import os

# Tests run on CPU with a virtual 8-device mesh for sharding checks; the real
# TPU (reached through a tunnel here) is reserved for bench.py.  The tunnel
# platform ignores JAX_PLATFORMS, so force via jax.config as well.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
