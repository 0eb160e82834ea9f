import os

# Tests run on CPU with a virtual 8-device mesh for sharding checks; the real
# TPU (reached through a tunnel here) is reserved for bench.py.  The tunnel
# platform ignores JAX_PLATFORMS, so force via jax.config as well.
# PSQ_TPU_TESTS=1 skips the CPU force so the slow-marked hardware parity
# tests (test_pallas_mutscore_hw, ...) can run on the real chip:
#   PSQ_TPU_TESTS=1 python -m pytest tests/test_pallas_mutscore_hw.py -m slow
if os.environ.get("PSQ_TPU_TESTS") != "1":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

    import jax

    jax.config.update("jax_platforms", "cpu")
