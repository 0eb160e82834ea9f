import os

# Tests run on CPU with a virtual 8-device mesh for sharding checks; the real
# TPU is reserved for bench.py.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)
