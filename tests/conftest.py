import os

# Multi-device tests run on a virtual 8-device CPU mesh; the real TPU chip is
# reserved for bench.py. Must be set before jax is imported.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
