import os

# Multi-device tests run on a virtual 8-device CPU mesh; the real TPU chip is
# reserved for bench.py. The axon TPU plugin ignores a pre-set JAX_PLATFORMS
# env default, so force the config at import time too.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
