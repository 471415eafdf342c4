import os

# Multi-device tests run on a virtual 8-device CPU mesh; the real TPU chip is
# reserved for bench.py. The axon TPU plugin ignores a pre-set JAX_PLATFORMS
# env default, so force the config at import time too.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules: a full single-process
    suite run accumulates ~400 XLA:CPU executables and the 387th test's
    compile then segfaults inside backend_compile_and_load (deterministic,
    test passes in isolation, stack-limit independent -- an XLA:CPU
    compiler-state issue, jaxlib 0.9.0). Clearing per module keeps the
    compiler healthy at the cost of recompiling shared kernels per file."""
    yield
    jax.clear_caches()
