import os
import sys

# A virtual 8-device CPU mesh for all tests. NOTE: this environment's
# sitecustomize registers an "axon" TPU backend that overrides JAX_PLATFORMS,
# so we must force the platform via jax.config, not env vars.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# fp32 parity tests need real fp32 matmuls
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module. The full suite
    (slow tests included) compiles hundreds of CPU programs in one process
    alongside torch (the golden-test oracle); past ~100 tests XLA:CPU's
    backend_compile_and_load starts SEGFAULTING from the accumulated JIT
    state (reproduced at different tests with identical stacks, r5
    bisect). Clearing per module keeps the live-executable count bounded;
    module-scoped fixtures recompile on next use."""
    yield
    jax.clear_caches()
