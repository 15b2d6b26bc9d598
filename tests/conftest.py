import os
import sys

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware (bench.py runs on the real chip instead).
# NOTE: the axon TPU plugin overrides the JAX_PLATFORMS env var, so the
# platform must be forced through jax.config before any backend use.
os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8").strip(),
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Full-suite runs accumulate dozens of multi-MB CPU executables in
    the in-process jit caches (they are never evicted); past ~70 tests
    the XLA:CPU runtime intermittently aborts loading the next one.
    Dropping the caches at module boundaries keeps the process lean —
    recompiles are served from the persistent on-disk cache."""
    yield
    jax.clear_caches()
