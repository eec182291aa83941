"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device sharding is tested without a pod via
``--xla_force_host_platform_device_count`` (SURVEY.md §4 implication).
Must run before the first jax import anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the environment pre-sets JAX_PLATFORMS=axon (the TPU tunnel); force CPU for
# the test suite regardless
jax.config.update("jax_platforms", "cpu")
try:  # persistent compile cache across test runs (BCR compiles dominate)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache_cpu")
except Exception:
    pass

import zlib  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def _seed_for(name: str) -> int:
    return zlib.crc32(name.encode()) ^ 0x5EED


@pytest.fixture()
def rng(request):
    """Deterministic per-TEST RNG, seeded from the test's nodeid: draws never
    depend on which other tests ran first on an xdist worker (a session-scoped
    shared rng made test_apps flaky in round 3)."""
    return np.random.default_rng(_seed_for(request.node.nodeid))


@pytest.fixture(scope="module")
def module_rng(request):
    """Deterministic per-MODULE RNG for module-scoped fixtures."""
    return np.random.default_rng(_seed_for(request.node.nodeid))
