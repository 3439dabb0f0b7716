"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding tests run without TPU hardware (SURVEY.md §4 implication (d))."""

import os

# Force CPU with 8 virtual devices. The driver environment pins
# JAX_PLATFORMS=axon (the real TPU) and its sitecustomize imports jax at
# interpreter startup, so the env var is already frozen by the time this
# conftest runs — jax.config.update is the only reliable override. The
# XLA_FLAGS assignment still works because the CPU backend has not been
# instantiated yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the fast subset is compile-dominated
# (many 2-30 s CPU compiles of stable test shapes); re-runs hit the
# cache. Safe on the CPU backend only — core/jitcache.py documents the
# measured axon hang; this conftest forces CPU above.
from vulkan_renderer_tpu.core import jitcache  # noqa: E402

jitcache.enable(min_compile_seconds=1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    # Fast subset: `pytest -m "not slow"` (~2-3 min). The slow marker
    # covers the multi-second end-to-end renders and convergence sweeps.
    config.addinivalue_line(
        "markers", "slow: multi-second end-to-end render tests "
        "(deselect with -m 'not slow')")


@pytest.fixture
def rng():
    return np.random.default_rng(0x5EED)


@pytest.fixture(autouse=True, scope="module")
def _bound_jax_memory():
    """Free jax's in-process caches after every test module: the full
    suite compiles hundreds of large (interpret-mode Pallas) programs and
    the accumulated executables/tracing caches grew past 11 GB RSS, ending
    in a segfault around the 75% mark (VERDICT r4 weak #5). Per-module
    clearing keeps the high-water mark bounded; the persistent on-disk
    compile cache above still makes recompiles cheap."""
    yield
    jax.clear_caches()
