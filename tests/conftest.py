"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The axon TPU plugin registers regardless of the JAX_PLATFORMS env var (its
sitecustomize hook overrides it), so pinning the env is not enough: the
config flag must be forced after import, BEFORE any backend initializes.
That keeps the suite hermetic — no tunnel handshake at session start, and
jax.profiler never tries to collect from the remote TPU.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persist XLA compilations across test runs (the suite is compile-bound).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/mst-jax-cache-tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# Prefer the repo's bundled copy (standalone checkout); fall back to the
# reference tree when running in the comparison environment.
_REPO_CORPUS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "work", "data", "guitar_bass")
REFERENCE_CORPUS = "/root/reference/work/data/guitar_bass"


@pytest.fixture(scope="session", autouse=True)
def _cpu_default_device():
    cpus = jax.devices("cpu")
    assert len(cpus) >= 8, f"expected 8 virtual CPU devices, got {len(cpus)}"
    with jax.default_device(cpus[0]):
        yield


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")


@pytest.fixture(scope="session")
def corpus_path():
    for path in (_REPO_CORPUS, REFERENCE_CORPUS):
        if os.path.isdir(path):
            return path
    pytest.skip("bundled corpus not available")
