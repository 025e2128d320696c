"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The axon TPU plugin registers regardless of JAX_PLATFORMS, so tests pin the
default device to CPU explicitly and build meshes from jax.devices("cpu").
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
import pytest  # noqa: E402

# Persist XLA compilations across test runs (the suite is compile-bound).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/mst-jax-cache-tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

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
    if not os.path.isdir(REFERENCE_CORPUS):
        pytest.skip("bundled reference corpus not available")
    return REFERENCE_CORPUS
