"""Test configuration: force CPU with 8 virtual devices so sharding tests
run anywhere; correctness gates must not need a TPU."""
import os

# Force local CPU with 8 virtual devices.  The environment pre-selects a
# remote TPU backend ("axon") via sitecustomize, which overrides
# JAX_PLATFORMS through jax.config — so we must override jax.config back
# (env vars alone are not enough once sitecustomize has run).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA cache (same dir as the CLI): recompiles forced by the
# per-module cache clear below are then cheap deserializations.
_cache = os.environ.get("BOWTIE_TPU_CACHE",
                        os.path.expanduser("~/.cache/bowtie-tpu-xla"))
try:
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402

E_COLI_INDEX = "/root/reference/indexes/e_coli"
READS_DIR = "/root/reference/reads"

# Modules whose tests jit the device engines (long XLA compiles) or run
# the randomized end-to-end harness.  Everything else is the "quick"
# host-parity gate: `pytest -m quick` finishes in a few minutes on one
# CPU, `pytest -m slow` is the full device set.
_SLOW_MODULES = {
    "test_dfs_device", "test_dfs_compact", "test_n_device",
    "test_exact_device", "test_dfs_mesh", "test_distributed",
    "test_random_vs_binary", "test_random_property", "test_best_device",
    "test_pe_device", "test_blockwise",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled-executable references after each module.

    Every XLA:CPU executable keeps mmap'd code regions alive as long
    as jax's in-memory jit caches reference it.  The full suite
    compiles enough distinct programs to exhaust the kernel's
    vm.max_map_count (~65k mappings; measured 62k right before a
    deterministic SIGSEGV inside executable (de)serialization at ~86%
    of the suite).  Clearing between modules caps the live-executable
    population; cross-module recompiles are served quickly from the
    persistent disk cache.
    """
    yield
    import gc
    jax.clear_caches()
    gc.collect()


@pytest.fixture(scope="session")
def ecoli_index():
    from bowtie_tpu.index.ebwt_io import read_ebwt
    return read_ebwt(E_COLI_INDEX)


@pytest.fixture(scope="session")
def ecoli_rev_index():
    from bowtie_tpu.index.ebwt_io import read_ebwt
    return read_ebwt(E_COLI_INDEX + ".rev")


@pytest.fixture(scope="session")
def ecoli_ref():
    from bowtie_tpu.index.ebwt_io import (read_bitpair_reference,
                                          unpack_reference)
    recs, packed = read_bitpair_reference(E_COLI_INDEX)
    return unpack_reference(recs, packed)[0]


@pytest.fixture(scope="session")
def golden(ecoli_index):
    from bowtie_tpu.align.golden import GoldenFM
    return GoldenFM(ecoli_index)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
