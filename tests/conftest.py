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

import numpy as np  # noqa: E402
import pytest  # noqa: E402

E_COLI_INDEX = "/root/reference/indexes/e_coli"
READS_DIR = "/root/reference/reads"


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
