"""Native SA-IS vs the prefix-doubling SA (both bowtie suffix order)."""
import numpy as np
import pytest

from bowtie_tpu.build.sa import (_load_sais, _suffix_array_doubling,
                                 suffix_array)


@pytest.mark.skipif(_load_sais() is None, reason="no native toolchain")
@pytest.mark.parametrize("n,seed", [(1, 0), (2, 1), (33, 2), (1000, 3),
                                    (20000, 4)])
def test_sais_matches_doubling(n, seed):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, n).astype(np.uint8)
    assert np.array_equal(suffix_array(codes),
                          _suffix_array_doubling(codes))


@pytest.mark.parametrize("n,seed", [(1, 0), (2, 1), (33, 2), (50, 7),
                                    (1000, 3), (5000, 5)])
def test_jax_sa_matches_doubling(n, seed):
    from bowtie_tpu.build.sa import suffix_array_jax
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, n).astype(np.uint8)
    assert np.array_equal(suffix_array_jax(codes),
                          _suffix_array_doubling(codes))


def test_jax_sa_repetitive():
    from bowtie_tpu.build.sa import suffix_array_jax
    codes = np.tile(np.array([0, 1, 0, 1, 2, 0, 1], np.uint8),
                    500)[:3000]
    assert np.array_equal(suffix_array_jax(codes),
                          _suffix_array_doubling(codes))


@pytest.mark.skipif(_load_sais() is None, reason="no native toolchain")
def test_sais_repetitive():
    codes = np.tile(np.array([0, 1, 0, 1, 2, 0, 1], np.uint8),
                    3000)[:20000]
    assert np.array_equal(suffix_array(codes),
                          _suffix_array_doubling(codes))
