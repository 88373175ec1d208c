"""Bounded-memory blockwise SA: exact parity with SA-IS, byte-identical
index files through the streaming writer."""
import os

import numpy as np
import pytest

from bowtie_tpu.build.blockwise import (DCSample, PackedText,
                                        blockwise_sa_chunks,
                                        delta_table, difference_cover,
                                        suffix_array_blockwise)
from bowtie_tpu.build.sa import suffix_array

HERE = os.path.dirname(__file__)
FASTA = os.path.join(HERE, "golden", "small_genome.fa")
GOLD = os.path.join(HERE, "golden", "small_index", "small_oracle")


def test_difference_cover_valid():
    for v in (32, 64, 256):
        D = difference_cover(v)
        diffs = (D[:, None] - D[None, :]) % v
        assert set(diffs.reshape(-1)) == set(range(v))
        dl = delta_table(v, D)
        inD = np.zeros(v, bool)
        inD[D % v] = True
        a = np.arange(v)
        for b in (0, 1, v // 2, v - 1):
            k = dl[:, b]
            assert inD[(a + k) % v].all()
            assert inD[(b + k) % v].all()
            assert (k < v).all()


def test_packed_text_keys():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, 500).astype(np.uint8)
    pt = PackedText(codes)
    pos = np.array([0, 1, 31, 32, 33, 100, 467], np.int64)
    keys = pt.keys(pos)
    for p, k in zip(pos, keys):
        want = 0
        for j in range(32):
            want = (want << 2) | int(codes[p + j])
        assert int(k) == want, p


@pytest.mark.parametrize("n,v,bmax,seed", [
    (5000, 64, 800, 0), (20000, 64, 3000, 1), (60000, 128, 8000, 2),
])
def test_blockwise_matches_sais(n, v, bmax, seed):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, n).astype(np.uint8)
    assert np.array_equal(suffix_array_blockwise(codes, bmax, v),
                          suffix_array(codes))


def test_blockwise_repetitive():
    """Satellite-like period-7 repeats: deep ties resolved by the
    difference-cover comparator."""
    codes = np.tile(np.array([0, 1, 0, 1, 2, 0, 1], np.uint8),
                    12000)[:80000]
    assert np.array_equal(
        suffix_array_blockwise(codes, bmax=9000, dcv=128),
        suffix_array(codes))


def test_chunks_are_bounded_and_ordered():
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, 40000).astype(np.uint8)
    chunks = list(blockwise_sa_chunks(codes, bmax=5000, dcv=64))
    total = np.concatenate(chunks)
    assert len(total) == 40001
    assert np.array_equal(total, suffix_array(codes))
    # no chunk wildly exceeds bmax (single buckets may, slightly)
    assert max(len(c) for c in chunks) < 3 * 5000


def test_streaming_build_byte_identical(tmp_path):
    """--bmax routes through blockwise + the streaming writer and still
    produces the reference builder's exact bytes."""
    from bowtie_tpu.cli.build import main as build_main
    base = str(tmp_path / "bw")
    assert build_main(["-o", "5", "-t", "7", "-q", "--bmax", "3000",
                       "--dcv", "64", FASTA, base]) == 0
    for e in (".1.ebwt", ".2.ebwt", ".rev.1.ebwt", ".rev.2.ebwt"):
        assert open(base + e, "rb").read() == \
            open(GOLD + e, "rb").read(), e
