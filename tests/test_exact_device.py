"""Device (jit) exact search vs golden model."""
import numpy as np
import jax.numpy as jnp

from bowtie_tpu.index.arrays import from_ebwt
from bowtie_tpu.align.exact import exact_ranges, resolve_rows, right_align
from bowtie_tpu.ops import fm as fmops

import pytest


@pytest.fixture(scope="module")
def fm(ecoli_index):
    return from_ebwt(ecoli_index)


def test_rank_matches_golden(fm, golden, rng):
    rows = rng.integers(0, golden.idx.bwt_len + 1, size=200)
    # include edge cases
    rows = np.concatenate([rows, [0, 1, golden.idx.zoff, golden.idx.zoff + 1,
                                  golden.idx.bwt_len]])
    for c in range(4):
        got = np.array([int(fmops.rank1(fm, jnp.int32(c), jnp.int32(i)))
                        for i in rows[:40]])
        want = np.array([golden.rank(c, int(i)) for i in rows[:40]])
        np.testing.assert_array_equal(got, want)


def test_rank4_matches_rank1(fm, rng):
    import jax
    rows = jnp.array(rng.integers(0, int(fm.bwt_len), size=64), jnp.int32)
    r4 = jax.vmap(lambda i: fmops.rank4(fm, i))(rows)
    for c in range(4):
        r1 = jax.vmap(lambda i: fmops.rank1(fm, jnp.int32(c), i))(rows)
        np.testing.assert_array_equal(np.array(r4[:, c]), np.array(r1))


def test_exact_ranges_match_golden(fm, golden, ecoli_ref, rng):
    n = len(ecoli_ref)
    queries = []
    for _ in range(64):
        ln = int(rng.integers(20, 60))
        pos = int(rng.integers(0, n - ln))
        queries.append(ecoli_ref[pos:pos + ln].copy())
    # a few misses
    for _ in range(8):
        queries.append(rng.integers(0, 4, size=40).astype(np.uint8))
    mat, lens = right_align(queries)
    top, bot = exact_ranges(fm, jnp.asarray(mat), jnp.asarray(lens))
    top, bot = np.array(top), np.array(bot)
    for i, q in enumerate(queries):
        gt, gb = golden.exact_range(q)
        assert (top[i], bot[i]) == (gt, gb), f"query {i}"


def test_resolve_rows_match_golden(fm, golden, ecoli_ref, rng):
    n = len(ecoli_ref)
    rows = []
    for _ in range(32):
        pos = int(rng.integers(0, n - 30))
        t, b = golden.exact_range(ecoli_ref[pos:pos + 30])
        rows.extend(range(t, min(b, t + 3)))
    rows = np.array(rows[:64], dtype=np.int32)
    off, ok = resolve_rows(fm, jnp.asarray(rows))
    assert bool(np.all(ok))
    want = np.array([golden.resolve_row(int(r)) for r in rows])
    np.testing.assert_array_equal(np.array(off), want)


def test_short_reads_and_ns(fm, golden):
    # shorter than ftabChars -> no ftab jump path
    q_short = np.array([0, 1, 2, 3, 0], dtype=np.uint8)
    # N in read -> no exact hit
    q_n = np.array([0, 1, 4, 3, 0, 1, 2, 3, 0, 1, 2, 3], dtype=np.uint8)
    mat, lens = right_align([q_short, q_n])
    top, bot = exact_ranges(fm, jnp.asarray(mat), jnp.asarray(lens))
    gt, gb = golden.exact_range(q_short)
    assert (int(top[0]), int(bot[0])) == (gt, gb)
    assert int(bot[1]) == int(top[1]) == 0


def test_compact_layout_matches_dense(fm, ecoli_index, rng):
    """occ_every=128 + walk-left (the hg-scale layout) reproduces the
    dense path bit-for-bit: search ranges AND resolved offsets."""
    import jax
    fmc = from_ebwt(ecoli_index, occ_every=128, dense_sa=False)
    fmd = from_ebwt(ecoli_index, occ_every=1, dense_sa=True)
    rows = jnp.array(rng.integers(0, int(fm.bwt_len), size=512), jnp.int32)
    # fused walk step == dense LF at every row (zoff excluded: lf_row
    # is undefined there)
    rows = jnp.where(rows == fm.zoff, rows + 1, rows)
    lf_d = jax.jit(fmops.lf_row)(fmd, rows)
    lf_c = jax.jit(fmops.lf_row)(fmc, rows)
    np.testing.assert_array_equal(np.asarray(lf_d), np.asarray(lf_c))
    offs_d, ok_d = resolve_rows(fmd, rows)
    offs_c, ok_c = resolve_rows(fmc, rows)
    assert bool(np.all(np.asarray(ok_c)))
    np.testing.assert_array_equal(np.asarray(offs_d),
                                  np.asarray(offs_c))
