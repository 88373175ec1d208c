"""Golden-model end-to-end checks: search + resolve on real genome data."""
import numpy as np

from bowtie_tpu.utils.alphabet import revcomp_codes


def test_exact_search_finds_planted_substrings(golden, ecoli_ref, rng):
    n = len(ecoli_ref)
    for _ in range(30):
        pos = int(rng.integers(0, n - 36))
        q = ecoli_ref[pos:pos + 36]
        top, bot = golden.exact_range(q)
        assert bot > top
        offs = {golden.resolve_row(r) for r in range(top, bot)}
        assert pos in offs
        # every reported offset must actually match the query
        for off in offs:
            assert np.array_equal(ecoli_ref[off:off + 36], q)


def test_ftab_agrees_with_plain_lf(golden, ecoli_ref, rng):
    n = len(ecoli_ref)
    for _ in range(20):
        pos = int(rng.integers(0, n - 24))
        q = ecoli_ref[pos:pos + 24]
        assert golden.exact_range(q, use_ftab=True) == \
               golden.exact_range(q, use_ftab=False)


def test_random_pattern_usually_absent(golden, rng):
    q = rng.integers(0, 4, size=50).astype(np.uint8)
    top, bot = golden.exact_range(q)
    assert bot == top  # 4^50 >> genome size; a hit would be a miracle


def test_revcomp_search(golden, ecoli_ref, rng):
    n = len(ecoli_ref)
    pos = int(rng.integers(0, n - 40))
    q = revcomp_codes(ecoli_ref[pos:pos + 40])
    # rc of a genome substring: searching rc finds it only if the rc
    # occurs fw elsewhere; searching rc of rc must find pos
    top, bot = golden.exact_range(revcomp_codes(q))
    offs = {golden.resolve_row(r) for r in range(top, bot)}
    assert pos in offs


def test_joined_to_text_off(golden):
    r = golden.joined_to_text_off(36, 1000)
    assert r == (0, 1000, 4938920)
    # spanning the end fails
    assert golden.joined_to_text_off(36, 4938920 - 10) is None
