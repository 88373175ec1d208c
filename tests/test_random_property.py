"""Randomized property tests (the random_bowtie_tests.pl analog,
scripts/test: random references + random reads + oracles).

We build an index from a random genome with our builder, plant reads
with controlled mismatches, align in several modes, and check the
results against brute-force numpy alignment of the genome.
"""
import io

import numpy as np
import pytest


@pytest.fixture(scope="module")
def random_index(tmp_path_factory, rng):
    from bowtie_tpu.build.builder import build_index
    n = 60000
    genome = rng.integers(0, 4, size=n).astype(np.uint8)
    # sprinkle N runs
    for _ in range(5):
        p = int(rng.integers(0, n - 30))
        genome[p:p + int(rng.integers(1, 20))] = 4
    base = str(tmp_path_factory.mktemp("rnd") / "rnd")
    build_index([genome], ["rndseq"], base, off_rate=5, ftab_chars=7)
    return base, genome


def _brute_hits(genome, q, max_mm):
    """All (off, nmm) with nmm <= max_mm (N anywhere = mismatch)."""
    n, m = len(genome), len(q)
    win = np.lib.stride_tricks.sliding_window_view(genome, m)
    bad = (win > 3) | (q[None, :] > 3)
    nmm = ((win != q[None, :]) | bad).sum(axis=1)
    return {int(i): int(nmm[i]) for i in np.flatnonzero(nmm <= max_mm)}


@pytest.mark.parametrize("v", [0, 1, 2])
def test_random_v_mode_hits_valid_and_complete(random_index, rng, v):
    from bowtie_tpu.index.ebwt_io import read_ebwt
    from bowtie_tpu.align.golden import GoldenFM
    from bowtie_tpu.align.drivers import OracleAligner
    from bowtie_tpu.align.policy import KPolicy, INF
    from bowtie_tpu.io.readers import ReadRecord
    from bowtie_tpu.utils.alphabet import codes_to_seq, revcomp_codes

    base, genome = random_index
    g_fw = GoldenFM(read_ebwt(base))
    g_bw = GoldenFM(read_ebwt(base + ".rev"))
    al = OracleAligner(g_fw, g_bw, KPolicy(khits=INF), v=v)

    for t in range(12):
        pos = int(rng.integers(0, len(genome) - 40))
        q = genome[pos:pos + 40].copy()
        if (q > 3).any():
            continue
        # plant up to v mismatches
        nmut = int(rng.integers(0, v + 1))
        for _ in range(nmut):
            p = int(rng.integers(0, 40))
            q[p] = (q[p] + 1 + rng.integers(0, 3)) % 4
        if rng.integers(0, 2):
            q = revcomp_codes(q)
        read = ReadRecord(name=b"t%d" % t,
                          seq=codes_to_seq(q).encode(),
                          qual=b"I" * 40, rdid=t)
        res = al.align_read(read)
        # completeness: every brute-force fw/rc hit must be reported
        fw_hits = _brute_hits(genome, q, v)
        rc_hits = _brute_hits(genome, revcomp_codes(q), v)
        want = {(o, True) for o in fw_hits} | \
               {(o, False) for o in rc_hits}
        got = {(h.toff, h.fw) for h in res.hits}
        assert got == want, f"read {t}: got {got}, want {want}"
        # validity: declared mismatch count matches brute force
        for h in res.hits:
            ref_n = fw_hits[h.toff] if h.fw else rc_hits[h.toff]
            assert len(h.mms) == ref_n


def test_random_build_roundtrips_through_inspect(random_index):
    from bowtie_tpu.build.inspect import inspect
    base, genome = random_index
    out = io.StringIO()
    inspect(base, out=out)
    body = "".join(out.getvalue().splitlines()[1:])
    from bowtie_tpu.utils.alphabet import seq_to_codes
    got = seq_to_codes(body)
    assert np.array_equal(got, genome)


def test_random_exact_device_matches_oracle(random_index, rng):
    import jax.numpy as jnp
    from bowtie_tpu.index.ebwt_io import read_ebwt
    from bowtie_tpu.index.arrays import from_ebwt
    from bowtie_tpu.align.golden import GoldenFM
    from bowtie_tpu.align.exact import exact_ranges, resolve_rows, \
        right_align

    base, genome = random_index
    idx = read_ebwt(base)
    g = GoldenFM(idx)
    for occ_every, dense in ((1, True), (128, False)):
        fm = from_ebwt(idx, occ_every=occ_every, dense_sa=dense)
        qs = []
        for _ in range(24):
            pos = int(rng.integers(0, len(genome) - 30))
            q = genome[pos:pos + 30]
            if not (q > 3).any():
                qs.append(q.copy())
        mat, lens = right_align(qs)
        top, bot = exact_ranges(fm, jnp.asarray(mat), jnp.asarray(lens))
        top, bot = np.asarray(top), np.asarray(bot)
        for i, q in enumerate(qs):
            assert (int(top[i]), int(bot[i])) == g.exact_range(q)
        rows = jnp.asarray(np.where(bot > top, top, 0).astype(np.int32))
        offs, ok = resolve_rows(fm, rows)
        for i in range(len(qs)):
            if bot[i] > top[i]:
                assert bool(ok[i])
                assert int(offs[i]) == g.resolve_row(int(top[i]))
