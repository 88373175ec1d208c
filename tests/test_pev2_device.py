"""Device-recorded PairedBWAlignerV2 (--best PE) vs the host V2 engine:
identical ReadResults over real paired fixtures (the host engine is
itself byte-verified against the reference binary in test_paired /
test_random_vs_binary)."""
import numpy as np
import pytest

from bowtie_tpu.align.best_factories import make_paired_best_aligner_v2
from bowtie_tpu.align.golden import GoldenFM
from bowtie_tpu.align.pev2_device import DevicePairedV2Aligner
from bowtie_tpu.align.policy import INF, KPolicy
from bowtie_tpu.index.ebwt_io import (read_bitpair_reference, read_ebwt,
                                      unpack_reference)
from bowtie_tpu.io.readers import ReadSource

IDX = "/root/reference/indexes/e_coli"
R1 = "/root/reference/reads/e_coli_1000_1.fq"
R2 = "/root/reference/reads/e_coli_1000_2.fq"


@pytest.fixture(scope="module")
def fix():
    idx = read_ebwt(IDX)
    idx_bw = read_ebwt(IDX + ".rev")
    recs, packed = read_bitpair_reference(IDX)
    refs = unpack_reference(recs, packed, plen=idx.plen)
    p1 = list(ReadSource([R1], "fastq", upto=192).records())
    p2 = list(ReadSource([R2], "fastq", upto=192).records())
    return idx, idx_bw, refs, list(zip(p1, p2))


def _hits_key(res):
    if res is None:
        return None
    return ([(h.tidx, h.toff, h.fw, h.stratum, h.cost, h.mate,
              tuple(h.mms)) for h in res.hits],
            res.maxed, getattr(res, "se_hits", None) and [
                [(h.tidx, h.toff, h.fw) for h in g]
                for g in res.se_hits])


@pytest.mark.parametrize("cfg", [
    dict(mode="n", seed_mms=2, better=True),
    dict(mode="n", seed_mms=1, better=False),
    dict(mode="v", v=1, better=True),
    dict(mode="v", v=2, better=True, best_sink=False),
])
def test_pev2_device_matches_host(fix, cfg):
    idx, idx_bw, refs, pairs = fix
    policy = KPolicy(1, INF)
    host = make_paired_best_aligner_v2(
        GoldenFM(idx), GoldenFM(idx_bw), refs, policy, **cfg)
    dev = DevicePairedV2Aligner(idx, idx_bw, refs, policy, **cfg)
    n = 96
    want = [host.align_pair(a, b) for a, b in pairs[:n]]
    got = dev.align_batch(pairs[:n])
    for k, (w, g) in enumerate(zip(want, got)):
        assert _hits_key(w) == _hits_key(g), (
            f"pair {k} diverged (cfg={cfg}): "
            f"{_hits_key(w)} vs {_hits_key(g)}")


def test_pev2_device_k2(fix):
    """-k 2 --best: uncapped recording (want_all_rows)."""
    idx, idx_bw, refs, pairs = fix
    policy = KPolicy(2, INF)
    cfg = dict(mode="n", seed_mms=2, better=True)
    host = make_paired_best_aligner_v2(
        GoldenFM(idx), GoldenFM(idx_bw), refs, policy, **cfg)
    dev = DevicePairedV2Aligner(idx, idx_bw, refs, policy, **cfg)
    n = 48
    want = [host.align_pair(a, b) for a, b in pairs[:n]]
    got = dev.align_batch(pairs[:n])
    for k, (w, g) in enumerate(zip(want, got)):
        assert _hits_key(w) == _hits_key(g), f"pair {k} diverged"
