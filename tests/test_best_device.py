"""Device lockstep best-first engine vs the host engine (which is
itself byte-validated against the reference binary)."""
import numpy as np
import pytest

from tests.conftest import E_COLI_INDEX, READS_DIR


@pytest.fixture(scope="module")
def stack():
    from bowtie_tpu.index.ebwt_io import read_ebwt
    from bowtie_tpu.align.golden import GoldenFM
    from bowtie_tpu.io.readers import ReadSource
    idx = read_ebwt(E_COLI_INDEX)
    idxb = read_ebwt(E_COLI_INDEX + ".rev")
    reads = list(ReadSource([f"{READS_DIR}/e_coli_1000.fq"], "fastq",
                            upto=60).records())
    return idx, idxb, GoldenFM(idx), GoldenFM(idxb), reads


CASES = [
    ("v1_best", dict(v=1), dict(khits=1)),
    ("v2_M2", dict(v=2), dict(khits=1, mhits=2, sample_max=True)),
    ("v2_strata_k3", dict(v=2, strata=True), dict(khits=3)),
    ("v3", dict(v=3), dict(khits=1)),
    ("v2_a_m3", dict(v=2, all_hits=True), dict(khits=1, mhits=3)),
]


@pytest.mark.parametrize("tag,kw,polkw", CASES)
def test_device_best_matches_host(stack, tag, kw, polkw):
    from bowtie_tpu.align.best_factories import make_best_aligner
    from bowtie_tpu.align.best_device import DeviceBestAligner
    from bowtie_tpu.align.policy import INF, KPolicy
    idx, idxb, gf, gb, reads = stack
    pol = KPolicy(polkw.get("khits", 1), polkw.get("mhits", INF),
                  sample_max=polkw.get("sample_max", False))
    kw = dict(kw)
    strata = kw.pop("strata", False)
    all_hits = kw.pop("all_hits", False)
    host = make_best_aligner(gf, gb, kw["v"], pol, strata, all_hits)
    dev = DeviceBestAligner(idx, idxb, pol, strata=strata,
                            all_hits=all_hits, **kw)
    hres = host.align_batch(reads)
    dres = dev.align_batch(reads)
    for i, (h, d) in enumerate(zip(hres, dres)):
        hs = [(x.fw, x.tidx, x.toff, x.oms, x.stratum, x.cost,
               tuple(x.mms)) for x in h.hits]
        ds = [(x.fw, x.tidx, x.toff, x.oms, x.stratum, x.cost,
               tuple(x.mms)) for x in d.hits]
        assert hs == ds, f"read {i}"
        assert (h.maxed, h.nvalid, h.sampled) == \
            (d.maxed, d.nvalid, d.sampled), f"read {i}"


def test_device_best_is_cli_default(tmp_path, monkeypatch):
    """The CLI routes -v --best to the device engine and still matches
    the committed reference-binary golden byte-for-byte."""
    import os
    from tests.test_parity_v0 import GOLDEN, run_cli
    monkeypatch.delenv("BOWTIE_TPU_HOST_ENGINE", raising=False)
    golden = open(os.path.join(GOLDEN, "best_v2_M2.out"), "rb").read()
    mine = run_cli(["-v", "2", "-M", "2", "-u", "300"], tmp_path)
    assert mine == golden


SEEDED_CASES = [
    ("n1_best", 1, 28, 70, False, dict(khits=1), 125),
    ("n2_best", 2, 28, 70, False, dict(khits=1), 800),
    ("n2_M1", 2, 28, 70, False,
     dict(khits=1, mhits=1, sample_max=True), 800),
    ("n2_strata_k2", 2, 28, 70, True, dict(khits=2), 800),
    ("n3_best", 3, 28, 70, False, dict(khits=1), 800),
]


@pytest.mark.parametrize("tag,n,sl,qc,strata,polkw,mb", SEEDED_CASES)
def test_device_seeded_matches_host(stack, tag, n, sl, qc, strata,
                                    polkw, mb):
    from bowtie_tpu.align.best_factories import make_seeded_best_aligner
    from bowtie_tpu.align.best_device import DeviceBestAligner
    from bowtie_tpu.align.policy import INF, KPolicy
    idx, idxb, gf, gb, reads = stack
    pol = KPolicy(polkw.get("khits", 1), polkw.get("mhits", INF),
                  sample_max=polkw.get("sample_max", False))
    host = make_seeded_best_aligner(gf, gb, n, sl, qc, pol, strata,
                                    False, maxbts=mb)
    dev = DeviceBestAligner(idx, idxb, pol, mode="n", seed_mms=n,
                            seed_len=sl, qual_cutoff=qc, strata=strata,
                            maxbts=mb)
    hres = host.align_batch(reads)
    dres = dev.align_batch(reads)
    for i, (h, d) in enumerate(zip(hres, dres)):
        hs = [(x.fw, x.tidx, x.toff, x.oms, x.stratum, x.cost,
               tuple(x.mms)) for x in h.hits]
        ds = [(x.fw, x.tidx, x.toff, x.oms, x.stratum, x.cost,
               tuple(x.mms)) for x in d.hits]
        assert hs == ds, f"read {i}"
        assert (h.maxed, h.nvalid, h.sampled) == \
            (d.maxed, d.nvalid, d.sampled), f"read {i}"


def test_device_seeded_is_cli_default(tmp_path, monkeypatch):
    """The CLI routes -n --best to the device engine and still matches
    the committed reference-binary golden byte-for-byte."""
    import os
    from tests.test_parity_v0 import GOLDEN, run_cli
    monkeypatch.delenv("BOWTIE_TPU_HOST_ENGINE", raising=False)
    golden = open(os.path.join(GOLDEN, "best_n2.out"), "rb").read()
    mine = run_cli(["-n", "2", "--best", "-u", "300"], tmp_path)
    assert mine == golden
