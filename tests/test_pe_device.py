"""Device paired-end engine (align/pe_device.py): the recorded anchor
streams + host replay must match the pure-host PairedBWAlignerV1
re-expression hit-for-hit, and the CLI device path must stay
byte-identical to the reference goldens."""
import os

import pytest

from tests.test_parity_v0 import GOLDEN, IDX

R1 = "/root/reference/reads/e_coli_1000_1.fq"
R2 = "/root/reference/reads/e_coli_1000_2.fq"


def _key(r):
    return ([(h.fw, h.tidx, h.toff, h.oms, h.stratum, h.cost,
              tuple(h.mms), h.mate) for h in r.hits],
            r.maxed, r.nvalid)


@pytest.fixture(scope="module")
def _setup():
    from bowtie_tpu.index.ebwt_io import (read_ebwt,
                                          read_bitpair_reference,
                                          unpack_reference)
    from bowtie_tpu.io.readers import ReadSource
    idx = read_ebwt(IDX)
    idxb = read_ebwt(IDX + ".rev")
    recs, packed = read_bitpair_reference(IDX)
    refs = unpack_reference(recs, packed)
    p1 = list(ReadSource([R1], "fastq").records())
    p2 = list(ReadSource([R2], "fastq").records())
    return idx, idxb, refs, list(zip(p1, p2))


@pytest.mark.parametrize("tag,kw,k,m", [
    ("n2", dict(mode="n"), 1, None),
    ("v1", dict(mode="v", v=1), 1, None),
    ("n2_IX", dict(mode="n", min_insert=50, max_insert=170), 1, None),
    # device-interleave coverage: other orientations, wide window,
    # -v 2, --ff (fw2=True)
    ("v2_X400", dict(mode="v", v=2, max_insert=400), 1, None),
    ("n2_ff", dict(mode="n", fw2=True), 1, None),
    ("n1_rf", dict(mode="n", seed_mms=1, fw1=False, fw2=True), 1,
     None),
])
def test_device_pe_matches_host(_setup, tag, kw, k, m):
    from bowtie_tpu.align.policy import INF, KPolicy
    from bowtie_tpu.align.golden import GoldenFM
    from bowtie_tpu.align.best_factories import make_paired_best_aligner
    from bowtie_tpu.align.pe_device import DevicePairedBestAligner
    idx, idxb, refs, pairs = _setup
    pairs = pairs[:120]
    pol = KPolicy(k, m if m is not None else INF)
    host = make_paired_best_aligner(GoldenFM(idx), GoldenFM(idxb),
                                    refs, pol, **kw)
    dev = DevicePairedBestAligner(idx, idxb, refs, pol, **kw)
    hr = host.align_batch(pairs)
    dr = dev.align_batch(pairs)
    bad = [i for i, (a, b) in enumerate(zip(hr, dr))
           if _key(a) != _key(b)]
    assert not bad, bad[:5]


@pytest.mark.parametrize("key,args", [
    ("pe_n2_u200", ["-n", "2", "-u", "200"]),
    ("pe_v1_u200", ["-v", "1", "-u", "200"]),
    ("pe_n2_S_u200", ["-n", "2", "-S", "-u", "200"]),
])
def test_cli_device_pe_golden(key, args, tmp_path, monkeypatch):
    """CLI with the device PE engine (BOWTIE_TPU_DEVICE_PE opt-in)
    matches the reference goldens byte-for-byte."""
    monkeypatch.delenv("BOWTIE_TPU_HOST_ENGINE", raising=False)
    monkeypatch.setenv("BOWTIE_TPU_DEVICE_PE", "1")
    from bowtie_tpu.cli import align as cli
    golden = open(os.path.join(GOLDEN, f"{key}.out"), "rb").read()
    out = tmp_path / "out.txt"
    cli.main(args + ["--quiet", "-1", R1, "-2", R2, IDX, str(out)])
    mine = b"".join(l for l in out.read_bytes().splitlines(keepends=True)
                    if not l.startswith(b"@PG"))
    assert mine == golden


def test_synth_stream_matches_recording(_setup):
    """Phase 0's synthesized first emission (the whole-read exact
    range from the exact kernel) must equal the machine recording's
    first emission for every read with an exact hit, for both strand
    machines and both modes."""
    from bowtie_tpu.align.pe_device import DevicePairedBestAligner
    from bowtie_tpu.align.policy import KPolicy
    from bowtie_tpu.utils.rng import fill_seed_caches
    import numpy as np
    idx, idxb, refs, pairs = _setup
    for mode_kw in (dict(mode="n"), dict(mode="v", v=1)):
        dev = DevicePairedBestAligner(idx, idxb, refs,
                                      KPolicy(1, 0xFFFFFFFF), **mode_kw)
        reads = [p[0] for p in pairs[:200]]
        seeds = fill_seed_caches(reads, 0)
        for mach in (dev.m_fw, dev.m_rc):
            synth = dev._synth_streams(mach, reads)
            streams, ov = mach.record(reads, seeds, rec_cap=None)
            checked = 0
            for i, s in enumerate(synth):
                if s is None or ov[i] or streams[i] is None \
                        or len(streams[i]) == 0:
                    continue
                fr_s, _ = s.materialize(0)
                fr_r, _ = streams[i].materialize(0)
                assert (fr_s.top, fr_s.bot, fr_s.cost, fr_s.stratum,
                        fr_s.fw, fr_s.ebwt_fw, fr_s.mms) == \
                       (fr_r.top, fr_r.bot, fr_r.cost, fr_r.stratum,
                        fr_r.fw, fr_r.ebwt_fw, fr_r.mms), \
                    (mode_kw, i)
                checked += 1
            assert checked > 20     # the invariant was actually tested
