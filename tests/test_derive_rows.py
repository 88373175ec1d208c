"""Device-side job-row derivation must match the row-upload path
bit-for-bit (it is the default on accelerators)."""
import os

import pytest

from bowtie_tpu.index.ebwt_io import read_ebwt
from bowtie_tpu.io.readers import ReadSource
from bowtie_tpu.align.policy import KPolicy


def _run(v_env):
    os.environ["BOWTIE_TPU_DERIVE_ROWS"] = v_env
    try:
        from bowtie_tpu.align.dfs_device import DeviceDFSAligner
        idx = read_ebwt("/root/reference/indexes/e_coli")
        idx_bw = read_ebwt("/root/reference/indexes/e_coli.rev")
        reads = list(ReadSource(
            ["/root/reference/reads/e_coli_1000.fq"], "fastq",
            upto=48).records())
        al = DeviceDFSAligner(idx, idx_bw, KPolicy(2), v=1)
        return [([(h.fw, h.tidx, h.toff, h.oms, h.stratum, h.cost,
                   tuple(h.mms)) for h in r.hits], r.maxed, r.nvalid)
                for r in al.align_batch(reads)]
    finally:
        os.environ.pop("BOWTIE_TPU_DERIVE_ROWS", None)


@pytest.mark.slow
def test_derive_matches_upload():
    assert _run("1") == _run("0")


def _run_n(v_env):
    """-n mode: derive-rows selects the fused single-round-trip path,
    whose launch-B job table is derived ON DEVICE from launch A's raw
    partial pools (n_device._derive_b_jobs_device).  The raw pools
    keep mutation triplets flat [B, P*3] — regression: the derivation
    must reshape them before per-k indexing (it crashed on any batch
    on real hardware while CPU tests only ran the upload path)."""
    os.environ["BOWTIE_TPU_DERIVE_ROWS"] = v_env
    try:
        from bowtie_tpu.align.n_device import DeviceNAligner
        idx = read_ebwt("/root/reference/indexes/e_coli")
        idx_bw = read_ebwt("/root/reference/indexes/e_coli.rev")
        reads = list(ReadSource(
            ["/root/reference/reads/e_coli_1000.fq"], "fastq",
            upto=48).records())
        al = DeviceNAligner(idx, idx_bw, KPolicy(1))
        return [([(h.fw, h.tidx, h.toff, h.oms, h.stratum, h.cost,
                   tuple(h.mms)) for h in r.hits], r.maxed, r.nvalid)
                for r in al.align_batch(reads)]
    finally:
        os.environ.pop("BOWTIE_TPU_DERIVE_ROWS", None)


@pytest.mark.slow
def test_derive_b_fused_matches_upload():
    assert _run_n("1") == _run_n("0")
