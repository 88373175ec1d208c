"""hg-scale compact index layout (rank checkpoints + walk-left SA
resolve) must be bit-identical to the dense layout / host oracle."""
import pytest

from bowtie_tpu.index.ebwt_io import read_ebwt
from bowtie_tpu.io.readers import ReadSource
from bowtie_tpu.align.policy import KPolicy, INF
from bowtie_tpu.align.dfs_device import DeviceDFSAligner
from bowtie_tpu.align.n_device import DeviceNAligner
from bowtie_tpu.align.drivers import OracleAligner
from bowtie_tpu.align.golden import GoldenFM

E_COLI = "/root/reference/indexes/e_coli"


@pytest.fixture(scope="module")
def env():
    idx = read_ebwt(E_COLI)
    idx_bw = read_ebwt(E_COLI + ".rev")
    reads = list(ReadSource(["/root/reference/reads/e_coli_1000.fq"],
                            "fastq", upto=250).records())
    return idx, idx_bw, GoldenFM(idx), GoldenFM(idx_bw), reads


def _key(r):
    return ([(h.fw, h.tidx, h.toff, h.oms, h.stratum, h.cost,
              tuple(h.mms)) for h in r.hits],
            r.maxed, r.nvalid, r.sampled, r.nbuffered)


@pytest.mark.parametrize("v,kh,mh", [(1, 1, INF), (2, 3, INF),
                                     (2, INF, 5)])
def test_compact_v(env, v, kh, mh):
    idx, idx_bw, g_fw, g_bw, reads = env
    pol = KPolicy(khits=kh, mhits=mh)
    dev = DeviceDFSAligner(idx, idx_bw, pol, v=v, compact=True)
    ora = OracleAligner(g_fw, g_bw, pol, v=v)
    assert [_key(r) for r in dev.align_batch(reads)] == \
           [_key(r) for r in ora.align_batch(reads)]


def test_compact_n(env):
    idx, idx_bw, g_fw, g_bw, reads = env
    pol = KPolicy(1)
    dev = DeviceNAligner(idx, idx_bw, pol, compact=True)
    ora = OracleAligner(g_fw, g_bw, pol, mode="n")
    assert [_key(r) for r in dev.align_batch(reads)] == \
           [_key(r) for r in ora.align_batch(reads)]
