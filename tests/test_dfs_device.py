"""Device lockstep-DFS engine vs the host oracle (which is itself
golden-tested byte-identical to the reference binary).

Covers -v 1/2 across reporting policies on the bundled e_coli fixtures
(the reference's own smoke-test scale, indexes/e_coli.README)."""
import pytest

from bowtie_tpu.index.ebwt_io import read_ebwt
from bowtie_tpu.io.readers import ReadSource
from bowtie_tpu.align.policy import KPolicy, INF
from bowtie_tpu.align.dfs_device import DeviceDFSAligner
from bowtie_tpu.align.drivers import OracleAligner
from bowtie_tpu.align.golden import GoldenFM

E_COLI = "/root/reference/indexes/e_coli"
READS = "/root/reference/reads/e_coli_1000.fq"


@pytest.fixture(scope="module")
def env():
    idx = read_ebwt(E_COLI)
    idx_bw = read_ebwt(E_COLI + ".rev")
    reads = list(ReadSource([READS], "fastq", upto=300).records())
    return idx, idx_bw, GoldenFM(idx), GoldenFM(idx_bw), reads


def _key(r):
    return ([(h.fw, h.tidx, h.toff, h.oms, h.stratum, h.cost,
              tuple(h.mms)) for h in r.hits],
            r.maxed, r.nvalid, r.sampled, r.nbuffered)


@pytest.mark.parametrize("v,kh,mh", [
    (1, 1, INF), (1, 3, INF), (1, INF, 5), (1, 1, 2),
    (2, 1, INF), (2, INF, INF), (2, 1, 2),
])
def test_device_matches_oracle(env, v, kh, mh):
    idx, idx_bw, g_fw, g_bw, reads = env
    pol = KPolicy(khits=kh, mhits=mh)
    dev = DeviceDFSAligner(idx, idx_bw, pol, v=v)
    ora = OracleAligner(g_fw, g_bw, pol, v=v)
    dres = dev.align_batch(reads)
    ores = ora.align_batch(reads)
    bad = [i for i, (d, o) in enumerate(zip(dres, ores))
           if _key(d) != _key(o)]
    assert bad == []


def test_device_nofw_norc(env):
    idx, idx_bw, g_fw, g_bw, reads = env
    pol = KPolicy(khits=1)
    for nofw, norc in ((True, False), (False, True)):
        dev = DeviceDFSAligner(idx, idx_bw, pol, v=1, nofw=nofw,
                               norc=norc)
        ora = OracleAligner(g_fw, g_bw, pol, v=1, nofw=nofw, norc=norc)
        assert [_key(r) for r in dev.align_batch(reads)] == \
               [_key(r) for r in ora.align_batch(reads)]
