"""Device -n engine (two-launch seeded pipeline) vs the host oracle."""
import pytest

from bowtie_tpu.index.ebwt_io import read_ebwt
from bowtie_tpu.io.readers import ReadSource
from bowtie_tpu.align.policy import KPolicy, INF
from bowtie_tpu.align.n_device import DeviceNAligner
from bowtie_tpu.align.drivers import OracleAligner
from bowtie_tpu.align.golden import GoldenFM

E_COLI = "/root/reference/indexes/e_coli"
READS = "/root/reference/reads/e_coli_1000.fq"


@pytest.fixture(scope="module")
def env():
    idx = read_ebwt(E_COLI)
    idx_bw = read_ebwt(E_COLI + ".rev")
    reads = list(ReadSource([READS], "fastq", upto=250).records())
    return idx, idx_bw, GoldenFM(idx), GoldenFM(idx_bw), reads


def _key(r):
    return ([(h.fw, h.tidx, h.toff, h.oms, h.stratum, h.cost,
              tuple(h.mms)) for h in r.hits],
            r.maxed, r.nvalid, r.sampled, r.nbuffered)


@pytest.mark.parametrize("cfg,kh,mh", [
    (dict(seed_mms=2), 1, INF),
    (dict(seed_mms=2), 3, INF),
    (dict(seed_mms=2), INF, 5),
    (dict(seed_mms=0), 1, INF),
    (dict(seed_mms=1), 1, INF),
    (dict(seed_mms=3), 1, INF),
    (dict(seed_mms=2, seed_len=20), 1, INF),
    (dict(seed_mms=2, qual_thresh=120), 1, INF),
    (dict(seed_mms=2, maq_round=False), 1, INF),
])
def test_n_device_matches_oracle(env, cfg, kh, mh):
    idx, idx_bw, g_fw, g_bw, reads = env
    pol = KPolicy(khits=kh, mhits=mh)
    dev = DeviceNAligner(idx, idx_bw, pol, **cfg)
    ora = OracleAligner(g_fw, g_bw, pol, mode="n", **cfg)
    bad = [i for i, (d, o) in
           enumerate(zip(dev.align_batch(reads), ora.align_batch(reads)))
           if _key(d) != _key(o)]
    assert bad == []
