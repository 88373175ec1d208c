"""The vectorized job builder must produce exactly the scalar
builder's tables (the scalar fill_job documents the per-read
set_query/set_offs semantics; the vectorized one is the fast path)."""
import numpy as np
import pytest

from bowtie_tpu.index.ebwt_io import read_ebwt  # noqa: F401 (env check)
from bowtie_tpu.io.readers import ReadSource
from bowtie_tpu.align.dfs_device import build_v_jobs
from bowtie_tpu.align.dfs_jobs import build_v_jobs_vec

READS = "/root/reference/reads/e_coli_1000.fq"


@pytest.mark.parametrize("v,nofw,norc", [(1, False, False),
                                         (2, False, False),
                                         (1, True, False),
                                         (2, False, True)])
def test_vec_matches_scalar(v, nofw, norc):
    reads = list(ReadSource([READS], "fastq", upto=150).records())
    a, Ja = build_v_jobs(reads, v, nofw, norc, 40, 10)
    b, Jb = build_v_jobs_vec(reads, v, nofw, norc, 40, 10, rows=True)
    for k in a:
        assert np.array_equal(a[k][:, :Jb].astype(np.int64),
                              b[k].astype(np.int64)), k
