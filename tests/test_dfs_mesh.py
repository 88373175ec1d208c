"""Sharded DFS engine: data-parallel lanes over the virtual 8-device
mesh must produce the same results as the single-device run."""
import numpy as np

from bowtie_tpu.index.ebwt_io import read_ebwt
from bowtie_tpu.io.readers import ReadSource
from bowtie_tpu.align import dfs_device as D
from bowtie_tpu.align.dfs_jobs import build_v_jobs_vec
from bowtie_tpu.parallel.dfs_mesh import make_dp_mesh, run_sharded

E_COLI = "/root/reference/indexes/e_coli"


def test_sharded_dfs_matches_single():
    import jax
    idx = read_ebwt(E_COLI)
    idx_bw = read_ebwt(E_COLI + ".rev")
    cat = D.build_fmcat(idx, idx_bw)
    B = 64
    reads = list(ReadSource(
        ["/root/reference/reads/e_coli_1000.fq"], "fastq",
        upto=B).records())
    jobs, J = build_v_jobs_vec(reads, 1, False, False, 40,
                               cat.ftab_chars)
    seeds = np.array([r.seed(0) for r in reads], dtype=np.uint32)
    kw = dict(J=J, L=40, nfrag=int(idx.nfrag), n_k=1, m_max=D.INF32,
              max_steps=4096)
    mesh = make_dp_mesh(jax.devices())
    out_s, _ = run_sharded(cat, jobs, seeds, np.zeros(B, np.int32),
                           mesh, **kw)
    import jax.numpy as jnp
    out_1, _ = D.run_machine(cat, D.upload_jobs(jobs, J, 40,
                                                cat.ftab_chars),
                             jnp.asarray(seeds),
                             jnp.zeros(B, jnp.int32), **kw)
    for k in ("result", "count", "nhits", "hits", "overflow"):
        assert np.array_equal(out_s[k], np.asarray(out_1[k])), k
