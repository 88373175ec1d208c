#!/usr/bin/env python
"""Scaling evidence for the data-parallel design (BASELINE.md's >=80%
1->N gate can't be measured on a single-chip bench, so this bounds the
answer from two sides):

1. single-chip batch-size -> throughput curve for the exact kernel and
   the -v 1 DFS engine: near-linear growth until the chip saturates is
   the premise that makes replicated-index data-parallel scale-out
   work (more chips = more aggregate batch at the saturated rate).
2. when >1 device is visible (real or xla_force_host_platform_device
   _count), reads/s on a 1-device vs an N-device mesh with the SAME
   per-device batch (weak scaling): the hot loop has no collectives
   except the while-loop termination reduce, so efficiency loss is
   that reduce + GSPMD overhead.

Prints one JSON line per measurement.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

if os.environ.get("JAX_PLATFORMS"):
    # the environment's sitecustomize pre-selects the remote TPU
    # backend through jax.config, which overrides the env var; force
    # it back so the virtual-device mesh measurement is possible
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def _sync(x):
    import jax.numpy as jnp
    return int(jnp.sum(x))


def exact_curve():
    import jax
    import jax.numpy as jnp
    from bowtie_tpu.index.ebwt_io import read_ebwt
    from bowtie_tpu.index.arrays import from_ebwt
    from bowtie_tpu.io.readers import ReadSource
    from bowtie_tpu.align.exact import right_align
    from bowtie_tpu.parallel.mesh import sharded_align_step

    idx = read_ebwt("/root/reference/indexes/e_coli")
    fm = from_ebwt(idx, occ_every=1, dense_sa=True)
    src = ReadSource(["/root/reference/reads/e_coli_1000.fq"], "fastq")
    base = [r.codes_fw for r in src.records()]

    @jax.jit
    def step(fm, reads, lens):
        t, b, o, k = sharded_align_step(fm, reads, lens)
        return jnp.sum(k.astype(jnp.int32)) + jnp.sum(b - t)

    for B in (4096, 16384, 65536, 262144, 524288):
        codes = [base[i % len(base)] for i in range(B)]
        mat, lens = right_align(codes, pad_to=36)
        mat, lens = jnp.asarray(mat), jnp.asarray(lens)
        _sync(step(fm, mat, lens))          # compile+warm
        t0 = time.time()
        it = 3
        for _ in range(it):
            _sync(step(fm, mat, lens))
        dt = (time.time() - t0) / it
        print(json.dumps({
            "metric": "exact kernel reads/s vs batch",
            "batch": B, "value": round(B / 2 / dt, 1),
            "unit": "reads/s"}), flush=True)


def v1_curve():
    from bowtie_tpu.index.ebwt_io import read_ebwt
    from bowtie_tpu.io.readers import ReadSource
    from bowtie_tpu.align.dfs_device import DeviceDFSAligner
    from bowtie_tpu.align.policy import INF, KPolicy

    idx = read_ebwt("/root/reference/indexes/e_coli")
    idx_bw = read_ebwt("/root/reference/indexes/e_coli.rev")
    src = ReadSource(["/root/reference/reads/e_coli_1000.fq"], "fastq")
    reads = list(src.records())
    al = DeviceDFSAligner(idx, idx_bw, KPolicy(1, INF), v=1)
    for B in (4096, 16384, 32768):
        batch = [reads[i % len(reads)] for i in range(B)]
        al.align_batch(batch[:512])        # warm shapes
        t0 = time.time()
        al.align_batch(batch)
        dt = time.time() - t0
        print(json.dumps({
            "metric": "-v1 engine reads/s vs batch",
            "batch": B, "value": round(B / dt, 1),
            "unit": "reads/s"}), flush=True)


def mesh_weak_scaling():
    import jax
    ndev = len(jax.devices())
    if ndev < 2:
        print(json.dumps({"metric": "mesh weak scaling",
                          "note": f"only {ndev} device(s); skipped"}))
        return
    import numpy as np
    from jax.sharding import Mesh
    from bowtie_tpu.index.ebwt_io import read_ebwt
    from bowtie_tpu.io.readers import ReadSource
    from bowtie_tpu.align.dfs_jobs import build_v_jobs_vec
    from bowtie_tpu.align import dfs_device as D
    from bowtie_tpu.parallel.dfs_mesh import make_dp_mesh, run_sharded

    idx = read_ebwt("/root/reference/indexes/e_coli")
    idx_bw = read_ebwt("/root/reference/indexes/e_coli.rev")
    cat = D.build_fmcat(idx, idx_bw)
    src = ReadSource(["/root/reference/reads/e_coli_1000.fq"], "fastq")
    reads = list(src.records())
    per_dev = 1024
    res = {}
    for n in (1, ndev):
        B = per_dev * n
        batch = [reads[i % len(reads)] for i in range(B)]
        jobs, J = build_v_jobs_vec(batch, 1, False, False, 40,
                                   cat.ftab_chars)
        seeds = np.array([r.seed(0) for r in batch], np.uint32)
        mesh = Mesh(np.array(jax.devices()[:n]), ("dp",))
        kw = dict(J=J, L=40, nfrag=int(idx.nfrag), n_k=1,
                  m_max=D.INF32, max_steps=8192)
        # warm-up: the per-(mesh,bucket) XLA compile must not count
        # toward the scaling ratio
        run_sharded(cat, jobs, seeds, np.zeros(B, np.int32), mesh,
                    **kw)
        t0 = time.time()
        run_sharded(cat, jobs, seeds, np.zeros(B, np.int32), mesh,
                    **kw)
        dt = time.time() - t0
        res[n] = B / dt
        print(json.dumps({
            "metric": "mesh weak scaling (-v1, per-dev batch "
                      f"{per_dev})", "devices": n,
            "value": round(B / dt, 1), "unit": "reads/s"}), flush=True)
    import jax
    virtual = jax.devices()[0].platform == "cpu"
    if virtual:
        # N virtual devices share the physical core(s): weak-scaling
        # ideal is res[N] == res[1] (N x work in N x time).  The ratio
        # isolates GSPMD partitioning overhead; the hot loop has no
        # collectives except the while-loop termination reduce.
        eff = res[ndev] / res[1]
        metric = (f"GSPMD overhead factor, 1 vs {ndev} virtual "
                  "devices (1.0 = no partitioning cost)")
    else:
        eff = res[ndev] / (res[1] * ndev)
        metric = f"weak-scaling efficiency 1->{ndev}"
    print(json.dumps({"metric": metric, "value": round(eff, 3)}),
          flush=True)


if __name__ == "__main__":
    exact_curve()
    v1_curve()
    mesh_weak_scaling()
