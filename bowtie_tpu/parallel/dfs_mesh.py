"""Multi-chip scale-out of the lockstep DFS engine.

The scaling model (SURVEY.md §2.7 "TPU-native mapping"): the FM index
(FMCat) is REPLICATED on every chip — the HBM analog of the
reference's `--mm`/`--shmem` page-cache sharing (shmem.h) — and read
lanes are data-parallel over a 1-D "dp" mesh.  Every op in the machine
step is batch-local (gathers from replicated arrays with sharded
indices, sharded elementwise state updates), so the hot loop needs NO
collectives; the only cross-chip communication is the `jnp.any(...)`
termination reduce of the while loop (one scalar all-reduce per
micro-step) and the initial/final host transfers.

Deterministic output order falls out of lane ids (the `--reorder`
analog, hit.h:181-188): lanes keep their original read index, so the
host merge is a concatenation.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..align import dfs_device as D


def make_dp_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), axis_names=("dp",))


def replicate_cat(cat: D.FMCat, mesh: Mesh) -> D.FMCat:
    """Replicate the concatenated fw+mirror index on every chip."""
    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, repl), cat)


def shard_lanes(mesh: Mesh, *arrays):
    """Place per-lane arrays data-parallel over the mesh (axis 0 must
    divide the device count; callers pad to the lane bucket)."""
    sh = NamedSharding(mesh, P(mesh.axis_names[0]))
    return tuple(jax.device_put(a, sh) for a in arrays)


def run_sharded(cat: D.FMCat, jobs_np: dict, seeds: np.ndarray,
                count0: np.ndarray, mesh: Mesh, *, J: int, L: int,
                nfrag: int, n_k: int, m_max: int, max_steps: int):
    """Run the DFS machine with lanes sharded over the mesh.  GSPMD
    partitions the jitted while loop from the input shardings alone —
    no shard_map needed because every op is lane-local."""
    ndev = mesh.devices.size
    B = seeds.shape[0]
    assert B % ndev == 0, f"lane count {B} not divisible by {ndev}"
    cat = replicate_cat(cat, mesh)
    lane_arrays = shard_lanes(mesh, seeds, count0)
    if "scal" not in jobs_np:
        jobs_np = D.pack_jobs_host(jobs_np, J, L)
    jobs_dev = {k: shard_lanes(mesh, np.ascontiguousarray(v))[0]
                for k, v in jobs_np.items()}
    if "qqp_r" not in jobs_dev:
        # derive by-depth rows on device; GSPMD keeps the outputs
        # lane-sharded from the sharded inputs
        jobs_dev["scal"], jobs_dev["qqp_r"] = D.derive_rows_jit(
            jobs_dev["scal"], jobs_dev["base_codes"],
            jobs_dev["base_qual"], jobs_dev["base_plen"],
            J=J, L=L, fc=cat.ftab_chars)
    out, iters = D.run_machine(cat, jobs_dev, *lane_arrays, J=J, L=L,
                               nfrag=nfrag, n_k=n_k, m_max=m_max,
                               max_steps=max_steps)
    return {k: np.asarray(v) for k, v in out.items()}, int(iters)


def dryrun(n_lanes_per_dev: int = 8, mesh: Mesh | None = None):
    """Compile + run one tiny sharded DFS batch (-v 1 jobs on the
    bundled e_coli index); used by the driver's multi-chip dry run."""
    from ..index.ebwt_io import read_ebwt
    from ..io.readers import ReadSource
    from ..align.dfs_jobs import build_v_jobs_vec

    mesh = mesh or make_dp_mesh()
    ndev = mesh.devices.size
    B = n_lanes_per_dev * ndev
    idx = read_ebwt("/root/reference/indexes/e_coli")
    idx_bw = read_ebwt("/root/reference/indexes/e_coli.rev")
    cat = D.build_fmcat(idx, idx_bw)
    reads = list(ReadSource(["/root/reference/reads/e_coli_1000.fq"],
                            "fastq", upto=B).records())
    while len(reads) < B:
        reads.append(reads[len(reads) % 1000])
    jobs, J = build_v_jobs_vec(reads, 1, False, False, 40,
                               cat.ftab_chars)
    seeds = np.array([r.seed(0) for r in reads], dtype=np.uint32)
    out, iters = run_sharded(cat, jobs, seeds,
                             np.zeros(B, np.int32), mesh, J=J, L=40,
                             nfrag=int(idx.nfrag), n_k=1, m_max=D.INF32,
                             max_steps=4096)
    assert out["result"].shape[0] == B
    assert int((out["result"] > 0).sum()) > 0, "no lane aligned"

    # seeded -n launch-A jobs (phases 1-2 + partial collection) over
    # the same mesh — the default mode's first device launch
    from ..align.dfs_jobs import build_n_jobs_a_vec
    jobs_n, J_N, _gated, _jrc, _jfw = build_n_jobs_a_vec(
        reads, 2, 28, 70, 125, True, False, False, 40,
        cat.ftab_chars)
    out_n, _ = run_sharded(cat, jobs_n, seeds,
                           np.zeros(B, np.int32), mesh, J=J_N, L=40,
                           nfrag=int(idx.nfrag), n_k=1, m_max=D.INF32,
                           max_steps=4096)
    assert int((out_n["result"] > 0).sum()) > 0, "no -n lane aligned"
    return out
