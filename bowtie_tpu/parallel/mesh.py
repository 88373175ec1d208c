"""Multi-chip scale-out: data-parallel reads over a device mesh with a
replicated HBM-resident index.

This is the TPU-native replacement for bowtie's pthread worker pool +
shared read-only index (+ --mm/--shmem process sharing, SURVEY §2.7):
- the index pytree is replicated across the mesh (NamedSharding(P()))
  — one HBM copy per chip, the analog of the mmap'd shared index;
- read batches are sharded along the batch axis (P("reads"));
- the LF-search loop is entirely chip-local (no collectives in the hot
  loop); per-shard hit tensors come back to host already ordered by
  read id, giving deterministic --reorder-style output for free.

For genomes whose index exceeds one chip's HBM, shard `bwt`/`occ` along
rows instead and turn rank() gathers into ragged all-to-alls — hg-scale
(~1 GB occ+bwt) fits comfortably replicated, so data-parallel is the
design point (MANUAL.markdown:14-16 claims ~2.2 GB host RAM for the
reference; our packed layout is ~1.4 GB for hg).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.arrays import FMIndexArrays
from ..align.exact import exact_ranges, resolve_rows


def make_mesh(devices=None, axis: str = "reads") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def replicate_index(fm: FMIndexArrays, mesh: Mesh) -> FMIndexArrays:
    spec = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, spec), fm)


def shard_reads(mesh: Mesh, reads: np.ndarray, lens: np.ndarray,
                axis: str = "reads"):
    """Pad batch to a multiple of mesh size and shard along axis 0."""
    n = mesh.devices.size
    B = reads.shape[0]
    pad = (-B) % n
    if pad:
        reads = np.pad(reads, ((0, pad), (0, 0)), constant_values=4)
        lens = np.pad(lens, (0, pad))
    sharding = NamedSharding(mesh, P(axis))
    return (jax.device_put(reads, sharding),
            jax.device_put(lens, sharding), B)


@jax.jit
def sharded_align_step(fm: FMIndexArrays, reads: jnp.ndarray,
                       lens: jnp.ndarray):
    """Full exact-alignment device step: search both implicit strands
    are handled by the caller batching fw+rc rows; here we search and
    resolve the selected row of every non-empty range.  jit of this
    function over sharded inputs makes XLA partition the batch across
    the mesh with zero hot-loop collectives."""
    top, bot = exact_ranges(fm, reads, lens)
    has = bot > top
    offs, ok = resolve_rows(fm, jnp.where(has, top, 0))
    # all-ones sentinel: -1 for int32, 0xFFFFFFFF for uint32 (hg-scale)
    sent = ~jnp.zeros((), offs.dtype)
    return top, bot, jnp.where(has, offs, sent), ok & has
