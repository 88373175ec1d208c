"""Device-resident FM-index arrays (the TPU-native Ebwt layout).

Instead of bowtie's 64-byte interleaved "sides" (ebwt.h:164-180) we keep:

- ``bwt``  : uint32[ceil((len+1)/16)]  -- 2-bit codes, 16 per word,
             low bit-pair first ('$' stored as code 0 at row ``zoff``)
- ``occ``  : int32[nblocks+1, 4]       -- rank checkpoints every
             ``OCC_BLOCK`` (=128) rows, counting *stored* codes
- ``fchr`` : int32[5]                  -- cumulative char counts
- ``ftab_hi/ftab_lo`` : int32[ftabLen] -- escape-resolved k-mer jump table
- ``offs`` : int32[offsLen]            -- SA sample (row % 32 == 0)
- ``zoff`` : int32 scalar

This layout makes one rank query = 1 checkpoint row + 8 consecutive
words, i.e. a single aligned 32-byte stream per (row, step) — the XLA/
Pallas-friendly equivalent of countUpTo's side scan (ebwt.h:1897).

The whole structure is a pytree, so it can be donated to jit, replicated
with NamedSharding, or host-sharded for very large genomes.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .ebwt_io import EbwtIndex

OCC_BLOCK = 128            # rows per checkpoint
WORDS_PER_BLOCK = OCC_BLOCK // 16


@jax.tree_util.register_pytree_node_class
@dataclass
class FMIndexArrays:
    bwt: jax.Array        # uint32 [nwords]
    occ: jax.Array        # int32  [nblocks+1, 4] (or [bwtLen+1, 4] full)
    fchr: jax.Array       # int32  [5]
    ftab_hi: jax.Array    # int32  [ftabLen]
    ftab_lo: jax.Array    # int32  [ftabLen]
    offs: jax.Array       # int32  [offsLen]
    zoff: jax.Array       # int32  scalar
    bwt_len: jax.Array    # int32  scalar (len+1)

    # static (not traced)
    ftab_chars: int = 10
    off_rate: int = 5
    # dense SA (sa[row] = joined text offset of the suffix at BWT row):
    # makes offset resolution a single gather instead of a walk-left
    # loop.  4 B/row; built at load by pointer-doubling over the LF
    # permutation.  None for very large genomes (walk-left path used).
    sa: jax.Array | None = None

    # rows per occ checkpoint: OCC_BLOCK (compact; rank = checkpoint +
    # popcount over 8 words) or 1 (full rank table; rank = ONE gather —
    # trades HBM footprint (16 B/row) for minimal per-step work, the
    # right point for genomes up to ~1 Gbp on a 16 GB chip)
    occ_every: int = OCC_BLOCK

    def tree_flatten(self):
        children = (self.bwt, self.occ, self.fchr, self.ftab_hi,
                    self.ftab_lo, self.offs, self.zoff, self.bwt_len,
                    self.sa)
        return children, (self.ftab_chars, self.off_rate, self.occ_every)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children[:8], sa=children[8], ftab_chars=aux[0],
                   off_rate=aux[1], occ_every=aux[2])


def pack_bwt_words(bwt_codes: np.ndarray) -> np.ndarray:
    """uint8 codes -> uint32 words, 16 codes/word, low bit-pair first,
    as a tile-exact [rows, 128] matrix (128 u32 = 16 occ blocks per
    row).  A narrow [nblocks, 8] row-gather operand is either padded
    16x by the TPU's (8,128) tiling or fetched at descriptor rate
    (~26 ms per gather against a 2 Gbp index — the round-4 hg-scale
    regression); 128-wide rows pad nothing and gather at full rate."""
    n = len(bwt_codes)
    nwords = (n + 15) // 16
    nwords = -(-nwords // 128) * 128
    padded = np.zeros(nwords * 16, dtype=np.uint32)
    padded[:n] = bwt_codes
    lanes = padded.reshape(nwords, 16)
    shifts = (2 * np.arange(16, dtype=np.uint32))[None, :]
    return (lanes << shifts).sum(axis=1,
                                 dtype=np.uint32).reshape(-1, 128)


def build_occ_checkpoints(bwt_codes: np.ndarray, block: int = OCC_BLOCK,
                          dtype=np.int32) -> np.ndarray:
    """occ[k, c] = count of stored code c in rows [0, k*block)."""
    n = len(bwt_codes)
    nblocks = (n + block - 1) // block
    pad = nblocks * block - n
    padded = np.pad(bwt_codes, (0, pad), constant_values=0)
    onehot = padded.reshape(nblocks, block, 1) == np.arange(4, dtype=np.uint8)
    per_block = onehot.sum(axis=1, dtype=np.int64)
    ck = np.zeros((nblocks + 1, 4), dtype=np.int64)
    np.cumsum(per_block, axis=0, out=ck[1:])
    ck[-1, 0] -= pad  # padding zeros are not 'A's
    return ck.astype(dtype)


def build_full_rank(bwt_codes: np.ndarray) -> np.ndarray:
    """occ[i, c] = count of stored code c in rows [0, i) — full table.
    Per-char cumsums into pre-allocated int32 columns (avoids the
    [n, 4] one-hot materialization)."""
    n = len(bwt_codes)
    ck = np.zeros((n + 1, 4), dtype=np.int32)
    for c in range(4):
        np.cumsum(bwt_codes == c, out=ck[1:, c])
    return ck


def build_dense_sa(idx: EbwtIndex,
                   full_rank: np.ndarray | None = None) -> np.ndarray:
    """sa[row] = joined-text offset of the suffix at BWT row, for every
    row — built by pointer-doubling over the LF permutation from the
    2^offRate-sampled offs[] (the batch equivalent of walk-left:
    reportChaseOne, ebwt.h:2727-2746, amortized over all rows at once).
    ~log2(max walk) rounds of two gathers each, all int32."""
    n1 = idx.length + 1
    bwt = idx.bwt
    rows = np.arange(n1, dtype=np.int32)
    # vectorized LF at each row's own char: fchr[c] + rank(c, row)
    lf = np.empty(n1, dtype=np.int32)
    if full_rank is not None:
        for c in range(4):
            mask = bwt == c
            lf[mask] = np.int32(idx.fchr[c]) + full_rank[:-1, c][mask]
    else:
        for c in range(4):
            mask = bwt == c
            cs = np.cumsum(mask, dtype=np.int32)   # count in [0, i]
            lf[mask] = np.int32(idx.fchr[c]) + cs[mask] - 1
    # '$' stored as 'A' at zoff: A-rows after it over-counted by one
    lf[(bwt == 0) & (rows > idx.zoff)] -= 1
    # pointer doubling toward marked rows (row % 2^offRate == 0 or zoff)
    marked = (rows & ((1 << idx.off_rate) - 1)) == 0
    marked[idx.zoff] = True
    ptr = np.where(marked, rows, lf)
    dist = (~marked).astype(np.int32)
    for _ in range(26):   # 2^26 exceeds any possible walk length
        dist += dist[ptr]
        ptr = ptr[ptr]
        if marked[ptr].all():
            break
    assert marked[ptr].all()
    base_off = np.where(ptr == idx.zoff, 0,
                        idx.offs[ptr >> idx.off_rate].astype(np.int32))
    # rows whose walk stops at a marked row that is ALSO zoff use
    # jumps only; offs[zoff>>offRate] is 0 there anyway when sampled
    return (base_off + dist).astype(np.int32)


def from_ebwt(idx: EbwtIndex, device=None,
              occ_every: int = OCC_BLOCK,
              dense_sa: bool = False) -> FMIndexArrays:
    """Convert a parsed host index into device arrays.

    occ_every=1 builds the full per-row rank table (fast path for
    genomes that fit: 16 B/row of HBM).  dense_sa=True additionally
    builds the per-row SA (4 B/row) so offset resolution is one gather."""
    hi, lo = idx.ftab_resolved()
    put = partial(jax.device_put, device=device)
    # row dtype: int32 covers genomes < 2^31; the reference's "small"
    # index spans up to 2^32-1 rows (TIndexOffU, btypes.h) — follow it
    # with uint32 for hg-scale genomes (all kernels dtype-follow fm)
    rdt = np.int32 if idx.bwt_len <= 0x7FFFFFFF else np.uint32
    occ = (build_full_rank(idx.bwt) if occ_every == 1
           else build_occ_checkpoints(idx.bwt, occ_every, dtype=rdt))
    return FMIndexArrays(
        bwt=put(pack_bwt_words(idx.bwt)),
        occ=put(occ),
        fchr=put(idx.fchr.astype(rdt)),
        ftab_hi=put(hi.astype(rdt)),
        ftab_lo=put(lo.astype(rdt)),
        offs=put(idx.offs.astype(rdt)),
        zoff=put(jnp.asarray(idx.zoff, rdt)),
        bwt_len=put(jnp.asarray(idx.bwt_len, rdt)),
        sa=put(build_dense_sa(idx)) if dense_sa else None,
        ftab_chars=idx.ftab_chars,
        off_rate=idx.off_rate,
        occ_every=occ_every,
    )
