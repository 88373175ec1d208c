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
    occ: jax.Array        # int32  [nblocks+1, 4]
    fchr: jax.Array       # int32  [5]
    ftab_hi: jax.Array    # int32  [ftabLen]
    ftab_lo: jax.Array    # int32  [ftabLen]
    offs: jax.Array       # int32  [offsLen]
    zoff: jax.Array       # int32  scalar
    bwt_len: jax.Array    # int32  scalar (len+1)

    # static (not traced)
    ftab_chars: int = 10
    off_rate: int = 5

    def tree_flatten(self):
        children = (self.bwt, self.occ, self.fchr, self.ftab_hi,
                    self.ftab_lo, self.offs, self.zoff, self.bwt_len)
        return children, (self.ftab_chars, self.off_rate)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, ftab_chars=aux[0], off_rate=aux[1])


def pack_bwt_words(bwt_codes: np.ndarray) -> np.ndarray:
    """uint8 codes -> uint32 words, 16 codes/word, low bit-pair first."""
    n = len(bwt_codes)
    nwords = (n + 15) // 16
    padded = np.zeros(nwords * 16, dtype=np.uint32)
    padded[:n] = bwt_codes
    lanes = padded.reshape(nwords, 16)
    shifts = (2 * np.arange(16, dtype=np.uint32))[None, :]
    return (lanes << shifts).sum(axis=1, dtype=np.uint32)


def build_occ_checkpoints(bwt_codes: np.ndarray, block: int = OCC_BLOCK
                          ) -> np.ndarray:
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
    return ck.astype(np.int32)


def from_ebwt(idx: EbwtIndex, device=None) -> FMIndexArrays:
    """Convert a parsed host index into device arrays."""
    hi, lo = idx.ftab_resolved()
    put = partial(jax.device_put, device=device)
    return FMIndexArrays(
        bwt=put(pack_bwt_words(idx.bwt)),
        occ=put(build_occ_checkpoints(idx.bwt)),
        fchr=put(idx.fchr.astype(np.int32)),
        ftab_hi=put(hi.astype(np.int32)),
        ftab_lo=put(lo.astype(np.int32)),
        offs=put(idx.offs.astype(np.int32)),
        zoff=put(jnp.int32(idx.zoff)),
        bwt_len=put(jnp.int32(idx.bwt_len)),
        ftab_chars=idx.ftab_chars,
        off_rate=idx.off_rate,
    )
