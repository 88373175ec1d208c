"""Batched FM-index primitives in JAX (jnp; XLA fuses these well).

These are the TPU re-expression of bowtie's hot loop:
- rank1/rank4      <-> countUpTo / countUpToEx + countFw/BwSide
                       (ebwt.h:1897,1963,2034,2136) — checkpoint + in-
                       register 2-bit popcounts instead of a side scan
- lf / lf4         <-> mapLF / mapLFEx (ebwt.h:2334-2560)
- ftab_jump        <-> ftabHi/ftabLo 10-char dispatch (ebwt.h:971-1034)
- bwt_char         <-> rowL (ebwt.h:1696)

All functions operate on int32 row indices and are shaped for vmap over
a read batch.

A Pallas VMEM-resident variant of the rank step was investigated and
is NOT viable on the current jax/mosaic version: TPU Pallas lowers
only same-shape 2D take_along_axis, so the per-lane dynamic row gather
at the heart of rank() cannot be expressed in-kernel.  The XLA row-
gather formulation below (gather1d keeps the minor dim intact so XLA
vectorizes it, ~1.5B rows/s vs ~0.3M elem/s for a 1D element gather)
is the fastest available path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..index.arrays import FMIndexArrays, OCC_BLOCK, WORDS_PER_BLOCK

# XOR patterns turning "word has code c in lane j" into 0b00 in lane j
# (analog of c_table, ebwt.h:55-60)
_CHAR_PATTERNS = jnp.array(
    [0x00000000, 0x55555555, 0xAAAAAAAA, 0xFFFFFFFF], dtype=jnp.uint32)
_LANE_EVEN = jnp.uint32(0x55555555)


def gather1d(a: jnp.ndarray, i: jnp.ndarray) -> jnp.ndarray:
    """Gather a[i] formulated as a 2D row gather.

    On TPU, XLA lowers 1D element gathers to a scalar-core loop
    (~0.3M elem/s) but vectorizes row gathers from 2D arrays with the
    minor dim intact (~1.5B rows/s).  The reshape is a free bitcast.
    """
    return a.reshape(-1, 1)[i][..., 0]


def block_words(fm, block: jnp.ndarray) -> jnp.ndarray:
    """The wpb packed words of checkpoint block `block` from the
    tile-exact [rows, 128] BWT matrix (see pack_bwt_words): one full-
    rate 128-wide row gather + a VPU group select of the block's
    16-block group."""
    wpb = fm.occ_every // 16
    rows = fm.bwt[block >> 4]                       # [..., 128]
    grp = (block & 15).astype(jnp.int32)
    gm = (jax.lax.broadcasted_iota(
        jnp.int32, rows.shape, rows.ndim - 1) // wpb) == grp[..., None]
    return jnp.sum(jnp.where(gm, rows, 0)
                   .reshape(rows.shape[:-1] + (16, wpb)), axis=-2)


def bwt_word_at(fm, widx: jnp.ndarray) -> jnp.ndarray:
    """Flat word index -> packed word, via the [rows, 128] layout."""
    rows = fm.bwt[widx >> 7]
    col = (widx & 127).astype(jnp.int32)
    m = jax.lax.broadcasted_iota(jnp.int32, rows.shape,
                                 rows.ndim - 1) == col[..., None]
    return jnp.sum(jnp.where(m, rows, 0), axis=-1)


def select4(table4: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """table4[..., c] without a gather: 4-way one-hot select (VPU)."""
    c = c[..., None]
    idx = jnp.arange(4, dtype=c.dtype)
    return (table4 * (idx == c)).sum(axis=-1)


def fchr_at(fm, c: jnp.ndarray) -> jnp.ndarray:
    """fchr[c] via unrolled select (fchr is tiny; avoid 1D gather)."""
    r = jnp.zeros(jnp.shape(c), dtype=fm.fchr.dtype)
    for j in range(4):
        r = jnp.where(c == j, fm.fchr[j], r)
    return r


def _count_matches_in_word(word: jnp.ndarray, c: jnp.ndarray,
                           nlanes: jnp.ndarray) -> jnp.ndarray:
    """# of lanes j < nlanes of `word` equal to code c.  nlanes in [0,16]."""
    x = word ^ _CHAR_PATTERNS[c]
    # lane matches iff both bits zero after xor
    m = jnp.bitwise_not(x)
    hits = m & (m >> 1) & _LANE_EVEN
    # mask off lanes >= nlanes: keep low 2*nlanes bits.  Clip the shift
    # to stay < 32 (shift-by-32 is undefined), then zero the n<=0 case.
    shift = (32 - 2 * jnp.clip(nlanes, 1, 16)).astype(jnp.uint32)
    keep = jnp.where(nlanes <= 0, jnp.uint32(0),
                     jnp.uint32(0xFFFFFFFF) >> shift)
    return jax.lax.population_count(hits & keep).astype(jnp.int32)


def rank1(fm: FMIndexArrays, c: jnp.ndarray, i: jnp.ndarray) -> jnp.ndarray:
    """Occ(c, i): occurrences of code c in BWT rows [0, i).

    '$' correction per countFwSide (ebwt.h:2044-2052): the '$' row is
    stored as code 0; subtract it from A-counts when i > zoff.
    """
    rdt = fm.fchr.dtype
    i = jnp.asarray(i, rdt)
    c = jnp.asarray(c)
    corr = jnp.where((c == 0) & (i > fm.zoff), 1, 0).astype(rdt)
    if fm.occ_every == 1:
        return select4(fm.occ[i], c) - corr
    blk = fm.occ_every
    wpb = blk // 16
    block = i // blk
    base = select4(fm.occ[block], c)
    rem = (i - block * blk).astype(jnp.int32)   # rows past checkpoint
    # shape-polymorphic (scalar or [B]) block-word gather; rows of a
    # [nblocks, wpb] view so TPU vectorizes it
    words = block_words(fm, block)
    nlanes = jnp.clip(rem[..., None] -
                      16 * jnp.arange(wpb, dtype=jnp.int32), 0, 16)
    cnt = base + _count_matches_in_word(
        words, c[..., None], nlanes).sum(axis=-1).astype(rdt)
    return cnt - corr


def rank4(fm: FMIndexArrays, i: jnp.ndarray) -> jnp.ndarray:
    """Occ(c, i) for all four codes at once (countUpToEx analog)."""
    rdt = fm.fchr.dtype
    i = jnp.asarray(i, rdt)
    corr = (jnp.where(i > fm.zoff, 1, 0)[..., None].astype(rdt) *
            jnp.array([1, 0, 0, 0], rdt))
    if fm.occ_every == 1:
        return fm.occ[i] - corr.reshape(fm.occ[i].shape)
    blk = fm.occ_every
    wpb = blk // 16
    block = i // blk
    base = fm.occ[block]                                   # [..., 4]
    rem = (i - block * blk).astype(jnp.int32)
    words = block_words(fm, block)
    nlanes = jnp.clip(rem[..., None] -
                      16 * jnp.arange(wpb, dtype=jnp.int32), 0, 16)
    cnts = jnp.stack(
        [_count_matches_in_word(words, jnp.int32(cc), nlanes).sum(axis=-1)
         for cc in range(4)], axis=-1).astype(rdt)
    return base + cnts - corr.reshape(base.shape)


def lf(fm: FMIndexArrays, i: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """LF step for search arrows: fchr[c] + Occ(c, i)."""
    return fchr_at(fm, jnp.asarray(c)) + rank1(fm, c, i)


def lf4(fm: FMIndexArrays, i: jnp.ndarray) -> jnp.ndarray:
    """All-4-chars LF (mapLFEx): [4] next rows."""
    return fm.fchr[:4] + rank4(fm, i)


def bwt_char(fm: FMIndexArrays, i: jnp.ndarray) -> jnp.ndarray:
    """The BWT char at row i (rowL).  Returns stored code; caller must
    treat row zoff specially ('$')."""
    i = jnp.asarray(i, fm.fchr.dtype)
    word = bwt_word_at(fm, i // 16)
    return ((word >> (2 * (i % 16).astype(jnp.uint32))) & 3).astype(jnp.int32)


def lf_row(fm: FMIndexArrays, i: jnp.ndarray) -> jnp.ndarray:
    """LF of row i via its own char (mapLF(l)); undefined at zoff."""
    if fm.occ_every == 1:
        return lf(fm, i, bwt_char(fm, i))
    return lf_row_compact(fm, i)


def lf_row_compact(fm: FMIndexArrays, i: jnp.ndarray) -> jnp.ndarray:
    """mapLF(l) for the checkpointed layout in TWO row gathers (occ row
    + BWT word row): the row's own char is extracted from the same word
    block the rank scan needs, instead of a third bwt_char gather —
    the walk-left hot path (reportChaseOne, ebwt.h:2727-2746)."""
    rdt = fm.fchr.dtype
    i = jnp.asarray(i, rdt)
    blk = fm.occ_every
    wpb = blk // 16
    block = i // blk
    rem = (i - block * blk).astype(jnp.int32)
    words = block_words(fm, block)                  # [..., wpb]
    wsel = jnp.arange(wpb, dtype=jnp.int32) == (rem // 16)[..., None]
    w = (words * wsel).sum(axis=-1).astype(jnp.uint32)
    c = ((w >> (2 * (rem % 16).astype(jnp.uint32))) & 3).astype(jnp.int32)
    base = select4(fm.occ[block], c)
    nlanes = jnp.clip(rem[..., None] -
                      16 * jnp.arange(wpb, dtype=jnp.int32), 0, 16)
    cnt = base + _count_matches_in_word(
        words, c[..., None], nlanes).sum(axis=-1).astype(rdt)
    corr = jnp.where((c == 0) & (i > fm.zoff), 1, 0).astype(rdt)
    return fchr_at(fm, c) + cnt - corr


def ftab_jump(fm: FMIndexArrays, codes: jnp.ndarray) -> tuple[jnp.ndarray,
                                                              jnp.ndarray]:
    """(top, bot) from the ftabChars codes (leftmost most significant).

    codes: int array [ftab_chars]; caller guarantees all < 4.
    top = ftabHi(off), bot = ftabLo(off+1)  (ebwt_search_backtrack.h:256).
    """
    weights = 4 ** jnp.arange(fm.ftab_chars - 1, -1, -1, dtype=jnp.int32)
    off = jnp.sum(codes.astype(jnp.int32) * weights)
    return fm.ftab_hi[off], fm.ftab_lo[off + 1]
