"""Batched exact-match search (-v 0) — the minimum end-to-end TPU slice.

Replaces the per-thread recursive path of search_exact.c +
GreedyDFSRangeSource::backtrack (ebwt_search_backtrack.h:237-297) with a
lockstep batch: every read advances one LF step per iteration of a
vmapped while_loop; reads whose range closes or whose pattern is
exhausted go inactive.

Reads are RIGHT-ALIGNED into a [B, L] int array (pad code 4 on the
left): backward search consumes columns L-1 .. L-qlen, so the ftab jump
(last ftabChars characters) reads fixed columns [L-fc, L) for the whole
batch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..index.arrays import FMIndexArrays
from ..ops import fm as fmops


def right_align(reads: list[np.ndarray], pad_to: int | None = None
                ) -> tuple[np.ndarray, np.ndarray]:
    """Pack variable-length code arrays into [B, L] right-aligned (pad=4
    on the left).  Returns (mat, lens)."""
    lens = np.array([len(r) for r in reads], dtype=np.int32)
    L = int(pad_to or (lens.max() if len(lens) else 0))
    mat = np.full((len(reads), L), 4, dtype=np.uint8)
    for i, r in enumerate(reads):
        if len(r):
            mat[i, L - len(r):] = r[:L]
    return mat, lens


def _search_one(fm: FMIndexArrays, q: jnp.ndarray, qlen: jnp.ndarray):
    """Backward-search one right-aligned query row.  Returns (top, bot);
    bot<=top means no exact hit."""
    L = q.shape[0]
    fc = fm.ftab_chars
    q = q.astype(jnp.int32)

    ftab_codes = q[L - fc:]
    ftab_ok = (qlen >= fc) & jnp.all(ftab_codes < 4)
    ft_top, ft_bot = fmops.ftab_jump(fm, jnp.where(ftab_codes < 4,
                                                   ftab_codes, 0))
    top0 = jnp.where(ftab_ok, ft_top, 0)
    bot0 = jnp.where(ftab_ok, ft_bot, fm.bwt_len)
    pos0 = jnp.where(ftab_ok, L - fc, L)
    stop = L - qlen  # consume down to this column (exclusive)

    def cond(state):
        top, bot, pos = state
        return (pos > stop) & (bot > top)

    def body(state):
        top, bot, pos = state
        c = q[pos - 1]
        is_n = c > 3
        cc = jnp.where(is_n, 0, c)
        ntop = fmops.lf(fm, top, cc)
        nbot = fmops.lf(fm, bot, cc)
        # N closes the range
        ntop, nbot = jnp.where(is_n, 0, ntop), jnp.where(is_n, 0, nbot)
        return ntop, nbot, pos - 1

    top, bot, _ = jax.lax.while_loop(
        cond, body, (top0.astype(jnp.int32), bot0.astype(jnp.int32), pos0))
    ok = bot > top
    return jnp.where(ok, top, 0), jnp.where(ok, bot, 0)


@jax.jit
def exact_ranges(fm: FMIndexArrays, reads: jnp.ndarray, lens: jnp.ndarray):
    """[B, L] right-aligned codes + [B] lens -> (top[B], bot[B])."""
    return jax.vmap(lambda q, n: _search_one(fm, q, n))(reads, lens)


def _resolve_one(fm: FMIndexArrays, row: jnp.ndarray, max_steps: int):
    """Walk left until a marked row or zoff (reportChaseOne,
    ebwt.h:2727-2746).  Returns (joined_off, ok)."""
    mask = jnp.int32((1 << fm.off_rate) - 1)

    def cond(state):
        i, jumps = state
        return ((i & mask) != 0) & (i != fm.zoff) & (jumps < max_steps)

    def body(state):
        i, jumps = state
        return fmops.lf_row(fm, i), jumps + 1

    i, jumps = jax.lax.while_loop(cond, body, (row.astype(jnp.int32),
                                               jnp.int32(0)))
    at_z = i == fm.zoff
    off = jnp.where(at_z, jumps, fm.offs[i >> fm.off_rate] + jumps)
    ok = at_z | ((i & mask) == 0)
    return off, ok


@jax.jit
def resolve_rows(fm: FMIndexArrays, rows: jnp.ndarray):
    """[B] BWT rows -> ([B] joined offsets, [B] ok flags).

    max_steps bounds the walk; rows are marked every 2^offRate in row
    space so walks are ~2^offRate expected steps, but the worst case is
    longer — 4096 covers anything realistic (ok=False signals overflow,
    resolved on host by the golden model).
    """
    return jax.vmap(lambda r: _resolve_one(fm, r, 4096))(rows)


@jax.jit
def bwt_rows_offsets(fm: FMIndexArrays, rows: jnp.ndarray,
                     valid: jnp.ndarray):
    """Resolve only rows where valid; invalid rows return 0."""
    rows = jnp.where(valid, rows, 0)
    off, ok = resolve_rows(fm, rows)
    return jnp.where(valid, off, 0), ok & valid
