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


@jax.jit
def exact_ranges(fm: FMIndexArrays, reads: jnp.ndarray, lens: jnp.ndarray):
    """[B, L] right-aligned codes + [B] lens -> (top[B], bot[B]).

    lax.scan over the (static) L columns, whole batch in lockstep with
    per-lane masking — a scan compiles to one on-device loop with no
    host-synced condition, unlike vmapped while_loop.
    """
    B, L = reads.shape
    fc = fm.ftab_chars
    q = reads.astype(jnp.int32)
    lens = lens.astype(jnp.int32)

    rdt = fm.fchr.dtype
    if L >= fc:
        ftab_codes = q[:, L - fc:]                              # [B, fc]
        ftab_ok = (lens >= fc) & jnp.all(ftab_codes < 4, axis=1)
        weights = 4 ** jnp.arange(fc - 1, -1, -1, dtype=jnp.int32)
        foff = jnp.sum(jnp.where(ftab_codes < 4, ftab_codes, 0)
                       * weights, axis=1)
        ft_top = fmops.gather1d(fm.ftab_hi, foff)
        ft_bot = fmops.gather1d(fm.ftab_lo, foff + 1)
        top0 = jnp.where(ftab_ok, ft_top, 0).astype(rdt)
        bot0 = jnp.where(ftab_ok, ft_bot, fm.bwt_len).astype(rdt)
        start = jnp.where(ftab_ok, L - fc, L)   # first unconsumed col+1
    else:
        # every read is shorter than ftabChars: the ftab jump never
        # applies (reads this short resolve via eftab absorption at
        # build time; query-side we just LF from the full range —
        # ftabHi/Lo guard at ebwt.h:971-1028)
        ftab_ok = jnp.zeros(B, bool)
        top0 = jnp.zeros(B, rdt)
        bot0 = jnp.broadcast_to(jnp.asarray(fm.bwt_len, rdt), (B,))
        start = jnp.full(B, L, jnp.int32)
    stop = L - lens                              # consume down to here

    cols = jnp.flip(q.T, axis=0)                 # [L, B]: step t = col L-1-t

    def step(carry, xs):
        top, bot = carry
        c, t = xs                                # c: [B], t scalar step idx
        col = L - 1 - t
        active = (col < start) & (col >= stop) & (bot > top)
        is_n = c > 3
        cc = jnp.where(is_n, 0, c)
        ntop = fmops.lf(fm, top, cc)
        nbot = fmops.lf(fm, bot, cc)
        ntop = jnp.where(is_n, 0, ntop)
        nbot = jnp.where(is_n, 0, nbot)
        top = jnp.where(active, ntop, top)
        bot = jnp.where(active, nbot, bot)
        return (top, bot), None

    (top, bot), _ = jax.lax.scan(
        step, (top0, bot0), (cols, jnp.arange(L, dtype=jnp.int32)))
    ok = bot > top
    return jnp.where(ok, top, 0), jnp.where(ok, bot, 0)


MAX_WALK = 1024   # scan fallback walk bound (ok=False past this)


@jax.jit
def resolve_rows(fm: FMIndexArrays, rows: jnp.ndarray):
    """[B] BWT rows -> ([B] joined offsets, [B] ok flags).

    With a dense SA (fm.sa) this is a single gather.  Otherwise a
    lockstep scan walks left until a marked row or zoff
    (reportChaseOne, ebwt.h:2727-2746); walks are ~2^offRate expected
    steps (ok=False signals the rare >MAX_WALK overflow, resolved on
    host by the golden model).
    """
    rdt = fm.fchr.dtype
    rows = rows.astype(rdt)
    if fm.sa is not None:
        return fmops.gather1d(fm.sa, rows), jnp.ones(rows.shape, bool)
    mask = jnp.asarray((1 << fm.off_rate) - 1, rdt)

    def cond(carry):
        i, jumps, done, it = carry
        return (it < MAX_WALK) & ~jnp.all(done)

    def step(carry):
        i, jumps, done, it = carry
        at_mark = ((i & mask) == 0) | (i == fm.zoff)
        done2 = done | at_mark
        ni = fmops.lf_row(fm, jnp.where(done2, 0, i))
        i = jnp.where(done2, i, ni)
        jumps = jnp.where(done2, jumps, jumps + 1)
        return (i, jumps, done2, it + 1)

    # while_loop, not a fixed-length scan: walks are geometric with
    # mean 2^offRate, so the batch max (~2^offRate * ln B) terminates
    # the loop far before the MAX_WALK safety bound
    (i, jumps, done, _) = jax.lax.while_loop(
        cond, step, (rows, jnp.zeros(rows.shape, rdt),
                     jnp.zeros(rows.shape, bool), jnp.int32(0)))
    at_z = i == fm.zoff
    finished = at_z | ((i & mask) == 0)
    off = jnp.where(at_z, jumps,
                    fmops.gather1d(fm.offs, i >> fm.off_rate) + jumps)
    return off, finished


@jax.jit
def bwt_rows_offsets(fm: FMIndexArrays, rows: jnp.ndarray,
                     valid: jnp.ndarray):
    """Resolve only rows where valid; invalid rows return 0."""
    rows = jnp.where(valid, rows, 0)
    off, ok = resolve_rows(fm, rows)
    return jnp.where(valid, off, 0), ok & valid
