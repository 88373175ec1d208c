"""End-to-end batched alignment driver (-v 0 exact mode).

The TPU replacement for exactSearch + exactSearchWorker
(ebwt_search.cpp:1333-1484): instead of per-thread readers pulling one
read at a time, we stream device-sized read batches, run the batched
search kernel over fw+rc strands at once, resolve the needed BWT rows
in a second batched kernel, and apply reporting policy + output on host
in deterministic read order (the single-stream analog of --reorder).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..index.arrays import FMIndexArrays
from ..index.ebwt_io import EbwtIndex
from .exact import exact_ranges, resolve_rows, right_align
from .policy import AlignStats, KPolicy, ReadResult  # noqa: F401 (re-export)
from .types import Hit
from ..utils.rng import next_u32
from ..utils.alphabet import DNA_CHARS


class JoinedResolver:
    """joinedToTextOff, vectorized on host (ebwt.h:2569-2629)."""

    def __init__(self, idx: EbwtIndex):
        self.starts = idx.rstarts[:, 0].astype(np.int64)
        self.tidxs = idx.rstarts[:, 1].astype(np.int64)
        self.toffs = idx.rstarts[:, 2].astype(np.int64)
        self.plen = idx.plen.astype(np.int64)
        self.length = idx.length

    def __call__(self, offs: np.ndarray, qlens: np.ndarray):
        """-> (tidx, textoff, valid). Hits spanning fragment ends are
        invalid (tidx == -1)."""
        elt = np.searchsorted(self.starts, offs, side="right") - 1
        upper = np.where(elt + 1 < len(self.starts),
                         self.starts[np.minimum(elt + 1,
                                                len(self.starts) - 1)],
                         self.length)
        valid = offs + qlens <= upper
        tidx = np.where(valid, self.tidxs[elt], -1)
        textoff = self.toffs[elt] + (offs - self.starts[elt])
        return tidx, textoff, valid


import jax


@jax.jit
def _one_row_kernel(fm: FMIndexArrays, mat, lens, seeds2):
    """Fused exact search + random-row pick + row resolve: ONE device
    round trip for the k-hits-without-enumeration path (the row pick is
    reportFullAlignment's first RNG draw,
    ebwt_search_backtrack.h:1536-1540)."""
    top, bot = exact_ranges(fm, mat, lens)
    a = jnp.uint32(1664525)
    c = jnp.uint32(1013904223)
    s1 = a * seeds2 + c
    ret = s1 >> jnp.uint32(16)
    s2 = a * s1 + c
    r1 = ret ^ s2                       # RandomSource::nextU32
    spread = bot - top
    row = top + (r1 % jnp.maximum(spread, 1).astype(jnp.uint32)) \
        .astype(top.dtype)
    off, ok = resolve_rows(fm, jnp.where(spread > 0, row, 0))
    # uint32 stack: rows/offsets are < 2^32 by construction (TIndexOffU
    # small-index semantics); the host widens to int64
    return (jnp.stack([spread.astype(jnp.uint32),
                       off.astype(jnp.uint32),
                       ok.astype(jnp.uint32)]))


class ExactAligner:
    """-v 0 aligner over a replicated device index."""

    def __init__(self, fm: FMIndexArrays, idx: EbwtIndex,
                 policy: KPolicy, nofw: bool = False, norc: bool = False,
                 global_seed: int = 0):
        self.fm = fm
        self.policy = policy
        self.nofw, self.norc = nofw, norc
        self.global_seed = global_seed
        self.joined = JoinedResolver(idx)

    def align_batch(self, reads: list) -> list[ReadResult]:
        if not self.policy.want_all_rows():
            return self._align_batch_one_row(reads)
        return self._align_batch_enum(reads)

    def _align_batch_one_row(self, reads: list) -> list[ReadResult]:
        """Vectorized path when only one random row per range is
        chased (-k without -a/-m enumeration): one fused kernel call,
        vectorized joinedToTextOff, and a slim per-read policy loop."""
        from ..utils.rng import fill_seed_caches
        B = len(reads)
        fw = [r.codes_fw for r in reads]
        rc = [r.codes_rc for r in reads]
        mat, lens = right_align(fw + rc)
        seeds = fill_seed_caches(reads, self.global_seed)
        seeds2 = np.concatenate([seeds, seeds])
        packed = np.asarray(_one_row_kernel(
            self.fm, jnp.asarray(mat), jnp.asarray(lens),
            jnp.asarray(seeds2))).astype(np.int64)
        spread, offs, ok = packed[0], packed[1], packed[2]
        tidx, textoff, valid = self.joined(offs, lens.astype(np.int64))
        valid = valid & (ok > 0) & (spread > 0)
        spread_l = spread.tolist()
        tidx_l = tidx.tolist()
        toff_l = textoff.tolist()
        valid_l = valid.tolist()
        seeds_l = seeds.tolist()
        results = []
        strands = [s for s in (0, 1)
                   if not (s == 0 and self.nofw)
                   and not (s == 1 and self.norc)]
        finish = self.policy.finish
        stop_after = self.policy.stop_after
        for i, read in enumerate(reads):
            buffered: list[Hit] = []
            count = 0
            for strand in strands:
                j = i + strand * B
                if spread_l[j] <= 0 or not valid_l[j]:
                    continue
                count += 1
                stop, maxed = stop_after(count)
                if maxed:
                    break
                buffered.append(Hit(
                    read=read, fw=(strand == 0), tidx=tidx_l[j],
                    toff=toff_l[j], oms=spread_l[j] - 1, stratum=0,
                    cost=0))
                if stop:
                    break
            results.append(finish(buffered, count, seeds_l[i]))
        return results

    def _align_batch_enum(self, reads: list) -> list[ReadResult]:
        B = len(reads)
        fw = [r.codes_fw for r in reads]
        rc = [r.codes_rc for r in reads]
        mat, lens = right_align(fw + rc)
        top, bot = exact_ranges(self.fm, jnp.asarray(mat), jnp.asarray(lens))
        top = np.asarray(top)
        bot = np.asarray(bot)
        spread = bot - top

        seeds = np.array([r.seed(self.global_seed) for r in reads],
                         dtype=np.uint32)

        # Decide which rows need resolving.
        # Chase order per strand: start at top + rand % spread, wrap
        # (reportFullAlignment, ebwt_search_backtrack.h:1536-1540).
        _, rand1 = next_u32(seeds)   # first draw per strand attempt
        rows: list[int] = []
        row_meta: list[tuple[int, int, int]] = []  # (read_i, strand, pos)
        enumerate_all = self.policy.want_all_rows()
        for i in range(B):
            for strand in (0, 1):    # 0 = fw, 1 = rc
                if strand == 0 and self.nofw:
                    continue
                if strand == 1 and self.norc:
                    continue
                j = i + strand * B
                sp = int(spread[j])
                if sp <= 0:
                    continue
                r0 = int(top[j]) + int(rand1[i]) % sp
                if enumerate_all:
                    order = list(range(r0, int(bot[j]))) + \
                            list(range(int(top[j]), r0))
                else:
                    order = [r0]
                for k, row in enumerate(order):
                    rows.append(row)
                    row_meta.append((i, strand, k))

        if rows:
            offs_d, ok_d = resolve_rows(self.fm, jnp.asarray(
                np.array(rows, dtype=np.int32)))
            offs = np.asarray(offs_d).astype(np.int64)
            qlens = np.array([len(reads[m[0]]) for m in row_meta],
                             dtype=np.int64)
            tidx, textoff, valid = self.joined(offs, qlens)
        else:
            tidx = textoff = valid = np.zeros(0)

        # Group per (read, strand) preserving chase order
        per_read: dict[int, dict[int, list]] = {i: {0: [], 1: []}
                                                for i in range(B)}
        for m_i, m in enumerate(row_meta):
            i, strand, k = m
            per_read[i][strand].append(
                (k, int(tidx[m_i]), int(textoff[m_i]), bool(valid[m_i])))

        # Apply policy per read: fw strand first, stop rules per
        # NGoodHitSinkPerThread; fw stop skips rc (search_exact.c:17).
        results = []
        for i, read in enumerate(reads):
            buffered: list[Hit] = []
            count = 0
            stopped = False
            for strand in (0, 1):
                if stopped:
                    break
                j = i + strand * B
                sp = int(spread[j])
                entries = sorted(per_read[i][strand])
                for _, t, off, v in entries:
                    if not v:
                        continue
                    count += 1
                    stop, maxed = self.policy.stop_after(count)
                    if maxed:
                        stopped = True
                        break
                    buffered.append(Hit(
                        read=read, fw=(strand == 0), tidx=t, toff=off,
                        oms=sp - 1, stratum=0, cost=0))
                    if stop:
                        stopped = True
                        break
            results.append(self.policy.finish(buffered, count,
                                              int(seeds[i])))
        return results
