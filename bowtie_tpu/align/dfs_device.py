"""Batched lockstep GreedyDFS backtracking on device.

This is the TPU-native engine for bowtie's quality-aware, randomized,
depth-first mismatch search (GreedyDFSRangeSource,
ebwt_search_backtrack.h:23-1787).  Where the reference runs one
recursive DFS per thread, this module runs THOUSANDS of reads in
lockstep: one `lax.while_loop` whose carry is the whole batch's DFS
state, each iteration advancing every active lane by one micro-step
(one LF quartet, one branch pick, or one row chase).

Faithfulness: every state transition mirrors the host oracle
(`backtrack_oracle.GreedyDFS`, itself validated bit-identical to the
reference binary), including the LCG consumption order, eligibility
caching, revisitability tightening, half-and-half constraints and
report-time random row starts.  Lanes that exceed any fixed resource
bound (stack depth, hit slots, partial slots, step budget) raise an
`overflow` flag and are re-run on the host oracle from scratch — the
per-read RNG makes that re-run bit-identical.

Layout: the fw and mirror indexes are concatenated into one set of
device arrays ("FMCat"); a lane switches index by adding per-lane base
offsets, so one gather serves both.  Each lane executes a sequence of
"jobs" (one per search phase/strand, mirroring search_*.c + the
full-index workers in ebwt_search.cpp), with per-job query/qual/penalty
rows precomputed on host by depth coordinate (qd[d] = qry[qlen-1-d]).

Modes of the per-lane state machine:
  DONE  lane finished (read fully resolved or flagged for host fallback)
  JOB   load next job; top-level backtrack() entry incl. ftab jump
        (ebwt_search_backtrack.h:237-297)
  ADV   consume one position: quartet LF, elims/eligibility updates,
        cur==0 / half-and-half checks (:363-741)
  BR    branch-loop head: condition check, mismatch pick (RNG), frame
        push (:743-982)
  POP   post-child bookkeeping: eliminate tried edge, eligibility
        rescan (:984-1058)
  REP   one row chase of a report: dense-SA resolve + joinedToTextOff +
        sink policy (reportFullAlignment :1521; reportChaseOne
        ebwt.h:2693; NGoodHitSinkPerThread hit.h:937-992)
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..index.arrays import FMIndexArrays, from_ebwt
from ..index.ebwt_io import EbwtIndex

# state-machine modes
M_DONE, M_JOB, M_ADV, M_BR, M_POP, M_REP, M_RETF = 0, 1, 2, 3, 4, 5, 6

INF32 = 0x7FFFFFFF          # device stand-in for the oracle's 0xFFFFFFFF

# resource bounds (per lane); overflow -> host-oracle fallback
S_MAX = 6                   # stack frames (mismatch depth; deeper
                            # searches fall back to the host oracle —
                            # qual budgets almost never allow >5)
H_MAX = 8                   # buffered hit slots
MM_SLOTS = 8                # mismatch slots per stored hit
P_MAX = 32                  # partial-alignment slots (-n phases 2/3)

_A = jnp.uint32(1664525)
_C = jnp.uint32(1013904223)


def _rng_next(state):
    """RandomSource::nextU32 (random_source.h:36-42), vectorized."""
    s1 = _A * state + _C
    ret = s1 >> jnp.uint32(16)
    s2 = _A * s1 + _C
    return s2, ret ^ s2


def _g1(a, i):
    """1-D gather as a width-1 row gather (TPU-vectorizable)."""
    return a.reshape(-1, 1)[i][..., 0]


def _sel_col(arr, idx):
    """arr[b, idx[b]] without a minor-dim gather: one-hot sum (VPU)."""
    L = arr.shape[-1]
    m = jax.lax.broadcasted_iota(jnp.int32, arr.shape, arr.ndim - 1) \
        == idx[..., None]
    return jnp.sum(jnp.where(m, arr, 0), axis=-1)


# Rows are carried as int32 BIT PATTERNS of uint32 values: genomes up
# to the reference's small-index limit (2^32-1 bp, btypes.h TIndexOffU)
# keep every add/sub/mask exact under modular arithmetic, and the few
# ORDERED row comparisons go through the sign-bias flip below (exact
# unsigned order; a no-op change for values < 2^31, i.e. every genome
# the engines handled before round 5).
_UBIAS = jnp.int32(-2147483648)


def _ult(a, b):
    """Unsigned a < b on int32 bit patterns."""
    return (a ^ _UBIAS) < (b ^ _UBIAS)


def _ule(a, b):
    """Unsigned a <= b on int32 bit patterns."""
    return (a ^ _UBIAS) <= (b ^ _UBIAS)


def _shr(x, k):
    """Logical right shift (rows are unsigned bit patterns)."""
    return jax.lax.shift_right_logical(x, k)


# ---------------------------------------------------------------------------
# Concatenated fw+mirror device index
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclass
class FMCat:
    """fw and mirror FM indexes concatenated row-wise; per-lane base
    offsets select the index (the device analog of SWITCH_TO_FW/BW_INDEX,
    ebwt_search.cpp:1867-1891).

    Two layouts (static `occ_every` / `dense`):
    - dense (small genomes): full per-row rank table + dense SA —
      one gather per LF step, one per offset resolution (36 B/row).
    - compact (hg-scale): rank checkpoints every `occ_every` rows +
      2-bit BWT words (rank = checkpoint row + register popcounts,
      the countUpTo analog, ebwt.h:1897) and the 2^offRate-sampled SA
      with a walk-left resolve (reportChaseOne, ebwt.h:2727-2746) —
      ~0.4 B/row, so a human-genome pair of indexes fits one chip."""
    occ: jax.Array          # [(n1+1)*2, 4] full, or per-block rows
    fchr: jax.Array         # [5] (identical for fw and mirror)
    ftab_hi: jax.Array      # [ftabLen*2]
    ftab_lo: jax.Array      # [ftabLen*2]
    sa: jax.Array           # dense SA [n1*2] or sampled offs
    bwt: jax.Array          # uint32 packed words (compact mode; [2] stub
                            # in dense mode)
    zoff: jax.Array         # [2] per-index '$' row
    rstarts_start: jax.Array   # [nfrag] fragment joined-offsets
    rstarts_tidx: jax.Array    # [nfrag]
    rstarts_toff: jax.Array    # [nfrag]
    length: jax.Array       # int32 joined text length
    bwt_len: jax.Array      # int32 n1 = length+1
    occ_base: jax.Array     # [2] row base into occ per index
    sa_base: jax.Array      # [2]
    ftab_base: jax.Array    # [2]
    blk_base: jax.Array     # [2] block base into bwt words per index
    ftab_chars: int = 10
    occ_every: int = 1      # rows per rank checkpoint (1 = full table)
    off_rate: int = 5
    dense: bool = True      # dense SA vs sampled + walk-left

    def tree_flatten(self):
        c = (self.occ, self.fchr, self.ftab_hi, self.ftab_lo, self.sa,
             self.bwt, self.zoff, self.rstarts_start, self.rstarts_tidx,
             self.rstarts_toff, self.length, self.bwt_len, self.occ_base,
             self.sa_base, self.ftab_base, self.blk_base)
        return c, (self.ftab_chars, self.occ_every, self.off_rate,
                   self.dense)

    @classmethod
    def tree_unflatten(cls, aux, c):
        return cls(*c, ftab_chars=aux[0], occ_every=aux[1],
                   off_rate=aux[2], dense=aux[3])


def build_fmcat(idx_fw: EbwtIndex, idx_bw: EbwtIndex,
                fm_fw: FMIndexArrays | None = None,
                fm_bw: FMIndexArrays | None = None,
                occ_every: int = 1, dense_sa: bool = True) -> FMCat:
    """Build the concatenated device index.  occ_every=1 + dense_sa is
    the small-genome fast path; occ_every=128 + dense_sa=False is the
    hg-scale compact layout (see FMCat)."""
    big = idx_fw.length >= (1 << 31)
    if big and (dense_sa or occ_every == 1):
        raise ValueError(
            f"joined text length {idx_fw.length:,} needs the compact "
            f"layout (occ_every > 1, sampled SA): rows beyond 2^31 "
            f"ride int32 bit patterns with unsigned compare semantics "
            f"(see _ult), which the dense per-row tables don't use")
    if idx_fw.length >= (1 << 32) - 2:
        raise ValueError(
            f"device engines carry rows as uint32 bit patterns "
            f"(the reference small-index TIndexOffU range, btypes.h); "
            f"length {idx_fw.length:,} needs the large-index path — "
            f"use the host engines (BOWTIE_TPU_HOST_ENGINE=1)")
    if fm_fw is None:
        fm_fw = from_ebwt(idx_fw, occ_every=occ_every, dense_sa=dense_sa)
    if fm_bw is None:
        fm_bw = from_ebwt(idx_bw, occ_every=occ_every, dense_sa=dense_sa)
    n1 = idx_fw.bwt_len
    ftlen = len(np.asarray(fm_fw.ftab_hi))
    occ = jnp.concatenate([fm_fw.occ, fm_bw.occ], axis=0)
    if dense_sa:
        sa = jnp.concatenate([fm_fw.sa, fm_bw.sa])
    else:
        sa = jnp.concatenate([fm_fw.offs, fm_bw.offs])
    if occ_every > 1:
        # tile-exact [rows, 128] layout: a [nblk, wpb=8] row-gather
        # operand would be padded 16x by the TPU's (8,128) tiling —
        # 14.6 GB of HLO temp at 2 Gbp (observed OOM); rows of exactly
        # 128 u32 pad nothing.  Each index's words are padded to a
        # whole row so per-index block bases stay 16-block aligned.
        def _pad128(w):
            w = np.asarray(w).reshape(-1)
            return np.concatenate(
                [w, np.zeros((-len(w)) % 128, np.uint32)])
        w_fw, w_bw = _pad128(fm_fw.bwt), _pad128(fm_bw.bwt)
        bwt = jnp.asarray(np.concatenate([w_fw, w_bw])
                          .reshape(-1, 128))
        nblk = len(w_fw) // (occ_every // 16)
    else:
        bwt = jnp.zeros((1, 128), jnp.uint32)
        nblk = 0
    def _i32(x):
        """Row-valued arrays ride as int32 BIT PATTERNS (see _ult):
        uint32 inputs (genomes >= 2^31 bp) are bit-cast, not
        value-converted."""
        x = np.asarray(x)
        if x.dtype == np.uint32:
            return jnp.asarray(x.view(np.int32))
        return jnp.asarray(x.astype(np.int32, copy=False))

    def _i32s(v):
        return jnp.asarray(np.array(int(v), np.uint32).view(np.int32))

    return FMCat(
        occ=_i32(occ),
        fchr=_i32(fm_fw.fchr),
        ftab_hi=_i32(jnp.concatenate([fm_fw.ftab_hi, fm_bw.ftab_hi])),
        ftab_lo=_i32(jnp.concatenate([fm_fw.ftab_lo, fm_bw.ftab_lo])),
        sa=_i32(sa),
        bwt=bwt,
        zoff=_i32(jnp.stack([jnp.asarray(fm_fw.zoff),
                             jnp.asarray(fm_bw.zoff)])),
        rstarts_start=_i32(np.asarray(idx_fw.rstarts[:, 0],
                                      np.uint32)),
        rstarts_tidx=_i32(np.asarray(idx_fw.rstarts[:, 1], np.uint32)),
        rstarts_toff=_i32(np.asarray(idx_fw.rstarts[:, 2], np.uint32)),
        length=_i32s(idx_fw.length),
        bwt_len=_i32s(n1),
        occ_base=jnp.array([0, fm_fw.occ.shape[0]], jnp.int32),
        sa_base=jnp.array([0, sa.shape[0] // 2], jnp.int32),
        ftab_base=jnp.array([0, ftlen], jnp.int32),
        blk_base=jnp.array([0, nblk], jnp.int32),
        ftab_chars=idx_fw.ftab_chars,
        occ_every=occ_every,
        off_rate=idx_fw.off_rate,
        dense=dense_sa,
    )


_CHAR_PATTERNS = jnp.array(
    [0x00000000, 0x55555555, 0xAAAAAAAA, 0xFFFFFFFF], dtype=jnp.uint32)
_LANE_EVEN = jnp.uint32(0x55555555)


def _rank4(cat: FMCat, occ_base, zoff, i, blk_base=0):
    """Occ(c, i) for all 4 codes at per-lane index-offset rows, with the
    '$'-as-A correction (countFwSide, ebwt.h:2044-2052).

    Dense mode: one checkpoint-row gather.  Compact mode: checkpoint
    row + in-register 2-bit popcounts over the block's packed words
    (countUpToEx, ebwt.h:1963)."""
    corr = jnp.where(_ult(zoff, i), 1, 0)[..., None] * \
        jnp.array([1, 0, 0, 0], jnp.int32)
    if cat.occ_every == 1:
        return cat.occ[i + occ_base] - corr
    blk = cat.occ_every
    assert blk & (blk - 1) == 0, "occ_every must be a power of two"
    wpb = blk // 16
    block = _shr(i, blk.bit_length() - 1)
    base = cat.occ[block + occ_base]                   # [B, 4]
    rem = i - block * blk
    # one [.., 128]-wide row gather + VPU group-select of the block's
    # wpb words (see build_fmcat: [N, wpb] operands pad 16x on TPU)
    blkg = block + blk_base
    rows128 = cat.bwt[blkg >> 4]                       # [B, 128]
    grp = (blkg & 15)
    gm = (jax.lax.broadcasted_iota(
        jnp.int32, rows128.shape, rows128.ndim - 1) // wpb) \
        == grp[..., None]
    words = jnp.sum(jnp.where(gm, rows128, 0)
                    .reshape(rows128.shape[:-1] + (16, wpb)),
                    axis=-2)                           # [B, wpb]
    nl = jnp.clip(rem[..., None] -
                  16 * jnp.arange(wpb, dtype=jnp.int32), 0, 16)
    shift = (32 - 2 * jnp.clip(nl, 1, 16)).astype(jnp.uint32)
    keep = jnp.where(nl <= 0, jnp.uint32(0),
                     jnp.uint32(0xFFFFFFFF) >> shift)    # [B, wpb]
    cnts = []
    for c in range(4):
        x = ~(words ^ _CHAR_PATTERNS[c])
        hits = x & (x >> 1) & _LANE_EVEN
        cnts.append(jax.lax.population_count(hits & keep)
                    .astype(jnp.int32).sum(axis=-1))
    return base + jnp.stack(cnts, axis=-1) - corr


def _lf4pair(cat: FMCat, occ_base, zoff, top, bot, blk_base=0):
    """fchr + rank quartets at top and bot (mapLFEx, ebwt.h:2334).

    One fused [2B] rank lookup: sparse-core gathers have a ~300 µs
    fixed cost at B=16k (scripts/microbench_ops.py), so one gather of
    2B rows beats two of B."""
    f4 = cat.fchr[:4]
    B = top.shape[0]
    i2 = jnp.concatenate([top, bot])
    ob2 = jnp.concatenate([jnp.broadcast_to(occ_base, (B,))] * 2)
    z2 = jnp.concatenate([jnp.broadcast_to(zoff, (B,))] * 2)
    bb2 = jnp.concatenate([jnp.broadcast_to(blk_base, (B,))] * 2)
    r2 = _rank4(cat, ob2, z2, i2, bb2)
    return f4 + r2[:B], f4 + r2[B:]


# ---------------------------------------------------------------------------
# Job descriptors
# ---------------------------------------------------------------------------

JOB_FIELDS = [
    # int32 per (lane, job) unless noted
    "valid",          # 1 if this job exists for the lane
    "qlen",           # search query length (after set_qlen)
    "ebwt_fw",        # 1 = forward index, 0 = mirror
    "fw",             # strand flag for reporting
    "d5", "d3", "unrev", "rev1", "rev2", "rev3",   # setOffs
    "ham0",           # entry ham (partial-extension prior cost)
    "report_exacts",  # bool
    "report_partials",  # 0 or seedMms
    "half_and_half",  # bool
    "max_bts",        # backtrack ceiling (INF32 = none)
    "consider_quals",  # bool
    "qual_thresh",    # -e budget (INF32 for -v modes)
    "reset_rng",      # 1: rng <- read seed at job load
    "ns_gate",        # 1: backtrack() returns False immediately (N tally)
    "ns_ftab",        # count of Ns in the first ftabChars depths
    "maq_round",      # Maq penalty rounding for derived pend rows
    "npremut",        # seed-stage mutations already applied (phase 3/4)
    "premut_pos0", "premut_pos1", "premut_pos2",
    "premut_refc0", "premut_refc1", "premut_refc2",
    "collect_partials",  # 1: partials go to the lane partial buffer
]


NJF = len(JOB_FIELDS)
_FIDX = {f: i for i, f in enumerate(JOB_FIELDS)}


def empty_jobs(B: int, J: int, L: int):
    """Host-side job table: scalars [B, J] + per-depth rows [B, J, L]."""
    jobs = {f: np.zeros((B, J), dtype=np.int32) for f in JOB_FIELDS}
    jobs["qd"] = np.full((B, J, L), 4, dtype=np.int32)     # codes by depth
    jobs["quald"] = np.zeros((B, J, L), dtype=np.int32)    # qual by depth
    jobs["pend"] = np.zeros((B, J, L), dtype=np.int32)     # penalty by depth
    return jobs


# ---------------------------------------------------------------------------
# Device job format.
#
# The machine step runs every micro-step, so the job table's layout sets
# a floor on per-step HBM traffic.  Two rules:
#   - all scalar fields live in ONE [B, J, NJF] int32 array ("scal")
#     read with a one-hot masked sum over the job axis — 26 separate
#     [B, J] arrays each pad their minor dim to a full lane tile,
#     multiplying bytes swept ~26x;
#   - the by-depth query/qual/penalty rows are [B, J, 3L] int8
#     ([qd | quald | pend]) selected the same way — and they are
#     derived ON DEVICE once per launch (set_query semantics), never
#     per machine step.
# ---------------------------------------------------------------------------


def _sel_block(arr3, jidx):
    """arr3[b, jidx[b], :] via ONE one-hot masked sum over the block
    axis — pure VPU work.  Dynamic gathers/scatters run on the TPU
    sparse core at ~µs-per-row granularity (measured ~1-3 ms per op at
    B=16k), so every hot-loop indexed read here is a masked sweep."""
    B, J, W = arr3.shape
    m = (jax.lax.broadcasted_iota(jnp.int32, (B, J), 1)
         == jidx[:, None])[:, :, None]
    return jnp.sum(jnp.where(m, arr3, 0), axis=1)


def _job_scal(jobs, jidx, J: int):
    """All NJF scalar fields of each lane's current job: [B, NJF]."""
    return _sel_block(jobs["scal"], jidx)


def pack_jobs_host(jobs, J: int, L: int):
    """Host job dict (per-field [B, J] + optional [B, J, L] rows) ->
    device-format numpy dict (scal [+ rows if present on host])."""
    B = jobs["valid"].shape[0]
    scal = np.stack([jobs[f] for f in JOB_FIELDS],
                    axis=-1).astype(np.int32)        # [B, J, NJF]
    out = {"scal": scal}
    if "qd" in jobs:
        out["qqp_r"] = np.concatenate([
            np.clip(jobs["qd"], -128, 127).astype(np.int8),
            np.clip(jobs["quald"], 0, 127).astype(np.int8),
            np.clip(jobs["pend"], 0, 127).astype(np.int8),
        ], axis=2)                                   # [B, J, 3L]
    for k in ("base_codes", "base_qual", "base_plen"):
        if k in jobs:
            out[k] = jobs[k]
    return out


def _derive_rows_impl(scal, base_codes, base_qual, base_plen, *,
                      J: int, L: int, fc: int):
    """set_query semantics on device, vectorized over (lane, job):
    derive the by-depth query/qual/penalty rows and the N-tally gates
    from the base read arrays (see dfs_jobs.py coordinate identities;
    _tally_ns analog, ebwt_search_backtrack.h:1306-1343).  Runs ONCE
    per launch.  Returns (scal with gates filled, packed qqp_r
    [B, J*3L] int8 rows)."""
    B = base_plen.shape[0]
    s2 = scal.reshape(B * J, NJF)       # [B, J, NJF] -> flat rows

    def f(name):
        return s2[:, _FIDX[name]]

    # The by-depth row is always a REVERSE and/or SHIFT of the base
    # read row (take[i] = qs-1-i when the job walks the pattern
    # right-to-left in read coordinates, plen-qs+i otherwise), so it
    # never needs a real gather: jnp.take_along_axis lowers to a
    # scalar-unit kCustom fusion measured at ~0.4 s for one launch-B
    # derive ([B*J, L] = [442k, 40]) — the single most expensive op of
    # the whole -n pipeline.  Instead: pack (code, qual) into one int32
    # word and barrel-shift rows with log2(L) masked cyclic rolls —
    # pure VPU sweeps, ~100x faster.
    packed = (base_codes.astype(jnp.int32) |
              (base_qual.astype(jnp.int32) << 3))         # [B, L]
    pk = jnp.repeat(packed, J, axis=0)                    # [B*J, L]
    plen = jnp.repeat(base_plen.astype(jnp.int32), J)
    qs = f("qlen")
    fwj = f("fw")
    efw = f("ebwt_fw")
    rev1 = (fwj == efw)
    src = jnp.where(rev1[:, None], pk[:, ::-1], pk)
    # out[i] = src[(i + shift) mod L]; positions >= qs are masked below,
    # so cyclic wrap (and the degenerate qs==0 row) never leaks through
    shift = jnp.where(rev1, L - qs, plen - qs) % L        # in [0, L)
    out = src
    s = 1
    while s < L:
        rolled = jnp.concatenate([out[:, s:], out[:, :s]], axis=1)
        out = jnp.where(((shift & s) > 0)[:, None], rolled, out)
        s <<= 1
    di = jax.lax.broadcasted_iota(jnp.int32, (B * J, L), 1)
    in_q = di < qs[:, None]
    qd = out & 7
    qv = out >> 3
    comp = (fwj == 0)[:, None]
    qd = jnp.where(comp & (qd < 4), 3 - qd, qd)
    qd = jnp.where(in_q, qd, 4)
    qv = jnp.where(in_q, qv, 0)
    # seed-stage mutations (phase 3/4 extension jobs)
    npm = f("npremut")
    for k in range(3):
        pos = f(f"premut_pos{k}")
        hit_d = (di == (qs - 1 - pos)[:, None]) & (npm > k)[:, None]
        qd = jnp.where(hit_d, f(f"premut_refc{k}")[:, None], qd)
    pend = jnp.where(f("maq_round")[:, None] > 0,
                     jnp.minimum(30, ((qv + 5) // 10) * 10), qv)
    # N tally gates
    region = in_q & (di < f("rev3")[:, None])
    isn = (qd == 4) & region
    nsc = jnp.cumsum(isn.astype(jnp.int32), axis=1)

    def kth(kk):
        at = isn & (nsc == kk)
        return jnp.any(at, axis=1), jnp.argmax(at, axis=1) \
            .astype(jnp.int32)

    h1, p1 = kth(1)
    h2, p2 = kth(2)
    h3, p3 = kth(3)
    total = nsc[:, -1]
    ns_gate = ((h1 & (p1 < f("unrev"))) | (h2 & (p2 < f("rev1"))) |
               (h3 & (p3 < f("rev2"))) | (total > 3)).astype(jnp.int32)
    ns_ftab = jnp.sum(((qd[:, :fc] == 4) & in_q[:, :fc])
                      .astype(jnp.int32), axis=1)
    s2 = s2.at[:, _FIDX["ns_gate"]].set(ns_gate)
    s2 = s2.at[:, _FIDX["ns_ftab"]].set(ns_ftab)
    qqp = jnp.concatenate([
        qd.astype(jnp.int8),
        jnp.clip(qv, 0, 127).astype(jnp.int8),
        jnp.clip(pend, 0, 127).astype(jnp.int8)], axis=1)  # [B*J, 3L]
    return s2.reshape(B, J, NJF), qqp.reshape(B, J, 3 * L)


@partial(jax.jit, static_argnames=("J", "L", "fc"))
def derive_rows_jit(scal, base_codes, base_qual, base_plen, *, J, L, fc):
    return _derive_rows_impl(scal, base_codes, base_qual, base_plen,
                             J=J, L=L, fc=fc)


def upload_jobs(jobs_np: dict, J: int, L: int, fc: int) -> dict:
    """Upload a host-format job dict; derive the by-depth rows on
    device when the host didn't precompute them."""
    jobs_np = pack_jobs_host(jobs_np, J, L) if "scal" not in jobs_np \
        else jobs_np
    dev = {k: jnp.asarray(v) for k, v in jobs_np.items()}
    if "qqp_r" not in dev:
        dev["scal"], dev["qqp_r"] = derive_rows_jit(
            dev["scal"], dev["base_codes"], dev["base_qual"],
            dev["base_plen"], J=J, L=L, fc=fc)
    return dev


# ---------------------------------------------------------------------------
# The state machine
#
# Layout strategy (the TPU-critical design decision): the CURRENT DFS
# frame lives in per-lane registers — [B] scalars plus [B, L(,8)]
# pairs/elims rows — which every micro-step can update with cheap
# vectorized masked writes.  Parent frames live in stack arrays
# ([B*S, ...]) touched ONLY at push/pop via row scatter/gather.  A naive
# [B, S, L, 8] one-hot update would sweep ~10 KB/lane/step; this layout
# sweeps ~1 KB, which is the difference between ~20k and ~500k
# lane-steps/s/chip.
# ---------------------------------------------------------------------------

# frame registers saved/restored across push/pop, in stack-slot order
REGS = ("depth", "unrev", "rev1", "rev2", "rev3", "ham", "d", "top",
        "bot", "alt", "elnum", "elsz", "eli", "eltop", "elbot",
        "elham", "elcint", "elignore", "lowq", "btdm", "mustbt",
        "invhh", "invex", "reppart", "dftab", "bi", "bj", "bspread")
NREG = len(REGS)


def _init_state(B: int, L: int, seeds, count0):
    z = lambda *s: jnp.zeros(s, jnp.int32)
    st = dict(
        mode=jnp.full((B,), M_JOB, jnp.int32),
        job=z(B),                 # current job idx
        result=z(B),              # 0 running, 1 done-ok, 2 done-maxed
        overflow=jnp.zeros((B,), bool),
        rng=jnp.asarray(seeds, jnp.uint32),
        seed=jnp.asarray(seeds, jnp.uint32),
        count=jnp.asarray(count0, jnp.int32),
        # current-job registers.  qqp packs the three by-depth rows
        # [qd | quald | pend] into ONE [B, 3L] array: element reads at
        # depth d become three static slices under one shared one-hot
        # mask (fused single VPU pass), and the JOB-step load is one
        # masked sweep instead of three
        qqp=z(B, 3 * L),
        qlen=z(B), ebwt_fw=z(B), fwflag=z(B),
        jd5=z(B), jd3=z(B), jrev2=z(B), jrev3=z(B),
        rep_exacts=z(B), rep_partials=z(B), hh=z(B), maxbts=z(B),
        cons_quals=z(B), qthresh=z(B), npremut=z(B),
        premut_pos=z(B, 3), premut_refc=z(B, 3),
        collect=z(B),
        occ_base=z(B), sa_base=z(B), ftab_base=z(B), zoff=z(B),
        blk_base=z(B),
        num_bts=z(B), bailed=jnp.zeros((B,), bool),
        # current-frame data rows
        # pairs is FLAT [B, 8*L] and CHANNEL-MAJOR (channel c of
        # position p at column c*L+p): a trailing dim of 8 would be
        # padded to 128 lanes by TPU (8, 128) tiling — 16x the HBM
        # bytes — and channel-major makes every read a set of STATIC
        # [B, L] slices under one shared position mask (a dynamic
        # [B, 8]-block gather measured 2.1 ms/op on the sparse core vs
        # ~0.1 ms for the masked sweep; scripts/microbench_ops.py)
        pairs=z(B, L * 8),
        elims=z(B, L),
        # frame stack: one combined row per (lane, level) — regs,
        # pairs rows, nibble-packed elims (4-bit values, 8 per int32
        # word: -25% physical row width after (8,128) tiling).
        # FLAT [B, S_MAX*W]: slot s of lane b at columns
        # [s*W, (s+1)*W).  A [B*S_MAX, W] layout forced XLA to
        # materialize a (12288,6,353)->(73728,353) retiling copy of the
        # whole array EVERY step (~0.4 ms, 25% of late-chunk step cost);
        # the flat shape makes push a repeat-mask sweep and pop six
        # static slices — no layout change, no sparse-core ops.
        stk=z(B, S_MAX * (NREG + L * 8 + _elw(L))),
        sd=z(B),
        mms=z(B, S_MAX), refcs=z(B, S_MAX), mmd=z(B, S_MAX),
        # report registers (r_row/r_jumps/r_walk: walk-left resolve
        # state for the compact layout)
        r_top=z(B), r_bot=z(B), r_sd=z(B), r_ham=z(B), r_stratum=z(B),
        r_k=z(B), r_r=z(B), r_resume=z(B),
        r_row=z(B), r_jumps=z(B), r_walk=z(B),
        # outputs
        nhits=z(B),
        hits=z(B, H_MAX * (8 + 2 * MM_SLOTS)),
        npart=z(B), part_n=z(B, P_MAX), part_job=z(B, P_MAX),
        part_pos=z(B, P_MAX * 3), part_refc=z(B, P_MAX * 3),
    )
    for r in REGS:
        st["c_" + r] = z(B)
    return st


def _w(st, name, mask, val):
    """Masked register write ([B] arrays — one cheap where)."""
    st[name] = jnp.where(mask, val, st[name])
    return st


def _fw_set(st, name, mask, val):
    """Masked write into a [B, S] per-stack-depth array at slot sd
    (used only for mms/refcs/mmd).  One-hot masked sweep: dynamic
    scatters run on the sparse core (~ms per op at B=16k), sweeps on
    the VPU (~µs)."""
    B, S = st[name].shape
    m = (jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
         == st["sd"][:, None]) & mask[:, None]
    st[name] = jnp.where(m, val[:, None], st[name])
    return st


def _elw(L: int) -> int:
    """Packed-elims word count: 8 4-bit values per int32."""
    return -(-L // 8)


def _pack_elims(el):
    """[B, L] 4-bit values -> [B, ceil(L/8)] int32 words."""
    B, L = el.shape
    W = _elw(L)
    if W * 8 != L:
        el = jnp.pad(el, ((0, 0), (0, W * 8 - L)))
    sh = 4 * jnp.arange(8, dtype=jnp.int32)
    return (el.reshape(B, W, 8) << sh).sum(axis=-1)


def _unpack_elims(words, L):
    """[B, W] int32 words -> [B, L] 4-bit values."""
    B, W = words.shape
    sh = 4 * jnp.arange(8, dtype=jnp.int32)
    el = (words[:, :, None] >> sh) & 0xF
    return el.reshape(B, W * 8)[:, :L]


def _push_frame(st, mask):
    """Save the current frame (registers + pairs rows + packed elims)
    to the stack at slot sd.  One-hot masked sweep over the slot dim —
    the row scatter costs ~770 µs vs ~590 µs for the sweep at B=16k
    (scripts/microbench_ops.py), and the broadcast of rec over S_MAX
    is a free view."""
    B = st["sd"].shape[0]
    regs = jnp.stack([st["c_" + r] for r in REGS], axis=-1)   # [B, NREG]
    rec = jnp.concatenate([regs, st["pairs"],
                           _pack_elims(st["elims"])], axis=-1)
    Wd = rec.shape[1]
    slot_m = ((jax.lax.broadcasted_iota(jnp.int32, (B, S_MAX), 1)
               == st["sd"][:, None]) & mask[:, None])
    st["stk"] = jnp.where(jnp.repeat(slot_m, Wd, axis=1),
                          jnp.tile(rec, (1, S_MAX)), st["stk"])
    return st


def _pop_frame(st, mask):
    """Restore the parent frame from the stack at (already-decremented)
    slot sd — S_MAX static slices under a one-hot slot select (pure
    VPU; a per-lane row gather runs on the sparse core)."""
    B = st["sd"].shape[0]
    L = st["elims"].shape[1]
    Wd = st["stk"].shape[1] // S_MAX
    rec = jnp.zeros((B, Wd), jnp.int32)
    for s in range(S_MAX):
        sel = (st["sd"] == s)[:, None]
        rec = jnp.where(sel, st["stk"][:, s * Wd:(s + 1) * Wd], rec)
    for k, r in enumerate(REGS):
        st = _w(st, "c_" + r, mask, rec[:, k])
    pr = rec[:, NREG:NREG + L * 8]
    st["pairs"] = jnp.where(mask[:, None], pr, st["pairs"])
    er = _unpack_elims(rec[:, NREG + L * 8:], L)
    st["elims"] = jnp.where(mask[:, None], er, st["elims"])
    return st


def _ret_false(st, mask):
    """A frame returns False: end the job (bailed cascades straight
    out, :423-427) or mark the lane for a deferred pop.  The actual
    stack restore happens once per machine step in _step_retf — having
    a single pop site (and reading the stacks before BR's push writes
    them) lets XLA keep the stack buffers in-place across while-loop
    iterations instead of copying ~200 MB per step."""
    job_fail = mask & ((st["sd"] == 0) | st["bailed"])
    pop = mask & ~job_fail
    st["mode"] = jnp.where(job_fail, M_JOB, st["mode"])
    st["job"] = jnp.where(job_fail, st["job"] + 1, st["job"])
    st["mode"] = jnp.where(pop, M_RETF, st["mode"])
    return st


def _step_retf(st):
    """Deferred frame pop: restore the parent frame, then run its
    post-child bookkeeping (POP)."""
    m = st["mode"] == M_RETF
    st["sd"] = jnp.where(m, st["sd"] - 1, st["sd"])
    st = _pop_frame(st, m)
    st["mode"] = jnp.where(m, M_POP, st["mode"])
    return st


def _init_regs(st, mask, depth, unrev, rev1, rev2, rev3, ham, top, bot,
               dftab):
    """Initialize the current-frame registers (entry of _bt, :187-213).
    pairs/elims rows need no zeroing: every row read is written first by
    ADV of the same frame."""
    zer = jnp.zeros_like(depth)
    vals = dict(depth=depth, unrev=unrev, rev1=rev1, rev2=rev2,
                rev3=rev3, ham=ham, d=depth, top=top, bot=bot,
                alt=zer, elnum=zer, elsz=zer, eli=zer, eltop=zer,
                elbot=zer, elham=ham, elcint=zer,
                elignore=jnp.ones_like(depth),
                lowq=jnp.full_like(depth, 0xFF), btdm=zer, mustbt=zer,
                invhh=zer, invex=zer, reppart=zer, dftab=dftab,
                bi=zer, bj=zer, bspread=zer)
    for r in REGS:
        st = _w(st, "c_" + r, mask, vals[r])
    # half-and-half backtrack accounting at frame entry (:194-198)
    hh = st["hh"] > 0
    bail = mask & hh & (st["maxbts"] > 0) & \
        (st["num_bts"] == st["maxbts"])
    st["num_bts"] = jnp.where(mask & hh & ~bail, st["num_bts"] + 1,
                              st["num_bts"])
    st["bailed"] = st["bailed"] | bail
    st["mode"] = jnp.where(mask & ~bail, M_ADV, st["mode"])
    st = _ret_false(st, bail)
    return st


# ---------------------------------------------------------------------------
# Report entry / row chase
# ---------------------------------------------------------------------------

def _enter_report(st, mask, sd_r, top, bot, ham, resume):
    """reportFullAlignment entry (ebwt_search_backtrack.h:1455-1540):
    compute stratum/cost, draw the random start row.

    In partial-collecting jobs (reportPartials > 0) a "report" instead
    appends a partial alignment and returns False (:527-531), with no
    RNG consumption."""
    pmask = mask & (st["rep_partials"] > 0)
    st = _store_partial(st, pmask & (sd_r > 0), sd_r)
    st["r_resume"] = jnp.where(pmask, resume, st["r_resume"])
    st = _report_fail(st, pmask)
    mask = mask & ~pmask
    B, S = st["mms"].shape
    ii = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    # stratum: mismatches with mms[i] >= qlen - rev3 <=> depth < rev3
    # (:1164-1181), rev3 = the JOB-level setOffs value
    in_seed = (ii < sd_r[:, None]) & (st["mmd"] < st["jrev3"][:, None])
    stratum = jnp.sum(in_seed.astype(jnp.int32), axis=1) + st["npremut"]
    spread = bot - top
    rng, v = _rng_next(st["rng"])
    st["rng"] = jnp.where(mask, rng, st["rng"])
    r = top + (v % jnp.maximum(spread.astype(jnp.uint32),
                               jnp.uint32(1))).astype(jnp.int32)
    for name, val in [("r_top", top), ("r_bot", bot), ("r_sd", sd_r),
                      ("r_ham", ham), ("r_stratum", stratum),
                      ("r_k", jnp.zeros_like(top)), ("r_r", r),
                      ("r_resume", resume),
                      ("r_walk", jnp.zeros_like(top))]:
        st[name] = jnp.where(mask, val, st[name])
    st["mode"] = jnp.where(mask, M_REP, st["mode"])
    return st


def _report_fail(st, mask):
    """The row loop exhausted without a sink stop: resume per context
    (:1521 returns false; callers at :329-331, :391, :482)."""
    r0 = mask & (st["r_resume"] == 0)   # ADV cur==0: top=bot, branch loop
    r1 = mask & (st["r_resume"] == 1)   # branch child (i+1==qlen): POP
    r2 = mask & (st["r_resume"] == 2)   # frame/job-level return False
    st = _w(st, "c_top", r0, st["c_bot"])
    st["mode"] = jnp.where(r0, M_BR, st["mode"])
    st["mode"] = jnp.where(r1, M_POP, st["mode"])
    st = _ret_false(st, r2)
    return st


def _store_partial(st, mask, n):
    """_report_partial (:519-524): append (mms, refcs)[0:n] to the
    lane's partial buffer."""
    B = st["sd"].shape[0]
    over = mask & ((st["npart"] >= P_MAX) | (n > 3))
    st["overflow"] = st["overflow"] | over
    st["mode"] = jnp.where(over, M_DONE, st["mode"])
    ok = mask & ~over
    pm = (jax.lax.broadcasted_iota(jnp.int32, (B, P_MAX), 1)
          == st["npart"][:, None]) & ok[:, None]
    st["part_n"] = jnp.where(pm, n[:, None], st["part_n"])
    st["part_job"] = jnp.where(pm, st["job"][:, None], st["part_job"])
    pmf = jnp.repeat(pm, 3, axis=1)
    st["part_pos"] = jnp.where(pmf, jnp.tile(st["mms"][:, :3],
                                             (1, P_MAX)), st["part_pos"])
    st["part_refc"] = jnp.where(pmf, jnp.tile(st["refcs"][:, :3],
                                              (1, P_MAX)),
                                st["part_refc"])
    st["npart"] = jnp.where(ok, st["npart"] + 1, st["npart"])
    return st


def _step_rep(st, cat: FMCat, nfrag: int, n_k: int, m_max: int):
    """One row chase: dense-SA resolve + joinedToTextOff + sink
    (reportChaseOne ebwt.h:2693; joinedToTextOff :2569-2629;
    NGoodHitSinkPerThread::reportHit hit.h:969-985)."""
    m = st["mode"] == M_REP
    spread = st["r_bot"] - st["r_top"]
    ri = st["r_r"] + st["r_k"]
    ri = jnp.where(_ule(st["r_bot"], ri), ri - spread, ri)
    ri_safe = jnp.where(m, ri, 0)
    if cat.dense:
        off = _g1(cat.sa, ri_safe + st["sa_base"])
    else:
        # walk left to a marked row (reportChaseOne, ebwt.h:2727-2746):
        # one LF per machine step; rows are marked every 2^offRate
        start = m & (st["r_walk"] == 0)
        row = jnp.where(start, ri_safe, st["r_row"])
        jumps = jnp.where(start, 0, st["r_jumps"])
        omask = (1 << cat.off_rate) - 1
        at_z = row == st["zoff"]
        marked = ((row & omask) == 0) | at_z
        resolved = m & marked
        off = jnp.where(
            at_z, jumps,
            _g1(cat.sa, jnp.where(m, _shr(row, cat.off_rate), 0)
                + st["sa_base"]) + jumps)
        walkers = m & ~marked
        wpb = cat.occ_every // 16
        widx = jnp.where(walkers, _shr(row, 4) + st["blk_base"] * wpb,
                         0)
        word = _sel_col(cat.bwt[widx >> 7], widx & 127)
        sh = (2 * (row & 15)).astype(jnp.uint32)
        ch = ((word >> sh) & 3).astype(jnp.int32)
        r4 = _rank4(cat, st["occ_base"], st["zoff"],
                    jnp.where(walkers, row, 0), st["blk_base"])
        lf = _sel_col(cat.fchr[:4] + r4, ch)
        st["r_row"] = jnp.where(walkers, lf, row)
        st["r_jumps"] = jnp.where(walkers, jumps + 1, jumps)
        st["r_walk"] = jnp.where(m, jnp.where(resolved, 0, 1),
                                 st["r_walk"])
        m = resolved
    qlen = st["qlen"]
    if nfrag == 1:
        elt = jnp.zeros_like(off)
    else:
        elt = jnp.searchsorted(cat.rstarts_start ^ _UBIAS,
                               off ^ _UBIAS, side="right") \
            .astype(jnp.int32) - 1
    start = _g1(cat.rstarts_start, elt)
    upper = jnp.where(elt + 1 < nfrag,
                      _g1(cat.rstarts_start,
                          jnp.minimum(elt + 1, nfrag - 1)),
                      cat.length)
    valid = _ule(off + qlen, upper)
    tidx = _g1(cat.rstarts_tidx, elt)
    fragoff = off - start
    fraglen = upper - start
    fragoff = jnp.where(st["ebwt_fw"] == 0,
                        fraglen - fragoff - 1 - (qlen - 1), fragoff)
    toff = fragoff + _g1(cat.rstarts_toff, elt)

    hit = m & valid
    newcount = st["count"] + 1
    maxed = hit & (newcount > m_max)
    stored = hit & ~maxed
    # assemble the hit record: search mms[0:r_sd] then the seed-stage
    # premuts (applyPartialMutations accounting, :1489-1519)
    B = st["count"].shape[0]
    nmms = st["r_sd"] + st["npremut"]
    slot_i = jax.lax.broadcasted_iota(jnp.int32, (B, MM_SLOTS), 1)
    from_mm = slot_i < st["r_sd"][:, None]
    pm_i = jnp.clip(slot_i - st["r_sd"][:, None], 0, 2)
    oh = pm_i[:, :, None] == jnp.arange(3, dtype=jnp.int32)[None, None]
    pm_pos = jnp.sum(jnp.where(oh, st["premut_pos"][:, None, :], 0), -1)
    pm_refc = jnp.sum(jnp.where(oh, st["premut_refc"][:, None, :], 0), -1)
    def _padmm(a):
        if S_MAX >= MM_SLOTS:
            return a[:, :MM_SLOTS]
        return jnp.pad(a, ((0, 0), (0, MM_SLOTS - S_MAX)))
    mm_v = jnp.where(from_mm, _padmm(st["mms"]), pm_pos)
    rc_v = jnp.where(from_mm, _padmm(st["refcs"]), pm_refc)
    cost = st["r_ham"] | (st["r_stratum"] << 14)
    rec = jnp.concatenate([
        jnp.stack([tidx, toff,
                   st["fwflag"] | (st["ebwt_fw"] << 1),
                   st["r_bot"] - st["r_top"] - 1,
                   st["r_stratum"], cost, nmms, qlen], axis=-1),
        mm_v, rc_v], axis=-1)                       # [B, 8+2*MM_SLOTS]
    slot_full = st["nhits"] >= H_MAX
    mm_over = nmms > MM_SLOTS
    over = stored & (slot_full | mm_over)
    st["overflow"] = st["overflow"] | over
    st["mode"] = jnp.where(over, M_DONE, st["mode"])
    do_store = stored & ~over
    hm = (jax.lax.broadcasted_iota(jnp.int32, (B, H_MAX), 1)
          == st["nhits"][:, None]) & do_store[:, None]
    W = 8 + 2 * MM_SLOTS
    st["hits"] = jnp.where(jnp.repeat(hm, W, axis=1),
                           jnp.tile(rec, (1, H_MAX)), st["hits"])
    st["nhits"] = jnp.where(do_store, st["nhits"] + 1, st["nhits"])
    st["count"] = jnp.where(hit, newcount, st["count"])
    # stop rules (hit.h:969-985 + reportHit count>max check)
    st["result"] = jnp.where(maxed, 2, st["result"])
    st["mode"] = jnp.where(maxed, M_DONE, st["mode"])
    stop = do_store & (newcount == n_k) & \
        ((m_max == INF32) | (m_max < n_k))
    st["result"] = jnp.where(stop, 1, st["result"])
    st["mode"] = jnp.where(stop, M_DONE, st["mode"])
    # advance the row loop
    go_on = m & ~maxed & ~stop & ~over
    nk = st["r_k"] + 1
    st["r_k"] = jnp.where(go_on, nk, st["r_k"])
    st = _report_fail(st, go_on & (nk >= spread))
    return st


# ---------------------------------------------------------------------------
# JOB: top-level backtrack() entry
# ---------------------------------------------------------------------------

def _step_job(st, cat: FMCat, jobs, J: int, L: int):
    m = st["mode"] == M_JOB
    jidx = jnp.minimum(st["job"], J - 1)
    B = jidx.shape[0]
    vals = _job_scal(jobs, jidx, J)            # [B, NJF], one sweep

    def jf(name):
        return vals[:, _FIDX[name]]

    valid = (jf("valid") > 0) & (st["job"] < J)
    done = m & ~valid
    st["mode"] = jnp.where(done, M_DONE, st["mode"])
    m = m & valid
    for reg, f in [("qlen", "qlen"), ("ebwt_fw", "ebwt_fw"),
                   ("fwflag", "fw"), ("jd5", "d5"), ("jd3", "d3"),
                   ("jrev2", "rev2"), ("jrev3", "rev3"),
                   ("rep_exacts", "report_exacts"),
                   ("rep_partials", "report_partials"),
                   ("hh", "half_and_half"), ("maxbts", "max_bts"),
                   ("cons_quals", "consider_quals"),
                   ("qthresh", "qual_thresh"),
                   ("npremut", "npremut"), ("collect", "collect_partials")]:
        st[reg] = jnp.where(m, jf(f), st[reg])
    for reg, fs in [("premut_pos", ("premut_pos0", "premut_pos1",
                                    "premut_pos2")),
                    ("premut_refc", ("premut_refc0", "premut_refc1",
                                     "premut_refc2"))]:
        v = jnp.stack([jf(f) for f in fs], axis=-1)
        st[reg] = jnp.where(m[:, None], v, st[reg])
    st["rng"] = jnp.where(m & (jf("reset_rng") > 0), st["seed"], st["rng"])
    st["num_bts"] = jnp.where(m, 0, st["num_bts"])
    st["bailed"] = jnp.where(m, False, st["bailed"])
    efw = jf("ebwt_fw")
    st["occ_base"] = jnp.where(m, jnp.where(efw > 0, cat.occ_base[0],
                                            cat.occ_base[1]),
                               st["occ_base"])
    st["sa_base"] = jnp.where(m, jnp.where(efw > 0, cat.sa_base[0],
                                           cat.sa_base[1]), st["sa_base"])
    st["ftab_base"] = jnp.where(m, jnp.where(efw > 0, cat.ftab_base[0],
                                             cat.ftab_base[1]),
                                st["ftab_base"])
    st["zoff"] = jnp.where(m, jnp.where(efw > 0, cat.zoff[0],
                                        cat.zoff[1]), st["zoff"])
    st["blk_base"] = jnp.where(m, jnp.where(efw > 0, cat.blk_base[0],
                                            cat.blk_base[1]),
                               st["blk_base"])
    st["sd"] = jnp.where(m, 0, st["sd"])

    # load the current job's packed by-depth rows into the lane state
    rows = _sel_block(jobs["qqp_r"], jidx).astype(jnp.int32)
    st["qqp"] = jnp.where(m[:, None], rows, st["qqp"])

    gate = m & (jf("ns_gate") > 0)
    st["mode"] = jnp.where(gate, M_JOB, st["mode"])
    st["job"] = jnp.where(gate, st["job"] + 1, st["job"])
    m = m & ~gate

    fc = cat.ftab_chars
    qlen = jf("qlen")
    unrev = jf("unrev")
    ns_ftab = jf("ns_ftab")
    ham0 = jf("ham0")
    use_ftab = (ns_ftab == 0) & (jnp.minimum(unrev, qlen) >= fc)
    # calcFtabOff over depths 0..fc-1 (ebwt_search_backtrack.h:254-257)
    w = (2 * jnp.arange(fc, dtype=jnp.int32))[None, :]
    qd_fc = rows[:, :fc]
    qf = jnp.where(qd_fc > 3, 0, qd_fc)
    foff = jnp.sum(qf << w, axis=1)
    ft = _g1(cat.ftab_hi, foff + st["ftab_base"])
    fb = _g1(cat.ftab_lo, foff + 1 + st["ftab_base"])

    offs6 = [jf("d5"), jf("d3"), unrev, jf("rev1"), jf("rev2"),
             jf("rev3")]
    z = jnp.zeros_like(qlen)
    # case a: qlen == fc, report path (no partials) (:139-143)
    rep_now = m & use_ftab & (qlen == fc) & _ult(ft, fb) & \
        (jf("report_partials") == 0)
    st = _enter_report(st, rep_now, z, ft, fb, ham0,
                       jnp.full_like(qlen, 2))
    # case a': qlen == fc with partials -> plain depth-0 recursion (:140)
    ent0p = m & use_ftab & (qlen == fc) & _ult(ft, fb) & \
        (jf("report_partials") > 0)
    # case b: jump-started frame 0 at depth fc (:145-146)
    entf = m & use_ftab & (qlen > fc) & _ult(ft, fb)
    # case c: empty ftab range -> job returns False (:147-148)
    cfail = m & use_ftab & _ule(fb, ft)
    st["mode"] = jnp.where(cfail, M_JOB, st["mode"])
    st["job"] = jnp.where(cfail, st["job"] + 1, st["job"])
    # no-ftab entry (:150-151)
    ent0 = m & ~use_ftab
    st = _init_regs(st, entf, jnp.full_like(qlen, fc), unrev,
                    offs6[3], offs6[4], offs6[5], ham0, ft, fb, z)
    e0 = ent0 | ent0p
    dftab = jnp.where(ent0, (ns_ftab > 0).astype(jnp.int32), 0)
    st = _init_regs(st, e0, z, unrev, offs6[3], offs6[4], offs6[5],
                    ham0, z, z, dftab)
    return st


# ---------------------------------------------------------------------------
# ADV: consume one position (the for-cur loop body, :215-332,473-479)
# ---------------------------------------------------------------------------

def _branch_exit(st, mask):
    """Fall-through after the branch loop (:473-483): fail checks, then
    either continue ADV at the next position or handle pattern-consumed."""
    mustbt = st["c_mustbt"] > 0
    invhh = st["c_invhh"] > 0
    invex = st["c_invex"] > 0
    top = st["c_top"]
    bot = st["c_bot"]
    alt = st["c_alt"]
    fail = mask & (mustbt | invhh | invex | ((top == bot) & (alt == 0)))
    st = _ret_false(st, fail)
    cont = mask & ~fail
    d = st["c_d"]
    consumed = cont & (d + 1 > st["qlen"] - 1)
    adv = cont & ~consumed
    st = _w(st, "c_d", adv, d + 1)
    st["mode"] = jnp.where(adv, M_ADV, st["mode"])
    # pattern consumed (:480-483)
    rep = consumed & (st["sd"] >= st["rep_partials"])
    st = _enter_report(st, rep, st["sd"], top, bot, st["c_ham"],
                       jnp.full_like(top, 2))
    st = _ret_false(st, consumed & ~rep)
    return st


def _step_adv(st, cat: FMCat, jobs, J: int, L: int):
    m = st["mode"] == M_ADV
    B = st["sd"].shape[0]
    jidx = jnp.minimum(st["job"], J - 1)
    d = st["c_d"]
    sd = st["sd"]
    qlen = st["qlen"]
    hh = st["hh"] > 0
    ii = jax.lax.broadcasted_iota(jnp.int32, (B, S_MAX), 1)

    # -- half-and-half entry checks (hhCheckTop, :486-508) --------------
    mm_mask = ii < sd[:, None]
    hi_n = jnp.sum((mm_mask & (st["mmd"] < st["jd5"][:, None]))
                   .astype(jnp.int32), axis=1)
    lo_n = jnp.sum((mm_mask & (st["mmd"] >= st["jd5"][:, None]) &
                    (st["mmd"] < st["jd3"][:, None])).astype(jnp.int32),
                   axis=1)
    req = st["jrev2"] == st["jrev3"]
    fail5 = (d == st["jd5"]) & jnp.where(req, sd == 0, sd < 1)
    fail3 = (d == st["jd3"]) & jnp.where(req, sd < 2, lo_n == 0)
    hh_fail = m & hh & (fail5 | fail3)
    st = _ret_false(st, hh_fail)
    m = m & ~hh_fail

    # -- position character / qual / penalty -----------------------------
    # one shared one-hot position mask over the packed qqp rows: the
    # three element reads fuse into a single [B, 3L] pass
    li0 = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    mD = li0 == jnp.clip(d, 0, L - 1)[:, None]
    qqp = st["qqp"]
    c = jnp.sum(jnp.where(mD, qqp[:, :L], 0), axis=1)
    q = jnp.sum(jnp.where(mD, qqp[:, L:2 * L], 0), axis=1)
    pen = jnp.sum(jnp.where(mD, qqp[:, 2 * L:], 0), axis=1)
    depth = st["c_depth"]
    unrev = st["c_unrev"]
    ham = st["c_ham"]
    top = st["c_top"]
    bot = st["c_bot"]
    lowq = st["c_lowq"]
    cq = st["cons_quals"] > 0
    cur_is_alt = (d >= unrev) & (~cq | (ham + pen <= st["qthresh"]))
    cur_is_eligible = cur_is_alt & jnp.where(cq, q <= lowq, True)
    cur_overrides = cur_is_alt & cq & (q < lowq)

    # -- quartet (:239-256): computed from the PRE-N-hack range ----------
    pt, pb = top, bot
    nhack = (c == 4) & (d > 0)
    top = jnp.where(nhack, 1, top)
    bot = jnp.where(nhack, 1, bot)
    zero_case = (top == 0) & (bot == 0)
    lf4t, lf4b = _lf4pair(cat, st["occ_base"], st["zoff"],
                          jnp.where(m, pt, 0), jnp.where(m, pb, 0),
                          st["blk_base"])
    row_t = jnp.where(zero_case[:, None], cat.fchr[None, 0:4], lf4t)
    row_b = jnp.where(zero_case[:, None], cat.fchr[None, 1:5], lf4b)
    write_pairs = m & (zero_case | cur_is_alt)
    rec8 = jnp.concatenate([row_t, row_b], axis=-1)
    ml = (jax.lax.broadcasted_iota(jnp.int32, (1, L), 1) ==
          d[:, None]) & write_pairs[:, None]
    # channel-major: column c*L+p gets rec8[:, c] where p == d
    st["pairs"] = jnp.where(jnp.tile(ml, (1, 8)),
                            jnp.repeat(rec8, L, axis=1), st["pairs"])
    cK = jnp.clip(c, 0, 3)
    top_n = jnp.where(zero_case, _sel_col(row_t, cK), _sel_col(lf4t, cK))
    bot_n = jnp.where(zero_case, _sel_col(row_b, cK), _sel_col(lf4b, cK))
    is_n = c > 3
    top = jnp.where(m & ~is_n, top_n, top)
    bot = jnp.where(m & ~is_n, bot_n, bot)

    # -- elims[d] init + alternative-char bookkeeping (:257-283) ---------
    spreads = row_b - row_t                                # [B, 4]
    jarange = jnp.arange(4, dtype=jnp.int32)[None, :]
    elim0 = jnp.where(is_n, 0, 1 << cK)
    zero_elim = jnp.where(cur_is_alt[:, None] & (jarange != c[:, None]) &
                          (spreads == 0), 1 << jarange, 0).sum(axis=1)
    elim_d = elim0 | zero_elim
    mle = (jax.lax.broadcasted_iota(jnp.int32, (1, L), 1) ==
           d[:, None]) & m[:, None]
    st["elims"] = jnp.where(mle, elim_d[:, None], st["elims"])
    live = (jarange != c[:, None]) & (spreads != 0)        # [B, 4]
    nlive = jnp.sum(live.astype(jnp.int32), axis=1)
    szlive = jnp.sum(jnp.where(live, spreads, 0), axis=1)
    alt_add = jnp.where(m & cur_is_alt, nlive, 0)
    alt = st["c_alt"] + alt_add
    # eligibility accumulation / override reset (:268-283)
    el_upd = m & cur_is_alt & cur_is_eligible & (nlive > 0)
    ovr = el_upd & cur_overrides
    jstar = jnp.argmax(live, axis=1).astype(jnp.int32)
    elnum = jnp.where(ovr, 0, st["c_elnum"])
    elsz = jnp.where(ovr, 0, st["c_elsz"])
    elnum = jnp.where(el_upd, elnum + nlive, elnum)
    elsz = jnp.where(el_upd, elsz + szlive, elsz)
    st = _w(st, "c_lowq", ovr, q)
    st = _w(st, "c_eli", ovr, d)
    st = _w(st, "c_eltop", ovr, _sel_col(row_t, jstar))
    st = _w(st, "c_elbot", ovr, _sel_col(row_b, jstar))
    st = _w(st, "c_elham", ovr, pen)
    st = _w(st, "c_elcint", ovr, jstar)
    st = _w(st, "c_elignore", ovr, jnp.zeros_like(d))
    st = _w(st, "c_elnum", m, elnum)
    st = _w(st, "c_elsz", m, elsz)
    st = _w(st, "c_alt", m, alt)

    # -- cur==0 / partial / exact / half-and-half flags (:285-325) -------
    cur0 = d == qlen - 1
    btdm = jnp.zeros_like(m)
    partial_c = m & cur0 & (top != bot) & (st["rep_partials"] > 0) & \
        (sd < st["rep_partials"])
    btdm = btdm | (partial_c & (alt > 0))
    st = _store_partial(st, partial_c & (sd > 0), sd)
    reported_partial = partial_c & (sd > 0)
    invex = m & cur0 & (sd == 0) & (bot != top) & (st["rep_exacts"] == 0)
    btdm = btdm | invex
    mustbt = jnp.zeros_like(m)
    invhh = jnp.zeros_like(m)
    # d5-1 boundary (:304-311)
    b5 = m & hh & (d == st["jd5"] - 1) & (top != bot)
    invhh = invhh | (b5 & (sd == 0))
    mustbt = mustbt | (b5 & (sd == 0) & (alt > 0))
    btdm = btdm | (b5 & (sd == 0) & (alt > 0))
    die5 = b5 & (sd == 0) & (alt == 0)
    # d3-1 boundary (:312-325)
    b3 = m & hh & (d == st["jd3"] - 1) & (top != bot)
    inv3 = (lo_n == 0) | (hi_n == 0)
    invhh = invhh | (b3 & inv3)
    mb3 = b3 & ((sd < 2) | inv3) & (alt > 0)
    mustbt = mustbt | mb3
    btdm = btdm | mb3
    die3 = b3 & (sd < 2) & (alt == 0)
    st = _ret_false(st, die5 | die3)
    m = m & ~(die5 | die3)

    st = _w(st, "c_top", m, top)
    st = _w(st, "c_bot", m, bot)
    st = _w(st, "c_btdm", m, btdm.astype(jnp.int32))
    st = _w(st, "c_mustbt", m, mustbt.astype(jnp.int32))
    st = _w(st, "c_invhh", m, invhh.astype(jnp.int32))
    st = _w(st, "c_invex", m, invex.astype(jnp.int32))
    st = _w(st, "c_reppart", m, reported_partial.astype(jnp.int32))

    # -- report at cur==0 (:327-331) --------------------------------------
    rep = m & cur0 & (bot != top) & ~invhh & ~invex & ~reported_partial
    st = _enter_report(st, rep, sd, top, bot, ham, jnp.zeros_like(d))
    m = m & ~rep

    # -- branch or fall through ------------------------------------------
    branch = m & ((top == bot) | btdm) & (alt > 0)
    st["mode"] = jnp.where(branch, M_BR, st["mode"])
    st = _branch_exit(st, m & ~branch)
    return st


# ---------------------------------------------------------------------------
# BR: branch-loop head — condition, mismatch pick, frame push (:334-420)
# ---------------------------------------------------------------------------

def _step_br(st, cat: FMCat, jobs, J: int, L: int):
    m = st["mode"] == M_BR
    B = st["sd"].shape[0]
    jidx = jnp.minimum(st["job"], J - 1)
    sd = st["sd"]
    top = st["c_top"]
    bot = st["c_bot"]
    btdm = st["c_btdm"] > 0
    alt = st["c_alt"]
    cond = ((top == bot) | btdm) & (alt > 0)
    st = _branch_exit(st, m & ~cond)
    m = m & cond

    depth = st["c_depth"]
    d = st["c_d"]
    ham = st["c_ham"]
    elnum = st["c_elnum"]
    elignore = st["c_elignore"] > 0
    lowq = st["c_lowq"]
    cq = st["cons_quals"] > 0
    scan = m & ((elnum > 1) | elignore)

    # -- scan pick (:340-365): highest eligible position -----------------
    er = st["elims"]                                       # [B, L]
    li = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    quald_row = st["qqp"][:, L:2 * L]
    qual_ok = jnp.where(cq[:, None], quald_row == lowq[:, None], True)
    elig = (li >= depth[:, None]) & (li <= d[:, None]) & \
        (er != 15) & qual_ok
    istar_s = jnp.max(jnp.where(elig, li, -1), axis=1)
    no_pos = scan & (istar_s < 0)            # defensive: cannot happen
    istar_safe = jnp.maximum(istar_s, 0)
    # channel-major pairs: 8 static slices under one shared one-hot
    # position mask (fused single pass; no sparse-core gather)
    mi = li == istar_safe[:, None]
    pf = st["pairs"]
    p8 = jnp.stack([jnp.sum(jnp.where(mi, pf[:, c * L:(c + 1) * L], 0),
                            axis=1) for c in range(8)], axis=-1)
    er_i = _sel_col(er, istar_safe)
    jar = jnp.arange(4, dtype=jnp.int32)[None, :]
    nonelim = ((er_i[:, None] >> jar) & 1) == 0
    spreads = p8[:, 4:8] - p8[:, 0:4]
    msp = jnp.where(nonelim, spreads, 0)
    pos_sz = jnp.sum(msp, axis=1)
    no_sz = scan & (pos_sz == 0)             # defensive: cannot happen
    st["overflow"] = st["overflow"] | no_pos | no_sz
    st["mode"] = jnp.where(no_pos | no_sz, M_DONE, st["mode"])
    m = m & ~(no_pos | no_sz)
    scan = scan & ~(no_pos | no_sz)
    rng, v = _rng_next(st["rng"])
    st["rng"] = jnp.where(scan, rng, st["rng"])
    r = (v % jnp.maximum(pos_sz.astype(jnp.uint32),
                         jnp.uint32(1))).astype(jnp.int32)
    cum = jnp.cumsum(msp, axis=1) - msp      # exclusive prefix
    pickj = nonelim & _ule(cum, r[:, None]) & \
        _ult(r[:, None], cum + msp)
    jstar_s = jnp.argmax(pickj, axis=1).astype(jnp.int32)
    bttop_s = _sel_col(p8[:, 0:4], jstar_s)
    btbot_s = _sel_col(p8[:, 4:8], jstar_s)
    btham_s = ham + jnp.sum(jnp.where(mi, st["qqp"][:, 2 * L:], 0),
                            axis=1)

    # -- cached single-eligible pick (:366-370) ---------------------------
    use_cache = m & ~scan
    istar = jnp.where(use_cache, st["c_eli"], istar_safe)
    jstar = jnp.where(use_cache, st["c_elcint"], jstar_s)
    bttop = jnp.where(use_cache, st["c_eltop"], bttop_s)
    btbot = jnp.where(use_cache, st["c_elbot"], btbot_s)
    btham = jnp.where(use_cache, ham + st["c_elham"], btham_s)

    # -- revisitability tightening (:371-380) ----------------------------
    rev1 = st["c_rev1"]
    rev2 = st["c_rev2"]
    rev3 = st["c_rev3"]
    unrev = st["c_unrev"]
    lt1 = istar < rev1
    lt2 = ~lt1 & (istar < rev2)
    lt3 = ~lt1 & ~lt2 & (istar < rev3)
    bt_unrev = jnp.where(lt1, rev1, unrev)
    bt_rev1 = jnp.where(lt1, rev2, jnp.where(lt2, rev2, rev1))
    bt_rev2 = jnp.where(lt1 | lt2, rev3, jnp.where(lt3, rev3, rev2))

    # -- record the mismatch (:381-388) -----------------------------------
    qlen = st["qlen"]
    st = _fw_set(st, "mms", m, qlen - 1 - istar)
    st = _fw_set(st, "refcs", m, jstar)
    st = _fw_set(st, "mmd", m, istar)
    st = _w(st, "c_bi", m, istar)
    st = _w(st, "c_bj", m, jstar)
    st = _w(st, "c_bspread", m, btbot - bttop)

    # -- dispatch ---------------------------------------------------------
    fc = cat.ftab_chars
    caseA = m & (istar + 1 == qlen)
    st = _enter_report(st, caseA, sd + 1, bttop, btbot, btham,
                       jnp.ones_like(sd))
    rest = m & ~caseA
    midftab = rest & (st["hh"] > 0) & (st["c_dftab"] == 0) & \
        (st["jrev2"] == st["jrev3"]) & (istar + 1 < fc) & \
        (fc <= st["jd5"])

    # mid-recursion ftab with the mutation substituted (:393-416),
    # gated: the two table gathers cost ~300 µs each even fully masked
    def _midftab_lookup(_):
        w = (2 * jnp.arange(fc, dtype=jnp.int32))[None, :]
        sub = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (B, fc), 1)
            == istar[:, None],
            jstar[:, None], st["qqp"][:, :fc])
        sub = jnp.where(sub > 3, 0, sub)
        foff = jnp.sum(sub << w, axis=1)
        return (_g1(cat.ftab_hi,
                    jnp.where(midftab, foff + st["ftab_base"], 0)),
                _g1(cat.ftab_lo,
                    jnp.where(midftab, foff + 1 + st["ftab_base"], 0)))

    ft, fb = jax.lax.cond(
        jnp.any(midftab), _midftab_lookup,
        lambda _: (jnp.zeros_like(istar), jnp.zeros_like(istar)), None)
    ft_empty = midftab & (ft == fb)
    st["mode"] = jnp.where(ft_empty, M_POP, st["mode"])
    push = (rest & ~midftab) | (midftab & ~ft_empty)
    s_over = push & (sd + 1 >= S_MAX)
    st["overflow"] = st["overflow"] | s_over
    st["mode"] = jnp.where(s_over, M_DONE, st["mode"])
    push = push & ~s_over
    st = _push_frame(st, push)
    st["sd"] = jnp.where(push, sd + 1, st["sd"])
    ndepth = jnp.where(midftab, fc, istar + 1)
    ntop = jnp.where(midftab, ft, bttop)
    nbot = jnp.where(midftab, fb, btbot)
    st = _init_regs(st, push, ndepth, bt_unrev, bt_rev1, bt_rev2,
                    rev3, btham, ntop, nbot, jnp.zeros_like(sd))
    return st


# ---------------------------------------------------------------------------
# POP: post-child bookkeeping (:421-472)
# ---------------------------------------------------------------------------

def _step_pop(st, jobs, J: int, L: int):
    m = st["mode"] == M_POP
    B = st["sd"].shape[0]
    jidx = jnp.minimum(st["job"], J - 1)
    # bailed / backtrack-ceiling cascade (:423-427)
    bts_hit = (st["hh"] > 0) & (st["maxbts"] > 0) & \
        (st["num_bts"] >= st["maxbts"])
    bail = m & (st["bailed"] | bts_hit)
    st["bailed"] = st["bailed"] | bail
    st = _ret_false(st, bail)
    m = m & ~bail

    sd = st["sd"]
    i = st["c_bi"]
    j = st["c_bj"]
    li = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    me = (li == i[:, None]) & m[:, None]
    st["elims"] = jnp.where(me, st["elims"] | (1 << j)[:, None],
                            st["elims"])
    elsz = st["c_elsz"] - st["c_bspread"]
    elnum = st["c_elnum"] - 1
    alt = st["c_alt"] - 1
    st = _w(st, "c_elsz", m, elsz)
    st = _w(st, "c_elnum", m, elnum)
    st = _w(st, "c_elignore", m, jnp.ones_like(sd))
    st = _w(st, "c_alt", m, alt)
    dead = m & (alt == 0)
    st = _ret_false(st, dead)
    m = m & ~dead
    rescan = m & (elnum == 0) & (st["cons_quals"] > 0)

    li = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)

    def do_rescan(st):
        # eligibility rescan (:437-472), vectorized over positions
        depth = st["c_depth"]
        d = st["c_d"]
        unrev = st["c_unrev"]
        ham = st["c_ham"]
        er = st["elims"]                                   # [B, L]
        pf = st["pairs"]                                   # [B, 8*L]
        # channel-major pairs: per-channel STATIC slices (no strided
        # views, no padded [B, L, 4] materialization)
        spread_c = [pf[:, (4 + j) * L:(5 + j) * L] -
                    pf[:, j * L:(j + 1) * L] for j in range(4)]
        live_c = [(((er >> j) & 1) == 0) & (spread_c[j] != 0)
                  for j in range(4)]
        in_rng = (li >= jnp.maximum(depth, unrev)[:, None]) & \
            (li <= d[:, None])
        pend_row = st["qqp"][:, 2 * L:]
        quald_row = st["qqp"][:, L:2 * L]
        k_alt = (ham[:, None] + pend_row) <= st["qthresh"][:, None]
        nlive = sum(lc.astype(jnp.int32) for lc in live_c)
        szs = sum(jnp.where(live_c[j], spread_c[j], 0) for j in range(4))
        valid_k = in_rng & k_alt & (nlive > 0)
        qv = jnp.where(valid_k, quald_row, 0x7FFF)
        low = jnp.min(qv, axis=1)
        at_low = valid_k & (quald_row == low[:, None])
        kstar = jnp.max(jnp.where(at_low, li, -1), axis=1)
        has = kstar >= 0
        ks = jnp.maximum(kstar, 0)
        n_el = jnp.sum(jnp.where(at_low, nlive, 0), axis=1)
        s_el = jnp.sum(jnp.where(at_low, szs, 0), axis=1)
        # first live char at kstar (ascending l, :453)
        lk = jnp.stack([_sel_col(live_c[j].astype(jnp.int32), ks)
                        for j in range(4)], axis=-1) > 0  # [B, 4]
        lstar = jnp.argmax(lk, axis=1).astype(jnp.int32)
        mk = li == ks[:, None]
        p8k = jnp.stack([jnp.sum(jnp.where(
            mk, pf[:, c * L:(c + 1) * L], 0), axis=1)
            for c in range(8)], axis=-1)
        mm = rescan & has
        st2 = dict(st)
        st2 = _w(st2, "c_lowq", mm, low)
        st2 = _w(st2, "c_eli", mm, ks)
        st2 = _w(st2, "c_eltop", mm, _sel_col(p8k[:, 0:4], lstar))
        st2 = _w(st2, "c_elbot", mm, _sel_col(p8k[:, 4:8], lstar))
        st2 = _w(st2, "c_elham", mm,
                 jnp.sum(jnp.where(mk, pend_row, 0), axis=1))
        st2 = _w(st2, "c_elcint", mm, lstar)
        st2 = _w(st2, "c_elignore", mm, jnp.zeros_like(ks))
        st2 = _w(st2, "c_elnum", mm, n_el)
        st2 = _w(st2, "c_elsz", mm, s_el)
        # no eligible found: lowq stays 0xFF, counters 0, ignore set
        mn = rescan & ~has
        st2 = _w(st2, "c_lowq", mn, jnp.full_like(ks, 0xFF))
        st2 = _w(st2, "c_elnum", mn, jnp.zeros_like(ks))
        st2 = _w(st2, "c_elsz", mn, jnp.zeros_like(ks))
        return st2

    st = jax.lax.cond(jnp.any(rescan), do_rescan, lambda s: dict(s), st)
    st["mode"] = jnp.where(m, M_BR, st["mode"])
    return st


# ---------------------------------------------------------------------------
# Machine driver
# ---------------------------------------------------------------------------

def _machine_step(st, cat: FMCat, jobs, J: int, L: int, nfrag: int,
                  n_k: int, m_max: int):
    """One lockstep micro-step: each sub-step processes the lanes in its
    mode; a lane can flow JOB->ADV->BR->REP within one iteration."""
    st = dict(st)
    # mode-presence counts in ONE [B, nmodes] pass: each jnp.any()
    # predicate costs ~70 µs on its own, and a lane that flips into a
    # gated mode mid-step is simply picked up next iteration
    cnts = jnp.sum(st["mode"][:, None] ==
                   jnp.arange(M_RETF + 1, dtype=jnp.int32)[None, :],
                   axis=0)

    def gate(mode_c, fn, s):
        """Run a sub-step only when some lane is in its mode: the
        gather-bearing sub-steps cost ~0.3-1 ms in sparse-core fixed
        overhead even when fully masked out."""
        return jax.lax.cond(cnts[mode_c] > 0, fn, lambda x: dict(x), s)

    st = gate(M_RETF, _step_retf, st)  # stack reads before BR's push
    st = gate(M_JOB, lambda s: _step_job(s, cat, jobs, J, L), st)
    # ADV multi-issue: one LF extension costs ~2 fused kernels while a
    # full machine step costs ~35 at ~70 us fixed dispatch each, so
    # advancing the (dominant) ADV lanes several depths per step cuts
    # total steps ~3x for ~20% more per-step work
    st = _step_adv(st, cat, jobs, J, L)
    st = _step_adv(st, cat, jobs, J, L)
    st = _step_adv(st, cat, jobs, J, L)
    st = gate(M_POP, lambda s: _step_pop(s, jobs, J, L), st)
    st = gate(M_REP, lambda s: _step_rep(s, cat, nfrag, n_k, m_max),
              st)
    st = _step_br(st, cat, jobs, J, L)   # the only stack write (push)
    return st


OUT_KEYS = ("result", "overflow", "count", "nhits", "hits", "npart",
            "part_n", "part_job", "part_pos", "part_refc", "rng",
            "mode")


@partial(jax.jit, static_argnames=("J", "L", "nfrag", "n_k", "m_max",
                                   "max_steps"))
def run_machine(cat: FMCat, jobs, seeds, count0, *, J: int, L: int,
                nfrag: int, n_k: int, m_max: int, max_steps: int):
    B = seeds.shape[0]
    st0 = _init_state(B, L, seeds, count0)

    def cond(carry):
        st, it = carry
        return (it < max_steps) & jnp.any(st["mode"] != M_DONE)

    def body(carry):
        st, it = carry
        return _machine_step(st, cat, jobs, J, L, nfrag, n_k, m_max), \
            it + 1

    st, iters = jax.lax.while_loop(cond, body, (st0, jnp.int32(0)))
    st["overflow"] = st["overflow"] | (st["mode"] != M_DONE)
    return {k: st[k] for k in OUT_KEYS}, iters


# ---------------------------------------------------------------------------
# Host-side job construction + result assembly
# ---------------------------------------------------------------------------

_QR = np.zeros(256, dtype=np.int32)     # Maq rounding (qual.cpp:4)
_QR[5:15] = 10
_QR[15:25] = 20
_QR[25:] = 30


def fill_job(jobs, b, j, read, *, fw, ebwt_fw, offs, qlen=None,
             report_exacts=True, report_partials=0, half_and_half=False,
             max_bts=INF32, consider_quals=False, qual_thresh=INF32,
             reset_rng=True, ham0=0, premuts=(), collect_partials=False,
             maq=True, fc=10, qd_override=None):
    """Host-side analog of set_query + set_offs (+ set_qlen/set_muts):
    precompute the by-depth query/qual/penalty rows and the N gates."""
    if ebwt_fw:
        qry = read.codes_fw if fw else read.codes_rc
        qualv = read.qual if fw else read.qual[::-1]
    else:
        qry = (read.codes_fw if fw else read.codes_rc)[::-1]
        qualv = read.qual[::-1] if fw else read.qual
    qry = np.asarray(qry, dtype=np.int32)
    if qd_override is not None:
        qry = qd_override
    q = np.frombuffer(bytes(qualv), dtype=np.uint8).astype(np.int32) - 33
    plen = len(qry)
    qlen = min(plen, qlen) if qlen is not None else plen
    d5, d3, unrev, rev1, rev2, rev3 = offs
    qd = qry[qlen - 1::-1]
    quald = q[qlen - 1::-1]
    if "qd" in jobs:
        jobs["qd"][b, j, :qlen] = qd
        jobs["quald"][b, j, :qlen] = quald
        jobs["pend"][b, j, :qlen] = _QR[np.clip(quald, 0, 255)] if maq \
            else quald
    # N tally (:163-184)
    ns_gate = 0
    ns_seed = 0
    for i in range(min(rev3, qlen)):
        if qd[i] == 4:
            ns_seed += 1
            if (ns_seed == 1 and i < unrev) or \
               (ns_seed == 2 and i < rev1) or \
               (ns_seed == 3 and i < rev2) or ns_seed > 3:
                ns_gate = 1
                break
    ns_ftab = int((qd[:min(fc, qlen)] == 4).sum())
    f = dict(valid=1, qlen=qlen, ebwt_fw=int(ebwt_fw), fw=int(fw),
             d5=d5, d3=d3, unrev=unrev, rev1=rev1, rev2=rev2, rev3=rev3,
             ham0=ham0, report_exacts=int(report_exacts),
             report_partials=report_partials,
             half_and_half=int(half_and_half), max_bts=max_bts,
             consider_quals=int(consider_quals), qual_thresh=qual_thresh,
             maq_round=int(maq),
             reset_rng=int(reset_rng), ns_gate=ns_gate, ns_ftab=ns_ftab,
             npremut=len(premuts),
             collect_partials=int(collect_partials))
    for k, (pos, refc) in enumerate(premuts):
        f[f"premut_pos{k}"] = pos
        f[f"premut_refc{k}"] = refc
    for k, v in f.items():
        jobs[k][b, j] = v


def build_v_jobs(reads, v: int, nofw: bool, norc: bool, L: int, fc: int):
    """Job sequences for -v 1/2/3: mismatchSearchWorkerFull +
    search_1mm_phase1/2.c and twoOrThreeMismatchSearchWorkerFull +
    search_23mm_phase1/2/3.c (ebwt_search.cpp:1509-1744,2055-2341)."""
    B = len(reads)
    J = 7
    jobs = empty_jobs(B, J, L)
    for b, read in enumerate(reads):
        s = len(read.seq)
        s3 = s >> 1
        s5 = s3 + (s & 1)
        j = 0
        if v == 1:
            seq = []
            if not nofw:
                seq.append(dict(fw=True, ebwt_fw=True,
                                offs=(0, 0, s, s, s, s)))
            if not norc:
                seq.append(dict(fw=False, ebwt_fw=True,
                                offs=(0, 0, s, s, s, s)))
            if not norc:
                seq.append(dict(fw=False, ebwt_fw=True,
                                offs=(0, 0, s5, s, s, s),
                                report_exacts=False))
            if not nofw:
                seq.append(dict(fw=True, ebwt_fw=True,
                                offs=(0, 0, s5, s, s, s),
                                report_exacts=False))
            if not norc:
                seq.append(dict(fw=False, ebwt_fw=False,
                                offs=(0, 0, s3, s, s, s),
                                report_exacts=False))
            if not nofw:
                seq.append(dict(fw=True, ebwt_fw=False,
                                offs=(0, 0, s3, s, s, s),
                                report_exacts=False))
        else:
            two = v == 2
            m2 = s if two else s5
            m3 = s if two else s3
            seq = []
            if not nofw:
                seq.append(dict(fw=True, ebwt_fw=True,
                                offs=(0, 0, s, s, s, s)))
            if not norc:
                seq.append(dict(fw=False, ebwt_fw=True,
                                offs=(0, 0, s5, s5, m2, s)))
            if not nofw:
                seq.append(dict(fw=True, ebwt_fw=False,
                                offs=(0, 0, s5, s5, m2, s),
                                report_exacts=False))
            if not norc:
                seq.append(dict(fw=False, ebwt_fw=False,
                                offs=(0, 0, s3, s3, m3, s),
                                report_exacts=False))
            if not nofw:
                seq.append(dict(fw=True, ebwt_fw=True,
                                offs=(0, 0, s3, s3, m3, s),
                                report_exacts=False))
            if not nofw:
                seq.append(dict(fw=True, ebwt_fw=True, half_and_half=True,
                                offs=(s3, s, 0, s3 if two else 0,
                                      s if two else s3, s)))
            if not norc:
                seq.append(dict(fw=False, ebwt_fw=True,
                                half_and_half=True,
                                offs=(s5, s, 0, s5 if two else 0,
                                      s if two else s5, s)))
        for spec in seq:
            fill_job(jobs, b, j, read, fc=fc, **spec)
            j += 1
    return jobs, J


def _bucket(n: int, buckets=(256, 1024, 4096, 8192, 12288,
                             16384)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return -(-n // buckets[-1]) * buckets[-1]


def _len_bucket(n: int, buckets=(40, 64, 128, 256, 512, 1024,
                                 2048, 4096)) -> int:
    """Length bucket for kernel shapes.  The reference caps reported
    mismatch masks at 1024 positions (hit.h:66) but still processes
    longer reads; so do we."""
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"read length {n} unsupported")


class DeviceDFSAligner:
    """-v 1/2/3 aligner running the lockstep DFS on device, with
    per-read host-oracle fallback on any resource overflow (the fresh
    per-read RNG makes the re-run bit-identical)."""

    # above this genome length the dense layout (36 B/row of HBM) no
    # longer fits comfortably; switch to checkpoints + walk-left
    DENSE_LIMIT = 1 << 28

    def __init__(self, idx_fw: EbwtIndex, idx_bw: EbwtIndex, policy,
                 v: int = 1, nofw: bool = False, norc: bool = False,
                 global_seed: int = 0, max_steps: int = 20000,
                 compact: bool | None = None):
        import os
        self.idx_fw, self.idx_bw = idx_fw, idx_bw
        if compact is None:
            compact = (idx_fw.length > self.DENSE_LIMIT or
                       bool(os.environ.get("BOWTIE_TPU_COMPACT")))
        # hybrid default: checkpoint-row + popcount rank beats the
        # full per-row rank-table gather on TPU (171 vs 391 µs/step at
        # B=16k — the checkpoint table is ~36x smaller, so its gathers
        # hit much faster memory; scripts/microbench_ops.py), while
        # the dense SA (one gather per report) stays whenever it fits
        self.cat = build_fmcat(idx_fw, idx_bw, occ_every=128,
                               dense_sa=not compact)
        self.policy = policy
        self.v = v
        self.nofw, self.norc = nofw, norc
        self.global_seed = global_seed
        self.max_steps = max_steps
        self.nfrag = int(idx_fw.nfrag)
        self._oracle = None
        self.fallbacks = 0

    def _oracle_aligner(self):
        if self._oracle is None:
            from .drivers import OracleAligner
            from .golden import GoldenFM
            self._oracle = OracleAligner(
                GoldenFM(self.idx_fw), GoldenFM(self.idx_bw), self.policy,
                v=self.v, nofw=self.nofw, norc=self.norc,
                global_seed=self.global_seed)
        return self._oracle

    def build_jobs(self, reads, L, fc):
        from .dfs_jobs import build_v_jobs_vec
        return build_v_jobs_vec(reads, self.v, self.nofw, self.norc, L,
                                fc)

    def _exact_aligner(self):
        if getattr(self, "_exact", None) is None:
            from .pipeline import ExactAligner
            from ..index.arrays import from_ebwt
            fm = from_ebwt(self.idx_fw, occ_every=128,
                           dense_sa=self.cat.dense)
            self._exact = ExactAligner(fm, self.idx_fw, self.policy,
                                       nofw=self.nofw, norc=self.norc,
                                       global_seed=self.global_seed)
        return self._exact

    def _exact_gate(self, reads, slow_path):
        """Exact-hit fast path for the default first-1-good policy.

        Every mode's phase 1 runs the whole-read-exact jobs first —
        fw exact then rc (search_1mm_phase1.c:17-38; the rc/second
        jobs of search_23mm_phase1.c:24-45 and
        search_seeded_phase1.c:47-75 allow mismatches but the greedy
        DFS descends the no-edit path first) — and every job re-seeds
        the per-read LCG at setQuery (ebwt_search_backtrack.h:137).
        So under -k 1 without -a/-m/-M a read with an exact hit
        reports the IDENTICAL line in -v 0 and in -v 1/2 / -n modes
        (verified: all 347 exactly-alignable e_coli_1000 reads have
        byte-identical -v 0 / -v 1 / -n 2 output).  Such reads take
        the ~1M reads/s exact kernel; only the rest enter the DFS
        machine."""
        if (self.policy.n != 1 or self.policy.max < INF32
                or self.policy.sample_max):
            return slow_path(reads)
        import os
        import sys
        import time
        prof = bool(os.environ.get("BOWTIE_TPU_PROF"))
        t0 = time.time()
        ex_res = self._exact_aligner().align_batch(reads)
        rest = [i for i, r in enumerate(ex_res) if not r.hits]
        if prof:
            print(f"[prof gate] exact gate: B={len(reads)} "
                  f"rest={len(rest)} t={time.time() - t0:.3f}s",
                  file=sys.stderr, flush=True)
        if rest:
            for i, r in zip(rest, slow_path([reads[i] for i in rest])):
                ex_res[i] = r
        return ex_res

    def align_batch(self, reads) -> list:
        if not reads:
            return []
        return self._exact_gate(reads, self._align_batch_dfs)

    def _align_batch_dfs(self, reads) -> list:
        B = len(reads)
        Bp = _bucket(B)
        L = _len_bucket(max(len(r.seq) for r in reads))
        jobs, J = self.build_jobs(reads, L, self.cat.ftab_chars)
        if Bp > B:   # pad with invalid lanes (valid=0 -> instant DONE)
            for k, v in jobs.items():
                pad = np.zeros((Bp - B,) + v.shape[1:], dtype=v.dtype)
                jobs[k] = np.concatenate([v, pad], axis=0)
        from ..utils.rng import fill_seed_caches
        seeds = np.zeros(Bp, dtype=np.uint32)
        seeds[:len(reads)] = fill_seed_caches(reads, self.global_seed)
        jobs_dev = upload_jobs(jobs, J, L, self.cat.ftab_chars)
        n_k = self.policy.n if self.policy.n < INF32 else INF32
        m_max = self.policy.max if self.policy.max < INF32 else INF32
        out = run_compacting(
            self.cat, jobs_dev, np.asarray(seeds),
            np.zeros(Bp, np.int32), J=J, L=L, nfrag=self.nfrag,
            n_k=n_k, m_max=m_max, max_steps=self.max_steps,
            parts=False)
        return self.assemble(reads, out, seeds)

    def assemble(self, reads, out, seeds) -> list:
        # fully vectorized record decode: gather every hit row at once
        # and convert each column to a python list in one pass — the
        # per-read slice/tolist version cost ~24 us/read of host time,
        # which capped the -v engines' end-to-end rate
        count_l = np.asarray(out["count"]).tolist()
        ovf = np.asarray(out["overflow"])
        seeds_l = np.asarray(seeds).tolist()
        bounds_l, mk = decode_hit_cols(out, len(reads), ovf)
        results = []
        finish = self.policy.finish
        for b, read in enumerate(reads):
            if ovf[b]:
                self.fallbacks += 1
                results.append(self._oracle_aligner().align_read(read))
                continue
            results.append(finish(
                [mk(read, j) for j in range(bounds_l[b],
                                            bounds_l[b + 1])],
                count_l[b], seeds_l[b]))
        return results


# ---------------------------------------------------------------------------
# Chunked execution with lane compaction
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("J", "L", "nfrag", "n_k", "m_max",
                                   "chunk"))
def run_chunk(cat: FMCat, jobs, st, *, J: int, L: int, nfrag: int,
              n_k: int, m_max: int, chunk: int):
    """Advance the machine by up to `chunk` micro-steps."""
    def cond(c):
        s, it = c
        return (it < chunk) & jnp.any(s["mode"] != M_DONE)

    def body(c):
        s, it = c
        return _machine_step(s, cat, jobs, J, L, nfrag, n_k, m_max), \
            it + 1

    st, it = jax.lax.while_loop(cond, body, (st, jnp.int32(0)))
    return st, it


@jax.jit
def _compact(st, jobs, idxs, pad):
    """Gather live lanes into a smaller bucket.  idxs: [newB] lane ids
    (pads repeat a live lane); pad: [newB] bool marks pad lanes, which
    are forced DONE so they do no work and report nothing."""
    B_old = st["mode"].shape[0]

    def take(v):
        if v.ndim >= 2 and v.shape[0] == B_old * S_MAX:   # stacked rows
            return v.reshape(B_old, S_MAX, *v.shape[1:])[idxs].reshape(
                idxs.shape[0] * S_MAX, *v.shape[1:])
        return v[idxs]

    st2 = {k: take(v) for k, v in st.items()}
    st2["mode"] = jnp.where(pad, M_DONE, st2["mode"])
    st2["result"] = jnp.where(pad, 0, st2["result"])
    st2["overflow"] = jnp.where(pad, False, st2["overflow"])
    st2["nhits"] = jnp.where(pad, 0, st2["nhits"])
    st2["npart"] = jnp.where(pad, 0, st2["npart"])
    jobs2 = {k: v[idxs] for k, v in jobs.items()}
    return st2, jobs2


@jax.jit
def _harvest_small(st, idxs):
    """Per-lane scalars of the given lanes, stacked into ONE array so
    the slow tunnel pays a single round trip instead of six."""
    ks = ("result", "overflow", "count", "nhits", "npart", "rng")
    return jnp.stack([st[k][idxs].astype(jnp.int32) for k in ks])


_HARVEST_KEYS = ("result", "overflow", "count", "nhits", "npart",
                 "rng")


def _unpack_small(packed):
    arr = np.asarray(packed)
    out = {k: arr[i] for i, k in enumerate(_HARVEST_KEYS)}
    out["overflow"] = out["overflow"].astype(bool)
    out["rng"] = out["rng"].astype(np.uint32)
    return out


@jax.jit
def _gather_rows(arr, lanes, slots):
    """Row gather that accepts both [B, S, W] pools and flat [B, S*W]
    pools (hits): returns [n, W]."""
    if arr.ndim == 2:
        W = 8 + 2 * MM_SLOTS
        return arr[lanes[:, None],
                   (slots * W)[:, None]
                   + jnp.arange(W, dtype=slots.dtype)]
    return arr[lanes, slots]


def _pad_pow2(a, fill=0, lo=64):
    n = max(lo, 1 << int(np.ceil(np.log2(max(1, len(a))))))
    if len(a) == n:
        return a
    return np.concatenate([a, np.full(n - len(a), fill, a.dtype)])


def _harvest(st, idxs):
    """Download the outputs of the given lanes, dense-packing the hit
    and partial buffers first: [total, fields] instead of
    [B, H_MAX/P_MAX, fields] — an order of magnitude less transfer on
    slow device links."""
    import jax.numpy as jnp
    dev_idx = jnp.asarray(idxs)
    out = _unpack_small(_harvest_small(st, dev_idx))
    n = len(idxs)

    def pack(counts, arr, width_shape):
        total = int(counts.sum())
        full = np.zeros((n,) + width_shape, np.int32)
        if total:
            lanes_rel = np.repeat(np.arange(n), counts)
            slots = np.concatenate([np.arange(c) for c in counts])
            la = _pad_pow2(idxs[lanes_rel].astype(np.int64))
            sl = _pad_pow2(slots.astype(np.int64))
            packed = np.asarray(_gather_rows(arr, jnp.asarray(la),
                                             jnp.asarray(sl)))[:total]
            full[lanes_rel, slots] = packed
        return full

    out["hits"] = pack(out["nhits"], st["hits"], (H_MAX,
                                                  8 + 2 * MM_SLOTS))
    # one fused gather+transfer for the four partial pools: [P_MAX, 8]
    fused = pack(out["npart"], _fuse_parts(st), (P_MAX, 8))
    out["part_n"] = fused[:, :, 0]
    out["part_job"] = fused[:, :, 1]
    out["part_pos"] = fused[:, :, 2:5]
    out["part_refc"] = fused[:, :, 5:8]
    return out


@jax.jit
def _fuse_parts_jit(pn, pj, pp, pr):
    B = pn.shape[0]
    return jnp.concatenate(
        [pn[..., None], pj[..., None],
         pp.reshape(B, P_MAX, 3), pr.reshape(B, P_MAX, 3)], axis=-1)


def _fuse_parts(st):
    """[B, P_MAX, 8] device view of the four partial pools."""
    return _fuse_parts_jit(st["part_n"], st["part_job"],
                           st["part_pos"], st["part_refc"])


_POLL_KEYS = ("mode", "result", "overflow", "count", "nhits", "npart",
              "rng")


@jax.jit
def _poll_all(st):
    """Mode + every per-lane scalar in ONE [7, B] transfer: each
    device->host round trip costs ~0.2 s over the remote tunnel, so
    the chunk poll must also carry everything the final harvest
    needs."""
    return jnp.stack([st[k].astype(jnp.int32) for k in _POLL_KEYS])


@jax.jit
def _pack_all(st, la_h, sl_h, la_p, sl_p):
    """Hit rows + fused partial rows in ONE gather+transfer."""
    hits = _gather_rows(st["hits"], la_h, sl_h)         # [PH, W]
    parts = _fuse_parts_jit(
        st["part_n"], st["part_job"], st["part_pos"],
        st["part_refc"])[la_p, sl_p]                    # [PP, 8]
    W = hits.shape[-1]
    parts = jnp.pad(parts, ((0, 0), (0, W - 8)))
    return jnp.concatenate([hits, parts], axis=0)


def _harvest_poll(st, poll, idxs):
    """Harvest the given lanes from an existing poll snapshot: one
    fused pack transfer (the scalars ride the poll)."""
    out = {k: poll[i + 1][idxs].copy()
           for i, k in enumerate(_HARVEST_KEYS)}
    out["overflow"] = out["overflow"].astype(bool)
    out["rng"] = out["rng"].astype(np.uint32)
    n = len(idxs)
    W = 8 + 2 * MM_SLOTS

    def pidx(counts):
        lanes_rel = np.repeat(np.arange(n), counts)
        slots = np.concatenate([np.arange(c) for c in counts]) \
            if counts.sum() else np.zeros(0, np.int64)
        return (lanes_rel, slots,
                _pad_pow2(idxs[lanes_rel].astype(np.int64)),
                _pad_pow2(slots.astype(np.int64)))

    lr_h, sl0_h, la_h, sl_h = pidx(out["nhits"])
    lr_p, sl0_p, la_p, sl_p = pidx(out["npart"])
    tot_h, tot_p = len(lr_h), len(lr_p)
    hits = np.zeros((n, H_MAX, W), np.int32)
    parts = np.zeros((n, P_MAX, 8), np.int32)
    if tot_h or tot_p:
        packed = np.asarray(_pack_all(st, jnp.asarray(la_h),
                                      jnp.asarray(sl_h),
                                      jnp.asarray(la_p),
                                      jnp.asarray(sl_p)))
        if tot_h:
            hits[lr_h, sl0_h] = packed[:tot_h]
        if tot_p:
            parts[lr_p, sl0_p] = packed[len(la_h):len(la_h) + tot_p,
                                        :8]
    out["hits"] = hits
    out["part_n"] = parts[:, :, 0]
    out["part_job"] = parts[:, :, 1]
    out["part_pos"] = parts[:, :, 2:5]
    out["part_refc"] = parts[:, :, 5:8]
    return out


@partial(jax.jit, static_argnames=("B", "L"))
def _init_state_jit(seeds, count0, *, B: int, L: int):
    return _init_state(B, L, seeds, count0)


def decode_hit_cols(out, n_reads, ovf):
    """Vectorized decode of a machine-output hits pool: one flat
    gather + per-column tolist, returning (per-read bounds list, and a
    Hit maker mk(read, j)) — shared by the DFS and seeded assemblers
    (per-read numpy slicing costs ~24 us/read)."""
    from .types import Hit
    acgt = (97, 99, 103, 116)
    nhits = np.asarray(out["nhits"])
    hits_np = np.asarray(out["hits"])
    nh_eff = np.where(ovf[:n_reads], 0, nhits[:n_reads])
    lanes = np.repeat(np.arange(n_reads), nh_eff)
    slots = (np.concatenate([np.arange(n) for n in nh_eff])
             if len(lanes) else np.zeros(0, np.int64))
    recs = hits_np[lanes, slots] if len(lanes) else \
        np.zeros((0, hits_np.shape[-1]), np.int32)
    fw_a = (recs[:, 2] & 1).astype(bool)
    efw_a = ((recs[:, 2] >> 1) & 1).astype(bool)
    offp = np.where((efw_a != fw_a)[:, None],
                    recs[:, 7:8] - recs[:, 8:8 + MM_SLOTS] - 1,
                    recs[:, 8:8 + MM_SLOTS])
    refc = recs[:, 8 + MM_SLOTS:8 + 2 * MM_SLOTS]
    cols = (recs[:, 0].tolist(), recs[:, 1].tolist(),
            fw_a.tolist(), recs[:, 3].tolist(),
            recs[:, 4].tolist(), recs[:, 5].tolist(),
            recs[:, 6].tolist(), offp.tolist(), refc.tolist())
    bounds = np.zeros(n_reads + 1, np.int64)
    np.cumsum(nh_eff, out=bounds[1:])

    def mk(read, j):
        ne = cols[6][j]
        mms = sorted((cols[7][j][k], acgt[cols[8][j][k]])
                     for k in range(ne)) if ne else []
        return Hit(read=read, fw=cols[2][j], tidx=cols[0][j],
                   toff=cols[1][j], oms=cols[3][j], stratum=cols[4][j],
                   cost=cols[5][j], mms=mms)
    return bounds.tolist(), mk


_SLICE_CACHE: dict = {}


def _slice_hits(st, ncols: int):
    """Jitted static [:, :ncols] hits-pool slice (see n_device
    _hits_slice): a data-independent transfer enqueued with the poll."""
    fn = _SLICE_CACHE.get(ncols)
    if fn is None:
        fn = _SLICE_CACHE[ncols] = jax.jit(lambda h: h[:, :ncols])
    return fn(st["hits"])


def run_compacting(cat: FMCat, jobs_dev, seeds, count0, *, J: int,
                   L: int, nfrag: int, n_k: int, m_max: int,
                   max_steps: int, chunk=None,
                   min_bucket: int = 512, st0=None,
                   parts: bool = True):
    """Run the machine in chunks, compacting live lanes into smaller
    buckets as reads finish.  Per-step cost scales with the bucket
    size, so this converts total cost from B * max(lane steps) to
    ~ sum(lane steps) — the straggler-dilution fix for lockstep DFS.

    chunk may be an int or a schedule tuple (the last entry repeats);
    st0 supplies a pre-built device state (seeds/count0 then unused).
    Returns host-side outputs at the ORIGINAL lane indexing."""
    import os
    import sys
    import time
    prof = bool(os.environ.get("BOWTIE_TPU_PROF"))
    if st0 is not None:
        st = st0
        B0 = int(st["mode"].shape[0])
    else:
        B0 = seeds.shape[0]
        # jitted init: ~80 zero-register arrays materialize on device
        # in one dispatch instead of ~80 individual uploads (each
        # tunnel transfer costs ~1 ms of latency)
        st = _init_state_jit(jnp.asarray(seeds), jnp.asarray(count0),
                             B=B0, L=L)
    jobs_d = jobs_dev
    orig = np.arange(B0)
    out = None
    steps = 0
    # chunk schedule: polls cost a tunnel round trip, full-bucket
    # steps cost device time — short early chunks compact the ~50%
    # fast lanes, longer late chunks avoid poll spam on stragglers
    sched = ((chunk,) if isinstance(chunk, int) else chunk) \
        or (768,)
    W = 8 + 2 * MM_SLOTS
    nslots = H_MAX if (n_k == INF32 or m_max != INF32) \
        else min(n_k, H_MAX)
    ci = 0
    while True:
        csteps = sched[min(ci, len(sched) - 1)]
        ci += 1
        t0 = time.time()
        st, _ = run_chunk(cat, jobs_d, st, J=J, L=L, nfrag=nfrag,
                          n_k=n_k, m_max=m_max, chunk=csteps)
        steps += csteps
        poll_dev = _poll_all(st)
        hits_dev = None
        if not parts:
            # policy-bounded static hits slice rides with the poll —
            # the harvest then needs NO further round trips
            hits_dev = _slice_hits(st, nslots * W)
            for x in (poll_dev, hits_dev):
                try:
                    x.copy_to_host_async()
                except Exception:
                    pass
        poll = np.asarray(poll_dev)
        if prof:
            print(f"[prof dfs] round {ci}: B={st['mode'].shape[0]} "
                  f"chunk={csteps} live_after="
                  f"{int((poll[0] != M_DONE).sum())} "
                  f"chunk+poll={time.time() - t0:.3f}s",
                  file=sys.stderr, flush=True)

        def harvest(idxs):
            if parts:
                return _harvest_poll(st, poll, idxs)
            h = {k: poll[i + 1][idxs].copy()
                 for i, k in enumerate(_HARVEST_KEYS)}
            h["overflow"] = h["overflow"].astype(bool)
            h["rng"] = h["rng"].astype(np.uint32)
            n = len(idxs)
            full = np.zeros((n, H_MAX, W), np.int32)
            full[:, :nslots] = np.asarray(hits_dev)[idxs] \
                .reshape(n, nslots, W)
            h["hits"] = full
            z = np.zeros((n, P_MAX), np.int32)
            h["part_n"], h["part_job"] = z, z.copy()
            h["part_pos"] = np.zeros((n, P_MAX, 3), np.int32)
            h["part_refc"] = np.zeros((n, P_MAX, 3), np.int32)
            return h

        mode = poll[0]
        act = np.flatnonzero(mode != M_DONE)
        live = orig >= 0
        if len(act) == 0 or steps >= max_steps:
            sub = np.flatnonzero(live)
            h = harvest(sub)
            if steps >= max_steps and len(act):
                # ran out of budget: flag still-active lanes
                still = np.isin(sub, act)
                h["overflow"] = h["overflow"] | still
            out = _merge_out(out, h, orig[sub], B0)
            return out
        newB = _bucket(len(act), (min_bucket, min_bucket * 4,
                                  min_bucket * 16, min_bucket * 64))
        if newB < mode.shape[0]:
            done_live = np.flatnonzero((mode == M_DONE) & live)
            if len(done_live):
                out = _merge_out(out, harvest(done_live),
                                 orig[done_live], B0)
            pad_n = newB - len(act)
            idxs = np.concatenate([act, np.full(pad_n, act[0],
                                                np.int64)])
            pad = np.zeros(newB, bool)
            pad[len(act):] = True
            st, jobs_d = _compact(st, jobs_d, jnp.asarray(idxs),
                                  jnp.asarray(pad))
            orig = np.concatenate([orig[act], np.full(pad_n, -1)])


def _merge_out(out, h, ids, B0):
    """Place harvested lane rows at their original indices."""
    if out is None:
        out = {k: np.zeros((B0,) + v.shape[1:], v.dtype)
               for k, v in h.items()}
    for k, v in h.items():
        out[k][ids] = v
    return out
