"""Device-resident PairedBWAlignerV1 interleave (aligner.h:1092-1480).

Round 3 recorded the four anchor-driver streams on device but replayed
the interleave — orientation state machine, range chases, reference-
window mate rescue — per pair on the host.  This module executes the
whole replay as a lockstep machine over the recorded streams:

- I_ILV:   one iteration of advanceOrientation's while-loop
           (aligner.h:1190-1326): pop the next range from the side
           with fewer accumulated candidate rows, run the
           delayed-range bookkeeping, schedule chases.
- I_CHASE: resolve the current row of the chased range (dense-SA
           gather or walk-left, reportChaseOne ebwt.h:2727) +
           joinedToTextOff fragment mapping + the rescue-window
           arithmetic of resolveOutstandingInRef (aligner.h:951-1087).
- I_SCAN:  the RefAligner window scan (ref_aligner.h:31,659) over the
           HBM-resident reference: all live lanes score their whole
           window in one [B, NPOS] sweep per query position, then the
           first valid candidate in zig-zag-from-the-middle order wins.

Byte-parity contract: this machine mirrors align/best_paired.py's
generator interleave (the host oracle, itself byte-verified against
the reference binary) decision for decision, including the per-pair
LCG draw per chase and the literal `offs > 3` delay condition.  It
covers the default reporting policy (-k 1, no -m); other policies and
out-of-bounds lanes (reads > Lq, saturating candidate counters) fall
back to the host replay, flagged per lane.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .best_device import H_MAX, MM_SLOTS
from .dfs_device import FMCat, _g1, _rank4, _rng_next, _sel_col

INF32 = np.int32(0x7FFFFFFF)
REC_W = 8 + 2 * MM_SLOTS

I_ILV, I_CHASE, I_SCAN, I_DONE = 0, 1, 2, 3

# offs counters saturate here; a lane that reaches the ceiling would
# risk diverging from the host's unbounded-int comparisons, so it
# escalates to the host replay instead
OFFS_SAT = 1 << 29


def _w(st, name, mask, val):
    st[name] = jnp.where(mask, val, st[name])
    return st


@dataclass(frozen=True)
class IlvStatic:
    """Compile-time configuration of one interleave run."""
    Lq: int              # outstanding-query pad length
    SPAN: int            # scan window gather width
    nfrag: int
    nd: int              # drivers per strand machine (efw table width)
    dense: bool
    v: int               # -1 for seeded (-n) scoring
    seed_mms: int
    seed_len: int
    qual_max: int
    attempt_lim: int     # --pairtries
    sym_ceiling: int
    dont_reconcile: bool
    # slot roles per phase: fw phase L/R, rc phase L/R
    slot_l0: int
    slot_r0: int
    slot_l1: int
    slot_r1: int
    max_steps: int


def _slot_lr(S: IlvStatic, phase):
    ls = jnp.where(phase == 0, S.slot_l0, S.slot_l1)
    rs = jnp.where(phase == 0, S.slot_r0, S.slot_r1)
    return ls, rs


def _combo(S: IlvStatic, phase, anchor_is_left):
    """Index into the per-lane outstanding-query tables.

    Combos: 0=(mate1,fw1) 1=(mate1,!fw1) 2=(mate2,fw2) 3=(mate2,!fw2).
    fw phase: L anchor -> mate2@fw2 (2); R anchor -> mate1@fw1 (0).
    rc phase: L anchor -> mate1@!fw1 (1); R anchor -> mate2@!fw2 (3).
    """
    return jnp.where(phase == 0,
                     jnp.where(anchor_is_left, 2, 0),
                     jnp.where(anchor_is_left, 1, 3))


def _rec_field(hits, slot, idx, field):
    """hits: [B, 4*H_MAX*REC_W] flattened recorded streams."""
    off = (slot * H_MAX + idx) * REC_W + field
    return jnp.take_along_axis(hits, off[:, None], axis=1)[:, 0]


def _sched_chase(st, m, slot, idx, side):
    """Enter chase of rec (slot, idx): per-chase LCG draw for the
    random start row (aligner.h chase entry; chase_and_rescue)."""
    top = _rec_field(st["hits"], slot, idx, 1)
    bot = _rec_field(st["hits"], slot, idx, 2)
    spread = jnp.maximum(bot - top, 1)
    rng, v = _rng_next(st["rng"])
    st["rng"] = jnp.where(m, rng, st["rng"])
    r0 = top + (v % spread.astype(jnp.uint32)).astype(jnp.int32)
    st = _w(st, "ch_slot", m, slot)
    st = _w(st, "ch_idx", m, idx)
    st = _w(st, "ch_top", m, top)
    st = _w(st, "ch_bot", m, bot)
    st = _w(st, "ch_r", m, r0)
    st = _w(st, "ch_k", m, 0)
    st = _w(st, "ch_side", m, side)
    st = _w(st, "r_walk", m, 0)
    st["mode"] = jnp.where(m, I_CHASE, st["mode"])
    return st


def _phase_advance(st, m):
    """End of one orientation (return from _run_orientation): advance
    fw-pair -> rc-pair -> done-without-pair."""
    nxt = st["phase"] + 1
    over = m & (nxt >= 2)
    go = m & ~over
    st = _w(st, "phase", go, nxt)
    for k in ("offs_l", "offs_r", "del_l", "del_r", "attempts",
              "p_valid"):
        st = _w(st, k, go, 0)
    st["mode"] = jnp.where(go, I_ILV, st["mode"])
    st["mode"] = jnp.where(over, I_DONE, st["mode"])
    return st


def _chase_done_no_hit(st, m):
    """chase_and_rescue returned False: run the pending second chase
    if one is queued, else back to the interleave loop."""
    pend = m & (st["p_valid"] > 0)
    back = m & ~pend
    st["mode"] = jnp.where(back, I_ILV, st["mode"])
    st = _w(st, "p_valid", pend, 0)
    st = _sched_chase(st, pend, st["p_slot"], st["p_idx"], st["p_side"])
    return st


def _step_ilv(st, S: IlvStatic):
    """One iteration of advanceOrientation's while-loop
    (aligner.h:1190-1326), both sides folded into one generic flow."""
    m = st["mode"] == I_ILV
    phase = st["phase"]
    ls, rs = _slot_lr(S, phase)
    sd = st["sdone"]
    ldone = _sel_col(sd, ls) > 0
    rdone = _sel_col(sd, rs) > 0
    offsL, offsR = st["offs_l"], st["offs_r"]

    condA = ((offsL < offsR) | rdone) & ~ldone
    condB = ~condA & ~rdone
    condC = ~condA & ~condB
    retA = condA & rdone & (offsR == 0)
    retB = condB & ldone & (offsL == 0)
    ret = m & (retA | retB | condC)
    st = _phase_advance(st, ret)
    m = m & ~ret

    # generic "my side" registers
    myL = condA
    aslot = jnp.where(myL, ls, rs)
    my_offs = jnp.where(myL, offsL, offsR)
    ot_offs = jnp.where(myL, offsR, offsL)
    my_del = jnp.where(myL, st["del_l"], st["del_r"])
    ot_del = jnp.where(myL, st["del_r"], st["del_l"])
    ot_dslot = jnp.where(myL, st["dr_slot"], st["dl_slot"])
    ot_didx = jnp.where(myL, st["dr_idx"], st["dl_idx"])

    cur = _sel_col(st["cur"], aslot)
    n_s = _sel_col(st["nrec"], aslot)
    cap_s = _sel_col(st["capped"], aslot) > 0
    canpop = cur < n_s

    esc = m & ~canpop & cap_s
    st = _w(st, "escalate", esc, 1)
    st["mode"] = jnp.where(esc, I_DONE, st["mode"])

    nodata = m & ~canpop & ~cap_s          # driver exhausted: done
    pop = m & canpop
    setd = nodata
    # pop the rec; ReplayDriver done semantics (pe_device.py:134-152)
    top = _rec_field(st["hits"], aslot, cur, 1)
    bot = _rec_field(st["hits"], aslot, cur, 2)
    done_col = _rec_field(st["hits"], aslot, cur, 6)
    newdone = (done_col == 1) | ((cur + 1 >= n_s) & ~cap_s)
    setd = setd | (pop & newdone)
    oh = jax.lax.broadcasted_iota(jnp.int32, st["sdone"].shape, 1) == \
        aslot[:, None]
    st["sdone"] = jnp.where(oh & setd[:, None], 1, st["sdone"])
    st["cur"] = jnp.where(oh & pop[:, None], st["cur"] + 1, st["cur"])

    spread = bot - top
    my_offs2 = jnp.minimum(my_offs + jnp.maximum(spread, 0), OFFS_SAT)
    sat = pop & (my_offs2 >= OFFS_SAT)
    st = _w(st, "escalate", sat, 1)
    st["mode"] = jnp.where(sat, I_DONE, st["mode"])
    pop = pop & ~sat

    if S.dont_reconcile:
        delay_cond = (ot_offs == 0) & (my_offs2 > 3)
    else:
        delay_cond = ot_offs == 0
    dly = pop & delay_cond
    go = pop & ~delay_cond
    sym = go & (my_offs2 > S.sym_ceiling) & (ot_offs > S.sym_ceiling)
    st = _phase_advance(st, sym)
    go = go & ~sym
    sw = go & (ot_del > 0) & (ot_offs < my_offs2)
    nr = go & ~sw

    # write back offs
    st = _w(st, "offs_l", pop | sat, jnp.where(myL, my_offs2, offsL))
    st = _w(st, "offs_r", pop | sat, jnp.where(myL, offsR, my_offs2))

    # delayed bookkeeping.  dly: my side delays this rec.
    my_side_is_l = myL
    dl_set = dly & my_side_is_l
    dr_set = dly & ~my_side_is_l
    st = _w(st, "del_l", dl_set, 1)
    st = _w(st, "dl_slot", dl_set, aslot)
    st = _w(st, "dl_idx", dl_set, cur)
    st = _w(st, "del_r", dr_set, 1)
    st = _w(st, "dr_slot", dr_set, aslot)
    st = _w(st, "dr_idx", dr_set, cur)

    # sw: chase other's delayed range first, then this rec (pend);
    # both delayed flags end cleared (aligner.h swap case).
    # nr: chase this rec; pend = other's delayed range if set
    clear_ot = nr & (ot_del > 0)
    st = _w(st, "del_l", sw | (clear_ot & ~my_side_is_l), 0)
    st = _w(st, "del_r", sw | (clear_ot & my_side_is_l), 0)

    my_sidecode = jnp.where(my_side_is_l, 1, 0)
    ot_sidecode = 1 - my_sidecode
    st = _w(st, "p_valid", sw | clear_ot, 1)
    st = _w(st, "p_slot", sw, aslot)
    st = _w(st, "p_idx", sw, cur)
    st = _w(st, "p_side", sw, my_sidecode)
    st = _w(st, "p_slot", clear_ot, ot_dslot)
    st = _w(st, "p_idx", clear_ot, ot_didx)
    st = _w(st, "p_side", clear_ot, ot_sidecode)

    ch1_slot = jnp.where(sw, ot_dslot, aslot)
    ch1_idx = jnp.where(sw, ot_didx, cur)
    ch1_side = jnp.where(sw, ot_sidecode, my_sidecode)
    st = _sched_chase(st, sw | nr, ch1_slot, ch1_idx, ch1_side)
    return st


def _step_chase(st, cat: FMCat, S: IlvStatic):
    """Resolve the current row + rescue-window arithmetic
    (reportChaseOne ebwt.h:2727; resolveOutstandingInRef
    aligner.h:951-1087)."""
    m = st["mode"] == I_CHASE
    slot = st["ch_slot"]
    drv = _rec_field(st["hits"], slot, st["ch_idx"], 0)
    anchor_is_left = st["ch_side"] > 0
    combo = _combo(S, st["phase"], anchor_is_left)
    # chase resolution uses the ANCHOR read's length
    # (chase_and_rescue: qlen = qlenL/qlenR of the anchor side)
    aqlen = _sel_col(st["alen_c"], combo)
    efw = _g1(st["efw_tab"], jnp.where(m, slot * S.nd + drv, 0))
    sa_base = jnp.where(efw > 0, cat.sa_base[0], cat.sa_base[1])
    occ_base = jnp.where(efw > 0, cat.occ_base[0], cat.occ_base[1])
    blk_base = jnp.where(efw > 0, cat.blk_base[0], cat.blk_base[1])
    zoff = jnp.where(efw > 0, cat.zoff[0], cat.zoff[1])
    spread = st["ch_bot"] - st["ch_top"]
    ri = st["ch_r"] + st["ch_k"]
    ri = jnp.where(ri >= st["ch_bot"], ri - spread, ri)
    ri_safe = jnp.where(m, ri, 0)
    if cat.dense:
        off = _g1(cat.sa, ri_safe + sa_base)
    else:
        start = m & (st["r_walk"] == 0)
        row = jnp.where(start, ri_safe, st["r_row"])
        jumps = jnp.where(start, 0, st["r_jumps"])
        omask = (1 << cat.off_rate) - 1
        at_z = row == zoff
        marked = ((row & omask) == 0) | at_z
        resolved = m & marked
        off = jnp.where(
            at_z, jumps,
            _g1(cat.sa, jnp.where(m, row >> cat.off_rate, 0) + sa_base)
            + jumps)
        walkers = m & ~marked
        widx = jnp.where(walkers, (row >> 4) +
                         blk_base * (cat.occ_every // 16), 0)
        word = _sel_col(cat.bwt[widx >> 7], widx & 127)
        sh = (2 * (row & 15)).astype(jnp.uint32)
        ch = ((word >> sh) & 3).astype(jnp.int32)
        r4 = _rank4(cat, occ_base, zoff, jnp.where(walkers, row, 0),
                    blk_base)
        lf = _sel_col(cat.fchr[:4] + r4, ch)
        st["r_row"] = jnp.where(walkers, lf, row)
        st["r_jumps"] = jnp.where(walkers, jumps + 1, jumps)
        st["r_walk"] = jnp.where(m, jnp.where(resolved, 0, 1),
                                 st["r_walk"])
        m = resolved

    # joinedToTextOff (ebwt.h:2569-2629)
    if S.nfrag == 1:
        start_f = jnp.zeros_like(off)
        upper = jnp.broadcast_to(cat.length, off.shape)
        tidx = jnp.zeros_like(off)
        toff0 = jnp.zeros_like(off)
    else:
        elt = jnp.searchsorted(cat.rstarts_start, off, side="right") \
            .astype(jnp.int32) - 1
        start_f = _g1(cat.rstarts_start, elt)
        upper = jnp.where(elt + 1 < S.nfrag,
                          _g1(cat.rstarts_start,
                              jnp.minimum(elt + 1, S.nfrag - 1)),
                          cat.length)
        tidx = _g1(cat.rstarts_tidx, elt)
        toff0 = _g1(cat.rstarts_toff, elt)
    valid = off + aqlen <= upper
    fragoff = off - start_f
    fraglen = upper - start_f
    fragoff = jnp.where(efw == 0, fraglen - fragoff - 1 - (aqlen - 1),
                        fragoff)
    toff = fragoff + toff0

    # rescue-window arithmetic for resolved rows
    res = m & valid
    qlen = _sel_col(st["qlen_c"], combo)
    alen = _sel_col(st["alen_c"], combo)
    wok = _sel_col(st["wok_c"], combo) > 0
    qn = _sel_col(st["qn_c"], combo) > 0
    reflen = _g1(st["reflen"], jnp.where(m, tidx, 0))
    minins, maxins = st["minins"], st["maxins"]
    insdiff = maxins - minins
    # match_right == anchor_is_left (aligner.h:1005-1016)
    end_r = toff + maxins
    begin_r = toff + 1 + jnp.where(qlen < alen, alen - qlen, 0)
    begin_r = jnp.where(end_r > insdiff + qlen,
                        jnp.maximum(begin_r, end_r - insdiff - qlen),
                        begin_r)
    end_r = jnp.minimum(reflen, end_r)
    begin_r = jnp.minimum(reflen, begin_r)
    begin_l = jnp.where(toff + alen < maxins, 0, toff + alen - maxins)
    mi = jnp.minimum(alen, qlen)
    end_l = jnp.minimum(toff + mi - 1,
                        toff + alen - minins + qlen - 1)
    end_l = jnp.where(toff + alen + qlen < minins + 1, 0, end_l)
    begin = jnp.where(anchor_is_left, begin_r, begin_l)
    end = jnp.where(anchor_is_left, end_r, end_l)
    win_ok = wok & (end - begin >= qlen) & ~qn

    scan = res & win_ok
    st = _w(st, "sc_tidx", scan, tidx)
    st = _w(st, "sc_toff", scan, toff)
    st = _w(st, "sc_begin", scan, begin)
    st = _w(st, "sc_end", scan, end)
    st = _w(st, "sc_combo", scan, combo)
    st["mode"] = jnp.where(scan, I_SCAN, st["mode"])

    # skipped scans still count an attempt (the interleave increments
    # attempts after every RESOLVED row, aligner.h:1129-1135, even
    # when resolveOutstandingInRef rejects the window early)
    skip = res & ~win_ok
    st = _advance_attempt_and_row(st, skip, S, spread)
    # fragment-spanning rows advance without an attempt
    st = _advance_row(st, m & ~valid, S, spread)
    return st


def _advance_attempt_and_row(st, m, S: IlvStatic, spread):
    at = st["attempts"] + 1
    st = _w(st, "attempts", m, at)
    exceeded = m & (at > S.attempt_lim)
    st = _w(st, "p_valid", exceeded, 0)
    st = _phase_advance(st, exceeded)
    return _advance_row(st, m & ~exceeded, S, spread)


def _advance_row(st, m, S: IlvStatic, spread):
    nk = st["ch_k"] + 1
    st = _w(st, "ch_k", m, nk)
    st = _w(st, "r_walk", m, 0)
    over = m & (nk >= spread)
    # continuing lanes resolve the next row (a scan-mode caller must
    # flip back, or it would re-score the stale window)
    st["mode"] = jnp.where(m & ~over, I_CHASE, st["mode"])
    st = _chase_done_no_hit(st, over)
    return st


def _step_scan(st, S: IlvStatic):
    """RefAligner::find as one lockstep window sweep
    (ref_aligner.h:31; zig-zag order :204-212; the 64-bit anchor loop
    :659 becomes a [B, NPOS] vector compare per query position)."""
    m = st["mode"] == I_SCAN
    B = m.shape[0]
    combo = st["sc_combo"]
    qlen = _sel_col(st["qlen_c"], combo)
    sol = _sel_col(st["sol_c"], combo) > 0        # = outstanding fw
    begin, end = st["sc_begin"], st["sc_end"]
    tidx = jnp.where(m, st["sc_tidx"], 0)
    reflen = _g1(st["reflen"], tidx)
    qbegin = jnp.where(sol, begin, begin + qlen)
    qend = jnp.where(sol, end - qlen, end)
    lim = qend - qbegin
    halfway = qbegin + (lim >> 1)
    lo_zz = halfway - ((lim + 1) >> 1)
    lo_w = jnp.maximum(jnp.where(sol, lo_zz, lo_zz - qlen), 0)

    NPOS = S.SPAN - S.Lq
    ref_cat, ref_base = st["_refcat"], st["_refbase"]
    gidx = _g1(ref_base, tidx)[:, None] + lo_w[:, None] + \
        jnp.arange(S.SPAN, dtype=jnp.int32)[None, :]
    gidx = jnp.clip(gidx, 0, ref_cat.shape[0] - 1)
    win = jnp.where(m[:, None], ref_cat[gidx], 0)     # [B, SPAN] uint8

    # select the outstanding query/penalty rows for this combo
    q = jnp.take_along_axis(st["q_c"], combo[:, None, None],
                            axis=1)[:, 0]             # [B, Lq] int8
    pens = jnp.take_along_axis(st["pen_c"], combo[:, None, None],
                               axis=1)[:, 0]          # [B, Lq] int32

    slen = jnp.minimum(S.seed_len, qlen) if S.v < 0 else qlen
    mmc = jnp.zeros((B, NPOS), jnp.int32)
    seed_mm = jnp.zeros((B, NPOS), jnp.int32)
    ham = jnp.zeros((B, NPOS), jnp.int32)
    has_n = jnp.zeros((B, NPOS), bool)

    def body(j, carry):
        mmc, seed_mm, ham, has_n = carry
        wj = jax.lax.dynamic_slice(win, (0, j), (B, NPOS))
        qj = jax.lax.dynamic_slice(q, (0, j), (B, 1))
        pj = jax.lax.dynamic_slice(pens, (0, j), (B, 1))
        act = j < qlen                                # [B]
        neq = (wj != qj) & act[:, None]
        has_n = has_n | ((wj > 3) & act[:, None])
        mmc = mmc + neq
        if S.v < 0:
            in_seed = jnp.where(sol, j < slen, j >= qlen - slen)
            seed_mm = seed_mm + (neq & in_seed[:, None])
            ham = ham + jnp.where(neq, pj, 0)
        return mmc, seed_mm, ham, has_n

    mmc, seed_mm, ham, has_n = jax.lax.fori_loop(
        0, S.Lq, body, (mmc, seed_mm, ham, has_n))

    if S.v >= 0:
        ok = mmc <= S.v
        strat = mmc
        ham = jnp.zeros_like(ham)
    else:
        ok = (seed_mm <= S.seed_mms) & (ham <= S.qual_max)
        strat = seed_mm
    ok = ok & ~has_n

    # geometric validity + zig-zag rank (ref_aligner.h:204-212)
    o = jnp.arange(NPOS, dtype=jnp.int32)[None, :]
    left = lo_w[:, None] + o
    ri = jnp.where(sol[:, None], left, left + qlen[:, None])
    hw = halfway[:, None]
    rank = jnp.where(ri >= hw, 2 * (ri - hw), 2 * (hw - ri) + 1)
    inb = (left >= 0) & (left + qlen[:, None] <= reflen[:, None]) & \
        (rank <= lim[:, None] + 1) & (ri >= lo_zz[:, None])
    ok = ok & inb
    key = jnp.where(ok, rank, INF32)
    bestk = jnp.min(key, axis=1)
    found = m & (bestk < INF32)
    besto = jnp.argmin(key, axis=1).astype(jnp.int32)
    bleft = lo_w + besto
    bstrat = _sel_col(strat, besto)
    bham = _sel_col(ham, besto)

    # found: the pair reports and the lane is done (-k 1 sink:
    # report_hit x2 -> done, best_paired.py:201-209)
    st = _w(st, "res_found", found, 1)
    st = _w(st, "res_slot", found, st["ch_slot"])
    st = _w(st, "res_idx", found, st["ch_idx"])
    st = _w(st, "res_tidx", found, st["sc_tidx"])
    st = _w(st, "res_toff", found, st["sc_toff"])
    st = _w(st, "res_left", found, bleft)
    st = _w(st, "res_strat", found, bstrat)
    st = _w(st, "res_ham", found, bham)
    st = _w(st, "res_phase", found, st["phase"])
    st = _w(st, "res_side", found, st["ch_side"])
    st["mode"] = jnp.where(found, I_DONE, st["mode"])

    # not found: attempts++ then next row
    nf = m & ~found
    spread = st["ch_bot"] - st["ch_top"]
    st = _advance_attempt_and_row(st, nf, S, spread)
    return st


def _machine_step(st, cat: FMCat, S: IlvStatic):
    st = dict(st)
    cnts = jnp.sum(st["mode"][:, None] ==
                   jnp.arange(I_DONE + 1, dtype=jnp.int32)[None, :],
                   axis=0)

    def gate(mode_c, fn, s):
        return jax.lax.cond(cnts[mode_c] > 0, fn, lambda x: dict(x), s)

    st = gate(I_ILV, lambda s: _step_ilv(s, S), st)
    st = gate(I_CHASE, lambda s: _step_chase(s, cat, S), st)
    st = gate(I_SCAN, lambda s: _step_scan(s, S), st)
    return st


OUT_KEYS = ("res_found", "res_slot", "res_idx", "res_tidx", "res_toff",
            "res_left", "res_strat", "res_ham", "res_phase", "res_side",
            "escalate", "mode")

# lane-constant tables that must be compacted together with the state
_GLOBAL_KEYS = ("efw_tab", "reflen", "_refcat", "_refbase")


@partial(jax.jit, static_argnames=("S", "chunk"))
def run_ilv_chunk(cat: FMCat, st, *, S: IlvStatic, chunk: int):
    def body(_, s):
        return _machine_step(s, cat, S)
    st = jax.lax.fori_loop(0, chunk, body, dict(st))
    return st, jnp.stack([st[k].astype(jnp.int32) for k in OUT_KEYS])


@jax.jit
def _compact_ilv(st, idxs):
    out = {}
    for k, v in st.items():
        out[k] = v if k in _GLOBAL_KEYS else v[idxs]
    return out


def run_ilv(cat: FMCat, st0, *, S: IlvStatic,
            chunk=(8, 8, 16, 32, 64, 128), min_bucket: int = 256):
    """Chunked machine driver with live-lane compaction: most pairs
    decide within a few steps, so the straggler tail (pairs grinding
    toward --pairtries) runs in small buckets instead of dilating the
    whole batch (the run_compacting pattern, best_device.py:2240)."""
    import os
    import sys
    import time
    prof = bool(os.environ.get("BOWTIE_TPU_PROF"))
    B0 = st0["mode"].shape[0]
    orig = np.arange(B0)
    out = {k: np.zeros(B0, np.int32) for k in OUT_KEYS}
    st = st0
    steps = 0
    sched = (chunk,) if isinstance(chunk, int) else tuple(chunk)
    ci = 0
    while True:
        csteps = sched[min(ci, len(sched) - 1)]
        ci += 1
        t0 = time.time()
        st, poll = run_ilv_chunk(cat, st, S=S, chunk=csteps)
        poll = np.asarray(poll)
        steps += csteps
        mode = poll[OUT_KEYS.index("mode")]
        live = orig >= 0
        act = np.flatnonzero((mode != I_DONE) & live)
        if prof:
            print(f"[prof pe-ilv] round {ci}: B={mode.shape[0]} "
                  f"chunk={csteps} live_after={len(act)} "
                  f"t={time.time() - t0:.3f}s",
                  file=sys.stderr, flush=True)
        if len(act) == 0 or steps >= S.max_steps:
            sub = np.flatnonzero(live)
            for i, k in enumerate(OUT_KEYS):
                out[k][orig[sub]] = poll[i][sub]
            if steps >= S.max_steps and len(act):
                out["escalate"][orig[act]] = 1
            out["escalate"] |= (out["mode"] != I_DONE)
            return out, steps
        newB = _bucket_ilv(len(act), min_bucket)
        if newB < mode.shape[0]:
            done_live = np.flatnonzero((mode == I_DONE) & live)
            if len(done_live):
                for i, k in enumerate(OUT_KEYS):
                    out[k][orig[done_live]] = poll[i][done_live]
            pad_n = newB - len(act)
            idxs = np.concatenate([act, np.full(pad_n, act[0],
                                                np.int64)])
            st = _compact_ilv(st, jnp.asarray(idxs))
            if pad_n:
                padm = np.zeros(newB, bool)
                padm[len(act):] = True
                st["mode"] = jnp.where(jnp.asarray(padm), I_DONE,
                                       st["mode"])
            orig = np.concatenate([orig[act], np.full(pad_n, -1)])


def _bucket_ilv(n: int, lo: int):
    b = lo
    while b < n:
        b *= 4
    return b


@partial(jax.jit, static_argnames=("S",))
def init_from_packed(pack_i32, q_c, gconsts, *, S: IlvStatic):
    """Build the full lane-state dict from ONE packed int32 upload +
    one uint8 upload (each host->device transfer over the tunnel costs
    ~0.1 s of latency; init_state's ~40 small arrays cost more than
    the whole interleave machine run).

    pack_i32 layout along axis 1:
      [4*H_MAX*REC_W hits | 4 nrec | 4 capped | 1 seeds | 1 dis |
       4 qlen | 4 alen | 4 qn | 4 sol | 4 wok | 1 minins | 1 maxins |
       4*Lq pen]
    """
    B = pack_i32.shape[0]
    HW = 4 * H_MAX * REC_W
    o = [0]

    def take(n, shape=None):
        a = pack_i32[:, o[0]:o[0] + n]
        o[0] += n
        return a if shape is None else a.reshape((B,) + shape)

    hits = take(HW)
    nrec = take(4)
    capped = take(4)
    seeds = take(1)[:, 0].astype(jnp.uint32)
    dis = take(1)[:, 0] > 0
    qlen_c = take(4)
    alen_c = take(4)
    qn_c = take(4)
    sol_c = take(4)
    wok_c = take(4)
    minins = take(1)[:, 0]
    maxins = take(1)[:, 0]
    pen_c = take(4 * S.Lq, (4, S.Lq))
    consts = dict(q_c=q_c, pen_c=pen_c, qlen_c=qlen_c, alen_c=alen_c,
                  qn_c=qn_c, sol_c=sol_c, wok_c=wok_c, minins=minins,
                  maxins=maxins, **gconsts)
    return init_state(B, hits, nrec, capped, seeds, consts, dis)


def init_state(B, hits_flat, nrec, capped, seeds, consts, dis):
    """Build the initial lane-state dict.  consts: per-lane tables
    (qlen_c, alen_c, wok_c, qn_c, sol_c, q_c, pen_c, minins, maxins,
    efw_tab, reflen, _refcat, _refbase)."""
    z = jnp.zeros(B, jnp.int32)
    st = dict(
        mode=jnp.where(jnp.asarray(dis), I_DONE, I_ILV).astype(jnp.int32),
        phase=z, cur=jnp.zeros((B, 4), jnp.int32),
        sdone=(jnp.asarray(nrec) == 0).astype(jnp.int32),
        offs_l=z, offs_r=z, del_l=z, del_r=z,
        dl_slot=z, dl_idx=z, dr_slot=z, dr_idx=z,
        attempts=z, p_valid=z, p_slot=z, p_idx=z, p_side=z,
        rng=jnp.asarray(seeds, jnp.uint32),
        ch_slot=z, ch_idx=z, ch_top=z, ch_bot=jnp.ones(B, jnp.int32),
        ch_r=z, ch_k=z, ch_side=z, r_walk=z, r_row=z, r_jumps=z,
        sc_tidx=z, sc_toff=z, sc_begin=z, sc_end=z, sc_combo=z,
        res_found=z, res_slot=z, res_idx=z, res_tidx=z, res_toff=z,
        res_left=z, res_strat=z, res_ham=z, res_phase=z, res_side=z,
        escalate=z,
        hits=jnp.asarray(hits_flat), nrec=jnp.asarray(nrec),
        capped=jnp.asarray(capped),
    )
    st.update(consts)
    return st
