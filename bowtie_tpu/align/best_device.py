"""Batched lockstep best-first (branch-and-bound) search on device.

The TPU-native engine for bowtie's --best machinery (--best / -M /
--strata / -v 3): where the host engine (align/best.py) advances one
Branch of one read at a time, this module runs thousands of reads in
lockstep, one `lax.while_loop` whose carry holds every lane's branch
pool, driver states and sink counters.

Faithfulness contract: every state transition mirrors the host engine
(itself validated bit-identical to the reference binary), including
- the Branch/BranchQueue/PathManager order (CostCompare key: cost asc,
  extendable first, deeper tip, smaller id; range_source.h:1103),
- curtail / splitBranch / pick_edit with their RNG draw order
  (range_source.h:644-939),
- CostAwareRangeSourceDriver's selection-sort tie draws and the
  strandFix delayed-range swap (range_source.h:2033-2400),
- the RangeChaser random-start row order (range_chaser.h:22) and
  NBestFirstStrat sink stop/backpressure rules (hit.h:1039,1123).
Lanes that exceed any fixed resource bound (branch slots, edit slots,
hit slots, step budget) raise `overflow` and are re-run on the host
engine from scratch — per-read RNG seeding makes that bit-identical.

State layout (the TPU-critical decision): branch *scalars* live in
[B, NBR] arrays updated with one-hot masked writes (cheap VPU sweeps);
the per-position range data lives in two flat pools —
``ptpb[B*NBR*L, 2]`` holding each consumed position's entry (top, bot)
and ``meta[B*NBR, L]`` holding packed elimination bits + quallo — so
one machine step costs one or two row scatters (~full-pool copy each,
the dominant per-step cost) plus O([B, NBR]) vector work.  A split
recomputes the needed LF quartet from the stored (top, bot) pair
(mapLFEx, ebwt.h:2334) instead of storing 8 ints per position.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .dfs_device import (FMCat, build_fmcat, _bucket, _g1, _len_bucket,
                         _lf4pair, _rank4, _rng_next, _sel_col)
from ..index.ebwt_io import EbwtIndex

INF32 = 0x7FFFFFFF
COST_INF = 0xFFFF          # host engine's 16-bit "no cost" sentinel

# resource bounds (per lane); overflow -> host-engine fallback
NBR = 16                   # branch pool slots
E_MAX = 6                  # edits per branch
H_MAX = 16                 # buffered hit slots
MM_SLOTS = 8               # mismatch slots per stored hit record

# machine modes
(M_DONE, M_MAIN, M_CADV, M_DADV, M_EXT, M_SPP, M_DEND, M_CPOST,
 M_SFX, M_SFXEND, M_SORT, M_CHASE) = range(12)

# meta encoding: bits 0-3 mm_elim (1 = eliminated substitution),
# bit 4 eliminated (whole position), bits 5-11 quallo, bit 12
# "depth-0 quartet came from fchr" flag
META_ELIM = 1 << 4
META_ALL_DEAD = 0xF | META_ELIM | (127 << 5)
META_FCHR = 1 << 12

# pin constants (SearchConstraintExtent)
PIN_BEG, PIN_LEN, PIN_HI, PIN_SEED = 0, 1, 2, 3

_QR = np.zeros(256, dtype=np.int32)     # Maq rounding (qual.cpp:4)
_QR[5:15] = 10
_QR[15:25] = 20
_QR[25:] = 30


@dataclass(frozen=True)
class DriverCfg:
    """Static per-driver config (one BestRangeSource + BestDriver)."""
    ebwt_fw: bool
    fw: bool
    pins: tuple           # 4 PIN_* constants
    report_exacts: bool
    hh: int               # half_and_half (0, 2 or 3)
    nudge_left: bool


def v_mode_configs(v: int, nofw: bool, norc: bool) -> list[DriverCfg]:
    """Driver DAGs of make_best_aligner (aligner_0mm/1mm/23mm.h
    factories; see best_factories.py for the host equivalents)."""
    out = []
    if v == 0:
        P = (PIN_LEN,) * 4
        if not nofw:
            out.append(DriverCfg(True, True, P, True, 0, True))
        if not norc:
            out.append(DriverCfg(True, False, P, True, 0, True))
    elif v == 1:
        P = (PIN_HI, PIN_LEN, PIN_LEN, PIN_LEN)
        if not nofw:
            out.append(DriverCfg(False, True, P, True, 0, False))
            out.append(DriverCfg(True, True, P, False, 0, True))
        if not norc:
            out.append(DriverCfg(True, False, P, True, 0, True))
            out.append(DriverCfg(False, False, P, False, 0, False))
    else:
        two = v == 2
        Pfull = (PIN_HI, PIN_HI, PIN_LEN if two else PIN_HI, PIN_LEN)
        Phalf = (PIN_BEG, PIN_HI, PIN_LEN if two else PIN_HI, PIN_LEN)
        Phalf3 = (PIN_BEG, PIN_HI, PIN_HI, PIN_LEN)
        if not nofw:
            out.append(DriverCfg(False, True, Pfull, True, 0, True))
            out.append(DriverCfg(True, True, Pfull, False, 0, False))
            out.append(DriverCfg(False, True, Phalf, False, 2, True))
            if not two:
                out.append(DriverCfg(True, True, Phalf3, False, 3, False))
        if not norc:
            out.append(DriverCfg(True, False, Pfull, True, 0, True))
            out.append(DriverCfg(False, False, Pfull, False, 0, False))
            out.append(DriverCfg(True, False, Phalf, False, 2, True))
            if not two:
                out.append(DriverCfg(False, False, Phalf3, False, 3,
                                     False))
    return out


def _host_rng_next(state):
    """Vectorized BtRandom.next_u32 on host (random_source.h:36-42)."""
    A, C = np.uint32(1664525), np.uint32(1013904223)
    s1 = (A * state + C).astype(np.uint32)
    ret = s1 >> np.uint32(16)
    s2 = (A * s1 + C).astype(np.uint32)
    return s2, (ret ^ s2).astype(np.uint32)


def cfg_arrays(cfgs: list[DriverCfg]):
    nd = len(cfgs)
    a = dict(
        ebwt_fw=np.array([c.ebwt_fw for c in cfgs], np.int32),
        fw=np.array([c.fw for c in cfgs], np.int32),
        exacts=np.array([c.report_exacts for c in cfgs], np.int32),
        hh=np.array([c.hh for c in cfgs], np.int32),
        nudge=np.array([c.nudge_left for c in cfgs], np.int32),
        pins=np.array([c.pins for c in cfgs], np.int32),  # [ND, 4]
    )
    return nd, a


class HostInit:
    """Vectorized numpy re-expression of set_query over the whole
    batch: per-driver offsets/min-cost adjustments, N tallies, initial
    branches (incl. ftab jump-start and the qlen==fc immediate-range
    case), and the initial sort_actives RNG draws — everything the host
    engine does before its first advance() call."""

    def __init__(self, cfgs, idx_fw, idx_bw, maq: bool,
                 qual_order: bool, qual_lim: int):
        self.cfgs = cfgs
        self.nd, self.cfg = cfg_arrays(cfgs)
        self.maq = maq
        self.qual_order = qual_order
        self.qual_lim = qual_lim
        self.fc = idx_fw.ftab_chars
        fh_fw, fl_fw = idx_fw.ftab_resolved()
        fh_bw, fl_bw = idx_bw.ftab_resolved()
        self.ftab_hi = (fh_fw, fh_bw)     # index by [0]=fw, [1]=mirror
        self.ftab_lo = (fl_fw, fl_bw)

    def build(self, reads, L: int, seeds: np.ndarray):
        B = len(reads)
        nd = self.nd
        cfg = self.cfg
        qlen = np.array([len(r.seq) for r in reads], np.int32)
        codes = np.full((B, L), 4, np.int32)
        qual = np.zeros((B, L), np.int32)
        for b, r in enumerate(reads):
            n = len(r.seq)
            codes[b, :n] = np.asarray(r.codes_fw, np.int32)
            qual[b, :n] = np.frombuffer(bytes(r.qual), np.uint8)[:n] \
                .astype(np.int32) - 33
        pen = _QR[np.clip(qual, 0, 255)] if self.maq else qual.copy()

        st = {}
        st["qlen"] = qlen
        st["codes"] = codes
        st["qual"] = qual
        st["pen"] = pen

        # --- per-driver offsets (initRangeSource) ---------------------
        s = qlen[:, None].repeat(nd, 1)                       # [B, ND]
        odd = (s & 1).astype(np.int32)
        d5 = (s >> 1) + np.where(cfg["nudge"][None, :] > 0, 0, odd)
        d3 = s
        rev = np.zeros((B, nd, 4), np.int32)
        for k in range(4):
            pin = cfg["pins"][:, k][None, :]
            rev[:, :, k] = np.select(
                [pin == PIN_SEED, pin == PIN_HI, pin == PIN_BEG],
                [s, d5, np.zeros_like(s)], default=s)
        st["dd5"], st["dd3"] = d5, d3
        st["drev"] = rev                                      # [B,ND,4]

        # by-depth code/qual per driver orientation:
        # pos(d) = qlen-1-d if ebwt_fw == fw else d; comp iff not fw
        di = np.arange(L)[None, :]
        in_q = di < qlen[:, None]                             # [B, L]
        qd = np.zeros((B, nd, L), np.int32)
        quald = np.zeros((B, nd, L), np.int32)
        for d in range(nd):
            same = self.cfgs[d].ebwt_fw == self.cfgs[d].fw
            pos = np.where(in_q,
                           (qlen[:, None] - 1 - di) if same else di, 0)
            c = np.take_along_axis(codes, pos, 1)
            if not self.cfgs[d].fw:
                c = np.where(c < 4, 3 - c, c)
            qd[:, d] = np.where(in_q, c, 4)
            quald[:, d] = np.where(in_q,
                                   np.take_along_axis(qual, pos, 1), 0)
        pend = _QR[np.clip(quald, 0, 255)] if self.maq else quald

        # --- min_cost_adj ---------------------------------------------
        adj = np.zeros((B, nd), np.int32)
        for d in range(nd):
            c = self.cfgs[d]
            if c.report_exacts:
                continue
            pe = np.where((di >= rev[:, d, 0:1]) & in_q, pend[:, d],
                          INF32)
            if not c.hh:
                v = (1 << 14) + (self.qual_order * pe.min(axis=1))
                adj[:, d] = np.where(rev[:, d, 0] < s[:, d], v, 0)
            else:
                lo1 = np.where((di < d5[:, d:d + 1]) & in_q,
                               pend[:, d], INF32).min(axis=1)
                h2 = np.where((di >= d5[:, d:d + 1]) &
                              (di < s[:, d:d + 1]) & in_q,
                              pend[:, d], INF32)
                h2s = np.sort(h2, axis=1)
                v = np.int32(2 << 14)
                if self.qual_order:
                    v = v + lo1 + h2s[:, 0]
                    if c.hh > 2:
                        v = v + np.where(h2s[:, 1] < INF32, h2s[:, 1], 0)
                ok = (d5[:, d] > 0) & (d5[:, d] < s[:, d] - 1)
                adj[:, d] = np.where(ok, v, 0)
        st["drv_adj"] = adj

        # --- N tallies (_tally_ns) ------------------------------------
        drv_dead = np.zeros((B, nd), bool)
        ns_ftab = np.zeros((B, nd), np.int32)
        for d in range(nd):
            lim = np.minimum(rev[:, d, 3], qlen)
            isn = (qd[:, d] == 4) & (di < lim[:, None])
            csum = np.cumsum(isn, axis=1)
            dead = np.zeros(B, bool)
            for k, col in ((1, 0), (2, 1), (3, 2)):
                at = isn & (csum == k)
                has = at.any(axis=1)
                p = np.argmax(at, axis=1)
                dead |= has & (p < rev[:, d, col])
            dead |= csum[:, -1] > 3
            drv_dead[:, d] = dead
            ns_ftab[:, d] = ((qd[:, d, :self.fc] == 4) &
                             (di[:, :self.fc] < qlen[:, None])) \
                .sum(axis=1)

        # --- init_branch ----------------------------------------------
        fc = self.fc
        p_valid = np.zeros((B, NBR), np.int32)
        p_drv = np.zeros((B, NBR), np.int32)
        p_cost = np.zeros((B, NBR), np.int32)
        p_ham = np.zeros((B, NBR), np.int32)
        p_rdepth = np.zeros((B, NBR), np.int32)
        p_len = np.zeros((B, NBR), np.int32)
        p_top = np.zeros((B, NBR), np.int32)
        p_bot = np.zeros((B, NBR), np.int32)
        p_curt = np.zeros((B, NBR), np.int32)
        p_dly = np.zeros((B, NBR), np.int32)
        p_dlyf = np.zeros((B, NBR), np.int32)
        p_id = np.zeros((B, NBR), np.int32)
        p_ne = np.zeros((B, NBR), np.int32)
        p_d = np.zeros((B, NBR, 4), np.int32)
        drv_done = np.zeros((B, nd), np.int32)
        drv_found = np.zeros((B, nd), np.int32)
        drv_min = np.zeros((B, nd), np.int32)
        pm_min = np.zeros((B, nd), np.int32)
        nextid = np.zeros((B, nd), np.int32)
        rr = np.zeros((B, nd, 5), np.int32)     # top,bot,cost,strat,nmms

        for d in range(nd):
            c = self.cfgs[d]
            off0 = rev[:, d, 0]
            m = np.minimum(off0, qlen)
            ftab_skips = qlen == fc
            skip_inv = (not c.report_exacts) & ftab_skips
            use_ftab = (ns_ftab[:, d] == 0) & (m >= fc) & ~skip_inv
            # calcFtabOff over depths 0..fc-1
            w = 2 * np.arange(fc)[None, :]
            qf = np.where(qd[:, d, :fc] > 3, 0, qd[:, d, :fc])
            foff = (qf << w).sum(axis=1)
            fh = self.ftab_hi[0 if c.ebwt_fw else 1]
            fl = self.ftab_lo[0 if c.ebwt_fw else 1]
            ft = fh[foff].astype(np.int64).astype(np.int32)
            fb = fl[foff + 1].astype(np.int64).astype(np.int32)
            nonempty = fb > ft
            alive = ~drv_dead[:, d] & (qlen >= 4)
            # immediate found range (qlen == fc)
            imm = alive & use_ftab & (qlen == fc) & nonempty
            drv_found[:, d] = imm
            rr[imm, d, 0] = ft[imm]
            rr[imm, d, 1] = fb[imm]
            # pushed branch: ftab-jumped or depth-0
            pushf = alive & use_ftab & (qlen > fc) & nonempty
            push0 = alive & ~use_ftab
            pushed = pushf | push0
            slot = d          # initial branch of driver d -> slot d
            p_valid[pushed, slot] = 1
            p_drv[:, slot] = d
            p_len[pushf, slot] = fc
            p_top[pushf, slot] = ft[pushf]
            p_bot[pushf, slot] = fb[pushf]
            p_d[pushed, slot, :] = rev[pushed, d, :]
            nextid[pushed, d] = 1
            drv_done[:, d] = (~alive | (~pushed & ~imm)).astype(np.int32)
            drv_min[:, d] = adj[:, d]    # max(icost=0, adj)

        # --- initial sort_actives -------------------------------------
        rng_ca = seeds.astype(np.uint32).copy()
        act = np.tile(np.arange(nd, dtype=np.int32), (B, 1))
        act_n = np.full(B, nd, np.int32)
        act, act_n, rng_ca, ca_min = _host_sort_actives(
            act, act_n, drv_done, drv_found, drv_min, rng_ca,
            np.zeros(B, np.int32))

        st.update(
            p_valid=p_valid, p_drv=p_drv, p_cost=p_cost, p_ham=p_ham,
            p_rdepth=p_rdepth, p_len=p_len, p_top=p_top, p_bot=p_bot,
            p_curt=p_curt, p_dly=p_dly, p_dlyf=p_dlyf, p_id=p_id,
            p_ne=p_ne, p_d0=p_d[:, :, 0], p_d1=p_d[:, :, 1],
            p_d2=p_d[:, :, 2], p_d3=p_d[:, :, 3],
            drv_done=drv_done, drv_found=drv_found, drv_min=drv_min,
            drv_adj=adj, pm_min=pm_min, drv_nextid=nextid,
            rr=rr, act=act, act_n=act_n, rng_ca=rng_ca,
            ca_min=ca_min, qd=qd, quald=quald, pend=pend,
        )
        return st


def _host_sort_actives(act, act_n, drv_done, drv_found, drv_min,
                       rng, ca_min):
    """sortActives (range_source.h:2367+) on host, vectorized over B,
    replicated draw-for-draw: selection sort with a draw per tie."""
    B, nd = act.shape
    act = act.copy()
    act_n = act_n.copy()
    i = np.zeros(B, np.int32)
    for _ in range(2 * nd):
        run = i < act_n
        if not run.any():
            break
        cur = np.take_along_axis(act, i[:, None].clip(0, nd - 1),
                                 1)[:, 0]
        rm = run & (drv_done[np.arange(B), cur] > 0) & \
            (drv_found[np.arange(B), cur] == 0)
        # pop at i: shift left
        if rm.any():
            cols = np.arange(nd)[None, :]
            shift = rm[:, None] & (cols >= i[:, None])
            src = np.clip(cols + 1, 0, nd - 1)
            act = np.where(shift, np.take_along_axis(act, src, 1), act)
            act_n = np.where(rm, act_n - 1, act_n)
        sel = run & ~rm
        if sel.any():
            min_cost = drv_min[np.arange(B), cur]
            min_off = i.copy()
            for joff in range(1, nd):
                j = i + joff
                vj = sel & (j < act_n)
                cj = np.take_along_axis(act, j[:, None].clip(0, nd - 1),
                                        1)[:, 0]
                skip = (drv_done[np.arange(B), cj] > 0) & \
                    (drv_found[np.arange(B), cj] == 0)
                cost_j = drv_min[np.arange(B), cj]
                ok = vj & ~skip
                less = ok & (cost_j < min_cost)
                tie = ok & (cost_j == min_cost)
                rng2, draw = _host_rng_next(rng)
                rng = np.where(tie, rng2, rng)
                take = less | (tie & ((draw & 0x1000) > 0))
                min_cost = np.where(less, cost_j, min_cost)
                min_off = np.where(take, j, min_off)
            # swap act[i] <-> act[min_off]
            do = sel & (min_off != i)
            if do.any():
                vi = np.take_along_axis(
                    act, i[:, None].clip(0, nd - 1), 1)[:, 0]
                vm = np.take_along_axis(
                    act, min_off[:, None].clip(0, nd - 1), 1)[:, 0]
                cols = np.arange(nd)[None, :]
                act = np.where(do[:, None] & (cols == i[:, None]),
                               vm[:, None], act)
                act = np.where(do[:, None] & (cols == min_off[:, None]),
                               vi[:, None], act)
            i = np.where(sel, i + 1, i)
    first = np.take_along_axis(act, np.zeros((B, 1), np.int32), 1)[:, 0]
    ca_min = np.where(act_n > 0,
                      np.maximum(drv_min[np.arange(B), first], ca_min),
                      ca_min)
    return act, act_n, rng, ca_min


# ---------------------------------------------------------------------------
# Device state
# ---------------------------------------------------------------------------

def _init_state(B, L, nd, seeds, host):
    z = lambda *s: jnp.zeros(s, jnp.int32)
    st = dict(
        mode=jnp.full((B,), M_MAIN, jnp.int32),
        overflow=jnp.zeros((B,), bool),
        result=z(B),
        rng_al=jnp.asarray(seeds, jnp.uint32),
        rng_ca=jnp.asarray(host["rng_ca"], jnp.uint32),
        rng_rs=jnp.tile(jnp.asarray(seeds, jnp.uint32)[:, None],
                        (1, nd)),
        seed=jnp.asarray(seeds, jnp.uint32),
        count=z(B), best_stratum=jnp.full((B,), 999, jnp.int32),
        nhits=z(B), hits=z(B, H_MAX, 8 + 2 * MM_SLOTS),
        qlen=jnp.asarray(host["qlen"], jnp.int32),
        qd=jnp.asarray(host["qd"], jnp.int32),        # [B, ND, L]
        pend=jnp.asarray(host["pend"], jnp.int32),
        dd5=jnp.asarray(host["dd5"], jnp.int32),
        dd3=jnp.asarray(host["dd3"], jnp.int32),
        qd_cur=z(B, L), pend_cur=z(B, L),
        d5_cur=z(B), d3_cur=z(B),
        # CostAware / aligner control
        ca_done=z(B), ca_found=z(B),
        ca_min=jnp.asarray(host["ca_min"], jnp.int32),
        act=jnp.asarray(host["act"], jnp.int32),
        act_n=jnp.asarray(host["act_n"], jnp.int32),
        cur=z(B), precost=z(B), phase=z(B), sfx_mc=z(B),
        needs_sort=z(B), adv_found=z(B), loop_cost=z(B),
        # found-range registers
        ls_drv=z(B), ls_top=z(B), ls_bot=z(B), ls_cost=z(B),
        ls_strat=z(B), ls_ne=z(B), ls_ed=z(B, E_MAX), ls_ec=z(B, E_MAX),
        dl_valid=z(B), dl_drv=z(B), dl_top=z(B), dl_bot=z(B),
        dl_cost=z(B), dl_strat=z(B), dl_ne=z(B),
        dl_ed=z(B, E_MAX), dl_ec=z(B, E_MAX),
        # chase registers
        ch_r=z(B), ch_k=z(B),
        r_row=z(B), r_jumps=z(B), r_walk=z(B),
        # per-driver state
        drv_done=jnp.asarray(host["drv_done"], jnp.int32),
        drv_found=jnp.asarray(host["drv_found"], jnp.int32),
        drv_min=jnp.asarray(host["drv_min"], jnp.int32),
        drv_adj=jnp.asarray(host["drv_adj"], jnp.int32),
        pm_min=jnp.asarray(host["pm_min"], jnp.int32),
        drv_nextid=jnp.asarray(host["drv_nextid"], jnp.int32),
        rr=jnp.asarray(host["rr"], jnp.int32),        # [B, ND, 5]
        rr_ed=z(B, nd, E_MAX), rr_ec=z(B, nd, E_MAX),
        # branch pool
        ptpb=z(B * NBR * L, 2),
        meta=jnp.full((B * NBR, L), META_ALL_DEAD, jnp.int32),
        p_ed=z(B, NBR, E_MAX), p_ec=z(B, NBR, E_MAX),
    )
    for k in ("p_valid", "p_drv", "p_cost", "p_ham", "p_rdepth",
              "p_len", "p_top", "p_bot", "p_curt", "p_dly", "p_dlyf",
              "p_id", "p_ne", "p_d0", "p_d1", "p_d2", "p_d3"):
        st[k] = jnp.asarray(host[k], jnp.int32)
    return st


def _w(st, name, mask, val):
    st[name] = jnp.where(mask, val, st[name])
    return st


def _pw(st, name, mask, slot, val):
    """Masked write of pool scalar `name` at per-lane slot."""
    B, S = st[name].shape
    mm = (jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
          == slot[:, None]) & mask[:, None]
    st[name] = jnp.where(mm, val[:, None], st[name])
    return st


def _psel(st, name, slot):
    return _sel_col(st[name], slot)


def _dsel(st, name, drv):
    """st[name][b, drv[b]] for [B, ND] arrays."""
    return _sel_col(st[name], drv)


def _dw(st, name, mask, drv, val):
    B, ND = st[name].shape
    mm = (jax.lax.broadcasted_iota(jnp.int32, (B, ND), 1)
          == drv[:, None]) & mask[:, None]
    st[name] = jnp.where(mm, val[:, None], st[name])
    return st


def _cfg1(cfg_arr, idx):
    """cfg lookup: [ND] array at per-lane driver idx."""
    return _g1(cfg_arr, idx)


def _irrelevant(st, cost, strata: bool):
    """NBestFirstStrat::irrelevantCost (hit.h:1124-1131)."""
    if not strata:
        return jnp.zeros_like(cost, dtype=bool)
    return (st["count"] > 0) & ((cost >> 14) > st["best_stratum"])


def _front_select(st, cur):
    """PathManager front: argmin by CostCompare key (cost asc,
    extendable first, deeper tip, smaller id; range_source.h:1103)."""
    B = cur.shape[0]
    elig = (st["p_valid"] > 0) & (st["p_drv"] == cur[:, None])
    tip = st["p_rdepth"] + st["p_len"]
    key1 = ((st["p_cost"] * 2 + st["p_curt"]) << 8) | \
        (255 - jnp.minimum(tip, 255))
    key1 = jnp.where(elig, key1, INF32)
    k1min = jnp.min(key1, axis=1)
    idk = jnp.where(elig & (key1 == k1min[:, None]), st["p_id"], INF32)
    fs = jnp.argmin(idk, axis=1).astype(jnp.int32)
    nonempty = jnp.any(elig, axis=1)
    return fs, nonempty


def _load_cur_rows(st, mask, cur):
    """Refresh the current-driver by-depth query/penalty registers and
    d5/d3 (sweeps [B, ND, L] once per driver switch, not per step)."""
    nd = st["qd"].shape[1]
    oh = (jax.lax.broadcasted_iota(jnp.int32, (1, nd, 1), 1)
          == cur[:, None, None])
    qdc = jnp.sum(jnp.where(oh, st["qd"], 0), axis=1)
    pdc = jnp.sum(jnp.where(oh, st["pend"], 0), axis=1)
    st["qd_cur"] = jnp.where(mask[:, None], qdc, st["qd_cur"])
    st["pend_cur"] = jnp.where(mask[:, None], pdc, st["pend_cur"])
    st = _w(st, "d5_cur", mask, _dsel(st, "dd5", cur))
    st = _w(st, "d3_cur", mask, _dsel(st, "dd3", cur))
    return st


# ---------------------------------------------------------------------------
# Steps
# ---------------------------------------------------------------------------

def _step_main(st, strata: bool):
    """UnpairedAlignerV2 loop head (best_driver.py align_read)."""
    m = st["mode"] == M_MAIN
    found = st["ca_found"] > 0
    irrf = m & found & _irrelevant(st, st["ls_cost"], strata)
    st = _w(st, "ca_found", irrf, 0)          # discard, stay M_MAIN
    chase = m & found & ~irrf
    spread = jnp.maximum(st["ls_bot"] - st["ls_top"], 1)
    rng, v = _rng_next(st["rng_al"])
    st["rng_al"] = jnp.where(chase, rng, st["rng_al"])
    r0 = st["ls_top"] + (v % spread.astype(jnp.uint32)).astype(jnp.int32)
    st = _w(st, "ch_r", chase, r0)
    st = _w(st, "ch_k", chase, 0)
    st = _w(st, "r_walk", chase, 0)
    st["mode"] = jnp.where(chase, M_CHASE, st["mode"])
    nf = m & ~found
    ex = nf & ((st["ca_done"] > 0) |
               _irrelevant(st, st["ca_min"], strata))
    st["mode"] = jnp.where(ex, M_DONE, st["mode"])
    st["mode"] = jnp.where(nf & ~ex, M_CADV, st["mode"])
    return st


def _step_cadv(st):
    """CostAwareRangeSourceDriver::advance entry
    (range_source.h:2180-2260; best_driver.py CostAwareDriver)."""
    m = st["mode"] == M_CADV
    # delayed range consumption
    dv = m & (st["dl_valid"] > 0)
    for a, b in (("ls_drv", "dl_drv"), ("ls_top", "dl_top"),
                 ("ls_bot", "dl_bot"), ("ls_cost", "dl_cost"),
                 ("ls_strat", "dl_strat"), ("ls_ne", "dl_ne")):
        st = _w(st, a, dv, st[b])
    st["ls_ed"] = jnp.where(dv[:, None], st["dl_ed"], st["ls_ed"])
    st["ls_ec"] = jnp.where(dv[:, None], st["dl_ec"], st["ls_ec"])
    st = _w(st, "dl_valid", dv, 0)
    st = _w(st, "ca_found", dv, 1)
    has_act = st["act_n"] > 0
    act0 = st["act"][:, 0]
    st = _w(st, "ca_min", dv & has_act,
            jnp.maximum(_dsel(st, "drv_min", act0), st["ca_min"]))
    st = _w(st, "ca_done", dv & ~has_act, 1)
    st["mode"] = jnp.where(dv, M_MAIN, st["mode"])
    m = m & ~dv
    # empty active
    emp = m & ~has_act
    st = _w(st, "ca_done", emp, 1)
    st["mode"] = jnp.where(emp, M_MAIN, st["mode"])
    go = m & ~emp
    st = _w(st, "cur", go, act0)
    st = _w(st, "phase", go, 0)
    st = _w(st, "precost", go, _dsel(st, "drv_min", act0))
    st = _load_cur_rows(st, go, st["cur"])
    pre = go & (_dsel(st, "drv_found", act0) > 0)
    st["mode"] = jnp.where(pre, M_CPOST, st["mode"])
    st["mode"] = jnp.where(go & ~pre, M_DADV, st["mode"])
    return st


def _step_sfx(st):
    """strandFix inner-loop head (range_source.h:2322-2352 while)."""
    m = st["mode"] == M_SFX
    cur = st["cur"]
    stop = m & ((_dsel(st, "drv_done", cur) > 0) |
                (_dsel(st, "drv_found", cur) > 0))
    st["mode"] = jnp.where(stop, M_SFXEND, st["mode"])
    st["mode"] = jnp.where(m & ~stop, M_DADV, st["mode"])
    return st


def _step_dadv(st):
    """BestDriver.advance entry: done/empty guard, found reset."""
    m = st["mode"] == M_DADV
    cur = st["cur"]
    has = jnp.any((st["p_valid"] > 0) & (st["p_drv"] == cur[:, None]),
                  axis=1)
    dd = m & ((_dsel(st, "drv_done", cur) > 0) | ~has)
    st = _dw(st, "drv_done", dd, cur, jnp.ones_like(cur))
    st = _w(st, "adv_found", m, 0)
    st["mode"] = jnp.where(dd, M_DEND, st["mode"])
    st["mode"] = jnp.where(m & ~dd, M_EXT, st["mode"])
    return st


def _meta_costs(st, meta_row, frd, flen, fd0, d3, qual_order: bool):
    """Per-position curtail/split costs over a branch's meta row
    (Branch::curtail/split scan, range_source.h:644-939).  Returns
    (eligible[B, L], cost[B, L])."""
    B, L = meta_row.shape
    ii = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    i0 = jnp.maximum(0, fd0 - frd)
    elig = (ii >= i0[:, None]) & (ii <= flen[:, None]) & \
        (ii < (st["qlen"] - frd)[:, None]) & \
        ((meta_row & META_ELIM) == 0)
    quallo = (meta_row >> 5) & 0x7F
    strat = jnp.where((frd[:, None] + ii) < d3[:, None], 1 << 14, 0)
    cost = (quallo if qual_order else jnp.zeros_like(quallo)) | strat
    return elig, jnp.where(elig, cost, COST_INF)


def _step_ext(st, cat: FMCat, cfgj, qual_lim: int, qual_order: bool,
              L: int):
    """One advanceBranch iteration, part 1: process the front branch —
    consume one position (quartet LF + installRanges) and apply the
    hit/empty/half-and-half outcome incl. Branch::curtail
    (ebwt_search_backtrack.h:2060-2361; range_source.h:877-939)."""
    m = st["mode"] == M_EXT
    B = m.shape[0]
    cur = st["cur"]
    efw = _cfg1(cfgj["ebwt_fw"], cur)
    hh = _cfg1(cfgj["hh"], cur)
    exacts = _cfg1(cfgj["exacts"], cur)
    occ_base = jnp.where(efw > 0, cat.occ_base[0], cat.occ_base[1])
    blk_base = jnp.where(efw > 0, cat.blk_base[0], cat.blk_base[1])
    zoff = jnp.where(efw > 0, cat.zoff[0], cat.zoff[1])
    d5, d3 = st["d5_cur"], st["d3_cur"]

    fs, _ = _front_select(st, cur)
    fcost = _psel(st, "p_cost", fs)
    fham = _psel(st, "p_ham", fs)
    frd = _psel(st, "p_rdepth", fs)
    flen = _psel(st, "p_len", fs)
    ftop = _psel(st, "p_top", fs)
    fbot = _psel(st, "p_bot", fs)
    fne = _psel(st, "p_ne", fs)
    fd0 = _psel(st, "p_d0", fs)
    st = _w(st, "loop_cost", m, fcost)

    depth = frd + flen
    qlen = st["qlen"]

    # half-and-half entry check (best.py _hh_check_top)
    hhfail = m & (hh > 0) & (((depth == d5) & (fne == 0)) |
                             ((depth == d3) & (fne < hh)))

    consume = m & ~hhfail & (depth < qlen)
    c = _sel_col(st["qd_cur"], jnp.clip(depth, 0, L - 1))
    q = _sel_col(st["pend_cur"], jnp.clip(depth, 0, L - 1))
    alt = (depth >= fd0) & (fham + q <= qual_lim)
    pt, pb = ftop, fbot
    n4 = consume & (c == 4) & (depth > 0)
    tb_top = jnp.where(n4, 1, ftop)
    tb_bot = jnp.where(n4, 1, fbot)
    caseA = consume & (tb_top == 0) & (tb_bot == 0)
    caseB = consume & ~caseA & alt & ((pb > pt) | (c == 4))
    caseC = consume & ~caseA & ~caseB & (pb > pt)
    # quartet (mapLFEx) for A/B/C lanes; masked otherwise
    need_q = caseA | caseB | caseC
    tops, bots = _lf4pair(cat, occ_base, zoff,
                          jnp.where(need_q, pt, 0),
                          jnp.where(need_q, pb, 0), blk_base)
    f4t = jnp.broadcast_to(cat.fchr[:4], (B, 4)).astype(jnp.int32)
    f4b = jnp.broadcast_to(cat.fchr[1:5], (B, 4)).astype(jnp.int32)
    tops = jnp.where(caseA[:, None], f4t, tops)
    bots = jnp.where(caseA[:, None], f4b, bots)

    # installRanges (range_source.h:970-1023) for A | B
    install = caseA | caseB
    dead = q > (qual_lim - fham)
    jj = jnp.arange(4, dtype=jnp.int32)[None, :]
    enabled = (jj != c[:, None]) & (bots > tops) & \
        ~dead[:, None] & install[:, None]
    elim_bits = jnp.sum(jnp.where(enabled, 0, 1) << jj, axis=1)
    eliminated = ~jnp.any(enabled, axis=1)
    meta_new = elim_bits | jnp.where(eliminated, META_ELIM, 0) | \
        (jnp.clip(q, 0, 127) << 5) | jnp.where(caseA, META_FCHR, 0)
    meta_new = jnp.where(install, meta_new, META_ALL_DEAD)

    # new top/bot after consuming
    qc = _sel_col(tops, jnp.clip(c, 0, 3))
    qb = _sel_col(bots, jnp.clip(c, 0, 3))
    new_top = jnp.where((caseA | caseB | caseC) & (c < 4), qc, tb_top)
    new_bot = jnp.where((caseA | caseB | caseC) & (c < 4), qb, tb_bot)
    # case A with c == 4 keeps (0, 0); case B with c == 4 -> (1, 1)
    new_top = jnp.where(caseA & (c == 4), 0, new_top)
    new_bot = jnp.where(caseA & (c == 4), 0, new_bot)
    st = _pw(st, "p_top", consume, fs, new_top)
    st = _pw(st, "p_bot", consume, fs, new_bot)
    eff_top = jnp.where(consume, new_top, ftop)
    eff_bot = jnp.where(consume, new_bot, fbot)

    # outcome
    cur0 = depth >= (qlen - 1)
    empty = eff_top == eff_bot
    hit = m & ~hhfail & cur0 & ~empty
    invalid_exact = hit & (fne == 0) & (exacts == 0)
    # _hh_check (best.py:437-450)
    ii = jax.lax.broadcasted_iota(jnp.int32, (B, E_MAX), 1)
    edm = ii < fne[:, None]
    ed_row = st["p_ed"][jnp.arange(B), jnp.clip(fs, 0, NBR - 1)]
    hi_n = jnp.sum((edm & (ed_row < d5[:, None])).astype(jnp.int32), 1)
    lo_n = jnp.sum((edm & (ed_row >= d5[:, None]) &
                    (ed_row < d3[:, None])).astype(jnp.int32), 1)
    hh2ok = jnp.where(
        (depth == d5 - 1) & ~empty, fne > 0,
        jnp.where((depth == d3 - 1) & ~empty,
                  (fne >= hh) & ~((lo_n == 0) | (hi_n == 0)),
                  True))
    hh2fail = m & ~hhfail & (hh > 0) & ~hh2ok

    found = hit & ~invalid_exact & ~hh2fail
    extend = m & ~hhfail & ~hh2fail & ~hit & ~empty & ~cur0
    curt = m & ~extend   # hhfail | hh2fail | hit | empty | cur0

    # FOUND: record cur_range for this driver (_mk_range)
    st = _w(st, "adv_found", found, 1)
    nd = st["rr"].shape[1]
    ohd = (jax.lax.broadcasted_iota(jnp.int32, (B, nd), 1)
           == cur[:, None]) & found[:, None]
    rrv = jnp.stack([eff_top, eff_bot, fcost, fcost >> 14, fne], -1)
    st["rr"] = jnp.where(ohd[:, :, None], rrv[:, None, :], st["rr"])
    st["rr_ed"] = jnp.where(ohd[:, :, None], ed_row[:, None, :],
                            st["rr_ed"])
    ec_row = st["p_ec"][jnp.arange(B), jnp.clip(fs, 0, NBR - 1)]
    st["rr_ec"] = jnp.where(ohd[:, :, None], ec_row[:, None, :],
                            st["rr_ec"])

    # EXTEND
    st = _pw(st, "p_len", extend, fs, flen + 1)

    # row writes: ptpb at position flen (consume lanes); meta at flen
    # (consume) and flen+1 cleared (extend lanes)
    lane = jax.lax.broadcasted_iota(jnp.int32, (B,), 0)
    rowbase = (lane * NBR + fs) * L
    BIG = jnp.int32(B * NBR * L + 7)
    i1 = jnp.where(consume, rowbase + flen, BIG)
    st["ptpb"] = st["ptpb"].at[i1].set(
        jnp.stack([pt, pb], -1), mode="drop", unique_indices=True)
    mrow = lane * NBR + fs
    MBIG = jnp.int32(B * NBR + 7)
    mi1 = jnp.where(consume, mrow, MBIG)
    mj1 = jnp.clip(flen, 0, L - 1)
    mi2 = jnp.where(extend & (flen + 1 < L), mrow, MBIG)
    mj2 = jnp.clip(flen + 1, 0, L - 1)
    st["meta"] = st["meta"].at[mi1, mj1].set(meta_new, mode="drop")
    st["meta"] = st["meta"].at[mi2, mj2].set(META_ALL_DEAD, mode="drop")
    # extend beyond L (can't happen: len < qlen <= L) -> overflow guard
    st["overflow"] = st["overflow"] | (extend & (flen + 1 >= L))

    # CURTAIL (range_source.h:877-939 + PathManager::curtail 1434-1455)
    meta_row = st["meta"][jnp.clip(mrow, 0, B * NBR - 1)]
    # overlay this step's write (the .at[].set above is already applied
    # to st["meta"], so meta_row is current)
    elig, costs = _meta_costs(st, meta_row, frd, flen, fd0, d3,
                              qual_order)
    lowest = jnp.min(costs, axis=1)
    exhausted = curt & (lowest == COST_INF)
    st = _pw(st, "p_valid", exhausted, fs, jnp.zeros_like(fs))
    live_curt = curt & ~exhausted
    st = _pw(st, "p_cost", live_curt, fs, fcost + lowest)
    st = _pw(st, "p_curt", live_curt, fs, jnp.ones_like(fs))
    st["mode"] = jnp.where(m, M_SPP, st["mode"])
    return st


def _step_spp(st, cat: FMCat, cfgj, qual_order: bool, L: int):
    """One advanceBranch iteration, part 2: splitAndPrep — delayed-cost
    fixups, splitBranch/pick_edit with its RNG draws, then the loop
    exit checks (range_source.h:644-773,1459-1517)."""
    m = st["mode"] == M_SPP
    B = m.shape[0]
    cur = st["cur"]
    efw = _cfg1(cfgj["ebwt_fw"], cur)
    occ_base = jnp.where(efw > 0, cat.occ_base[0], cat.occ_base[1])
    blk_base = jnp.where(efw > 0, cat.blk_base[0], cat.blk_base[1])
    zoff = jnp.where(efw > 0, cat.zoff[0], cat.zoff[1])
    d3 = st["d3_cur"]

    fs, nonempty = _front_select(st, cur)
    pm_empty = m & ~nonempty
    live = m & nonempty
    fcost = _psel(st, "p_cost", fs)
    fdlyf = _psel(st, "p_dlyf", fs)
    fdly = _psel(st, "p_dly", fs)
    fcurt = _psel(st, "p_curt", fs)
    frd = _psel(st, "p_rdepth", fs)
    flen = _psel(st, "p_len", fs)
    fne = _psel(st, "p_ne", fs)
    fham = _psel(st, "p_ham", fs)
    fd0 = _psel(st, "p_d0", fs)
    fd1 = _psel(st, "p_d1", fs)
    fd2 = _psel(st, "p_d2", fs)
    fd3 = _psel(st, "p_d3", fs)

    # delayed-increase fixup: apply and stay in M_SPP (the host's
    # `while front.delayed_increase` loop, one fixup per machine step)
    dfix = live & (fdlyf > 0)
    st = _pw(st, "p_cost", dfix, fs, fdly)
    st = _pw(st, "p_dlyf", dfix, fs, jnp.zeros_like(fs))
    rest = live & ~dfix

    dosplit = rest & (fcurt > 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (B,), 0)
    mrow = lane * NBR + fs
    meta_row = st["meta"][jnp.clip(mrow, 0, B * NBR - 1)]
    elig, costs = _meta_costs(st, meta_row, frd, flen, fd0, d3,
                              qual_order)
    best = jnp.min(costs, axis=1)
    tie = elig & (costs == best[:, None])
    n_t = jnp.sum(tie.astype(jnp.int32), axis=1)
    gt = jnp.where(elig & (costs > best[:, None]), costs, COST_INF)
    nxt = jnp.min(gt, axis=1)
    n_el = jnp.sum(elig.astype(jnp.int32), axis=1)
    w = jnp.minimum(n_t, 3)
    ndraw = dosplit & (w > 1)
    rng_d = _dsel(st, "rng_rs", cur).astype(jnp.uint32)
    rng2, v = _rng_next(rng_d)
    r = jnp.where(ndraw,
                  (v % jnp.maximum(w, 1).astype(jnp.uint32))
                  .astype(jnp.int32), 0)
    nd_ = st["rng_rs"].shape[1]
    ohr = (jax.lax.broadcasted_iota(jnp.int32, (B, nd_), 1)
           == cur[:, None]) & ndraw[:, None]
    st["rng_rs"] = jnp.where(ohr, rng2[:, None], st["rng_rs"])
    rank = n_t - w + r
    tcs = jnp.cumsum(tie.astype(jnp.int32), axis=1)
    posm = tie & (tcs == (rank + 1)[:, None])
    pos = jnp.argmax(posm, axis=1).astype(jnp.int32)
    depth_split = frd + pos

    # quartet at the split position from the stored (top, bot) entry
    prow = (lane * NBR + fs) * L + pos
    ent = st["ptpb"][jnp.clip(prow, 0, B * NBR * L - 1)]
    spt, spb = ent[:, 0], ent[:, 1]
    meta_pos = _sel_col(meta_row, pos)
    is_fchr = (meta_pos & META_FCHR) > 0
    tops, bots = _lf4pair(cat, occ_base, zoff,
                          jnp.where(dosplit, spt, 0),
                          jnp.where(dosplit, spb, 0), blk_base)
    f4t = jnp.broadcast_to(cat.fchr[:4], (B, 4)).astype(jnp.int32)
    f4b = jnp.broadcast_to(cat.fchr[1:5], (B, 4)).astype(jnp.int32)
    tops = jnp.where(is_fchr[:, None], f4t, tops)
    bots = jnp.where(is_fchr[:, None], f4b, bots)

    # pick_edit (range_source.h:321-485)
    jj = jnp.arange(4, dtype=jnp.int32)[None, :]
    cands = ((meta_pos[:, None] >> jj) & 1) == 0
    num = jnp.sum(cands.astype(jnp.int32), axis=1)
    spreads = jnp.where(cands, bots - tops, 0)
    tot = jnp.sum(spreads, axis=1)
    multi = dosplit & (num > 1)
    rng_d2 = _dsel(st, "rng_rs", cur).astype(jnp.uint32)
    rng3, v2 = _rng_next(rng_d2)
    dart = (v2 % jnp.maximum(tot, 1).astype(jnp.uint32)).astype(jnp.int32)
    ohr2 = (jax.lax.broadcasted_iota(jnp.int32, (B, nd_), 1)
            == cur[:, None]) & multi[:, None]
    st["rng_rs"] = jnp.where(ohr2, rng3[:, None], st["rng_rs"])
    cumsp = jnp.cumsum(spreads, axis=1)
    chosen_multi = jnp.argmax(cands & (dart[:, None] < cumsp),
                              axis=1).astype(jnp.int32)
    chosen_single = jnp.argmax(cands, axis=1).astype(jnp.int32)
    last = num == 1
    chosen = jnp.where(last, chosen_single, chosen_multi)
    # parent meta update at pos
    pm_new = jnp.where(last, meta_pos | META_ELIM,
                       meta_pos | (1 << jnp.clip(chosen, 0, 3)))

    # child branch
    fkey = st["p_valid"] * NBR + \
        jax.lax.broadcasted_iota(jnp.int32, (B, NBR), 1)
    cslot = jnp.argmin(fkey, axis=1).astype(jnp.int32)
    pool_full = _psel(st, "p_valid", cslot) > 0
    edits_over = fne + 1 > E_MAX
    over = dosplit & (pool_full | edits_over)
    st["overflow"] = st["overflow"] | over
    st["mode"] = jnp.where(over, M_DONE, st["mode"])
    ok = dosplit & ~over

    hamadd = best & 0x3FFF
    nid = _dsel(st, "drv_nextid", cur)
    st = _dw(st, "drv_nextid", ok, cur, nid + 1)
    nd0 = jnp.where(depth_split < fd1, fd1, fd0)
    nd1 = jnp.where(depth_split < fd2, fd2, fd1)
    nd2 = jnp.where(depth_split < fd3, fd3, fd2)
    for name, val in (("p_valid", jnp.ones_like(fs)), ("p_drv", cur),
                      ("p_cost", fcost), ("p_ham", fham + hamadd),
                      ("p_rdepth", frd + pos + 1),
                      ("p_len", jnp.zeros_like(fs)),
                      ("p_top", _sel_col(tops, chosen)),
                      ("p_bot", _sel_col(bots, chosen)),
                      ("p_curt", jnp.zeros_like(fs)),
                      ("p_dly", jnp.zeros_like(fs)),
                      ("p_dlyf", jnp.zeros_like(fs)),
                      ("p_id", nid), ("p_ne", fne + 1),
                      ("p_d0", nd0), ("p_d1", nd1), ("p_d2", nd2),
                      ("p_d3", fd3)):
        st = _pw(st, name, ok, cslot, val)
    # child edits = parent edits + (depth_split, chosen)
    ed_row = st["p_ed"][jnp.arange(B), jnp.clip(fs, 0, NBR - 1)]
    ec_row = st["p_ec"][jnp.arange(B), jnp.clip(fs, 0, NBR - 1)]
    sl = jax.lax.broadcasted_iota(jnp.int32, (B, E_MAX), 1)
    at_ne = sl == jnp.clip(fne, 0, E_MAX - 1)[:, None]
    ned_row = jnp.where(at_ne, depth_split[:, None], ed_row)
    nec_row = jnp.where(at_ne, chosen[:, None], ec_row)
    ohc = (jax.lax.broadcasted_iota(jnp.int32, (B, NBR), 1)
           == cslot[:, None]) & ok[:, None]
    st["p_ed"] = jnp.where(ohc[:, :, None], ned_row[:, None, :],
                           st["p_ed"])
    st["p_ec"] = jnp.where(ohc[:, :, None], nec_row[:, None, :],
                           st["p_ec"])

    # parent post-split bookkeeping
    exh = ok & (n_el == 1) & last
    st = _pw(st, "p_valid", exh, fs, jnp.zeros_like(fs))
    dly = ok & ~exh & (n_t == 1) & last & (best != nxt) & \
        (nxt != COST_INF)
    st = _pw(st, "p_dly", dly, fs, fcost - best + nxt)
    st = _pw(st, "p_dlyf", dly, fs, jnp.ones_like(fs))

    # meta writes: parent pos + child position 0 cleared
    MBIG = jnp.int32(B * NBR + 7)
    mi1 = jnp.where(ok, mrow, MBIG)
    st["meta"] = st["meta"].at[mi1, jnp.clip(pos, 0, L - 1)].set(
        pm_new, mode="drop")
    crow = jnp.where(ok, lane * NBR + cslot, MBIG)
    st["meta"] = st["meta"].at[crow, 0].set(META_ALL_DEAD, mode="drop")

    # ---- loop exit checks (advance_branch tail) ----------------------
    chk = (rest & ~over) | pm_empty
    elig2 = (st["p_valid"] > 0) & (st["p_drv"] == cur[:, None])
    any2 = jnp.any(elig2, axis=1)
    fca = jnp.min(jnp.where(elig2, st["p_cost"], INF32), axis=1)
    # pm.min_cost tracking (frozen when empty)
    st = _dw(st, "pm_min", m & any2, cur, fca)
    exit_ = chk & (~any2 | (fca != st["loop_cost"]) |
                   (st["adv_found"] > 0))
    st["mode"] = jnp.where(exit_, M_DEND, st["mode"])
    st["mode"] = jnp.where(chk & ~exit_, M_EXT, st["mode"])
    return st


def _step_dend(st):
    """BestDriver.advance tail: done/min_cost updates, then return into
    the caller (CostAware main path or the strandFix loop)."""
    m = st["mode"] == M_DEND
    cur = st["cur"]
    has = jnp.any((st["p_valid"] > 0) & (st["p_drv"] == cur[:, None]),
                  axis=1)
    st = _dw(st, "drv_done", m, cur, (~has).astype(jnp.int32))
    pmc = _dsel(st, "pm_min", cur)
    adj = _dsel(st, "drv_adj", cur)
    st = _dw(st, "drv_min", m & (pmc != 0), cur,
             jnp.maximum(pmc, adj))
    st = _dw(st, "drv_found", m, cur, st["adv_found"])
    mn = m & (st["phase"] == 0)
    st["mode"] = jnp.where(mn, M_CPOST, st["mode"])
    ms = m & (st["phase"] == 1)
    exceed = ms & (_dsel(st, "drv_min", cur) > st["sfx_mc"])
    st["mode"] = jnp.where(exceed, M_SFXEND, st["mode"])
    st["mode"] = jnp.where(ms & ~exceed, M_SFX, st["mode"])
    return st


def _copy_range_regs(st, mask, prefix, drv):
    """prefix regs <- driver drv's cur_range (rr)."""
    nd = st["rr"].shape[1]
    oh = (jax.lax.broadcasted_iota(jnp.int32, (1, nd), 1)
          == drv[:, None])[:, :, None]
    rr = jnp.sum(jnp.where(oh, st["rr"], 0), axis=1)     # [B, 5]
    ed = jnp.sum(jnp.where(oh, st["rr_ed"], 0), axis=1)
    ec = jnp.sum(jnp.where(oh, st["rr_ec"], 0), axis=1)
    st = _w(st, prefix + "drv", mask, drv)
    st = _w(st, prefix + "top", mask, rr[:, 0])
    st = _w(st, prefix + "bot", mask, rr[:, 1])
    st = _w(st, prefix + "cost", mask, rr[:, 2])
    st = _w(st, prefix + "strat", mask, rr[:, 3])
    st = _w(st, prefix + "ne", mask, rr[:, 4])
    st[prefix + "ed"] = jnp.where(mask[:, None], ed, st[prefix + "ed"])
    st[prefix + "ec"] = jnp.where(mask[:, None], ec, st[prefix + "ec"])
    return st


def _step_cpost(st, cfgj, nd: int):
    """CostAware.advance after p.advance(): consume a found range
    (_found_first_range incl. the strandFix scan) and decide whether to
    re-sort (range_source.h:2262-2360)."""
    m = st["mode"] == M_CPOST
    cur = st["cur"]
    pf = m & (_dsel(st, "drv_found", cur) > 0)
    needs0 = (_dsel(st, "drv_done", cur) > 0) | \
        (st["precost"] != _dsel(st, "drv_min", cur))

    # found: last_range <- cur driver's range; strandFix scan
    st = _copy_range_regs(st, pf, "ls_", cur)
    st = _w(st, "ca_found", pf, 1)
    st = _dw(st, "drv_found", pf, cur, jnp.zeros_like(cur))
    r_fw = _cfg1(cfgj["fw"], cur)
    # first i >= 1 (STATIC rss order) with cfg.fw[i] != r.fw and
    # i < act_n (the reference's rss_[i]/active_[i] quirk)
    ii = jax.lax.broadcasted_iota(jnp.int32, (1, nd), 1)
    cfg_fw_row = jnp.broadcast_to(cfgj["fw"][None, :],
                                  (cur.shape[0], nd))
    cand = (ii >= 1) & (cfg_fw_row != r_fw[:, None]) & \
        (ii < st["act_n"][:, None])
    has_i = jnp.any(cand, axis=1)
    i_star = jnp.argmax(cand, axis=1).astype(jnp.int32)
    sf = pf & has_i
    tgt = _sel_col(st["act"], i_star)
    mc = jnp.maximum(st["ca_min"], _dsel(st, "drv_min", tgt))
    brk = sf & (mc > st["ls_cost"])
    go = sf & ~brk
    st = _w(st, "cur", go, tgt)
    st = _w(st, "phase", go, 1)
    st = _w(st, "sfx_mc", go, mc)
    st = _load_cur_rows(st, go, st["cur"])
    st["mode"] = jnp.where(go, M_SFX, st["mode"])

    # sort decision for the non-strandfix paths
    fin = m & ~go
    needs = needs0 | go   # go lanes sort later (after sfix)
    dosort = fin & needs
    st["mode"] = jnp.where(dosort, M_SORT, st["mode"])
    st["mode"] = jnp.where(fin & ~dosort, M_MAIN, st["mode"])
    return st


def _step_sfxend(st):
    """strandFix loop tail: maybe take the opposite-strand range as
    delayed, with the spread-weighted swap draw
    (range_source.h:2329-2345)."""
    m = st["mode"] == M_SFXEND
    cur = st["cur"]
    pf = m & (_dsel(st, "drv_found", cur) > 0)
    st = _copy_range_regs(st, pf, "dl_", cur)
    st = _w(st, "dl_valid", pf, 1)
    st = _dw(st, "drv_found", pf, cur, jnp.zeros_like(cur))
    tot = (st["dl_bot"] - st["dl_top"]) + (st["ls_bot"] - st["ls_top"])
    rng2, v = _rng_next(st["rng_ca"])
    st["rng_ca"] = jnp.where(pf, rng2, st["rng_ca"])
    rq = (v % jnp.maximum(tot, 1).astype(jnp.uint32)).astype(jnp.int32)
    swap = pf & (rq < (st["dl_bot"] - st["dl_top"]))
    # swap last <-> delayed
    for a, b in (("ls_drv", "dl_drv"), ("ls_top", "dl_top"),
                 ("ls_bot", "dl_bot"), ("ls_cost", "dl_cost"),
                 ("ls_strat", "dl_strat"), ("ls_ne", "dl_ne")):
        va, vb = st[a], st[b]
        st[a] = jnp.where(swap, vb, va)
        st[b] = jnp.where(swap, va, vb)
    for a, b in (("ls_ed", "dl_ed"), ("ls_ec", "dl_ec")):
        va, vb = st[a], st[b]
        st[a] = jnp.where(swap[:, None], vb, va)
        st[b] = jnp.where(swap[:, None], va, vb)
    st = _w(st, "phase", m, 0)
    st["mode"] = jnp.where(m, M_SORT, st["mode"])
    return st


def _step_sort(st, nd: int):
    """sortActives on device: the host selection sort with a draw per
    tie, unrolled (2*ND outer x ND inner masked vector ops)."""
    m = st["mode"] == M_SORT
    B = m.shape[0]
    act = st["act"]
    act_n = st["act_n"]
    rng = st["rng_ca"]
    i = jnp.zeros((B,), jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, nd), 1)
    for _t in range(2 * nd):
        run = m & (i < act_n)
        cur = _sel_col(act, jnp.clip(i, 0, nd - 1))
        rm = run & (_dsel(st, "drv_done", cur) > 0) & \
            (_dsel(st, "drv_found", cur) == 0)
        shift = rm[:, None] & (cols >= i[:, None])
        src = jnp.clip(cols + 1, 0, nd - 1)
        act = jnp.where(shift, jnp.take_along_axis(act, src, 1), act)
        act_n = jnp.where(rm, act_n - 1, act_n)
        sel = run & ~rm
        min_cost = _dsel(st, "drv_min", cur)
        min_off = i
        for joff in range(1, nd):
            j = i + joff
            vj = sel & (j < act_n)
            cj = _sel_col(act, jnp.clip(j, 0, nd - 1))
            skip = (_dsel(st, "drv_done", cj) > 0) & \
                (_dsel(st, "drv_found", cj) == 0)
            cost_j = _dsel(st, "drv_min", cj)
            okj = vj & ~skip
            less = okj & (cost_j < min_cost)
            tiej = okj & (cost_j == min_cost)
            rng2, draw = _rng_next(rng)
            rng = jnp.where(tiej, rng2, rng)
            take = less | (tiej & ((draw & 0x1000) > 0))
            min_cost = jnp.where(less, cost_j, min_cost)
            min_off = jnp.where(take, j, min_off)
        do = sel & (min_off != i)
        vi = _sel_col(act, jnp.clip(i, 0, nd - 1))
        vm = _sel_col(act, jnp.clip(min_off, 0, nd - 1))
        act = jnp.where(do[:, None] & (cols == i[:, None]),
                        vm[:, None], act)
        act = jnp.where(do[:, None] & (cols == min_off[:, None]),
                        vi[:, None], act)
        i = jnp.where(sel, i + 1, i)
    st["act"] = act
    st["act_n"] = jnp.where(m, act_n, st["act_n"])
    st["rng_ca"] = jnp.where(m, rng, st["rng_ca"])
    first = _sel_col(act, jnp.zeros_like(i))
    st = _w(st, "ca_min", m & (act_n > 0),
            jnp.maximum(_dsel(st, "drv_min", first), st["ca_min"]))
    # post-sort: active emptied -> done unless a delayed range waits
    emp = m & (act_n == 0)
    st = _w(st, "ca_done", emp, (st["dl_valid"] == 0).astype(jnp.int32))
    st["mode"] = jnp.where(m, M_MAIN, st["mode"])
    return st


def _step_chase(st, cat: FMCat, cfgj, nfrag: int, n_k: int, m_max: int,
                strata: bool):
    """One RangeChaser row: resolve + joinedToTextOff + sink
    (range_chaser.h:22; BestSink.report_hit in best_driver.py)."""
    m = st["mode"] == M_CHASE
    B = m.shape[0]
    efw = _cfg1(cfgj["ebwt_fw"], st["ls_drv"])
    sa_base = jnp.where(efw > 0, cat.sa_base[0], cat.sa_base[1])
    occ_base = jnp.where(efw > 0, cat.occ_base[0], cat.occ_base[1])
    blk_base = jnp.where(efw > 0, cat.blk_base[0], cat.blk_base[1])
    zoff = jnp.where(efw > 0, cat.zoff[0], cat.zoff[1])
    spread = st["ls_bot"] - st["ls_top"]
    ri = st["ch_r"] + st["ch_k"]
    ri = jnp.where(ri >= st["ls_bot"], ri - spread, ri)
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
        wpb = cat.occ_every // 16
        word = _g1(cat.bwt, jnp.where(walkers, (row >> 4) +
                                      blk_base * wpb, 0))
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
    qlen = st["qlen"]
    if nfrag == 1:
        elt = jnp.zeros_like(off)
        start_f = jnp.zeros_like(off)
        upper = jnp.broadcast_to(cat.length, off.shape)
        tidx = jnp.zeros_like(off)
        toff0 = jnp.zeros_like(off)
    else:
        elt = jnp.searchsorted(cat.rstarts_start, off, side="right") \
            .astype(jnp.int32) - 1
        start_f = _g1(cat.rstarts_start, elt)
        upper = jnp.where(elt + 1 < nfrag,
                          _g1(cat.rstarts_start,
                              jnp.minimum(elt + 1, nfrag - 1)),
                          cat.length)
        tidx = _g1(cat.rstarts_tidx, elt)
        toff0 = _g1(cat.rstarts_toff, elt)
    valid = off + qlen <= upper
    fragoff = off - start_f
    fraglen = upper - start_f
    fragoff = jnp.where(efw == 0, fraglen - fragoff - 1 - (qlen - 1),
                        fragoff)
    toff = fragoff + toff0

    hit = m & valid
    newcount = st["count"] + 1
    st = _w(st, "count", hit, newcount)
    st = _w(st, "best_stratum", hit,
            jnp.minimum(st["best_stratum"], st["ls_strat"]))
    maxed = hit & (newcount > m_max)
    st = _w(st, "result", maxed, 2)
    st["mode"] = jnp.where(maxed, M_DONE, st["mode"])
    stored = hit & ~maxed
    # hit record (same layout as dfs_device hits)
    fwflag = _cfg1(cfgj["fw"], st["ls_drv"])
    nmms = st["ls_ne"]
    def _padmm(a):
        if E_MAX >= MM_SLOTS:
            return a[:, :MM_SLOTS]
        return jnp.pad(a, ((0, 0), (0, MM_SLOTS - E_MAX)))
    rec = jnp.concatenate([
        jnp.stack([tidx, toff, fwflag | (efw << 1),
                   spread - 1, st["ls_strat"], st["ls_cost"],
                   nmms, qlen], axis=-1),
        _padmm(st["ls_ed"]), _padmm(st["ls_ec"])], axis=-1)
    slot_full = st["nhits"] >= H_MAX
    over = stored & (slot_full | (nmms > MM_SLOTS))
    st["overflow"] = st["overflow"] | over
    st["mode"] = jnp.where(over, M_DONE, st["mode"])
    do_store = stored & ~over
    hm = (jax.lax.broadcasted_iota(jnp.int32, (B, H_MAX), 1)
          == st["nhits"][:, None]) & do_store[:, None]
    st["hits"] = jnp.where(hm[:, :, None], rec[:, None, :], st["hits"])
    st = _w(st, "nhits", do_store, st["nhits"] + 1)
    stop = do_store & (newcount == n_k) & \
        ((m_max == INF32) | (m_max < n_k))
    st = _w(st, "result", stop, 1)
    st["mode"] = jnp.where(stop, M_DONE, st["mode"])
    # post-hit irrelevantCost break (best_driver.py align_read chase)
    irr = do_store & ~stop & _irrelevant(st, st["ls_cost"], strata)
    go_on = m & ~maxed & ~stop & ~over & ~irr
    brk = irr
    nk2 = st["ch_k"] + 1
    st = _w(st, "ch_k", go_on, nk2)
    wrapped = go_on & (nk2 >= spread)
    endc = brk | wrapped
    st = _w(st, "ca_found", endc, 0)
    st["mode"] = jnp.where(endc, M_MAIN, st["mode"])
    return st


# ---------------------------------------------------------------------------
# Machine driver
# ---------------------------------------------------------------------------

def _machine_step(st, cat: FMCat, cfgj, nd: int, L: int, nfrag: int,
                  n_k: int, m_max: int, strata: bool, qual_lim: int,
                  qual_order: bool):
    st = dict(st)
    st = _step_main(st, strata)
    st = _step_cadv(st)
    st = _step_sfx(st)
    st = _step_dadv(st)
    st = _step_ext(st, cat, cfgj, qual_lim, qual_order, L)
    st = _step_spp(st, cat, cfgj, qual_order, L)
    st = _step_dend(st)
    st = _step_cpost(st, cfgj, nd)
    st = _step_sfxend(st)
    st = _step_sort(st, nd)
    st = _step_chase(st, cat, cfgj, nfrag, n_k, m_max, strata)
    return st


@partial(jax.jit, static_argnames=("nd", "L", "nfrag", "n_k", "m_max",
                                   "strata", "qual_lim", "qual_order",
                                   "chunk"))
def run_chunk(cat: FMCat, cfgj, st, *, nd: int, L: int, nfrag: int,
              n_k: int, m_max: int, strata: bool, qual_lim: int,
              qual_order: bool, chunk: int):
    def cond(c):
        s, it = c
        return (it < chunk) & jnp.any(s["mode"] != M_DONE)

    def body(c):
        s, it = c
        return _machine_step(s, cat, cfgj, nd, L, nfrag, n_k, m_max,
                             strata, qual_lim, qual_order), it + 1

    st, it = jax.lax.while_loop(cond, body, (st, jnp.int32(0)))
    return st, st["mode"]


# ---------------------------------------------------------------------------
# Compaction + harvest
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("L",))
def _compact(st, idxs, pad, *, L: int):
    B_old = st["mode"].shape[0]

    def take(v):
        if v.ndim >= 1 and v.shape[0] == B_old * NBR * L:
            return v.reshape(B_old, NBR * L, *v.shape[1:])[idxs] \
                .reshape(idxs.shape[0] * NBR * L, *v.shape[1:])
        if v.ndim >= 1 and v.shape[0] == B_old * NBR:
            return v.reshape(B_old, NBR, *v.shape[1:])[idxs] \
                .reshape(idxs.shape[0] * NBR, *v.shape[1:])
        return v[idxs]

    st2 = {k: take(v) for k, v in st.items()}
    st2["mode"] = jnp.where(pad, M_DONE, st2["mode"])
    st2["result"] = jnp.where(pad, 0, st2["result"])
    st2["overflow"] = jnp.where(pad, False, st2["overflow"])
    st2["nhits"] = jnp.where(pad, 0, st2["nhits"])
    return st2


@jax.jit
def _harvest_small(st, idxs):
    return {k: st[k][idxs] for k in
            ("result", "overflow", "count", "best_stratum", "nhits")}


@jax.jit
def _gather_rows(arr, lanes, slots):
    return arr[lanes, slots]


def _pad_pow2(a, fill=0, lo=64):
    n = max(lo, 1 << int(np.ceil(np.log2(max(1, len(a))))))
    if len(a) == n:
        return a
    return np.concatenate([a, np.full(n - len(a), fill, a.dtype)])


def _harvest(st, idxs):
    dev_idx = jnp.asarray(idxs)
    out = {k: np.asarray(v)
           for k, v in _harvest_small(st, dev_idx).items()}
    n = len(idxs)
    counts = out["nhits"]
    total = int(counts.sum())
    full = np.zeros((n, H_MAX, 8 + 2 * MM_SLOTS), np.int32)
    if total:
        lanes_rel = np.repeat(np.arange(n), counts)
        slots = np.concatenate([np.arange(c) for c in counts])
        la = _pad_pow2(idxs[lanes_rel].astype(np.int64))
        sl = _pad_pow2(slots.astype(np.int64))
        packed = np.asarray(_gather_rows(st["hits"], jnp.asarray(la),
                                         jnp.asarray(sl)))[:total]
        full[lanes_rel, slots] = packed
    out["hits"] = full
    return out


def _merge_out(out, h, ids, B0):
    if out is None:
        out = {k: np.zeros((B0,) + v.shape[1:], v.dtype)
               for k, v in h.items()}
    for k, v in h.items():
        out[k][ids] = v
    return out


def run_compacting(cat: FMCat, cfgj, st, *, nd: int, L: int, nfrag: int,
                   n_k: int, m_max: int, strata: bool, qual_lim: int,
                   qual_order: bool, max_steps: int,
                   chunk: int = 192, min_bucket: int = 512):
    B0 = st["mode"].shape[0]
    orig = np.arange(B0)
    out = None
    steps = 0
    kw = dict(nd=nd, L=L, nfrag=nfrag, n_k=n_k, m_max=m_max,
              strata=strata, qual_lim=qual_lim, qual_order=qual_order)
    while True:
        st, _ = run_chunk(cat, cfgj, st, chunk=chunk, **kw)
        steps += chunk
        mode = np.asarray(st["mode"])
        act = np.flatnonzero(mode != M_DONE)
        live = orig >= 0
        if len(act) == 0 or steps >= max_steps:
            sub = np.flatnonzero(live)
            h = _harvest(st, sub)
            if steps >= max_steps and len(act):
                h["overflow"] = h["overflow"] | np.isin(sub, act)
            return _merge_out(out, h, orig[sub], B0)
        newB = _bucket(len(act), (min_bucket, min_bucket * 4,
                                  min_bucket * 16, min_bucket * 64))
        if newB < mode.shape[0]:
            done_live = np.flatnonzero((mode == M_DONE) & live)
            if len(done_live):
                out = _merge_out(out, _harvest(st, done_live),
                                 orig[done_live], B0)
            pad_n = newB - len(act)
            idxs = np.concatenate([act, np.full(pad_n, act[0],
                                                np.int64)])
            pad = np.zeros(newB, bool)
            pad[len(act):] = True
            st = _compact(st, jnp.asarray(idxs), jnp.asarray(pad), L=L)
            orig = np.concatenate([orig[act], np.full(pad_n, -1)])


# ---------------------------------------------------------------------------
# Aligner
# ---------------------------------------------------------------------------

class DeviceBestAligner:
    """--best / -M / --strata / -v 3 SE aligner on the lockstep device
    machine, with per-read host-engine fallback on overflow."""

    DENSE_LIMIT = 1 << 28

    def __init__(self, idx_fw: EbwtIndex, idx_bw: EbwtIndex, policy,
                 v: int, strata: bool, all_hits: bool,
                 nofw: bool = False, norc: bool = False,
                 maq: bool = True, better: bool = False,
                 global_seed: int = 0, max_steps: int = 60000,
                 compact: bool | None = None):
        import os
        self.idx_fw, self.idx_bw = idx_fw, idx_bw
        if compact is None:
            compact = (idx_fw.length > self.DENSE_LIMIT or
                       bool(os.environ.get("BOWTIE_TPU_COMPACT")))
        self.cat = build_fmcat(idx_fw, idx_bw,
                               occ_every=128 if compact else 1,
                               dense_sa=not compact)
        self.policy = policy
        self.v = v
        self.strata, self.all_hits = strata, all_hits
        self.nofw, self.norc = nofw, norc
        self.maq = maq
        self.qual_order = not better
        self.global_seed = global_seed
        self.max_steps = max_steps
        self.nfrag = int(idx_fw.nfrag)
        self.cfgs = v_mode_configs(v, nofw, norc)
        self.nd = len(self.cfgs)
        _, cfga = cfg_arrays(self.cfgs)
        self.cfgj = {k: jnp.asarray(v_) for k, v_ in cfga.items()}
        self.hostinit = HostInit(self.cfgs, idx_fw, idx_bw, maq,
                                 self.qual_order, INF32)
        self._fallback = None
        self.fallbacks = 0

    # sink n (BestSink.n): INF32//2 for strata+all, INF for -a, else -k
    def _sink_n(self):
        if self.strata and self.all_hits:
            return INF32 // 2
        if self.all_hits:
            return INF32
        return self.policy.n if self.policy.n < INF32 else INF32

    def _host_aligner(self):
        if self._fallback is None:
            from .best_factories import make_best_aligner
            from .golden import GoldenFM
            self._fallback = make_best_aligner(
                GoldenFM(self.idx_fw), GoldenFM(self.idx_bw), self.v,
                self.policy, strata=self.strata, all_hits=self.all_hits,
                nofw=self.nofw, norc=self.norc, maq=self.maq,
                better=not self.qual_order,
                global_seed=self.global_seed)
        return self._fallback

    def align_batch(self, reads) -> list:
        if not reads:
            return []
        B = len(reads)
        # reads the device machine can't represent -> host directly
        host_only = [b for b, r in enumerate(reads)
                     if len(r.seq) < 4 or len(r.seq) > 255]
        Bp = _bucket(B)
        L = _len_bucket(max(len(r.seq) for r in reads))
        seeds = np.zeros(Bp, dtype=np.uint32)
        for b, r in enumerate(reads):
            seeds[b] = r.seed(self.global_seed)
        pad_reads = list(reads)
        host = self.hostinit.build(reads, L, seeds[:B])
        if Bp > B:
            for k, v in host.items():
                pad = np.zeros((Bp - B,) + v.shape[1:], dtype=v.dtype)
                host[k] = np.concatenate([v, pad], axis=0)
        st = _init_state(Bp, L, self.nd, seeds, host)
        # disable lanes that run host-side (or are pads)
        dis = np.zeros(Bp, bool)
        dis[B:] = True
        for b in host_only:
            dis[b] = True
        if dis.any():
            st["mode"] = jnp.where(jnp.asarray(dis), M_DONE, st["mode"])
        n_k = self._sink_n()
        m_max = self.policy.max if self.policy.max < INF32 else INF32
        out = run_compacting(
            self.cat, self.cfgj, st, nd=self.nd, L=L,
            nfrag=self.nfrag, n_k=n_k, m_max=m_max, strata=self.strata,
            qual_lim=INF32, qual_order=self.qual_order,
            max_steps=self.max_steps)
        for b in host_only:
            out["overflow"][b] = True
        _ = pad_reads
        return self.assemble(reads, out, seeds)

    def assemble(self, reads, out, seeds) -> list:
        from .policy import ReadResult
        from .types import Hit
        from ..utils.rng import BtRandom
        results = []
        n = self._sink_n()
        m_max = self.policy.max
        for b, read in enumerate(reads):
            if out["overflow"][b]:
                self.fallbacks += 1
                results.append(self._host_aligner().align_read(read))
                continue
            buffered = []
            qlen = len(read.seq)
            for t in range(int(out["nhits"][b])):
                rec = out["hits"][b, t]
                fw = bool(rec[2] & 1)
                ebwt_fw = bool((rec[2] >> 1) & 1)
                mms = []
                for k in range(int(rec[6])):
                    d = int(rec[8 + k])          # search depth
                    refc = int(rec[8 + MM_SLOTS + k])
                    # _mk_range: mm = qlen-1-d; BestSink flips when
                    # ebwt_fw != fw -> final 5' offset
                    pos = qlen - 1 - d
                    off = qlen - pos - 1 if (ebwt_fw != fw) else pos
                    mms.append((off, ord("acgt"[refc])))
                buffered.append(Hit(
                    read=read, fw=fw, tidx=int(rec[0]), toff=int(rec[1]),
                    oms=int(rec[3]), stratum=int(rec[4]),
                    cost=int(rec[5]), mms=sorted(mms)))
            count = int(out["count"][b])
            # BestSink.finish (best_driver.py:453-475)
            maxed = count > m_max
            if self.strata:
                for h in buffered:
                    h.oms = len(buffered) - 1
            if maxed:
                if self.policy.sample_max and buffered:
                    rand = BtRandom(int(seeds[b]))
                    num = 1
                    while (num < len(buffered) and
                           buffered[num].stratum == buffered[0].stratum):
                        num += 1
                    h = buffered[rand.next_u32() % num]
                    results.append(ReadResult(
                        [h], maxed=True, nvalid=count, sampled=True,
                        nbuffered=len(buffered)))
                else:
                    results.append(ReadResult(
                        [], maxed=True, nvalid=count,
                        nbuffered=len(buffered)))
            else:
                results.append(ReadResult(
                    buffered[:n], nvalid=count,
                    nbuffered=min(len(buffered), n)))
        return results
