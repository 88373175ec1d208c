"""Batched lockstep best-first (branch-and-bound) search on device.

The TPU-native engine for bowtie's --best machinery (--best / -M /
--strata / -v 3 and the seeded -n --best modes): where the host engine
(align/best.py) advances one Branch of one read at a time, this module
runs thousands of reads in lockstep, one `lax.while_loop` whose carry
holds every lane's branch pool, driver states and sink counters.

Faithfulness contract: every state transition mirrors the host engine
(itself validated bit-identical to the reference binary), including
- the Branch/BranchQueue/PathManager order (CostCompare key: cost asc,
  extendable first, deeper tip, smaller id; range_source.h:1103),
- curtail / splitBranch / pick_edit with their RNG draw order
  (range_source.h:644-939) and the shared --maxbts ceiling,
- CostAwareRangeSourceDriver's selection-sort tie draws and the
  strandFix delayed-range swap (range_source.h:2033-2400),
- EbwtSeededRangeSourceDriver's generator/extender scheduling with
  dynamic creation of full-extension drivers per seed partial
  (ebwt_search_backtrack.h:2935-3140; best_driver.py SeededDriver),
- the RangeChaser random-start row order (range_chaser.h:22) and
  NBestFirstStrat sink stop/backpressure rules (hit.h:1039,1123).
Lanes that exceed any fixed resource bound (branch slots, edit slots,
extender slots, hit slots, step budget) raise `overflow` and are re-run
on the host engine from scratch — per-read RNG seeding makes that
bit-identical.

Driver model: the OUTER CostAware driver ranges over outer drivers
(0..ND-1), each either PLAIN (one range source) or SEEDED (a seed
generator chained to dynamically created full extenders merged by an
inner CostAware).  All range sources — plain drivers, generators and
extender slots — live in one FLAT sub-driver dimension (0..NDT-1) that
the branch pool and the advance machinery operate on; outer-level state
lives in separate [B, ND] arrays.

State layout (the TPU-critical decision): branch *scalars* live in
[B, NBR] arrays updated with one-hot masked writes (cheap VPU sweeps);
per-position range data lives in flat 1-D pools —
``ptb_pool[B, NBR, 2L]`` (each consumed position's entry top/bot) and
``meta[B, NBR, L]`` (packed elimination bits + quallo) — so one
machine step costs a few one-hot masked sweeps plus O([B, NBR]) vector
work.  Pool rows are read/written with one-hot slot masks, never
dynamic gathers/scatters: a [B, L]-row gather from a flat pool
measured ~2.2 ms/op on the TPU sparse core vs ~0.2 ms for the masked
sweep (scripts/microbench_ops.py).  A split recomputes the needed LF
quartet from the stored (top, bot) pair (mapLFEx, ebwt.h:2334)
instead of storing 8 ints per position.
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
PEX = 4                    # extender slots per seeded outer driver

# machine modes
(M_DONE, M_MAIN, M_CADV, M_OADV, M_DADV, M_EXT, M_SPP, M_DEND,
 M_ODEND, M_CPOST, M_SFX, M_SFXEND, M_SORT, M_CHASE,
 M_SD, M_SDGEN, M_SDFULL, M_ICADV, M_ICPOST) = range(19)

# phase: where a flat-driver advance (DADV..DEND) returns to
PH_OUTER, PH_GEN, PH_FULL = 0, 2, 3

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
    """Static config of one flat range source (BestRangeSource +
    BestDriver)."""
    ebwt_fw: bool
    fw: bool
    pins: tuple           # 4 PIN_* constants
    report_exacts: bool
    hh: int               # half_and_half (0, 2 or 3)
    nudge_left: bool
    seed: bool = False    # truncate query to the seed (gen drivers)


@dataclass(frozen=True)
class OuterCfg:
    kind: str             # "plain" | "seeded"
    cfg: DriverCfg        # plain driver / generator
    ext: DriverCfg | None = None


def v_mode_configs(v: int, nofw: bool, norc: bool) -> list[OuterCfg]:
    """Driver DAGs of make_best_aligner (aligner_0mm/1mm/23mm.h
    factories; see best_factories.py for the host equivalents)."""
    out = []

    def plain(*a):
        out.append(OuterCfg("plain", DriverCfg(*a)))

    if v == 0:
        P = (PIN_LEN,) * 4
        if not nofw:
            plain(True, True, P, True, 0, True)
        if not norc:
            plain(True, False, P, True, 0, True)
    elif v == 1:
        P = (PIN_HI, PIN_LEN, PIN_LEN, PIN_LEN)
        if not nofw:
            plain(False, True, P, True, 0, False)
            plain(True, True, P, False, 0, True)
        if not norc:
            plain(True, False, P, True, 0, True)
            plain(False, False, P, False, 0, False)
    else:
        two = v == 2
        Pfull = (PIN_HI, PIN_HI, PIN_LEN if two else PIN_HI, PIN_LEN)
        Phalf = (PIN_BEG, PIN_HI, PIN_LEN if two else PIN_HI, PIN_LEN)
        Phalf3 = (PIN_BEG, PIN_HI, PIN_HI, PIN_LEN)
        if not nofw:
            plain(False, True, Pfull, True, 0, True)
            plain(True, True, Pfull, False, 0, False)
            plain(False, True, Phalf, False, 2, True)
            if not two:
                plain(True, True, Phalf3, False, 3, False)
        if not norc:
            plain(True, False, Pfull, True, 0, True)
            plain(False, False, Pfull, False, 0, False)
            plain(True, False, Phalf, False, 2, True)
            if not two:
                plain(False, False, Phalf3, False, 3, False)
    return out


def seeded_mode_configs(seed_mms: int, nofw: bool,
                        norc: bool) -> list[OuterCfg]:
    """Driver DAGs of make_seeded_best_aligner
    (aligner_seed_mm.h:80-532; best_factories.py
    seeded_best_driver_factory)."""
    SEED, HI, BEG = PIN_SEED, PIN_HI, PIN_BEG
    out = []
    n = seed_mms
    for fw in (True, False):
        if fw and nofw:
            continue
        if not fw and norc:
            continue
        efw_e = not fw          # exact-side index: mirror for fw reads
        efw_g = fw              # generator side: the opposite

        def plain(pins, exacts, hh=0):
            out.append(OuterCfg("plain", DriverCfg(
                efw_e, fw, pins, exacts, hh, True)))

        def seeded(gen_pins, gen_hh=0):
            gen = DriverCfg(efw_g, fw, gen_pins, False, gen_hh, False,
                            seed=True)
            ext = DriverCfg(efw_e, fw, (SEED,) * 4, True, 0, True)
            out.append(OuterCfg("seeded", gen, ext))

        if n == 0:
            plain((SEED,) * 4, True)
        elif n == 1:
            plain((HI, SEED, SEED, SEED), True)
            seeded((HI, SEED, SEED, SEED))
        elif n == 2:
            plain((HI, HI, SEED, SEED), True)
            seeded((HI, HI, SEED, SEED))
            plain((BEG, HI, SEED, SEED), False, hh=2)
        else:
            plain((HI, HI, HI, SEED), True)
            seeded((HI, HI, HI, SEED))
            seeded((BEG, HI, HI, SEED), gen_hh=3)
            plain((BEG, HI, HI, SEED), False, hh=2)
    return out


def _outer_min_cost(oc: OuterCfg, read, seed_len: int, maq: bool,
                    qual_order: bool) -> int:
    """Initial minCostAdjustment of one CostAware vec entry
    (BestDriver._init_range_source / initRangeSource,
    ebwt_search_backtrack.h:2721-2805) — pure arithmetic over the
    read's qualities, no search.  For seeded outers the SeededDriver's
    min_cost equals its generator's adjustment."""
    from .best_driver import cext_to_depth
    from .backtrack_oracle import mm_penalty
    cfg = oc.cfg
    length = len(read.seq)
    if cfg.ebwt_fw:
        qual = read.qual if cfg.fw else read.qual[::-1]
    else:
        qual = read.qual[::-1] if cfg.fw else read.qual
    s = min(seed_len, length) if seed_len > 0 else length
    s_right = s >> 1
    if s & 1 and not cfg.nudge_left:
        s_right += 1
    rev0 = cext_to_depth(cfg.pins[0], s_right, s, length)
    qlen = s if (cfg.seed and length > s) else length
    if cfg.report_exacts:
        return 0
    if not cfg.hh and rev0 < s:
        mc = 1 << 14
        if qual_order:
            lo = min(qual[qlen - d - 1] for d in range(rev0, s))
            mc += mm_penalty(maq, lo - 33)
        return mc
    if cfg.hh and 0 < s_right < s - 1:
        mc = (3 if cfg.seed else 2) << 14
        if qual_order:
            lo1 = min(qual[qlen - d - 1] for d in range(0, s_right))
            mc += mm_penalty(maq, lo1 - 33)
            half2 = sorted(qual[qlen - d - 1]
                           for d in range(s_right, s))
            mc += mm_penalty(maq, half2[0] - 33)
            if cfg.hh > 2 and len(half2) > 1:
                mc += mm_penalty(maq, half2[1] - 33)
        return mc
    return 0


def _emulate_sort_actives(costs: list, rand) -> list:
    """CostAware sortActives over the STATIC initial costs
    (range_source.h:2367+: selection sort, random swap on equal
    costs).  Returns the active order as construction indices."""
    vec = list(range(len(costs)))
    c = list(costs)
    sz = len(vec)
    i = 0
    while i < sz:
        mn, mo = c[i], i
        for j in range(i + 1, sz):
            if c[j] < mn:
                mn, mo = c[j], j
            elif c[j] == mn:
                if rand.next_u32() & 0x1000:
                    mo = j
        if mo != i:
            vec[i], vec[mo] = vec[mo], vec[i]
            c[i], c[mo] = c[mo], c[i]
        i += 1
    return vec


def flatten_outer(outers: list[OuterCfg]):
    """Flat sub-driver list + outer->flat maps."""
    flat: list[DriverCfg] = []
    o_kind, o_flat0, o_exbase = [], [], []
    for oc in outers:
        o_flat0.append(len(flat))
        if oc.kind == "plain":
            o_kind.append(0)
            o_exbase.append(-1)
            flat.append(oc.cfg)
        else:
            o_kind.append(1)
            flat.append(oc.cfg)            # generator at flat0
            o_exbase.append(len(flat))
            flat.extend([oc.ext] * PEX)    # extender slots
    return flat, np.array(o_kind, np.int32), \
        np.array(o_flat0, np.int32), np.array(o_exbase, np.int32)


def _host_rng_next(state):
    """Vectorized BtRandom.next_u32 on host (random_source.h:36-42)."""
    A, C = np.uint32(1664525), np.uint32(1013904223)
    s1 = (A * state + C).astype(np.uint32)
    ret = s1 >> np.uint32(16)
    s2 = (A * s1 + C).astype(np.uint32)
    return s2, (ret ^ s2).astype(np.uint32)


def cfg_arrays(flat: list[DriverCfg], outers: list[OuterCfg],
               o_kind, o_flat0, o_exbase):
    a = dict(
        ebwt_fw=np.array([c.ebwt_fw for c in flat], np.int32),
        fw=np.array([c.fw for c in flat], np.int32),
        exacts=np.array([c.report_exacts for c in flat], np.int32),
        hh=np.array([c.hh for c in flat], np.int32),
        same=np.array([c.ebwt_fw == c.fw for c in flat], np.int32),
        is_ext=np.zeros(len(flat), np.int32),
        o_kind=o_kind, o_flat0=o_flat0, o_exbase=o_exbase,
        o_fw=np.array([oc.cfg.fw for oc in outers], np.int32),
        # the index a CHASED range lives in: the plain driver's own
        # side, or the extender side for seeded outers
        o_chase_efw=np.array(
            [(oc.ext.ebwt_fw if oc.kind == "seeded" else
              oc.cfg.ebwt_fw) for oc in outers], np.int32),
        # per-outer mate flag: all mate1 for single-read DAGs; the
        # paired-V2 merged DAG (pev2_device) overwrites this so the
        # strandFix scan and mate elimination see each outer's mate
        # (range_source.h:2322-2327, :2233)
        o_m1=np.ones(len(outers), np.int32),
    )
    for oi, oc in enumerate(outers):
        if oc.kind == "seeded":
            a["is_ext"][o_exbase[oi]:o_exbase[oi] + PEX] = 1
    return a


class HostInit:
    """Vectorized numpy re-expression of set_query over the whole
    batch: per-flat-driver offsets/min-cost adjustments, N tallies,
    initial branches (incl. ftab jump-start and the dqlen==fc
    immediate-range case), outer/inner driver states and the initial
    sort_actives RNG draws."""

    def __init__(self, outers: list[OuterCfg], idx_fw, idx_bw,
                 maq: bool, qual_order: bool, qual_lim: int,
                 seed_len: int):
        self.outers = outers
        self.flat, o_kind, o_flat0, o_exbase = flatten_outer(outers)
        self.cfg = cfg_arrays(self.flat, outers, o_kind, o_flat0,
                              o_exbase)
        self.nd = len(outers)
        self.ndt = len(self.flat)
        self.maq = maq
        self.qual_order = qual_order
        self.qual_lim = qual_lim
        self.seed_len = seed_len
        self.fc = idx_fw.ftab_chars
        fh_fw, fl_fw = idx_fw.ftab_resolved()
        fh_bw, fl_bw = idx_bw.ftab_resolved()
        self.ftab_hi = (fh_fw, fh_bw)     # [0]=fw index, [1]=mirror
        self.ftab_lo = (fl_fw, fl_bw)

    def _derive_rows(self, c: DriverCfg, codes, qual, qlen, dq, L):
        """By-depth code/qual rows for one flat driver: pos(d) =
        dq-1-d if ebwt_fw == fw else qlen-dq+d; complement iff rc;
        depths beyond dq read N (BestRangeSource.set_query +
        set_qlen)."""
        di = np.arange(L)[None, :]
        in_q = di < dq[:, None]
        same = c.ebwt_fw == c.fw
        pos = np.where(in_q,
                       (dq[:, None] - 1 - di) if same
                       else (qlen[:, None] - dq[:, None] + di), 0)
        cd = np.take_along_axis(codes, pos, 1)
        if not c.fw:
            cd = np.where(cd < 4, 3 - cd, cd)
        qd = np.where(in_q, cd, 4)
        quald = np.where(in_q, np.take_along_axis(qual, pos, 1), 0)
        return qd, quald

    def build(self, reads, L: int, seeds: np.ndarray):
        B = len(reads)
        nd, ndt = self.nd, self.ndt
        qlen = np.array([len(r.seq) for r in reads], np.int32)
        codes = np.full((B, L), 4, np.int32)
        qual = np.zeros((B, L), np.int32)
        for b, r in enumerate(reads):
            n = len(r.seq)
            codes[b, :n] = np.asarray(r.codes_fw, np.int32)
            qual[b, :n] = np.frombuffer(bytes(r.qual), np.uint8)[:n] \
                .astype(np.int32) - 33
        pen = _QR[np.clip(qual, 0, 255)] if self.maq else qual.copy()

        st = dict(qlen=qlen, codes=codes, qual=qual, pen=pen)

        # --- per-flat-driver geometry --------------------------------
        sl = self.seed_len
        dqlen = np.zeros((B, ndt), np.int32)
        dd5 = np.zeros((B, ndt), np.int32)
        dd3 = np.zeros((B, ndt), np.int32)
        rev = np.zeros((B, ndt, 4), np.int32)
        for f, c in enumerate(self.flat):
            s = np.minimum(sl, qlen) if sl > 0 else qlen.copy()
            odd = (s & 1).astype(np.int32)
            d5 = (s >> 1) + (0 if c.nudge_left else odd)
            dq = s if c.seed else qlen
            dqlen[:, f] = dq
            dd5[:, f] = d5
            dd3[:, f] = s
            for k in range(4):
                pin = c.pins[k]
                rev[:, f, k] = (s if pin == PIN_SEED else
                                d5 if pin == PIN_HI else
                                0 if pin == PIN_BEG else qlen)
        st["dqlen"], st["dd5"], st["dd3"] = dqlen, dd5, dd3

        # static per-(lane, flat-driver) by-depth rows [qd | pend]:
        # the device machine one-hot-selects these instead of deriving
        # rows with gathers (see _derive_qd)
        rows_qp = np.zeros((B, ndt, 2 * L), np.int8)
        for f, c in enumerate(self.flat):
            qd_f, quald_f = self._derive_rows(c, codes, qual, qlen,
                                              dqlen[:, f], L)
            pend_f = _QR[np.clip(quald_f, 0, 255)] if self.maq \
                else quald_f
            rows_qp[:, f, :L] = np.clip(qd_f, -128, 127)
            rows_qp[:, f, L:] = np.clip(pend_f, 0, 127)
        st["rows_qp"] = rows_qp

        di = np.arange(L)[None, :]
        adj = np.zeros((B, ndt), np.int32)
        drv_dead = np.zeros((B, ndt), bool)
        drv_skip = np.zeros((B, ndt), bool)
        ns_ftab = np.zeros((B, ndt), np.int32)
        qd_all = {}
        for f, c in enumerate(self.flat):
            if self.cfg["is_ext"][f]:
                continue                    # created dynamically
            dq = dqlen[:, f]
            qd, quald = self._derive_rows(c, codes, qual, qlen, dq, L)
            qd_all[f] = qd
            pend = _QR[np.clip(quald, 0, 255)] if self.maq else quald
            in_q = di < dq[:, None]
            # min_cost_adj (best_driver.py _init_range_source)
            s = dd3[:, f]
            d5 = dd5[:, f]
            if not c.report_exacts:
                pe = np.where((di >= rev[:, f, 0:1]) & in_q, pend,
                              INF32)
                if not c.hh:
                    v_ = (1 << 14) + (self.qual_order * pe.min(axis=1))
                    adj[:, f] = np.where(rev[:, f, 0] < s, v_, 0)
                else:
                    base = (3 if c.seed else 2) << 14
                    lo1 = np.where((di < d5[:, None]) & in_q, pend,
                                   INF32).min(axis=1)
                    h2 = np.where((di >= d5[:, None]) &
                                  (di < s[:, None]) & in_q, pend,
                                  INF32)
                    h2s = np.sort(h2, axis=1)
                    v_ = np.full(B, base, np.int32)
                    if self.qual_order:
                        v_ = v_ + lo1 + h2s[:, 0]
                        if c.hh > 2:
                            v_ = v_ + np.where(h2s[:, 1] < INF32,
                                               h2s[:, 1], 0)
                    ok = (d5 > 0) & (d5 < s - 1)
                    adj[:, f] = np.where(ok, v_, 0)
            # N tallies (_tally_ns)
            lim = np.minimum(rev[:, f, 3], dq)
            isn = (qd == 4) & (di < lim[:, None])
            csum = np.cumsum(isn, axis=1)
            dead = np.zeros(B, bool)
            for k, col in ((1, 0), (2, 1), (3, 2)):
                at = isn & (csum == k)
                has = at.any(axis=1)
                p = np.argmax(at, axis=1)
                dead |= has & (p < rev[:, f, col])
            dead |= csum[:, -1] > 3
            # init_branch's dqlen < 4 early-out — the ONLY condition
            # that sets rs.done at setQuery (ebwt_search_backtrack.h:
            # 1935-1948); an N-killed source stays alive with nothing
            # pushed (tallyNs failure is a bare `return`, :1950-1955)
            # and participates in sortActives until first advanced
            maxmms = np.zeros(B, np.int32)
            for a_, b_ in ((0, 1), (1, 2), (2, 3)):
                maxmms = np.where(rev[:, f, a_] != rev[:, f, b_],
                                  a_ + 1, maxmms)
            skip = (dq < 4) & (dq <= maxmms)
            drv_skip[:, f] = skip
            drv_dead[:, f] = dead | skip
            ns_ftab[:, f] = ((qd[:, :self.fc] == 4) &
                             (di[:, :self.fc] < dq[:, None])) \
                .sum(axis=1)
        st["drv_adj"] = adj

        # --- init_branch per non-extender flat driver -----------------
        fc = self.fc
        zero = lambda *s_: np.zeros(s_, np.int32)
        P = dict(p_valid=zero(B, NBR), p_drv=zero(B, NBR),
                 p_cost=zero(B, NBR), p_ham=zero(B, NBR),
                 p_rdepth=zero(B, NBR), p_len=zero(B, NBR),
                 p_top=zero(B, NBR), p_bot=zero(B, NBR),
                 p_curt=zero(B, NBR), p_dly=zero(B, NBR),
                 p_dlyf=zero(B, NBR), p_id=zero(B, NBR),
                 p_ne=zero(B, NBR))
        p_d = np.zeros((B, NBR, 4), np.int32)
        drv_done = np.ones((B, ndt), np.int32)   # extenders start done
        drv_found = np.zeros((B, ndt), np.int32)
        drv_min = np.zeros((B, ndt), np.int32)
        nextid = np.zeros((B, ndt), np.int32)
        rr = np.zeros((B, ndt, 5), np.int32)
        slot_cursor = 0
        for f, c in enumerate(self.flat):
            if self.cfg["is_ext"][f]:
                continue
            dq = dqlen[:, f]
            qd = qd_all[f]
            off0 = rev[:, f, 0]
            m = np.minimum(off0, dq)
            ftab_skips = dq == fc
            skip_inv = (not c.report_exacts) & ftab_skips
            use_ftab = (ns_ftab[:, f] == 0) & (m >= fc) & ~skip_inv
            w = 2 * np.arange(fc)[None, :]
            qf = np.where(qd[:, :fc] > 3, 0, qd[:, :fc])
            foff = (qf << w).sum(axis=1)
            fh = self.ftab_hi[0 if c.ebwt_fw else 1]
            fl = self.ftab_lo[0 if c.ebwt_fw else 1]
            ft = fh[foff].astype(np.int64).astype(np.int32)
            fb = fl[foff + 1].astype(np.int64).astype(np.int32)
            nonempty = fb > ft
            alive = ~drv_dead[:, f]
            imm = alive & use_ftab & (dq == fc) & nonempty
            drv_found[:, f] = imm
            rr[imm, f, 0] = ft[imm]
            rr[imm, f, 1] = fb[imm]
            pushf = alive & use_ftab & (dq > fc) & nonempty
            push0 = alive & ~use_ftab
            pushed = pushf | push0
            slot = slot_cursor
            slot_cursor += 1
            P["p_valid"][pushed, slot] = 1
            P["p_drv"][:, slot] = f
            P["p_len"][pushf, slot] = fc
            P["p_top"][pushf, slot] = ft[pushf]
            P["p_bot"][pushf, slot] = fb[pushf]
            p_d[pushed, slot, :] = rev[pushed, f, :]
            nextid[pushed, f] = 1
            # done = rs.done only (range_source.h:1766): an alive
            # driver with an empty pool participates in sortActives
            # (soaking tie draws) until its first advance kills it in
            # _step_dadv — required for CostAware RNG-sequence parity
            drv_done[:, f] = drv_skip[:, f].astype(np.int32)
            drv_min[:, f] = adj[:, f]    # max(icost=0, adj)
        assert slot_cursor <= NBR
        st.update(P)
        st["p_d0"], st["p_d1"] = p_d[:, :, 0], p_d[:, :, 1]
        st["p_d2"], st["p_d3"] = p_d[:, :, 2], p_d[:, :, 3]

        # --- outer driver state --------------------------------------
        kind = self.cfg["o_kind"]
        flat0 = self.cfg["o_flat0"]
        od_done = np.zeros((B, nd), np.int32)
        od_found = np.zeros((B, nd), np.int32)
        od_min = np.zeros((B, nd), np.int32)
        for oi in range(nd):
            f = flat0[oi]
            if kind[oi] == 0:
                od_done[:, oi] = drv_done[:, f]
                od_found[:, oi] = drv_found[:, f]
                od_min[:, oi] = drv_min[:, f]
            else:
                # SeededDriver.set_query: done False,
                # min = max(gen adj, gen min)
                od_min[:, oi] = np.maximum(adj[:, f], drv_min[:, f])
        st.update(drv_done=drv_done, drv_found=drv_found,
                  drv_min=drv_min, drv_nextid=nextid, rr=rr,
                  od_done=od_done, od_found=od_found, od_min=od_min)

        # --- initial outer sort_actives ------------------------------
        rng_ca = seeds.astype(np.uint32).copy()
        act = np.tile(np.arange(nd, dtype=np.int32), (B, 1))
        act_n = np.full(B, nd, np.int32)
        act, act_n, rng_ca, ca_min = _host_sort_actives(
            act, act_n, od_done, od_found, od_min, rng_ca,
            np.zeros(B, np.int32))
        st.update(act=act, act_n=act_n, rng_ca=rng_ca, ca_min=ca_min)
        return st


def _host_sort_actives(act, act_n, done, found, minc, rng, ca_min):
    """sortActives (range_source.h:2367+) on host, vectorized over B,
    replicated draw-for-draw: selection sort with a draw per tie."""
    B, nd = act.shape
    act = act.copy()
    act_n = act_n.copy()
    i = np.zeros(B, np.int32)
    rows = np.arange(B)
    for _ in range(2 * nd):
        run = i < act_n
        if not run.any():
            break
        cur = np.take_along_axis(act, i[:, None].clip(0, nd - 1),
                                 1)[:, 0]
        rm = run & (done[rows, cur] > 0) & (found[rows, cur] == 0)
        if rm.any():
            cols = np.arange(nd)[None, :]
            shift = rm[:, None] & (cols >= i[:, None])
            src = np.clip(cols + 1, 0, nd - 1)
            act = np.where(shift, np.take_along_axis(act, src, 1), act)
            act_n = np.where(rm, act_n - 1, act_n)
        sel = run & ~rm
        if sel.any():
            min_cost = minc[rows, cur]
            min_off = i.copy()
            for joff in range(1, nd):
                j = i + joff
                vj = sel & (j < act_n)
                cj = np.take_along_axis(act, j[:, None].clip(0, nd - 1),
                                        1)[:, 0]
                skip = (done[rows, cj] > 0) & (found[rows, cj] == 0)
                cost_j = minc[rows, cj]
                ok = vj & ~skip
                less = ok & (cost_j < min_cost)
                tie = ok & (cost_j == min_cost)
                rng2, draw = _host_rng_next(rng)
                rng = np.where(tie, rng2, rng)
                take = less | (tie & ((draw & 0x1000) > 0))
                min_cost = np.where(less, cost_j, min_cost)
                min_off = np.where(take, j, min_off)
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
                      np.maximum(minc[rows, first], ca_min), ca_min)
    return act, act_n, rng, ca_min


# ---------------------------------------------------------------------------
# Device state
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("B", "L", "nd", "ndt", "maxbts"))
def _init_state_jit(seeds, host, *, B, L, nd, ndt, maxbts):
    """One-dispatch device init: the ~40 zero/constant registers
    materialize on device inside the executable instead of as ~40
    individual host->device uploads (each costs ~1 ms of tunnel
    latency; x4 record machines per PE batch)."""
    return _init_state(B, L, nd, ndt, seeds, host, maxbts)


def _init_state(B, L, nd, ndt, seeds, host, maxbts):
    z = lambda *s: jnp.zeros(s, jnp.int32)
    st = dict(
        mode=jnp.full((B,), M_MAIN, jnp.int32),
        overflow=jnp.zeros((B,), bool),
        result=z(B),
        # per-lane config-group bases for fused multi-DAG runs (zeros
        # for ordinary single-DAG runs; see _cfgF/_cfgO)
        cfg0f=jnp.asarray(host["cfg0f"], jnp.int32)
        if "cfg0f" in host else z(B),
        cfg0o=jnp.asarray(host["cfg0o"], jnp.int32)
        if "cfg0o" in host else z(B),
        rng_al=jnp.asarray(seeds, jnp.uint32),
        rng_ca=jnp.asarray(host["rng_ca"], jnp.uint32),
        rng_rs=jnp.asarray(host["rng_rs"], jnp.uint32)
        if "rng_rs" in host else
        jnp.tile(jnp.asarray(seeds, jnp.uint32)[:, None], (1, ndt)),
        seed=jnp.asarray(seeds, jnp.uint32),
        count=z(B), best_stratum=jnp.full((B,), 999, jnp.int32),
        # hits is kept flat [B, H_MAX*W]: a trailing dim of W=24 would
        # be padded to 128 lanes by TPU (8,128) tiling, multiplying the
        # HBM cost of every masked sweep ~5x
        nhits=z(B), hits=z(B, H_MAX * (8 + 2 * MM_SLOTS)),
        qlen=jnp.asarray(host["qlen"], jnp.int32),
        # per-OUTER full read length / RNG seed: identical across
        # outers for single-read DAGs; per-mate for the paired-V2
        # merged DAG (each driver serves its own mate's read,
        # range_source.h:2084 / aligner.h:1483)
        qlen_o=jnp.asarray(host["qlen_o"], jnp.int32)
        if "qlen_o" in host else
        jnp.tile(jnp.asarray(host["qlen"], jnp.int32)[:, None],
                 (1, nd)),
        seed_o=jnp.asarray(host["seed_o"], jnp.uint32)
        if "seed_o" in host else
        jnp.tile(jnp.asarray(seeds, jnp.uint32)[:, None], (1, nd)),
        rows_qp=jnp.asarray(host["rows_qp"], jnp.int8),
        dqlen=jnp.asarray(host["dqlen"], jnp.int32),
        dd5=jnp.asarray(host["dd5"], jnp.int32),
        dd3=jnp.asarray(host["dd3"], jnp.int32),
        # packed current-driver rows [qd | pend]: element reads
        # share one one-hot position mask (single fused pass)
        qp_cur=z(B, 2 * L),
        d5_cur=z(B), d3_cur=z(B), qlen_cur=z(B),
        bt=jnp.full((B,), maxbts, jnp.int32),
        # outer CostAware / aligner control
        ca_done=z(B), ca_found=z(B),
        ca_min=jnp.asarray(host["ca_min"], jnp.int32),
        act=jnp.asarray(host["act"], jnp.int32),
        act_n=jnp.asarray(host["act_n"], jnp.int32),
        cur=z(B), cur_o=z(B), precost=z(B), phase=z(B), octx=z(B),
        sfx_mc=z(B), adv_found=z(B), loop_cost=z(B), sdf_old=z(B),
        ic_pre=z(B), pre_min=z(B),
        # found-range registers
        ls_drv=z(B), ls_top=z(B), ls_bot=z(B), ls_cost=z(B),
        ls_strat=z(B), ls_ne=z(B), ls_ed=z(B, E_MAX), ls_ec=z(B, E_MAX),
        dl_valid=z(B), dl_drv=z(B), dl_top=z(B), dl_bot=z(B),
        dl_cost=z(B), dl_strat=z(B), dl_ne=z(B),
        dl_ed=z(B, E_MAX), dl_ec=z(B, E_MAX),
        # chase registers
        ch_r=z(B), ch_k=z(B),
        r_row=z(B), r_jumps=z(B), r_walk=z(B),
        # flat sub-driver state
        drv_done=jnp.asarray(host["drv_done"], jnp.int32),
        drv_found=jnp.asarray(host["drv_found"], jnp.int32),
        drv_min=jnp.asarray(host["drv_min"], jnp.int32),
        drv_adj=jnp.asarray(host["drv_adj"], jnp.int32),
        pm_min=z(B, ndt),
        drv_nextid=jnp.asarray(host["drv_nextid"], jnp.int32),
        # per-driver blocks are FLAT element-major [B, W*K] (see _BLK)
        rr=jnp.asarray(host["rr"], jnp.int32).transpose(0, 2, 1)
        .reshape(B, -1),
        rr_ed=z(B, ndt * E_MAX), rr_ec=z(B, ndt * E_MAX),
        # extender dynamic state
        pm_m=z(B, ndt * 3), pm_c=z(B, ndt * 3), pm_n=z(B, ndt),
        ex_next=z(B, nd),
        # outer driver state
        od_done=jnp.asarray(host["od_done"], jnp.int32),
        od_found=jnp.asarray(host["od_found"], jnp.int32),
        od_min=jnp.asarray(host["od_min"], jnp.int32),
        od_rr=z(B, nd * 5), od_ed=z(B, nd * E_MAX),
        od_ec=z(B, nd * E_MAX),
        # inner CostAware state (one per outer slot; used when seeded)
        ic_act=z(B, nd * PEX), ic_actn=z(B, nd), ic_found=z(B, nd),
        ic_done=z(B, nd), ic_min=z(B, nd),
        ic_rng=jnp.asarray(host["seed_o"], jnp.uint32)
        if "seed_o" in host else
        jnp.tile(jnp.asarray(seeds, jnp.uint32)[:, None], (1, nd)),
        il_top=z(B, nd), il_bot=z(B, nd), il_cost=z(B, nd),
        il_strat=z(B, nd), il_ne=z(B, nd),
        il_ed=z(B, nd * E_MAX), il_ec=z(B, nd * E_MAX),
        # branch pool.  The per-position pools are [B, NBR, *] with the
        # position axis minor: every row read/write is then a one-hot
        # masked sweep over the slot axis — dynamic row gathers from a
        # flat pool measured ~2.2 ms/op on the TPU sparse core vs
        # ~0.2 ms for the masked sweep (scripts/microbench_ops.py).
        # ptb packs the entry-top row and entry-bot row side by side
        # ([pt | pb] along the minor axis) so one pass serves both.
        ptb_pool=z(B, NBR, 2 * L),
        meta=jnp.full((B, NBR, L), META_ALL_DEAD, jnp.int32),
        p_ed=z(B, NBR * E_MAX), p_ec=z(B, NBR * E_MAX),
    )
    # outer rr for pre-found plain drivers (immediate ftab ranges)
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
    """st[name][b, drv[b]] for [B, K] arrays."""
    return _sel_col(st[name], drv)


def _dw(st, name, mask, drv, val):
    B, K = st[name].shape
    mm = (jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
          == drv[:, None]) & mask[:, None]
    st[name] = jnp.where(mm, val[:, None], st[name])
    return st


def _slot_mask(fs, B):
    """One-hot [B, NBR, 1] mask of each lane's slot fs."""
    return (jax.lax.broadcasted_iota(jnp.int32, (B, NBR), 1)
            == fs[:, None])[:, :, None]


def _meta_row(st, fs, B):
    """[B, L] meta row of slot fs — one-hot sum over the slot axis."""
    return jnp.sum(jnp.where(_slot_mask(fs, B), st["meta"], 0), axis=1)


def _ptb_row(st, fs, B, L):
    """(entry-top row, entry-bot row) of slot fs: [B, L] each."""
    ptb = jnp.sum(jnp.where(_slot_mask(fs, B), st["ptb_pool"], 0),
                  axis=1)
    return ptb[:, :L], ptb[:, L:]


def _lane_block(arr, slot, width, nslots):
    """arr block `slot` -> [B, width] from a per-lane flat
    [B, width*nslots] ELEMENT-MAJOR pool (element e of block k at
    column e*nslots + k): `width` static slices under ONE shared
    one-hot slot mask, fused into a single VPU pass.  (The slot-major
    index-arithmetic gather this replaces measured ~2.2 ms/op on the
    sparse core at B=16k; scripts/microbench_ops.py.)"""
    B = slot.shape[0]
    m = jax.lax.broadcasted_iota(jnp.int32, (B, nslots), 1) \
        == slot[:, None]
    return jnp.stack(
        [jnp.sum(jnp.where(m, arr[:, e * nslots:(e + 1) * nslots], 0),
                 axis=1) for e in range(width)], axis=-1)


# Per-driver block widths for the flat ELEMENT-MAJOR [B, W*K] per-lane
# state (a logical [B, K, W] layout would be TPU-padded to [B, K, 128]
# — 24-49x its logical bytes, swept in full by every masked write).
_BLK = {"rr": 5, "rr_ed": E_MAX, "rr_ec": E_MAX, "pm_m": 3, "pm_c": 3,
        "od_rr": 5, "od_ed": E_MAX, "od_ec": E_MAX, "il_ed": E_MAX,
        "il_ec": E_MAX, "ic_act": PEX}


def _dsel2(st, name, drv):
    """Block select from flat element-major [B, W*K] -> [B, W]."""
    W = _BLK[name]
    a = st[name]
    return _lane_block(a, drv, W, a.shape[1] // W)


def _dw2(st, name, mask, drv, val):
    """Block write into flat element-major [B, W*K]: one masked sweep
    (shared one-hot block mask tiled over the W element groups)."""
    a = st[name]
    B, KW = a.shape
    W = _BLK[name]
    K = KW // W
    m = (jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
         == drv[:, None]) & mask[:, None]
    st[name] = jnp.where(jnp.tile(m, (1, W)),
                         jnp.repeat(val, K, axis=1), a)
    return st


def _cfg1(cfg_arr, idx):
    """cfg lookup: [K] array at per-lane index."""
    return _g1(cfg_arr, idx)


def _cfgF(st, cfg_arr, idx):
    """Flat-driver cfg lookup honoring the lane's config-group base
    (cfg0f): a fused multi-DAG run (e.g. the PE 4-in-1 recording,
    pe_device.py) concatenates several machines' flat cfg tables and
    gives each lane the base of its group; single-DAG runs keep
    cfg0f == 0 and the original arrays."""
    return _g1(cfg_arr, idx + st["cfg0f"])


def _cfgO(st, cfg_arr, idx):
    """Outer-driver cfg lookup honoring the lane's config-group base
    (cfg0o); see _cfgF."""
    return _g1(cfg_arr, idx + st["cfg0o"])


def _irrelevant(st, cost, strata: bool):
    """NBestFirstStrat::irrelevantCost (hit.h:1124-1131)."""
    if not strata:
        return jnp.zeros_like(cost, dtype=bool)
    return (st["count"] > 0) & ((cost >> 14) > st["best_stratum"])


def _front_select(st, cur):
    """PathManager front: argmin by CostCompare key (cost asc,
    extendable first, deeper tip, smaller id; range_source.h:1103)."""
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


def _derive_qd(st, cfgj, flat, L):
    """By-depth code/penalty rows for flat driver `flat` ([B] ids):
    the base rows are STATIC per (lane, flat driver) — set_query's
    reversal/complement geometry depends only on the driver config and
    the read — so they are precomputed at launch into rows_qp
    [B, NDT, 2L] int8 and selected here by a one-hot sum over the
    driver axis (the take_along_axis permutation gathers this replaces
    measured ~2.2 ms/op on the sparse core).  Only the seed-stage
    premuts (extender creation, dynamic) are applied per call."""
    B = flat.shape[0]
    ndt = st["pm_n"].shape[1]
    m = (jax.lax.broadcasted_iota(jnp.int32, (B, ndt), 1)
         == flat[:, None])[:, :, None]
    qp = jnp.sum(jnp.where(m, st["rows_qp"], 0), axis=1) \
        .astype(jnp.int32)                           # [B, 2L]
    qd, pend = qp[:, :L], qp[:, L:]
    # seed-stage mutations: depth == m_k (set_query applies the seed
    # range's edits to qry; in depth coordinates the edit lands at its
    # seed-relative 5' offset).  Premut positions are always < dqlen,
    # so no extra in_q guard is needed.
    di = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    npm = _dsel(st, "pm_n", flat)
    pmm = _dsel2(st, "pm_m", flat)       # [B, 3]
    pmc = _dsel2(st, "pm_c", flat)
    for k in range(3):
        hit = (di == pmm[:, k:k + 1]) & (npm[:, None] > k)
        qd = jnp.where(hit, pmc[:, k:k + 1], qd)
    return qd, pend


def _load_cur_rows(st, mask, flat, cfgj, L):
    """Refresh the current-flat-driver registers (by-depth query and
    penalty rows, d5/d3/qlen)."""
    qd, pend = _derive_qd(st, cfgj, flat, L)
    qp = jnp.concatenate([qd, pend], axis=1)
    st["qp_cur"] = jnp.where(mask[:, None], qp, st["qp_cur"])
    st = _w(st, "d5_cur", mask, _dsel(st, "dd5", flat))
    st = _w(st, "d3_cur", mask, _dsel(st, "dd3", flat))
    st = _w(st, "qlen_cur", mask, _dsel(st, "dqlen", flat))
    return st


def _copy_outer_range(st, mask, prefix, cur_o):
    """prefix regs <- outer driver's current range (od_rr)."""
    rrv = _dsel2(st, "od_rr", cur_o)
    st = _w(st, prefix + "drv", mask, cur_o)
    st = _w(st, prefix + "top", mask, rrv[:, 0])
    st = _w(st, prefix + "bot", mask, rrv[:, 1])
    st = _w(st, prefix + "cost", mask, rrv[:, 2])
    st = _w(st, prefix + "strat", mask, rrv[:, 3])
    st = _w(st, prefix + "ne", mask, rrv[:, 4])
    ed = _dsel2(st, "od_ed", cur_o)
    ec = _dsel2(st, "od_ec", cur_o)
    st[prefix + "ed"] = jnp.where(mask[:, None], ed, st[prefix + "ed"])
    st[prefix + "ec"] = jnp.where(mask[:, None], ec, st[prefix + "ec"])
    return st


def _sort_generic(m, act, act_n, done2, found2, min2, rng, K):
    """sortActives on device over an id list `act` whose entries index
    the given per-id arrays; returns updated (act, act_n, rng).

    Small K (SE DAGs, nd <= 6) unrolls all 2K*(K-1) compare stages so
    XLA fuses them into a few kernels.  Larger K (the paired-V2 merged
    DAG, nd ~ 12 -> 264 stages) would explode XLA:CPU compile time
    inside the machine's while_loop body, so the loops become
    lax.fori_loops — same operation sequence (incl. every tie-break
    RNG draw), bounded graph."""
    B = m.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, act.shape, 1)

    def outer_body(carry, _t):
        act, act_n, rng, i = carry
        run = m & (i < act_n)
        cur = _sel_col(act, jnp.clip(i, 0, K - 1))
        rm = run & (_sel_col(done2, cur) > 0) & \
            (_sel_col(found2, cur) == 0)
        shift = rm[:, None] & (cols >= i[:, None])
        act_s1 = jnp.concatenate([act[:, 1:], act[:, -1:]], axis=1)
        act = jnp.where(shift, act_s1, act)
        act_n = jnp.where(rm, act_n - 1, act_n)
        sel = run & ~rm
        min_cost = _sel_col(min2, cur)
        min_off = i

        def inner_body(c2, joff):
            act, act_n, rng, min_cost, min_off = c2
            j = i + joff
            vj = sel & (j < act_n)
            cj = _sel_col(act, jnp.clip(j, 0, act.shape[1] - 1))
            skip = (_sel_col(done2, cj) > 0) & \
                (_sel_col(found2, cj) == 0)
            cost_j = _sel_col(min2, cj)
            okj = vj & ~skip
            less = okj & (cost_j < min_cost)
            tiej = okj & (cost_j == min_cost)
            rng2, draw = _rng_next(rng)
            rng = jnp.where(tiej, rng2, rng)
            take = less | (tiej & ((draw & 0x1000) > 0))
            min_cost = jnp.where(less, cost_j, min_cost)
            min_off = jnp.where(take, j, min_off)
            return (act, act_n, rng, min_cost, min_off)

        if K <= 6:
            c2 = (act, act_n, rng, min_cost, min_off)
            for joff in range(1, K):
                c2 = inner_body(c2, jnp.int32(joff))
            act, act_n, rng, min_cost, min_off = c2
        else:
            def ib(joff, c2):
                return inner_body(c2, joff)
            act, act_n, rng, min_cost, min_off = jax.lax.fori_loop(
                1, K, ib, (act, act_n, rng, min_cost, min_off))
        do = sel & (min_off != i)
        vi = _sel_col(act, jnp.clip(i, 0, act.shape[1] - 1))
        vm = _sel_col(act, jnp.clip(min_off, 0, act.shape[1] - 1))
        act = jnp.where(do[:, None] & (cols == i[:, None]),
                        vm[:, None], act)
        act = jnp.where(do[:, None] & (cols == min_off[:, None]),
                        vi[:, None], act)
        i = jnp.where(sel, i + 1, i)
        return (act, act_n, rng, i)

    i0 = jnp.zeros((B,), jnp.int32)
    carry = (act, act_n, rng, i0)
    if K <= 6:
        for _t in range(2 * K):
            carry = outer_body(carry, _t)
    else:
        carry = jax.lax.fori_loop(
            0, 2 * K, lambda t, c: outer_body(c, t), carry)
    act, act_n, rng, _i = carry
    return act, act_n, rng


# ---------------------------------------------------------------------------
# Aligner-level + outer CostAware steps
# ---------------------------------------------------------------------------

def _step_main(st, strata: bool, record: bool = False,
               rec_cap: int | None = None):
    """UnpairedAlignerV2 loop head (best_driver.py align_read).

    record=True: paired-end stream-recording mode — instead of chasing
    a found range, append it to the hits pool verbatim (drv id, top,
    bot, cost, stratum, edits) and keep advancing until the driver is
    exhausted.  No sink backpressure and no chase RNG draw: the host
    PairedBestAligner replay performs those (aligner.h:1092-1326
    consumes driver ranges strictly in emission order, so the full
    stream reproduces its behavior byte-identically)."""
    m = st["mode"] == M_MAIN
    found = st["ca_found"] > 0
    if record:
        return _record_range(st, m, found, rec_cap)
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


def _record_range(st, m, found, rec_cap: int | None = None):
    """Append the current found range to the hits pool (record mode).

    rec_cap: stop a lane once it has recorded this many ranges instead
    of advancing its driver to exhaustion.  The PE interleave usually
    consumes only the first range of one driver (a chased anchor +
    reference-space mate rescue decides the pair, aligner.h:1190-1326),
    so full exhaustion wastes most machine steps.  A lane frozen by
    the cap stores 2 in the record's done column — the replay treats
    its stream as truncated and falls back to the live host drivers
    if the interleave ever asks for a range past the recorded end."""
    B = m.shape[0]
    rec_on = m & found
    nmms = st["ls_ne"]

    def _padmm(a):
        if E_MAX >= MM_SLOTS:
            return a[:, :MM_SLOTS]
        return jnp.pad(a, ((0, 0), (0, MM_SLOTS - E_MAX)))
    # [6] = driver done at emission: a range returned together with
    # done=True is never consumed by the PE interleave (aligner.h:1190
    # checks !drv.done before draining found_range) — replay needs it.
    # 2 = lane frozen by rec_cap with the driver NOT exhausted.
    done_col = st["ca_done"]
    if rec_cap is not None:
        frz = (st["nhits"] + 1 >= rec_cap) & (st["ca_done"] == 0)
        done_col = jnp.where(frz, 2, done_col)
    # ed pad slot [8 + MM_SLOTS - 1] (always zero: E_MAX < MM_SLOTS)
    # carries the driver's min_cost at the host's LAST pruning check
    # before this emission (aligner.h:1638-1681): minCost is
    # nondecreasing, so the last pre-advance value decides the V2
    # replay's pruning exactly
    ed_p = _padmm(st["ls_ed"])
    ed_p = jnp.concatenate([ed_p[:, :MM_SLOTS - 1],
                            st["pre_min"][:, None]], axis=-1)
    rec = jnp.concatenate([
        jnp.stack([st["ls_drv"], st["ls_top"], st["ls_bot"],
                   st["ls_cost"], st["ls_strat"], nmms,
                   done_col, _dsel(st, "qlen_o", st["ls_drv"])],
                  axis=-1),
        ed_p, _padmm(st["ls_ec"])], axis=-1)
    over = rec_on & ((st["nhits"] >= H_MAX) | (nmms > MM_SLOTS))
    st["overflow"] = st["overflow"] | over
    st["mode"] = jnp.where(over, M_DONE, st["mode"])
    do_store = rec_on & ~over
    W = 8 + 2 * MM_SLOTS
    hm = (jax.lax.broadcasted_iota(jnp.int32, (B, H_MAX), 1)
          == st["nhits"][:, None]) & do_store[:, None]
    st["hits"] = jnp.where(jnp.repeat(hm, W, axis=1),
                           jnp.tile(rec, (1, H_MAX)), st["hits"])
    st = _w(st, "nhits", do_store, st["nhits"] + 1)
    if rec_cap is not None:
        st["mode"] = jnp.where(do_store & (st["nhits"] >= rec_cap),
                               M_DONE, st["mode"])
    st = _w(st, "ca_found", rec_on, 0)        # consumed; keep advancing
    nf = m & ~found
    st = _w(st, "pre_min", nf, st["ca_min"])
    ex = nf & (st["ca_done"] > 0)
    st["mode"] = jnp.where(ex, M_DONE, st["mode"])
    st["mode"] = jnp.where(nf & ~ex, M_CADV, st["mode"])
    return st


def _step_cadv(st, cfgj, paired: bool):
    """Outer CostAwareRangeSourceDriver::advance entry
    (range_source.h:2180-2260)."""
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
    if paired:
        # CostAware::_mate_eliminated at advance entry
        # (best_driver.py:298): with both-mate sources merged, the
        # driver dies when either mate has no not-done source left
        # (every not-done source is still in `active`: pops remove
        # only done-and-not-found entries).  Checked only when no
        # delayed range is pending (the host emits a pending delayed
        # range first, :289-297).
        nd_ = st["od_done"].shape[1]
        ii_a = jax.lax.broadcasted_iota(jnp.int32,
                                        (m.shape[0], nd_), 1)
        o_m1_row = cfgj["o_m1"][st["cfg0o"][:, None] + ii_a] > 0
        alive_o = st["od_done"] == 0
        alive1 = jnp.any(alive_o & o_m1_row, axis=1)
        alive2 = jnp.any(alive_o & ~o_m1_row, axis=1)
        elim = m & ~dv & (~alive1 | ~alive2)
        st = _w(st, "ca_done", elim, 1)
        st["mode"] = jnp.where(elim, M_MAIN, st["mode"])
        m = m & ~elim
    has_act = st["act_n"] > 0
    act0 = st["act"][:, 0]
    st = _w(st, "ca_min", dv & has_act,
            jnp.maximum(_dsel(st, "od_min", act0), st["ca_min"]))
    st = _w(st, "ca_done", dv & ~has_act, 1)
    st["mode"] = jnp.where(dv, M_MAIN, st["mode"])
    m = m & ~dv
    emp = m & ~has_act
    st = _w(st, "ca_done", emp, 1)
    st["mode"] = jnp.where(emp, M_MAIN, st["mode"])
    go = m & ~emp
    st = _w(st, "cur_o", go, act0)
    st = _w(st, "octx", go, 0)
    st = _w(st, "precost", go, _dsel(st, "od_min", act0))
    pre = go & (_dsel(st, "od_found", act0) > 0)
    st["mode"] = jnp.where(pre, M_CPOST, st["mode"])
    st["mode"] = jnp.where(go & ~pre, M_OADV, st["mode"])
    return st


def _step_oadv(st, cfgj, L, has_seeded: bool):
    """Dispatch one outer-driver advance: plain -> flat machinery,
    seeded -> the SeededDriver scheduler."""
    m = st["mode"] == M_OADV
    cur_o = st["cur_o"]
    if not has_seeded:
        f0 = _cfgO(st, cfgj["o_flat0"], cur_o)
        st = _w(st, "cur", m, f0)
        st = _w(st, "phase", m, PH_OUTER)
        st = _load_cur_rows(st, m, st["cur"], cfgj, L)
        st["mode"] = jnp.where(m, M_DADV, st["mode"])
        return st
    kind = _cfgO(st, cfgj["o_kind"], cur_o)
    pl = m & (kind == 0)
    f0 = _cfgO(st, cfgj["o_flat0"], cur_o)
    st = _w(st, "cur", pl, f0)
    st = _w(st, "phase", pl, PH_OUTER)
    st = _load_cur_rows(st, pl, st["cur"], cfgj, L)
    st["mode"] = jnp.where(pl, M_DADV, st["mode"])
    st["mode"] = jnp.where(m & (kind == 1), M_SD, st["mode"])
    return st


def _step_sfx(st):
    """strandFix inner-loop head (range_source.h:2322-2352 while)."""
    m = st["mode"] == M_SFX
    cur_o = st["cur_o"]
    stop = m & ((_dsel(st, "od_done", cur_o) > 0) |
                (_dsel(st, "od_found", cur_o) > 0))
    st["mode"] = jnp.where(stop, M_SFXEND, st["mode"])
    st["mode"] = jnp.where(m & ~stop, M_OADV, st["mode"])
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
    (Branch::curtail/split scan, range_source.h:644-939)."""
    B, L = meta_row.shape
    ii = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    i0 = jnp.maximum(0, fd0 - frd)
    elig = (ii >= i0[:, None]) & (ii <= flen[:, None]) & \
        (ii < (st["qlen_cur"] - frd)[:, None]) & \
        ((meta_row & META_ELIM) == 0)
    quallo = (meta_row >> 5) & 0x7F
    strat = jnp.where((frd[:, None] + ii) < d3[:, None], 1 << 14, 0)
    cost = (quallo if qual_order else jnp.zeros_like(quallo)) | strat
    return elig, jnp.where(elig, cost, COST_INF)


def _merged_edits(st, cur, ed_row, ec_row, fne):
    """Branch edits followed by the driver's seed-stage premuts (the
    addPartialEdits accounting, ebwt_search_backtrack.h:2376): the
    premut's seed-relative 5' offset plays the depth role in the
    range's mismatch list."""
    B = cur.shape[0]
    npm = _dsel(st, "pm_n", cur)
    pmm = _dsel2(st, "pm_m", cur)
    pmc = _dsel2(st, "pm_c", cur)
    sl = jax.lax.broadcasted_iota(jnp.int32, (B, E_MAX), 1)
    from_br = sl < fne[:, None]
    pidx = jnp.clip(sl - fne[:, None], 0, 2)
    oh = pidx[:, :, None] == jnp.arange(3, dtype=jnp.int32)[None, None]
    pm_pos = jnp.sum(jnp.where(oh, pmm[:, None, :], 0), -1)
    pm_ref = jnp.sum(jnp.where(oh, pmc[:, None, :], 0), -1)
    ed = jnp.where(from_br, ed_row, pm_pos)
    ec = jnp.where(from_br, ec_row, pm_ref)
    return ed, ec, fne + npm


def _step_ext(st, cat: FMCat, cfgj, qual_lim: int, qual_order: bool,
              L: int):
    """One advanceBranch iteration, part 1: process the front branch —
    consume one position (quartet LF + installRanges) and apply the
    hit/empty/half-and-half outcome incl. Branch::curtail
    (ebwt_search_backtrack.h:2060-2361; range_source.h:877-939)."""
    m = st["mode"] == M_EXT
    B = m.shape[0]
    cur = st["cur"]
    efw = _cfgF(st, cfgj["ebwt_fw"], cur)
    hh = _cfgF(st, cfgj["hh"], cur)
    exacts = _cfgF(st, cfgj["exacts"], cur)
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
    qlen = st["qlen_cur"]

    # half-and-half entry check (best.py _hh_check_top)
    hhfail = m & (hh > 0) & (((depth == d5) & (fne == 0)) |
                             ((depth == d3) & (fne < hh)))

    consume = m & ~hhfail & (depth < qlen)
    mD = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1) \
        == jnp.clip(depth, 0, L - 1)[:, None]
    c = jnp.sum(jnp.where(mD, st["qp_cur"][:, :L], 0), axis=1)
    q = jnp.sum(jnp.where(mD, st["qp_cur"][:, L:], 0), axis=1)
    alt = (depth >= fd0) & (fham + q <= qual_lim)
    pt, pb = ftop, fbot
    n4 = consume & (c == 4) & (depth > 0)
    tb_top = jnp.where(n4, 1, ftop)
    tb_bot = jnp.where(n4, 1, fbot)
    caseA = consume & (tb_top == 0) & (tb_bot == 0)
    caseB = consume & ~caseA & alt & ((pb > pt) | (c == 4))
    caseC = consume & ~caseA & ~caseB & (pb > pt)
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

    qc = _sel_col(tops, jnp.clip(c, 0, 3))
    qb = _sel_col(bots, jnp.clip(c, 0, 3))
    new_top = jnp.where((caseA | caseB | caseC) & (c < 4), qc, tb_top)
    new_bot = jnp.where((caseA | caseB | caseC) & (c < 4), qb, tb_bot)
    new_top = jnp.where(caseA & (c == 4), 0, new_top)
    new_bot = jnp.where(caseA & (c == 4), 0, new_bot)
    st = _pw(st, "p_top", consume, fs, new_top)
    st = _pw(st, "p_bot", consume, fs, new_bot)
    eff_top = jnp.where(consume, new_top, ftop)
    eff_bot = jnp.where(consume, new_bot, fbot)

    cur0 = depth >= (qlen - 1)
    empty = eff_top == eff_bot
    hit = m & ~hhfail & cur0 & ~empty
    invalid_exact = hit & (fne == 0) & (exacts == 0)
    # _hh_check (best.py:437-450)
    ii = jax.lax.broadcasted_iota(jnp.int32, (B, E_MAX), 1)
    edm = ii < fne[:, None]
    ed_row = _lane_block(st["p_ed"], fs, E_MAX, NBR)
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
    curt = m & ~extend

    # FOUND: record cur_range for this flat driver (_mk_range, with
    # the driver's seed premuts appended)
    st = _w(st, "adv_found", found, 1)
    ec_row = _lane_block(st["p_ec"], fs, E_MAX, NBR)
    med, mec, mne = _merged_edits(st, cur, ed_row, ec_row, fne)
    rrv = jnp.stack([eff_top, eff_bot, fcost, fcost >> 14, mne], -1)
    st = _dw2(st, "rr", found, cur, rrv)
    st = _dw2(st, "rr_ed", found, cur, med)
    st = _dw2(st, "rr_ec", found, cur, mec)

    # EXTEND
    st = _pw(st, "p_len", extend, fs, flen + 1)

    # row writes: one-hot (slot, position) masked sweeps, fused into a
    # single pass per pool
    slot3 = _slot_mask(fs, B)                       # [B, NBR, 1]
    iota2L = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2 * L), 2)
    c3 = consume[:, None, None] & slot3
    st["ptb_pool"] = jnp.where(
        c3 & (iota2L == flen[:, None, None]), pt[:, None, None],
        jnp.where(c3 & (iota2L == (L + flen)[:, None, None]),
                  pb[:, None, None], st["ptb_pool"]))
    iotaL = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2)
    m1 = c3 & (iotaL == flen[:, None, None])
    m2 = (extend[:, None, None] & slot3 &
          (iotaL == (flen + 1)[:, None, None]))
    st["meta"] = jnp.where(m1, meta_new[:, None, None],
                           jnp.where(m2, META_ALL_DEAD, st["meta"]))
    st["overflow"] = st["overflow"] | (extend & (flen + 1 >= L))

    # CURTAIL (range_source.h:877-939 + PathManager::curtail 1434-1455)
    meta_row = _meta_row(st, fs, B)
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


def _step_spp(st, cat: FMCat, cfgj, qual_order: bool, L: int,
              bt_on: bool):
    """One advanceBranch iteration, part 2: splitAndPrep — delayed-cost
    fixups, the shared --maxbts ceiling, splitBranch/pick_edit with its
    RNG draws, then the loop exit checks
    (range_source.h:644-773,1459-1517)."""
    m = st["mode"] == M_SPP
    B = m.shape[0]
    cur = st["cur"]
    efw = _cfgF(st, cfgj["ebwt_fw"], cur)
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

    # backtrack-ceiling entry check (splitAndPrep: bt_cnt[0] == 0)
    btfail0 = jnp.zeros_like(m) if not bt_on else \
        (live & (st["bt"] == 0))
    clear0 = btfail0
    live = live & ~btfail0

    # delayed-increase fixup: one per machine step, stay in M_SPP
    dfix = live & (fdlyf > 0)
    st = _pw(st, "p_cost", dfix, fs, fdly)
    st = _pw(st, "p_dlyf", dfix, fs, jnp.zeros_like(fs))
    rest = live & ~dfix

    dosplit = rest & (fcurt > 0)
    # decrement the shared ceiling before splitting; hitting zero
    # aborts without splitting (range_source.h:1470-1476)
    if bt_on:
        st = _w(st, "bt", dosplit, jnp.maximum(st["bt"] - 1, 0))
        btfail1 = dosplit & (st["bt"] == 0)
        clear0 = clear0 | btfail1
        dosplit = dosplit & ~btfail1
        rest = rest & ~btfail1
    # pm-clear path (advance_branch: heap.clear(); min_cost = 0)
    if bt_on:
        cm = clear0[:, None] & (st["p_drv"] == cur[:, None])
        st["p_valid"] = jnp.where(cm, 0, st["p_valid"])
        st = _dw(st, "pm_min", clear0, cur, jnp.zeros_like(cur))
        st["mode"] = jnp.where(clear0, M_DEND, st["mode"])

    meta_row = _meta_row(st, fs, B)
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
    ndt_ = st["rng_rs"].shape[1]
    ohr = (jax.lax.broadcasted_iota(jnp.int32, (B, ndt_), 1)
           == cur[:, None]) & ndraw[:, None]
    st["rng_rs"] = jnp.where(ohr, rng2[:, None], st["rng_rs"])
    rank = n_t - w + r
    tcs = jnp.cumsum(tie.astype(jnp.int32), axis=1)
    posm = tie & (tcs == (rank + 1)[:, None])
    pos = jnp.argmax(posm, axis=1).astype(jnp.int32)
    depth_split = frd + pos

    pt_row, pb_row = _ptb_row(st, fs, B, L)
    spt = _sel_col(pt_row, pos)
    spb = _sel_col(pb_row, pos)
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
    ohr2 = (jax.lax.broadcasted_iota(jnp.int32, (B, ndt_), 1)
            == cur[:, None]) & multi[:, None]
    st["rng_rs"] = jnp.where(ohr2, rng3[:, None], st["rng_rs"])
    cumsp = jnp.cumsum(spreads, axis=1)
    chosen_multi = jnp.argmax(cands & (dart[:, None] < cumsp),
                              axis=1).astype(jnp.int32)
    chosen_single = jnp.argmax(cands, axis=1).astype(jnp.int32)
    last = num == 1
    chosen = jnp.where(last, chosen_single, chosen_multi)
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
    ed_row = _lane_block(st["p_ed"], fs, E_MAX, NBR)
    ec_row = _lane_block(st["p_ec"], fs, E_MAX, NBR)
    sl = jax.lax.broadcasted_iota(jnp.int32, (B, E_MAX), 1)
    at_ne = sl == jnp.clip(fne, 0, E_MAX - 1)[:, None]
    ned_row = jnp.where(at_ne, depth_split[:, None], ed_row)
    nec_row = jnp.where(at_ne, chosen[:, None], ec_row)
    ohc = (jax.lax.broadcasted_iota(jnp.int32, (B, NBR), 1)
           == cslot[:, None]) & ok[:, None]
    ohf = jnp.tile(ohc, (1, E_MAX))          # element-major [B, E*NBR]
    st["p_ed"] = jnp.where(ohf, jnp.repeat(ned_row, NBR, axis=1),
                           st["p_ed"])
    st["p_ec"] = jnp.where(ohf, jnp.repeat(nec_row, NBR, axis=1),
                           st["p_ec"])

    # parent post-split bookkeeping
    exh = ok & (n_el == 1) & last
    st = _pw(st, "p_valid", exh, fs, jnp.zeros_like(fs))
    dly = ok & ~exh & (n_t == 1) & last & (best != nxt) & \
        (nxt != COST_INF)
    st = _pw(st, "p_dly", dly, fs, fcost - best + nxt)
    st = _pw(st, "p_dlyf", dly, fs, jnp.ones_like(fs))

    # combined parent-elim + child-clear write (one fused sweep)
    iotaL = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2)
    ok3 = ok[:, None, None]
    mp = ok3 & _slot_mask(fs, B) & (iotaL == pos[:, None, None])
    mc = ok3 & _slot_mask(cslot, B) & (iotaL == 0)
    st["meta"] = jnp.where(mp, pm_new[:, None, None],
                           jnp.where(mc, META_ALL_DEAD, st["meta"]))

    # ---- loop exit checks (advance_branch tail) ----------------------
    chk = (rest & ~over) | pm_empty
    elig2 = (st["p_valid"] > 0) & (st["p_drv"] == cur[:, None])
    any2 = jnp.any(elig2, axis=1)
    fca = jnp.min(jnp.where(elig2, st["p_cost"], INF32), axis=1)
    st = _dw(st, "pm_min", m & any2, cur, fca)
    exit_ = chk & (~any2 | (fca != st["loop_cost"]) |
                   (st["adv_found"] > 0))
    st["mode"] = jnp.where(exit_, M_DEND, st["mode"])
    st["mode"] = jnp.where(chk & ~exit_, M_EXT, st["mode"])
    return st


def _step_dend(st):
    """BestDriver.advance tail: done/min_cost updates, then return to
    the caller by phase (outer / generator / inner-full)."""
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
    st["mode"] = jnp.where(m & (st["phase"] == PH_OUTER), M_ODEND,
                           st["mode"])
    st["mode"] = jnp.where(m & (st["phase"] == PH_GEN), M_SDGEN,
                           st["mode"])
    st["mode"] = jnp.where(m & (st["phase"] == PH_FULL), M_ICPOST,
                           st["mode"])
    return st


def _step_odend(st, cfgj):
    """One outer-driver advance finished: sync outer state (plain
    drivers mirror their flat source) and continue per context (main
    CostAware flow vs the strandFix loop)."""
    m = st["mode"] == M_ODEND
    cur_o = st["cur_o"]
    kind = _cfgO(st, cfgj["o_kind"], cur_o)
    f0 = _cfgO(st, cfgj["o_flat0"], cur_o)
    pl = m & (kind == 0)
    st = _dw(st, "od_done", pl, cur_o, _dsel(st, "drv_done", f0))
    st = _dw(st, "od_min", pl, cur_o, _dsel(st, "drv_min", f0))
    pf = pl & (_dsel(st, "drv_found", f0) > 0)
    st = _dw(st, "od_found", pf, cur_o, jnp.ones_like(cur_o))
    st = _dw(st, "drv_found", pf, f0, jnp.zeros_like(f0))
    rrv = _dsel2(st, "rr", f0)
    st = _dw2(st, "od_rr", pf, cur_o, rrv)
    st = _dw2(st, "od_ed", pf, cur_o, _dsel2(st, "rr_ed", f0))
    st = _dw2(st, "od_ec", pf, cur_o, _dsel2(st, "rr_ec", f0))
    # route by context
    main = m & (st["octx"] == 0)
    st["mode"] = jnp.where(main, M_CPOST, st["mode"])
    sf = m & (st["octx"] == 1)
    exceed = sf & (_dsel(st, "od_min", cur_o) > st["sfx_mc"])
    st["mode"] = jnp.where(exceed, M_SFXEND, st["mode"])
    st["mode"] = jnp.where(sf & ~exceed, M_SFX, st["mode"])
    return st


def _step_cpost(st, cfgj, nd: int):
    """Outer CostAware.advance after p.advance(): consume a found range
    (_found_first_range incl. the strandFix scan) and decide whether to
    re-sort (range_source.h:2262-2360)."""
    m = st["mode"] == M_CPOST
    cur_o = st["cur_o"]
    pf = m & (_dsel(st, "od_found", cur_o) > 0)
    needs0 = (_dsel(st, "od_done", cur_o) > 0) | \
        (st["precost"] != _dsel(st, "od_min", cur_o))

    st = _copy_outer_range(st, pf, "ls_", cur_o)
    st = _w(st, "ca_found", pf, 1)
    st = _dw(st, "od_found", pf, cur_o, jnp.zeros_like(cur_o))
    r_fw = _cfgO(st, cfgj["o_fw"], cur_o)
    r_m1 = _cfgO(st, cfgj["o_m1"], cur_o)
    # first i >= 1 (STATIC rss order) with outer cfg.fw[i] != r.fw,
    # same mate, and i < act_n (the rss_[i]/active_[i] quirk)
    ii = jax.lax.broadcasted_iota(jnp.int32, (1, nd), 1)
    cfg_fw_row = cfgj["o_fw"][st["cfg0o"][:, None] + ii]
    cfg_m1_row = cfgj["o_m1"][st["cfg0o"][:, None] + ii]
    cand = (ii >= 1) & (cfg_fw_row != r_fw[:, None]) & \
        (cfg_m1_row == r_m1[:, None]) & \
        (ii < st["act_n"][:, None])
    has_i = jnp.any(cand, axis=1)
    i_star = jnp.argmax(cand, axis=1).astype(jnp.int32)
    sf = pf & has_i
    tgt = _sel_col(st["act"], i_star)
    mc = jnp.maximum(st["ca_min"], _dsel(st, "od_min", tgt))
    brk = sf & (mc > st["ls_cost"])
    go = sf & ~brk
    st = _w(st, "cur_o", go, tgt)
    st = _w(st, "octx", go, 1)
    st = _w(st, "sfx_mc", go, mc)
    st["mode"] = jnp.where(go, M_SFX, st["mode"])

    fin = m & ~go
    needs = needs0 | go
    dosort = fin & needs
    st["mode"] = jnp.where(dosort, M_SORT, st["mode"])
    st["mode"] = jnp.where(fin & ~dosort, M_MAIN, st["mode"])
    return st


def _step_sfxend(st):
    """strandFix loop tail: maybe take the opposite-strand range as
    delayed, with the spread-weighted swap draw
    (range_source.h:2329-2345)."""
    m = st["mode"] == M_SFXEND
    cur_o = st["cur_o"]
    pf = m & (_dsel(st, "od_found", cur_o) > 0)
    st = _copy_outer_range(st, pf, "dl_", cur_o)
    st = _w(st, "dl_valid", pf, 1)
    st = _dw(st, "od_found", pf, cur_o, jnp.zeros_like(cur_o))
    tot = (st["dl_bot"] - st["dl_top"]) + (st["ls_bot"] - st["ls_top"])
    rng2, v = _rng_next(st["rng_ca"])
    st["rng_ca"] = jnp.where(pf, rng2, st["rng_ca"])
    rq = (v % jnp.maximum(tot, 1).astype(jnp.uint32)).astype(jnp.int32)
    swap = pf & (rq < (st["dl_bot"] - st["dl_top"]))
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
    st = _w(st, "octx", m, 0)
    st["mode"] = jnp.where(m, M_SORT, st["mode"])
    return st


def _step_sort(st, nd: int):
    """Outer sortActives + the post-sort active-empty check."""
    m = st["mode"] == M_SORT
    act, act_n, rng = _sort_generic(
        m, st["act"], st["act_n"], st["od_done"], st["od_found"],
        st["od_min"], st["rng_ca"], nd)
    st["act"] = jnp.where(m[:, None], act, st["act"])
    st["act_n"] = jnp.where(m, act_n, st["act_n"])
    st["rng_ca"] = jnp.where(m, rng, st["rng_ca"])
    first = act[:, 0]
    # minCost update skipped while a delayed range is pending
    # (range_source.h:2409-2413): its cost, not active[0]'s, is the
    # frontier the sink's irrelevantCost must see
    st = _w(st, "ca_min", m & (act_n > 0) & (st["dl_valid"] == 0),
            jnp.maximum(_dsel(st, "od_min", first), st["ca_min"]))
    emp = m & (act_n == 0)
    st = _w(st, "ca_done", emp, (st["dl_valid"] == 0).astype(jnp.int32))
    st["mode"] = jnp.where(m, M_MAIN, st["mode"])
    return st


# ---------------------------------------------------------------------------
# Seeded-driver scheduler (EbwtSeededRangeSourceDriver)
# ---------------------------------------------------------------------------

def _step_sd(st, cfgj, L):
    """SeededDriver.advance entry: done checks, 0xFFFF pruning, the
    do_full scheduling decision (best_driver.py:324-368)."""
    m = st["mode"] == M_SD
    cur_o = st["cur_o"]
    gen = _cfgO(st, cfgj["o_flat0"], cur_o)
    gdone = _dsel(st, "drv_done", gen) > 0
    gfound = _dsel(st, "drv_found", gen) > 0
    fdone = _dsel(st, "ic_done", cur_o) > 0
    ffound = _dsel(st, "ic_found", cur_o) > 0

    alldone = m & gdone & fdone & ~gfound & ~ffound
    st = _dw(st, "od_done", alldone, cur_o, jnp.ones_like(cur_o))
    st["mode"] = jnp.where(alldone, M_ODEND, st["mode"])
    rest = m & ~alldone

    sdead = rest & gdone & ~gfound
    st = _dw(st, "drv_min", sdead, gen,
             jnp.full_like(gen, COST_INF))
    ret1 = sdead & (_dsel(st, "ic_min", cur_o) >
                    _dsel(st, "od_min", cur_o))
    st = _dw(st, "od_min", ret1, cur_o, _dsel(st, "ic_min", cur_o))
    st["mode"] = jnp.where(ret1, M_ODEND, st["mode"])
    rest = rest & ~ret1

    fdead = rest & fdone & ~ffound
    st = _dw(st, "ic_min", fdead, cur_o,
             jnp.full_like(cur_o, COST_INF))
    ret2 = fdead & (_dsel(st, "drv_min", gen) >
                    _dsel(st, "od_min", cur_o))
    st = _dw(st, "od_min", ret2, cur_o, _dsel(st, "drv_min", gen))
    st["mode"] = jnp.where(ret2, M_ODEND, st["mode"])
    rest = rest & ~ret2

    do_full = _dsel(st, "ic_min", cur_o) <= _dsel(st, "drv_min", gen)
    genp = rest & ~do_full
    pre_g = genp & gfound
    st["mode"] = jnp.where(pre_g, M_SDGEN, st["mode"])
    adv_g = genp & ~gfound
    st = _w(st, "cur", adv_g, gen)
    st = _w(st, "phase", adv_g, PH_GEN)
    st = _load_cur_rows(st, adv_g, st["cur"], cfgj, L)
    st["mode"] = jnp.where(adv_g, M_DADV, st["mode"])

    fullp = rest & do_full
    st = _w(st, "sdf_old", fullp, _dsel(st, "ic_min", cur_o))
    pre_f = fullp & ffound
    st["mode"] = jnp.where(pre_f, M_SDFULL, st["mode"])
    st["mode"] = jnp.where(fullp & ~pre_f, M_ICADV, st["mode"])
    return st


def _step_sdgen(st, cat: FMCat, cfgj, hostish, qual_order: bool,
                L: int, fc: int):
    """After a generator advance: on a seed partial, create a full
    extender (its whole set_query runs on device: premut application,
    N tally, ftab jump, initial branch) and add it to the inner
    CostAware (add_source incl. the inner sort's draws); then the
    generator min-cost propagation (SeededDriver.advance not-do_full
    tail)."""
    m = st["mode"] == M_SDGEN
    B = m.shape[0]
    cur_o = st["cur_o"]
    gen = _cfgO(st, cfgj["o_flat0"], cur_o)
    gfound = m & (_dsel(st, "drv_found", gen) > 0)

    # seed range from the generator's rr regs
    srr = _dsel2(st, "rr", gen)
    scost = srr[:, 2]
    sne = srr[:, 4]
    sed = _dsel2(st, "rr_ed", gen)       # search depths in gen coords
    sec = _dsel2(st, "rr_ec", gen)
    st = _dw(st, "drv_found", gfound, gen, jnp.zeros_like(gen))

    # allocate an extender slot
    exb = _cfgO(st, cfgj["o_exbase"], cur_o)
    slot = _dsel(st, "ex_next", cur_o)
    over = gfound & ((slot >= PEX) | (sne > 3))
    st["overflow"] = st["overflow"] | over
    st["mode"] = jnp.where(over, M_DONE, st["mode"])
    ok = gfound & ~over
    flat_e = exb + jnp.clip(slot, 0, PEX - 1)
    st = _dw(st, "ex_next", ok, cur_o, slot + 1)

    # --- extender set_query (device) ---------------------------------
    # premuts: seed-relative 5' offsets m = dqlen_gen - 1 - depth
    gdq = _dsel(st, "dqlen", gen)
    pm_m = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (B, 3), 1) < sne[:, None],
        gdq[:, None] - 1 - sed[:, :3], 0)
    pm_c = sec[:, :3]
    st = _dw2(st, "pm_m", ok, flat_e, pm_m)
    st = _dw2(st, "pm_c", ok, flat_e, pm_c)
    st = _dw(st, "pm_n", ok, flat_e, sne)
    # geometry: full qlen, d3 = s (seed edge), d5 = s >> 1 (nudge left)
    qlen = _dsel(st, "qlen_o", cur_o)
    s_seed = _dsel(st, "dd3", gen)       # = min(seed_len, qlen)
    st = _dw(st, "dqlen", ok, flat_e, qlen)
    st = _dw(st, "dd3", ok, flat_e, s_seed)
    st = _dw(st, "dd5", ok, flat_e, s_seed >> 1)
    iham = (scost & 0x3FFF) if qual_order else jnp.zeros_like(scost)
    st = _dw(st, "drv_nextid", ok, flat_e, jnp.zeros_like(flat_e))
    st = _dw(st, "pm_min", ok, flat_e, jnp.zeros_like(flat_e))
    ndt_ = st["rng_rs"].shape[1]
    ohr = (jax.lax.broadcasted_iota(jnp.int32, (B, ndt_), 1)
           == flat_e[:, None]) & ok[:, None]
    st["rng_rs"] = jnp.where(ohr, _dsel(st, "seed_o", cur_o)[:, None],
                             st["rng_rs"])

    # derive the extender's qd row (with premuts) for tally + ftab
    qd_e, _pend_e = _derive_qd(st, cfgj, jnp.where(ok, flat_e, gen), L)
    di = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    dead = jnp.any((qd_e == 4) & (di < s_seed[:, None]), axis=1)
    ns_ftab = jnp.sum(((qd_e[:, :fc] == 4) &
                       (di[:, :fc] < qlen[:, None])).astype(jnp.int32),
                      axis=1)
    use_ftab = (ns_ftab == 0) & (jnp.minimum(s_seed, qlen) >= fc)
    wsh = (2 * jnp.arange(fc, dtype=jnp.int32))[None, :]
    qf = jnp.where(qd_e[:, :fc] > 3, 0, qd_e[:, :fc])
    foff = jnp.sum(qf << wsh, axis=1)
    efw_e = _cfgF(st, cfgj["ebwt_fw"], jnp.where(ok, flat_e, gen))
    ftab_base = jnp.where(efw_e > 0, cat.ftab_base[0],
                          cat.ftab_base[1])
    ft = _g1(cat.ftab_hi, jnp.where(ok, foff, 0) + ftab_base)
    fb = _g1(cat.ftab_lo, jnp.where(ok, foff + 1, 1) + ftab_base)
    nonempty = fb > ft
    alive = ok & ~dead & (qlen >= 4)
    imm = alive & use_ftab & (qlen == fc) & nonempty
    # immediate range: mms = premuts only (nmms = sne)
    rr_imm = jnp.stack([ft, fb, scost, scost >> 14, sne], -1)
    st = _dw2(st, "rr", imm, flat_e, rr_imm)
    pad = jnp.zeros((B, E_MAX - 3), jnp.int32)
    st = _dw2(st, "rr_ed", imm, flat_e,
              jnp.concatenate([pm_m, pad], axis=1))
    st = _dw2(st, "rr_ec", imm, flat_e,
              jnp.concatenate([pm_c, pad], axis=1))
    pushf = alive & use_ftab & (qlen > fc) & nonempty
    push0 = alive & ~use_ftab
    pushed = pushf | push0
    # pool slot for the initial branch
    fkey = st["p_valid"] * NBR + \
        jax.lax.broadcasted_iota(jnp.int32, (B, NBR), 1)
    cslot = jnp.argmin(fkey, axis=1).astype(jnp.int32)
    pool_full = _psel(st, "p_valid", cslot) > 0
    over2 = pushed & pool_full
    st["overflow"] = st["overflow"] | over2
    st["mode"] = jnp.where(over2, M_DONE, st["mode"])
    pushed = pushed & ~over2
    blen0 = jnp.where(pushf, fc, 0)
    for name, val in (("p_valid", jnp.ones_like(cslot)),
                      ("p_drv", flat_e), ("p_cost", scost),
                      ("p_ham", iham),
                      ("p_rdepth", jnp.zeros_like(cslot)),
                      ("p_len", blen0),
                      ("p_top", jnp.where(pushf, ft, 0)),
                      ("p_bot", jnp.where(pushf, fb, 0)),
                      ("p_curt", jnp.zeros_like(cslot)),
                      ("p_dly", jnp.zeros_like(cslot)),
                      ("p_dlyf", jnp.zeros_like(cslot)),
                      ("p_id", jnp.zeros_like(cslot)),
                      ("p_ne", jnp.zeros_like(cslot)),
                      ("p_d0", s_seed), ("p_d1", s_seed),
                      ("p_d2", s_seed), ("p_d3", s_seed)):
        st = _pw(st, name, pushed, cslot, val)
    st = _dw(st, "drv_nextid", pushed, flat_e, jnp.ones_like(flat_e))
    # clear the created branch's first scan position
    iotaL = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2)
    mcf = (pushed[:, None, None] & _slot_mask(cslot, B) &
           (iotaL == blen0[:, None, None]))
    st["meta"] = jnp.where(mcf, META_ALL_DEAD, st["meta"])
    st = _dw(st, "drv_done", ok, flat_e,
             (~pushed & ~imm).astype(jnp.int32))
    st = _dw(st, "drv_found", ok, flat_e, imm.astype(jnp.int32))
    st = _dw(st, "drv_min", ok, flat_e, scost)

    # --- inner add_source --------------------------------------------
    st = _dw(st, "ic_found", ok, cur_o, jnp.zeros_like(cur_o))
    st = _dw(st, "ic_done", ok, cur_o, jnp.zeros_like(cur_o))
    actn = _dsel(st, "ic_actn", cur_o)
    iact = _dsel2(st, "ic_act", cur_o)          # [B, PEX]
    sl4 = jax.lax.broadcasted_iota(jnp.int32, iact.shape, 1)
    iact = jnp.where((sl4 == actn[:, None]) & ok[:, None],
                     flat_e[:, None], iact)
    actn2 = jnp.where(ok, actn + 1, actn)
    # inner sort (add_source: min_cost = 0 then _sort_actives)
    irng = _dsel(st, "ic_rng", cur_o).astype(jnp.uint32)
    iact3, actn3, irng3 = _sort_generic(
        ok, iact, actn2, st["drv_done"], st["drv_found"],
        st["drv_min"], irng, PEX)
    st = _dw2(st, "ic_act", m, cur_o, jnp.where(ok[:, None], iact3,
                                                iact))
    st = _dw(st, "ic_actn", m, cur_o, jnp.where(ok, actn3, actn))
    nd_ = st["ic_rng"].shape[1]
    ohri = (jax.lax.broadcasted_iota(jnp.int32, (B, nd_), 1)
            == cur_o[:, None]) & ok[:, None]
    st["ic_rng"] = jnp.where(ohri, irng3[:, None], st["ic_rng"])
    ifirst = iact3[:, 0]
    icm = jnp.where(actn3 > 0,
                    jnp.maximum(_dsel(st, "drv_min", ifirst), 0), 0)
    st = _dw(st, "ic_min", ok, cur_o, icm)

    # --- generator min-cost propagation (not-do_full tail) -----------
    gmin = _dsel(st, "drv_min", gen)
    omin = _dsel(st, "od_min", cur_o)
    upd = m & (gmin > omin)
    st = _dw(st, "od_min", upd, cur_o, gmin)
    icd = _dsel(st, "ic_done", cur_o) > 0
    upd2 = upd & ~icd
    st = _dw(st, "od_min", upd2, cur_o,
             jnp.minimum(_dsel(st, "od_min", cur_o),
                         _dsel(st, "ic_min", cur_o)))
    st["mode"] = jnp.where(m & (st["mode"] == M_SDGEN), M_ODEND,
                           st["mode"])
    return st


def _step_sdfull(st, cfgj):
    """SeededDriver.advance do_full tail: consume an inner-found range
    as the outer's (with the outer fw override) and propagate inner
    min-cost increases."""
    m = st["mode"] == M_SDFULL
    cur_o = st["cur_o"]
    gen = _cfgO(st, cfgj["o_flat0"], cur_o)
    ff = m & (_dsel(st, "ic_found", cur_o) > 0)
    st = _dw(st, "od_found", ff, cur_o, jnp.ones_like(cur_o))
    st = _dw(st, "ic_found", ff, cur_o, jnp.zeros_like(cur_o))
    rrv = jnp.stack([_dsel(st, "il_top", cur_o),
                     _dsel(st, "il_bot", cur_o),
                     _dsel(st, "il_cost", cur_o),
                     _dsel(st, "il_strat", cur_o),
                     _dsel(st, "il_ne", cur_o)], -1)
    st = _dw2(st, "od_rr", ff, cur_o, rrv)
    st = _dw2(st, "od_ed", ff, cur_o, _dsel2(st, "il_ed", cur_o))
    st = _dw2(st, "od_ec", ff, cur_o, _dsel2(st, "il_ec", cur_o))
    icm = _dsel(st, "ic_min", cur_o)
    upd = m & (icm > st["sdf_old"])
    st = _dw(st, "od_min", upd, cur_o,
             jnp.minimum(icm, _dsel(st, "drv_min", gen)))
    st["mode"] = jnp.where(m, M_ODEND, st["mode"])
    return st


def _step_icadv(st, cfgj, L):
    """Inner CostAware.advance entry (strand_fix=False, no delayed)."""
    m = st["mode"] == M_ICADV
    cur_o = st["cur_o"]
    actn = _dsel(st, "ic_actn", cur_o)
    emp = m & (actn == 0)
    st = _dw(st, "ic_done", emp, cur_o, jnp.ones_like(cur_o))
    st["mode"] = jnp.where(emp, M_SDFULL, st["mode"])
    go = m & ~emp
    p = _dsel2(st, "ic_act", cur_o)[:, 0]
    st = _w(st, "cur", go, p)
    st = _w(st, "ic_pre", go, _dsel(st, "drv_min", p))
    pre = go & (_dsel(st, "drv_found", p) > 0)
    st["mode"] = jnp.where(pre, M_ICPOST, st["mode"])
    adv = go & ~pre
    st = _w(st, "phase", adv, PH_FULL)
    st = _load_cur_rows(st, adv, st["cur"], cfgj, L)
    st["mode"] = jnp.where(adv, M_DADV, st["mode"])
    return st


def _step_icpost(st):
    """Inner CostAware.advance tail: consume the extender's range into
    the inner last-range regs; sort when needed."""
    m = st["mode"] == M_ICPOST
    cur_o = st["cur_o"]
    p = st["cur"]
    pf = m & (_dsel(st, "drv_found", p) > 0)
    rrv = _dsel2(st, "rr", p)
    st = _dw(st, "il_top", pf, cur_o, rrv[:, 0])
    st = _dw(st, "il_bot", pf, cur_o, rrv[:, 1])
    st = _dw(st, "il_cost", pf, cur_o, rrv[:, 2])
    st = _dw(st, "il_strat", pf, cur_o, rrv[:, 3])
    st = _dw(st, "il_ne", pf, cur_o, rrv[:, 4])
    st = _dw2(st, "il_ed", pf, cur_o, _dsel2(st, "rr_ed", p))
    st = _dw2(st, "il_ec", pf, cur_o, _dsel2(st, "rr_ec", p))
    st = _dw(st, "ic_found", pf, cur_o, jnp.ones_like(cur_o))
    st = _dw(st, "drv_found", pf, p, jnp.zeros_like(p))
    needs = m & ((_dsel(st, "drv_done", p) > 0) |
                 (st["ic_pre"] != _dsel(st, "drv_min", p)))
    # inner sort
    iact = _dsel2(st, "ic_act", cur_o)
    actn = _dsel(st, "ic_actn", cur_o)
    irng = _dsel(st, "ic_rng", cur_o).astype(jnp.uint32)
    iact2, actn2, irng2 = _sort_generic(
        needs, iact, actn, st["drv_done"], st["drv_found"],
        st["drv_min"], irng, PEX)
    st = _dw2(st, "ic_act", needs, cur_o, iact2)
    st = _dw(st, "ic_actn", needs, cur_o, actn2)
    B = m.shape[0]
    nd_ = st["ic_rng"].shape[1]
    ohri = (jax.lax.broadcasted_iota(jnp.int32, (B, nd_), 1)
            == cur_o[:, None]) & needs[:, None]
    st["ic_rng"] = jnp.where(ohri, irng2[:, None], st["ic_rng"])
    ifirst = iact2[:, 0]
    st = _dw(st, "ic_min", needs & (actn2 > 0), cur_o,
             jnp.maximum(_dsel(st, "drv_min", ifirst),
                         _dsel(st, "ic_min", cur_o)))
    st = _dw(st, "ic_done", needs & (actn2 == 0), cur_o,
             jnp.ones_like(cur_o))
    st["mode"] = jnp.where(m, M_SDFULL, st["mode"])
    return st


def _step_chase(st, cat: FMCat, cfgj, nfrag: int, n_k: int, m_max: int,
                strata: bool):
    """One RangeChaser row: resolve + joinedToTextOff + sink
    (range_chaser.h:22; BestSink.report_hit in best_driver.py)."""
    m = st["mode"] == M_CHASE
    B = m.shape[0]
    efw = _cfgO(st, cfgj["o_chase_efw"], st["ls_drv"])
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
    qlen = _dsel(st, "qlen_o", st["ls_drv"])
    if nfrag == 1:
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
    fwflag = _cfgO(st, cfgj["o_fw"], st["ls_drv"])
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
    W = 8 + 2 * MM_SLOTS
    hm = (jax.lax.broadcasted_iota(jnp.int32, (B, H_MAX), 1)
          == st["nhits"][:, None]) & do_store[:, None]
    st["hits"] = jnp.where(jnp.repeat(hm, W, axis=1),
                           jnp.tile(rec, (1, H_MAX)), st["hits"])
    st = _w(st, "nhits", do_store, st["nhits"] + 1)
    stop = do_store & (newcount == n_k) & \
        ((m_max == INF32) | (m_max < n_k))
    st = _w(st, "result", stop, 1)
    st["mode"] = jnp.where(stop, M_DONE, st["mode"])
    irr = do_store & ~stop & _irrelevant(st, st["ls_cost"], strata)
    go_on = m & ~maxed & ~stop & ~over & ~irr
    nk2 = st["ch_k"] + 1
    st = _w(st, "ch_k", go_on, nk2)
    wrapped = go_on & (nk2 >= spread)
    endc = irr | wrapped
    st = _w(st, "ca_found", endc, 0)
    st["mode"] = jnp.where(endc, M_MAIN, st["mode"])
    return st


# ---------------------------------------------------------------------------
# Machine driver
# ---------------------------------------------------------------------------

def _machine_step(st, cat: FMCat, cfgj, nd: int, ndt: int, L: int,
                  nfrag: int, n_k: int, m_max: int, strata: bool,
                  qual_lim: int, qual_order: bool, bt_on: bool,
                  fc: int, has_seeded: bool, record: bool = False,
                  rec_cap: int | None = None, paired: bool = False):
    st = dict(st)
    # mode-presence counts in ONE [B, nmodes] pass (see dfs_device):
    # lanes flipping into a gated mode mid-step run next iteration
    cnts = jnp.sum(st["mode"][:, None] ==
                   jnp.arange(M_ICPOST + 1, dtype=jnp.int32)[None, :],
                   axis=0)

    def gate(modes, fn, s):
        """Run a sub-step group only when some lane is in one of its
        modes: the heavy groups (sorts, extender creation, chases)
        cost 0.5-3 ms even fully masked, while a cond costs ~0.05 ms."""
        p = jnp.zeros((), bool)
        for mc in modes:
            p = p | (cnts[mc] > 0)
        return jax.lax.cond(p, fn, lambda x: dict(x), s)

    st = _step_main(st, strata, record, rec_cap)
    st = _step_cadv(st, cfgj, paired)
    st = _step_sfx(st)
    if has_seeded:
        st = gate((M_SD, M_ICADV), lambda s: _step_icadv(
            _step_sd(s, cfgj, L), cfgj, L), st)
    st = _step_oadv(st, cfgj, L, has_seeded)
    st = _step_dadv(st)
    st = _step_ext(st, cat, cfgj, qual_lim, qual_order, L)
    st = _step_spp(st, cat, cfgj, qual_order, L, bt_on)
    st = _step_dend(st)
    if has_seeded:
        st = gate((M_SDGEN, M_ICPOST, M_SDFULL), lambda s: _step_sdfull(
            _step_icpost(_step_sdgen(
                s, cat, cfgj, None, qual_order, L, fc)), cfgj), st)
    st = _step_odend(st, cfgj)
    st = _step_cpost(st, cfgj, nd)
    st = _step_sfxend(st)
    st = gate((M_SORT,), lambda s: _step_sort(s, nd), st)
    if not record:
        st = gate((M_CHASE,), lambda s: _step_chase(
            s, cat, cfgj, nfrag, n_k, m_max, strata), st)
    return st


@partial(jax.jit, static_argnames=("nd", "ndt", "L", "nfrag", "n_k",
                                   "m_max", "strata", "qual_lim",
                                   "qual_order", "bt_on", "fc",
                                   "has_seeded", "chunk", "record",
                                   "rec_cap", "paired"))
def run_chunk(cat: FMCat, cfgj, st, *, nd: int, ndt: int, L: int,
              nfrag: int, n_k: int, m_max: int, strata: bool,
              qual_lim: int, qual_order: bool, bt_on: bool, fc: int,
              has_seeded: bool, chunk: int, record: bool = False,
              rec_cap: int | None = None, paired: bool = False):
    def cond(c):
        s, it = c
        return (it < chunk) & jnp.any(s["mode"] != M_DONE)

    def body(c):
        s, it = c
        return _machine_step(s, cat, cfgj, nd, ndt, L, nfrag, n_k,
                             m_max, strata, qual_lim, qual_order,
                             bt_on, fc, has_seeded, record,
                             rec_cap, paired), it + 1

    st, it = jax.lax.while_loop(cond, body, (st, jnp.int32(0)))
    return st, st["mode"]


# ---------------------------------------------------------------------------
# Compaction + harvest
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("L",))
def _compact(st, idxs, pad, *, L: int):
    B_old = st["mode"].shape[0]

    def take(v):
        return v[idxs]

    st2 = {k: take(v) for k, v in st.items()}
    st2["mode"] = jnp.where(pad, M_DONE, st2["mode"])
    st2["result"] = jnp.where(pad, 0, st2["result"])
    st2["overflow"] = jnp.where(pad, False, st2["overflow"])
    st2["nhits"] = jnp.where(pad, 0, st2["nhits"])
    return st2


@jax.jit
def _harvest_small(st, idxs):
    ks = ("result", "overflow", "count", "best_stratum", "nhits")
    return jnp.stack([st[k][idxs].astype(jnp.int32) for k in ks])


@jax.jit
def _poll_all(st):
    """Mode + per-lane scalars in ONE [6, B] transfer (each tunnel
    round trip costs ~0.2 s; the poll carries the harvest scalars)."""
    ks = ("mode", "result", "overflow", "count", "best_stratum",
          "nhits")
    return jnp.stack([st[k].astype(jnp.int32) for k in ks])


def _harvest_poll(st, poll, idxs):
    """Harvest lanes from a poll snapshot: one pack transfer."""
    out = {k: poll[i + 1][idxs].copy()
           for i, k in enumerate(_HARVEST_KEYS)}
    out["overflow"] = out["overflow"].astype(bool)
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


_HARVEST_KEYS = ("result", "overflow", "count", "best_stratum",
                 "nhits")


def _unpack_small(packed):
    arr = np.asarray(packed)
    out = {k: arr[i] for i, k in enumerate(_HARVEST_KEYS)}
    out["overflow"] = out["overflow"].astype(bool)
    return out


@jax.jit
def _gather_rows(arr, lanes, slots):
    """[n, W] hit records from the flat [B, H_MAX*W] hits pool."""
    W = 8 + 2 * MM_SLOTS
    return arr[lanes[:, None],
               (slots * W)[:, None] + jnp.arange(W, dtype=slots.dtype)]


def _pad_pow2(a, fill=0, lo=64):
    n = max(lo, 1 << int(np.ceil(np.log2(max(1, len(a))))))
    if len(a) == n:
        return a
    return np.concatenate([a, np.full(n - len(a), fill, a.dtype)])


def _harvest(st, idxs):
    dev_idx = jnp.asarray(idxs)
    out = _unpack_small(_harvest_small(st, dev_idx))
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


def run_compacting(cat: FMCat, cfgj, st, *, L: int, max_steps: int,
                   chunk=(96, 96, 192, 384, 768),
                   min_bucket: int = 512, **kw):
    """chunk may be an int or a schedule tuple (last entry repeats):
    per-step cost scales with the live bucket size, so short early
    chunks compact away the fast lanes before the straggler tail."""
    import os
    import sys
    import time
    prof = bool(os.environ.get("BOWTIE_TPU_PROF"))
    B0 = st["mode"].shape[0]
    orig = np.arange(B0)
    out = None
    steps = 0
    sched = (chunk,) if isinstance(chunk, int) else tuple(chunk)
    ci = 0
    while True:
        csteps = sched[min(ci, len(sched) - 1)]
        ci += 1
        t0 = time.time()
        st, _ = run_chunk(cat, cfgj, st, chunk=csteps, L=L, **kw)
        steps += csteps
        poll = np.asarray(_poll_all(st))
        if prof:
            print(f"[prof best] round {ci}: B={st['mode'].shape[0]} "
                  f"chunk={csteps} live_after="
                  f"{int((poll[0] != M_DONE).sum())} "
                  f"chunk+poll={time.time() - t0:.3f}s",
                  file=sys.stderr, flush=True)
        mode = poll[0]
        act = np.flatnonzero(mode != M_DONE)
        live = orig >= 0
        if len(act) == 0 or steps >= max_steps:
            sub = np.flatnonzero(live)
            h = _harvest_poll(st, poll, sub)
            if steps >= max_steps and len(act):
                h["overflow"] = h["overflow"] | np.isin(sub, act)
            return _merge_out(out, h, orig[sub], B0)
        newB = _bucket(len(act), (min_bucket, min_bucket * 4,
                                  min_bucket * 16, min_bucket * 64))
        if newB < mode.shape[0]:
            done_live = np.flatnonzero((mode == M_DONE) & live)
            if len(done_live):
                out = _merge_out(out, _harvest_poll(st, poll,
                                                    done_live),
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
    """--best / -M / --strata / -v 3 and seeded -n --best SE aligner on
    the lockstep device machine, with per-read host-engine fallback on
    overflow.  mode="v" uses the v-mode driver DAG; mode="n" the
    seeded DAG (seed_mms/seed_len/qual_cutoff)."""

    DENSE_LIMIT = 1 << 28

    def __init__(self, idx_fw: EbwtIndex, idx_bw: EbwtIndex, policy,
                 v: int = 2, strata: bool = False,
                 all_hits: bool = False, mode: str = "v",
                 seed_mms: int = 2, seed_len: int = 28,
                 qual_cutoff: int = 70,
                 nofw: bool = False, norc: bool = False,
                 maq: bool = True, better: bool = False,
                 global_seed: int = 0, max_steps: int = 60000,
                 maxbts: int = 800, compact: bool | None = None):
        import os
        self.idx_fw, self.idx_bw = idx_fw, idx_bw
        if idx_fw.length >= (1 << 31):
            raise ValueError(
                f"the best-first device machine still compares rows as "
                f"signed int32; joined length {idx_fw.length:,} >= 2^31 "
                f"routes to the host engine (the DFS/-n engines carry "
                f"uint32 rows and stay on device)")
        if compact is None:
            compact = (idx_fw.length > self.DENSE_LIMIT or
                       bool(os.environ.get("BOWTIE_TPU_COMPACT")))
        self.cat = build_fmcat(idx_fw, idx_bw,
                               occ_every=128,
                               dense_sa=not compact)
        self.policy = policy
        self.mode = mode
        self.v = v
        self.seed_mms, self.seed_len = seed_mms, seed_len
        self.qual_cutoff = qual_cutoff
        self.strata, self.all_hits = strata, all_hits
        self.nofw, self.norc = nofw, norc
        self.maq = maq
        self.qual_order = not better
        self.global_seed = global_seed
        self.max_steps = max_steps
        self.maxbts = maxbts
        self.nfrag = int(idx_fw.nfrag)
        if mode == "n":
            self.outers = seeded_mode_configs(seed_mms, nofw, norc)
            self.qual_lim = qual_cutoff
            self.bt_on = seed_mms >= 2
            sl = seed_len
        else:
            self.outers = v_mode_configs(v, nofw, norc)
            self.qual_lim = INF32
            self.bt_on = False
            sl = 0
        self.hostinit = HostInit(self.outers, idx_fw, idx_bw, maq,
                                 self.qual_order, self.qual_lim, sl)
        self.nd = self.hostinit.nd
        self.ndt = self.hostinit.ndt
        self.cfgj = {k: jnp.asarray(v_)
                     for k, v_ in self.hostinit.cfg.items()}
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
            from .best_factories import (make_best_aligner,
                                         make_seeded_best_aligner)
            from .golden import GoldenFM
            gf, gb = GoldenFM(self.idx_fw), GoldenFM(self.idx_bw)
            if self.mode == "n":
                self._fallback = make_seeded_best_aligner(
                    gf, gb, self.seed_mms, self.seed_len,
                    self.qual_cutoff, self.policy, strata=self.strata,
                    all_hits=self.all_hits, nofw=self.nofw,
                    norc=self.norc, maq=self.maq,
                    better=not self.qual_order,
                    global_seed=self.global_seed, maxbts=self.maxbts)
            else:
                self._fallback = make_best_aligner(
                    gf, gb, self.v, self.policy, strata=self.strata,
                    all_hits=self.all_hits, nofw=self.nofw,
                    norc=self.norc, maq=self.maq,
                    better=not self.qual_order,
                    global_seed=self.global_seed, maxbts=self.maxbts)
        return self._fallback

    def align_batch(self, reads) -> list:
        if not reads:
            return []
        gate = (self.policy.n == 1 and self.policy.max >= INF32 and
                not self.policy.sample_max and not self.strata and
                not self.all_hits)
        if not gate:
            return self._align_batch_machine(reads)
        results = self._exact_gate(reads)
        rest = [i for i, r in enumerate(results) if r is None]
        if rest:
            sub = self._align_batch_machine([reads[i] for i in rest])
            for i, r in zip(rest, sub):
                results[i] = r
        return results

    # -- exact-hit fast path (first-1-good policies) ----------------------
    #
    # A read with a whole-read exact hit reports, without running the
    # machine, a hit that is fully determined by: the two exact
    # drivers' ranges (the only cost-0 sub-drivers — everything else
    # starts >= 1<<14), the CostAware set_query sortActives draws over
    # the STATIC initial costs, the strandFix delayed-range draw
    # (range_source.h:2322: rq % (spread_delayed + spread_first)), and
    # the chase's first row draw.  All are host-computable; verified
    # hit-for-hit against the host engine for -v 1/2/3 and -n 1/2/3.

    def _exact_fm(self, efw: bool):
        fms = getattr(self, "_fms", None)
        if fms is None:
            fms = self._fms = {}
        if efw not in fms:
            from ..index.arrays import from_ebwt
            fms[efw] = from_ebwt(self.idx_fw if efw else self.idx_bw,
                                 occ_every=self.cat.occ_every,
                                 dense_sa=False)
        return fms[efw]

    def _gate_ranges(self, reads, cfg):
        """Whole-read exact (top, bot) per read on cfg's index, via the
        batched exact kernel."""
        import jax.numpy as jnp
        from .exact import exact_ranges, right_align
        base = [(r.codes_fw if cfg.fw else r.codes_rc) for r in reads]
        if not cfg.ebwt_fw:
            base = [b[::-1] for b in base]
        L = max(8, max(len(b) for b in base))
        mat, lens = right_align(base, pad_to=L)
        top, bot = exact_ranges(self._exact_fm(cfg.ebwt_fw),
                                jnp.asarray(mat), jnp.asarray(lens))
        return np.asarray(top).tolist(), np.asarray(bot).tolist()

    def _exact_gate(self, reads) -> list:
        from .policy import ReadResult
        from .types import Hit
        from .best import FoundRange
        from .best_driver import RangeChaser
        from ..utils.rng import BtRandom, fill_seed_caches
        from .golden import GoldenFM
        if getattr(self, "_chaser", None) is None:
            self._gfw = GoldenFM(self.idx_fw)
            self._gbw = GoldenFM(self.idx_bw)
            self._chaser = RangeChaser(self._gfw, self._gbw)
        outers = self.outers
        ex_idx = [i for i, oc in enumerate(outers)
                  if oc.cfg.report_exacts]
        sl = self.seed_len if self.mode == "n" else 0
        tops, bots = {}, {}
        for i in ex_idx:
            tops[i], bots[i] = self._gate_ranges(reads, outers[i].cfg)
        seeds = fill_seed_caches(reads, self.global_seed).tolist()
        results = []
        for b, read in enumerate(reads):
            if not (4 <= len(read.seq) <= 255):
                results.append(None)
                continue
            spreads = {i: bots[i][b] - tops[i][b] for i in ex_idx}
            if all(s <= 0 for s in spreads.values()):
                results.append(None)     # no exact hit: machine path
                continue
            costs = [_outer_min_cost(oc, read, sl, self.maq,
                                     self.qual_order) for oc in outers]
            if any(c == 0 for i, c in enumerate(costs)
                   if i not in ex_idx):
                results.append(None)     # ambiguous zero-cost tie
                continue
            rand = BtRandom(seeds[b])
            order = _emulate_sort_actives(costs, rand)
            first = order[0]
            emit = None
            if spreads.get(first, 0) > 0:
                emit = first
                # strandFix quirk: the mate/strand test reads the
                # CONSTRUCTION-order driver, the advance acts on the
                # SORTED-order one (range_source.h:2322-2327)
                for i in range(1, len(outers)):
                    if outers[i].cfg.fw != outers[first].cfg.fw:
                        p2 = order[i]
                        if costs[p2] > 0:
                            break
                        if spreads.get(p2, 0) > 0:
                            tot = spreads[p2] + spreads[first]
                            rq = rand.next_u32() % tot
                            if rq < spreads[p2]:
                                emit = p2
                        break
            else:
                others = [i for i in ex_idx
                          if i != first and spreads[i] > 0]
                emit = others[0] if others else None
            if emit is None:
                results.append(None)
                continue
            cfg = outers[emit].cfg
            fr = FoundRange(top=tops[emit][b], bot=bots[emit][b],
                            cost=0, stratum=0, num_mms=0, fw=cfg.fw,
                            ebwt_fw=cfg.ebwt_fw, mms=[], refcs=[])
            rand2 = BtRandom(seeds[b])
            qlen = len(read.seq)
            hit = None
            for tidx, toff in self._chaser.chase(fr, qlen, rand2):
                hit = Hit(read=read, fw=cfg.fw, tidx=tidx, toff=toff,
                          oms=spreads[emit] - 1, stratum=0, cost=0,
                          mms=[])
                break
            if hit is None:
                results.append(None)
                continue
            results.append(ReadResult([hit], nvalid=1, nbuffered=1))
        return results

    def _align_batch_machine(self, reads) -> list:
        B = len(reads)
        host_only = [b for b, r in enumerate(reads)
                     if len(r.seq) < 4 or len(r.seq) > 255]
        Bp = _bucket(B)
        L = _len_bucket(max(len(r.seq) for r in reads))
        from ..utils.rng import fill_seed_caches
        seeds = np.zeros(Bp, dtype=np.uint32)
        seeds[:B] = fill_seed_caches(reads, self.global_seed)
        host = self.hostinit.build(reads, L, seeds[:B])
        if Bp > B:
            for k, v_ in host.items():
                pad = np.zeros((Bp - B,) + v_.shape[1:], dtype=v_.dtype)
                host[k] = np.concatenate([v_, pad], axis=0)
        st = _init_state_jit(seeds, host, B=Bp, L=L, nd=self.nd,
                             ndt=self.ndt, maxbts=self.maxbts)
        dis = np.zeros(Bp, bool)
        dis[B:] = True
        for b in host_only:
            dis[b] = True
        if dis.any():
            st["mode"] = jnp.where(jnp.asarray(dis), M_DONE, st["mode"])
        n_k = self._sink_n()
        m_max = self.policy.max if self.policy.max < INF32 else INF32
        out = run_compacting(
            self.cat, self.cfgj, st, L=L, nd=self.nd, ndt=self.ndt,
            nfrag=self.nfrag, n_k=n_k, m_max=m_max, strata=self.strata,
            qual_lim=self.qual_lim, qual_order=self.qual_order,
            bt_on=self.bt_on, fc=self.cat.ftab_chars,
            has_seeded=(self.mode == "n"), max_steps=self.max_steps)
        for b in host_only:
            out["overflow"][b] = True
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
            nh = int(out["nhits"][b])
            recs = np.asarray(out["hits"][b, :nh]).tolist() if nh else ()
            for rec in recs:
                fw = bool(rec[2] & 1)
                ebwt_fw = bool((rec[2] >> 1) & 1)
                mms = []
                for k in range(rec[6]):
                    d = rec[8 + k]               # search depth
                    refc = rec[8 + MM_SLOTS + k]
                    pos = qlen - 1 - d
                    off = qlen - pos - 1 if (ebwt_fw != fw) else pos
                    mms.append((off, (97, 99, 103, 116)[refc]))
                buffered.append(Hit(
                    read=read, fw=fw, tidx=rec[0], toff=rec[1],
                    oms=rec[3], stratum=rec[4],
                    cost=rec[5], mms=sorted(mms)))
            count = int(out["count"][b])
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


# ---------------------------------------------------------------------------
# Multi-chip (mesh) execution
# ---------------------------------------------------------------------------

def shard_best_state(st, mesh):
    """Shard every per-lane array (incl. the lane-major flat pools)
    data-parallel over the mesh; the machine step is lane-local, so
    GSPMD partitions the whole while loop without hot-loop
    collectives (the dfs_mesh scaling model)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P(mesh.axis_names[0]))
    return {k: jax.device_put(v, sh) for k, v in st.items()}


def dryrun_best(n_lanes_per_dev: int = 8, mesh=None):
    """Compile + run one tiny sharded best-first batch (-v 2 --best on
    the bundled e_coli index) over the mesh; used by the driver's
    multi-chip dry run."""
    from jax.sharding import Mesh
    from ..index.ebwt_io import read_ebwt
    from ..io.readers import ReadSource
    from ..parallel.dfs_mesh import make_dp_mesh, replicate_cat
    from .policy import INF, KPolicy

    mesh = mesh or make_dp_mesh()
    ndev = mesh.devices.size
    B = n_lanes_per_dev * ndev
    idx = read_ebwt("/root/reference/indexes/e_coli")
    idx_bw = read_ebwt("/root/reference/indexes/e_coli.rev")
    al = DeviceBestAligner(idx, idx_bw, KPolicy(1, INF), v=2,
                           strata=False, all_hits=False)
    reads = list(ReadSource(["/root/reference/reads/e_coli_1000.fq"],
                            "fastq", upto=B).records())
    while len(reads) < B:
        reads.append(reads[len(reads) % 1000])
    L = _len_bucket(max(len(r.seq) for r in reads))
    seeds = np.array([r.seed(0) for r in reads], np.uint32)
    host = al.hostinit.build(reads, L, seeds)
    st = _init_state(B, L, al.nd, al.ndt, seeds, host, al.maxbts)
    cat = replicate_cat(al.cat, mesh)
    cfgj = {k: jax.device_put(v, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec())) for k, v in al.cfgj.items()}
    st = shard_best_state(st, mesh)
    kw = dict(nd=al.nd, ndt=al.ndt, L=L, nfrag=al.nfrag, n_k=1,
              m_max=INF32, strata=False, qual_lim=INF32,
              qual_order=True, bt_on=False, fc=al.cat.ftab_chars,
              has_seeded=False)
    for _ in range(40):
        st, mode = run_chunk(cat, cfgj, st, chunk=256, **kw)
        if int(jnp.sum((mode != M_DONE).astype(jnp.int32))) == 0:
            break
    nhits = int(jnp.sum(st["nhits"]))
    assert nhits > 0, "no best-first lane found a range"
    return nhits
