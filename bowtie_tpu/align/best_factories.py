"""Stateful-aligner driver DAGs per alignment mode (aligner_0mm.h,
aligner_1mm.h, aligner_23mm.h factories)."""
from __future__ import annotations

from .best import (BestRangeSource, PIN_TO_BEGINNING, PIN_TO_HI_HALF_EDGE,
                   PIN_TO_LEN, PIN_TO_SEED_EDGE)
from .best_driver import (BestDriver, BestSink, CostAwareDriver,
                          RangeChaser, UnpairedBestAligner)
from .golden import GoldenFM
from .policy import KPolicy

INF32 = 0xFFFFFFFF


def _mk_driver(g, ebwt_fw, fw, pins, report_exacts=True, seed_len=0,
               qual_lim=INF32, hh=0, seeded=False, maq=True,
               qual_order=True, global_seed=0, bt_cnt=None,
               nudge_left=True):
    rs = BestRangeSource(g, ebwt_fw, fw, qual_lim=qual_lim,
                         report_exacts=report_exacts, half_and_half=hh,
                         seeded=seeded, maq_penalty=maq,
                         qual_order=qual_order, global_seed=global_seed)
    return BestDriver(rs, seed=seeded, seed_len=seed_len,
                      nudge_left=nudge_left, pins=pins, bt_cnt=bt_cnt)


def exact_best_driver_factory(g_fw: GoldenFM, nofw, norc, strand_fix,
                              maq, qual_order, global_seed):
    """UnpairedExactAlignerV1Factory::create (aligner_0mm.h:69-116):
    fw + rc sources on the forward index, whole read unrevisitable."""
    P = (PIN_TO_LEN,) * 4

    def make(read):
        drs = []
        if not nofw:
            drs.append(_mk_driver(g_fw, True, True, P, maq=maq,
                                  qual_order=qual_order,
                                  global_seed=global_seed))
        if not norc:
            drs.append(_mk_driver(g_fw, True, False, P, maq=maq,
                                  qual_order=qual_order,
                                  global_seed=global_seed))
        return CostAwareDriver(drs, strand_fix=strand_fix,
                               global_seed=global_seed)
    return make


def mm1_best_driver_factory(g_fw: GoldenFM, g_bw: GoldenFM, nofw, norc,
                            strand_fix, maq, qual_order, global_seed):
    """Unpaired1mmAlignerV1Factory::create (aligner_1mm.h:79-140):
    4 half-constrained sources — {fw read x mirror/fw idx,
    rc read x fw/mirror idx}; the exact-covering one of each pair
    reports exacts, the other doesn't."""
    P = (PIN_TO_HI_HALF_EDGE, PIN_TO_LEN, PIN_TO_LEN, PIN_TO_LEN)

    def make(read):
        kw = dict(maq=maq, qual_order=qual_order,
                  global_seed=global_seed)
        drs = []
        if not nofw:
            drs.append(_mk_driver(g_bw, False, True, P,
                                  report_exacts=True, nudge_left=False,
                                  **kw))
            drs.append(_mk_driver(g_fw, True, True, P,
                                  report_exacts=False, nudge_left=True,
                                  **kw))
        if not norc:
            drs.append(_mk_driver(g_fw, True, False, P,
                                  report_exacts=True, nudge_left=True,
                                  **kw))
            drs.append(_mk_driver(g_bw, False, False, P,
                                  report_exacts=False, nudge_left=False,
                                  **kw))
        return CostAwareDriver(drs, strand_fix=strand_fix,
                               global_seed=global_seed)
    return make


def mm23_best_driver_factory(g_fw: GoldenFM, g_bw: GoldenFM, two: bool,
                             nofw, norc, strand_fix, maq, qual_order,
                             global_seed, maxbts=125):
    """Unpaired23mmAlignerV1Factory::create (aligner_23mm.h): per
    strand, three sources — left-half-pinned (exacts), right-half-
    pinned (no exacts), and a half-and-half source."""
    # (aligner_23mm.h:99-122,131-134)
    Pfull = (PIN_TO_HI_HALF_EDGE, PIN_TO_HI_HALF_EDGE,
             PIN_TO_LEN if two else PIN_TO_HI_HALF_EDGE, PIN_TO_LEN)
    Phalf = (PIN_TO_BEGINNING, PIN_TO_HI_HALF_EDGE,
             PIN_TO_LEN if two else PIN_TO_HI_HALF_EDGE, PIN_TO_LEN)

    Phalf3 = (PIN_TO_BEGINNING, PIN_TO_HI_HALF_EDGE,
              PIN_TO_HI_HALF_EDGE, PIN_TO_LEN)

    def make(read):
        kw = dict(maq=maq, qual_order=qual_order,
                  global_seed=global_seed)
        drs = []
        if not nofw:
            drs.append(_mk_driver(g_bw, False, True, Pfull,
                                  report_exacts=True, nudge_left=True,
                                  **kw))
            drs.append(_mk_driver(g_fw, True, True, Pfull,
                                  report_exacts=False, nudge_left=False,
                                  **kw))
            drs.append(_mk_driver(g_bw, False, True, Phalf,
                                  report_exacts=False, hh=2,
                                  nudge_left=True, **kw))
            if not two:
                drs.append(_mk_driver(g_fw, True, True, Phalf3,
                                      report_exacts=False, hh=3,
                                      nudge_left=False, **kw))
        if not norc:
            drs.append(_mk_driver(g_fw, True, False, Pfull,
                                  report_exacts=True, nudge_left=True,
                                  **kw))
            drs.append(_mk_driver(g_bw, False, False, Pfull,
                                  report_exacts=False, nudge_left=False,
                                  **kw))
            drs.append(_mk_driver(g_fw, True, False, Phalf,
                                  report_exacts=False, hh=2,
                                  nudge_left=True, **kw))
            if not two:
                drs.append(_mk_driver(g_bw, False, False, Phalf3,
                                      report_exacts=False, hh=3,
                                      nudge_left=False, **kw))
        return CostAwareDriver(drs, strand_fix=strand_fix,
                               global_seed=global_seed)
    return make


def make_best_aligner(g_fw: GoldenFM, g_bw: GoldenFM | None, v: int,
                      policy: KPolicy, strata: bool, all_hits: bool,
                      nofw=False, norc=False, maq=True, better=False,
                      global_seed=0, maxbts=800):
    if v == 0:
        fac = exact_best_driver_factory(g_fw, nofw, norc, True, maq,
                                        not better, global_seed)
    elif v == 1:
        fac = mm1_best_driver_factory(g_fw, g_bw, nofw, norc, True,
                                      maq, not better, global_seed)
    else:
        fac = mm23_best_driver_factory(g_fw, g_bw, v == 2, nofw, norc,
                                       True, maq, not better,
                                       global_seed, maxbts)
    chaser = RangeChaser(g_fw, g_bw)
    sink = BestSink(policy, strata, all_hits, global_seed)
    return UnpairedBestAligner(fac, chaser, sink, global_seed)
