"""Paired-end alignment: anchor search + reference-window mate rescue.

Functional re-expression of PairedBWAlignerV1 (aligner.h:606-1480): one
mate anchors via the FM-index engines, the other is rescued by scanning
the reference window allowed by -I/--minins, -X/--maxins and the pair
orientation (--ff/--fr/--rf).  Window arithmetic follows
resolveOutstandingInRef (aligner.h:951-1087) including the
no-mate-containment rules; the scan itself is the vectorized analog of
RefAligner::find's 64-bit anchor-compare loop (ref_aligner.h:31,659).

Note on parity: bowtie's paired mode always runs its stateful best-first
engine (ebwt_search.cpp:3001-3002), whose driver interleaving decides
which of several equally-good pairs is reported first.  This module
reproduces the *alignment semantics* (same pairs found, same windows,
same policies); tie-break ordering parity lands with the stateful
engine (align/best.py).
"""
from __future__ import annotations

import numpy as np

from .drivers import OracleAligner, OracleSink
from .golden import GoldenFM
from .policy import INF, KPolicy, ReadResult
from .types import Hit
from .backtrack_oracle import QUAL_ROUNDS, mm_penalty


class MateRescuer:
    """Scan a reference window for the outstanding mate
    (RefAligner::find family, ref_aligner.h).

    -v mode (Exact/OneMM/TwoMM/ThreeMMRefAligner): at most `v`
    mismatches anywhere; stratum = #mms.
    -n mode (Seed0-3RefAligner): at most `seed_mms` mismatches in the
    first seed_len 5' bases AND total (Maq-rounded) quality penalty of
    all mismatches <= qual_max; stratum = seed mms.
    """

    def __init__(self, ref_codes: np.ndarray, v: int | None = None,
                 seed_mms: int = 2, seed_len: int = 28,
                 qual_max: int = 70, maq_round: bool = True):
        self.ref = ref_codes
        self.v = v
        self.seed_mms, self.seed_len = seed_mms, seed_len
        self.qual_max = qual_max
        self.maq = maq_round

    def find(self, seq: np.ndarray, qual: bytes, fw: bool,
             begin: int, end: int, max_hits: int = 16):
        """seq: codes of the mate w.r.t. the forward reference strand.
        qual: base qualities in the same orientation.  Returns list of
        (off, mms[(pos5p, refchar)], stratum, cost), scanning left to
        right."""
        qlen = len(seq)
        lo = max(0, begin)
        hi = min(len(self.ref), end)
        if hi - lo < qlen:
            return []
        n = hi - lo - qlen + 1
        windows = np.lib.stride_tricks.sliding_window_view(
            self.ref[lo:hi], qlen)                    # [n, qlen]
        neq = windows != seq[None, :]                 # mismatch matrix
        nmms = neq.sum(axis=1)
        quals = np.frombuffer(qual, dtype=np.uint8).astype(np.int32) - 33
        pens = (QUAL_ROUNDS[quals] if self.maq else quals).astype(np.int32)
        out = []
        if self.v is not None:
            cand = np.flatnonzero(nmms <= self.v)
        else:
            # seed is the first seed_len bases from the mate's 5' end;
            # seq is in fw-reference orientation, so for rc mates the
            # seed is at the RIGHT end of seq
            sl = min(self.seed_len, qlen)
            seedcols = (np.arange(qlen) < sl) if fw else \
                       (np.arange(qlen) >= qlen - sl)
            seed_mm = (neq & seedcols[None, :]).sum(axis=1)
            totpen = (neq * pens[None, :]).sum(axis=1)
            cand = np.flatnonzero((seed_mm <= self.seed_mms) &
                                  (totpen <= self.qual_max) &
                                  (nmms <= 0x7FFF))
        for w in cand[:max_hits]:
            cols = np.flatnonzero(neq[w])
            # positions relative to the mate's 5' end
            mms = []
            pen = 0
            seedmm = 0
            sl = min(self.seed_len, qlen)
            for cpos in cols:
                p5 = int(cpos) if fw else qlen - 1 - int(cpos)
                refc = int(windows[w, cpos])
                mms.append((p5, ord("acgt"[refc])))
                pen += int(pens[cpos])
                if p5 < sl:
                    seedmm += 1
            if self.v is not None:
                stratum = len(mms)
            else:
                stratum = seedmm
            cost = (stratum << 14) | pen
            out.append((lo + int(w), sorted(mms), stratum, cost))
        return out


class PairedOracleAligner:
    """Paired-end driver: anchor one mate with the SE engines, rescue
    the other in reference space; enforce insert/orientation rules."""

    def __init__(self, fm_fw: GoldenFM, fm_bw: GoldenFM | None,
                 ref_codes_list: list[np.ndarray], policy: KPolicy,
                 mode: str = "n", v: int = 0,
                 min_insert: int = 0, max_insert: int = 250,
                 mate1_fw: bool = True, mate2_fw: bool = False,
                 nofw: bool = False, norc: bool = False,
                 global_seed: int = 0, pairtries: int = 100,
                 seed_mms: int = 2, seed_len: int = 28,
                 qual_thresh: int = 70, maq_round: bool = True,
                 maxbts: int = 125):
        self.fm_fw, self.fm_bw = fm_fw, fm_bw
        self.refs = ref_codes_list
        self.policy = policy
        self.mode, self.v = mode, v
        self.minins, self.maxins = min_insert, max_insert
        self.m1fw, self.m2fw = mate1_fw, mate2_fw
        self.nofw, self.norc = nofw, norc
        self.global_seed = global_seed
        self.pairtries = pairtries
        rescue_kw = (dict(v=v) if mode != "n" else
                     dict(seed_mms=seed_mms, seed_len=seed_len,
                          qual_max=qual_thresh, maq_round=maq_round))
        self.rescuers = [MateRescuer(rc, **rescue_kw)
                         for rc in ref_codes_list]
        self.se_kw = dict(mode=mode, v=v, seed_mms=seed_mms,
                          seed_len=seed_len, qual_thresh=qual_thresh,
                          maq_round=maq_round, maxbts=maxbts)

    def _anchor_hits(self, read, fw: bool, cap: int = 32) -> list[Hit]:
        """All SE hits of `read` on one strand, best-stratum-first."""
        pol = KPolicy(khits=cap, mhits=INF)
        se = OracleAligner(self.fm_fw, self.fm_bw, pol,
                           nofw=not fw, norc=fw,
                           global_seed=self.global_seed, **self.se_kw)
        res = se.align_read(read)
        return sorted(res.hits, key=lambda h: (h.stratum, h.cost))

    def align_batch(self, pairs) -> list[ReadResult]:
        return [self.align_pair(a, b) for a, b in pairs]

    def align_pair(self, rd1, rd2) -> ReadResult:
        npairs = 0
        pairs: list[tuple[Hit, Hit]] = []
        seen: set = set()
        maxed = stop = False
        n, mx = self.policy.n, self.policy.max
        # fw-pair orientation, then rc-pair (aligner.h:817-836)
        for pair_fw in (True, False):
            if stop:
                break
            if pair_fw and self.nofw:
                continue
            if not pair_fw and self.norc:
                continue
            fw1 = self.m1fw if pair_fw else not self.m1fw
            fw2 = self.m2fw if pair_fw else not self.m2fw
            # try anchoring each mate (mate1's driver first)
            for anchor_is_1 in (True, False):
                if stop:
                    break
                ar, orr = (rd1, rd2) if anchor_is_1 else (rd2, rd1)
                afw = fw1 if anchor_is_1 else fw2
                ofw = fw2 if anchor_is_1 else fw1
                tries = 0
                for ah in self._anchor_hits(ar, afw):
                    if stop or tries >= self.pairtries:
                        break
                    tries += 1
                    for up, dn in self._rescue(ah, ar, orr, ofw,
                                               anchor_is_1, pair_fw):
                        key = (up.tidx, up.toff, dn.toff,
                               up.fw, up.read.mate)
                        if key in seen:
                            continue
                        seen.add(key)
                        npairs += 1
                        if npairs > mx:
                            maxed = stop = True
                            break
                        pairs.append((up, dn))
                        if npairs == n and (mx == INF or mx < n):
                            stop = True
                            break
        if maxed:
            return ReadResult([], maxed=True, nvalid=npairs,
                              nbuffered=len(pairs))
        hits: list[Hit] = []
        for up, dn in pairs[:n]:
            hits.extend((up, dn))
        return ReadResult(hits, nvalid=npairs, nbuffered=len(pairs))

    def _rescue(self, ah: Hit, ar, orr, ofw: bool, anchor_is_1: bool,
                pair_fw: bool):
        """Window math per resolveOutstandingInRef (aligner.h:951-1087),
        trimming not yet applied (trimmed5/3 == 0)."""
        qlen = len(orr.seq)
        alen = len(ar.seq)
        minins, maxins = self.minins, self.maxins
        if maxins <= max(qlen, alen):
            return []
        tidx, toff = ah.tidx, ah.toff
        reflen = len(self.refs[tidx])
        # matchRight: does the outstanding mate sit to the right of the
        # anchor?  (aligner.h:958-961: matchRight = off1 ? !doneFw :
        # doneFw — in the fw-pair phase mate1 is upstream, so anchoring
        # mate1 means the other mate goes right; flipped in rc-pair.)
        matchRight = (anchor_is_1 == pair_fw)
        insdiff = maxins - minins
        if matchRight:
            end = toff + maxins
            begin = toff + 1
            if qlen < alen:
                begin += alen - qlen
            if end > insdiff + qlen:
                begin = max(begin, end - insdiff - qlen)
            end = min(reflen, end)
            begin = min(reflen, begin)
        else:
            begin = 0 if toff + alen < maxins else toff + alen - maxins
            mi = min(alen, qlen)
            end = toff + mi - 1
            end = min(end, toff + alen - minins + qlen - 1)
            if toff + alen + qlen < minins + 1:
                end = 0
        if end - begin < qlen:
            return []
        seq = orr.codes_fw if ofw else orr.codes_rc
        qual = orr.qual if ofw else orr.qual[::-1]
        found = self.rescuers[tidx].find(seq, qual, ofw, begin, end)
        out = []
        for off, mms, stratum, cost in found:
            # insert-size constraints on the resulting pair
            left = min(toff, off)
            right = max(toff + alen, off + qlen)
            isize = right - left
            if isize > self.maxins or isize < self.minins:
                continue
            # oms: reference copies the anchor's BWT range onto the
            # rescued mate ("we just copy the known range's top and
            # bot", aligner.h:1071-1074), so both mates report
            # min(spreadL, spreadR)-1 == anchor spread-1
            oms = ah.oms
            oh = Hit(read=orr, fw=ofw, tidx=tidx, toff=off,
                     oms=oms, stratum=stratum, cost=cost, mms=mms,
                     mate=2 if anchor_is_1 else 1)
            a2 = Hit(read=ar, fw=ah.fw, tidx=tidx, toff=toff,
                     oms=oms, stratum=ah.stratum, cost=ah.cost,
                     mms=list(ah.mms), mate=1 if anchor_is_1 else 2)
            # fill mate cross-references; upstream printed first
            up, dn = (a2, oh) if toff <= off else (oh, a2)
            for h, o in ((up, dn), (dn, up)):
                h.mfw = o.fw
                h.mtidx = o.tidx
                h.mtoff = o.toff
                h.mlen = o.length
            out.append((up, dn))
        return out


