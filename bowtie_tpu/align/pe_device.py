"""Device-batched paired-end alignment (PairedBWAlignerV1 on TPU).

The V1 engine (aligner.h:606-1480) interleaves four per-(mate,strand)
best-first anchor drivers with reference-window mate rescue.  The
driver streams are interaction-free — the interleave only decides
which ranges get chased/rescued and when to stop — so the expensive
part (branch-and-bound search, >50% of host time) batches perfectly:

1. RECORD (device): every (pair, mate, strand) is one lane of the
   lockstep best-first machine in record mode (best_device._step_main
   record=True): ranges are appended to the lane's pool in emission
   order, with the driver's done-at-emission flag, until exhaustion.
   One machine run per strand (fw lanes: norc; rc lanes: nofw) since
   the driver DAG differs per strand.
2. REPLAY (host): PairedBestAligner runs unchanged, but its four
   drivers are ReplayDrivers that pop the precomputed streams.  All
   interleave decisions, chase RNG draws, rescue scans and sink calls
   happen exactly as on the pure-host path — byte-identical output.

Lanes whose stream overflows the pool (H_MAX ranges) or whose machine
overflows fall back to the pure-host aligner per pair.
"""
from __future__ import annotations

import numpy as np

from .best import FoundRange
from .best_paired import _trim_adjusted_insert
from .best_device import (
    H_MAX, HostInit, INF32, M_DONE, MM_SLOTS, _bucket, _init_state,
    _len_bucket, build_fmcat, run_compacting, seeded_mode_configs,
    v_mode_configs,
)
from .policy import KPolicy


def exact_ranges_cat(cat, reads, lens, efw):
    """Whole-read exact ranges over the concatenated fw+mirror index
    with a PER-LANE index choice (efw): the lockstep LF scan of
    exact.exact_ranges generalized to FMCat so all four PE anchor
    sections search in ONE device launch (ebwt.h:971-1028 ftab jump +
    backward LF extension)."""
    import jax
    import jax.numpy as jnp
    from .dfs_device import _g1, _rank4, _sel_col
    B, L = reads.shape
    fc = cat.ftab_chars
    occ_base = jnp.where(efw > 0, cat.occ_base[0], cat.occ_base[1])
    blk_base = jnp.where(efw > 0, cat.blk_base[0], cat.blk_base[1])
    ftab_base = jnp.where(efw > 0, cat.ftab_base[0], cat.ftab_base[1])
    zoff = jnp.where(efw > 0, cat.zoff[0], cat.zoff[1])
    q = reads.astype(jnp.int32)
    lens = lens.astype(jnp.int32)
    if L >= fc:
        ftab_codes = q[:, L - fc:]
        ftab_ok = (lens >= fc) & jnp.all(ftab_codes < 4, axis=1)
        weights = 4 ** jnp.arange(fc - 1, -1, -1, dtype=jnp.int32)
        foff = jnp.sum(jnp.where(ftab_codes < 4, ftab_codes, 0)
                       * weights, axis=1)
        ft = _g1(cat.ftab_hi, jnp.where(ftab_ok, foff, 0) + ftab_base)
        fb = _g1(cat.ftab_lo, jnp.where(ftab_ok, foff + 1, 1)
                 + ftab_base)
        top0 = jnp.where(ftab_ok, ft, 0)
        bot0 = jnp.where(ftab_ok, fb, cat.bwt_len)
        start = jnp.where(ftab_ok, L - fc, L)
    else:
        top0 = jnp.zeros(B, jnp.int32)
        bot0 = jnp.broadcast_to(cat.bwt_len, (B,))
        start = jnp.full(B, L, jnp.int32)
    stop = L - lens
    cols = jnp.flip(q.T, axis=0)

    def step(carry, xs):
        top, bot = carry
        c, t = xs
        col = L - 1 - t
        active = (col < start) & (col >= stop) & (bot > top)
        is_n = c > 3
        cc = jnp.where(is_n, 0, c)
        r4t = _rank4(cat, occ_base, zoff,
                     jnp.where(active, top, 0), blk_base)
        r4b = _rank4(cat, occ_base, zoff,
                     jnp.where(active, bot, 0), blk_base)
        ntop = _sel_col(cat.fchr[:4] + r4t, cc)
        nbot = _sel_col(cat.fchr[:4] + r4b, cc)
        ntop = jnp.where(is_n, 0, ntop)
        nbot = jnp.where(is_n, 0, nbot)
        top = jnp.where(active, ntop, top)
        bot = jnp.where(active, nbot, bot)
        return (top, bot), None

    (top, bot), _ = jax.lax.scan(
        step, (top0, bot0), (cols, jnp.arange(L, dtype=jnp.int32)))
    ok = bot > top
    return jnp.where(ok, top, 0), jnp.where(ok, bot, 0)


_erc_jit = None


def _exact_ranges_cat_jit():
    global _erc_jit
    if _erc_jit is None:
        import jax
        _erc_jit = jax.jit(exact_ranges_cat)
    return _erc_jit


class ReplayTruncated(Exception):
    """The interleave asked for a range past the recorded end of a
    rec_cap-truncated stream — the pair must re-run on live host
    drivers."""


class RecordedStream:
    """A lane's device-recorded range stream: the raw hit-record rows
    plus the per-driver strand tables needed to materialize each
    FoundRange lazily (many queued ranges are never popped — the
    interleave stops as soon as the pair is decided)."""

    __slots__ = ("rows", "qlen", "o_fw", "o_efw", "capped")

    def __init__(self, rows, qlen, o_fw, o_efw):
        self.rows = rows            # np [n, REC] int64 hit records
        self.qlen = qlen
        self.o_fw = o_fw
        self.o_efw = o_efw
        # done column 2 = lane frozen by rec_cap, stream may be
        # truncated (best_device._record_range)
        self.capped = len(rows) > 0 and int(rows[-1][6]) == 2

    def __len__(self):
        return len(self.rows)

    def materialize(self, t):
        rec = self.rows[t]
        drv = int(rec[0])
        ne = int(rec[5])
        mms = [self.qlen - int(rec[8 + k]) - 1 for k in range(ne)]
        refcs = [int(rec[8 + MM_SLOTS + k]) for k in range(ne)]
        fr = FoundRange(
            top=int(rec[1]), bot=int(rec[2]), cost=int(rec[3]),
            stratum=int(rec[4]), num_mms=ne, fw=bool(self.o_fw[drv]),
            ebwt_fw=bool(self.o_efw[drv]), mms=mms, refcs=refcs)
        return fr, int(rec[6]) == 1


class SynthStream:
    """Phase-0 synthesized stream: an anchor driver's FIRST emission is
    the whole-read exact range whenever one exists — the exact-
    reporting sub-driver starts at min_cost 0 while every other
    sub-driver's min_cost_adj is >= 1<<14 (no CostAware tie draws),
    and the best-first engine's zero-cost descent reports the full
    exact range first.  So the first emission comes straight from the
    batched exact kernel, no machine run.  Marked capped: a second pop
    escalates to a real recording."""

    __slots__ = ("top", "bot", "qlen", "o_fw", "o_efw", "capped")

    def __init__(self, top, bot, qlen, fw, efw):
        self.top, self.bot = int(top), int(bot)
        self.qlen = qlen
        self.o_fw, self.o_efw = fw, efw
        self.capped = True

    def __len__(self):
        return 1

    def materialize(self, t):
        fr = FoundRange(top=self.top, bot=self.bot, cost=0, stratum=0,
                        num_mms=0, fw=self.o_fw, ebwt_fw=self.o_efw,
                        mms=[], refcs=[])
        return fr, False


class UnrecordedDriver:
    """Placeholder for a driver stream the recording pass skipped (the
    rc-orientation drivers in phase A): stays alive, and the first
    advance() escalates the pair to a fuller recording/live rerun."""

    __slots__ = ("found_range", "done")

    def __init__(self):
        self.found_range = False
        self.done = False

    def advance(self, _until):
        raise ReplayTruncated

    def range(self):
        return None


class ReplayDriver:
    """Feeds a precomputed FoundRange stream through the BestDriver
    advance()/range()/done interface the PE interleave consumes."""

    __slots__ = ("_s", "_i", "_cur", "found_range", "done")

    def __init__(self, stream: RecordedStream):
        self._s = stream
        self._i = 0
        self._cur = None
        self.found_range = False
        self.done = len(stream) == 0

    def advance(self, _until):
        if self._i < len(self._s):
            r, done = self._s.materialize(self._i)
            self._i += 1
            self._cur = r
            self.found_range = True
            # done-at-emission: host CostAwareDriver.advance can set
            # done together with found_range (range_source.h:2262+);
            # otherwise done only once the stream is exhausted AND the
            # machine reached M_DONE (always true post-exhaustion).
            # A capped stream's machine was frozen early, so exhaustion
            # of the *recorded* stream proves nothing — stay not-done
            # and escalate if the interleave ever advances again.
            self.done = bool(done) or (self._i >= len(self._s)
                                       and not self._s.capped)
        else:
            if self._s.capped:
                raise ReplayTruncated
            self.done = True

    def range(self):
        return self._cur


class _StrandMachine:
    """One record-mode machine: all lanes share a single per-strand
    driver DAG (mate is per-lane via the query)."""

    def __init__(self, cat, idx_fw, idx_bw, mode, v, seed_mms,
                 seed_len, qual_cutoff, fw, maq, qual_order, maxbts,
                 max_steps):
        self.cat = cat
        nofw, norc = (not fw), fw
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
        self.has_seeded = mode == "n"
        self.hostinit = HostInit(self.outers, idx_fw, idx_bw, maq,
                                 qual_order, self.qual_lim, sl)
        import jax.numpy as jnp
        self.cfgj = {k: jnp.asarray(v_)
                     for k, v_ in self.hostinit.cfg.items()}
        self.qual_order = qual_order
        self.maxbts = maxbts
        self.max_steps = max_steps
        self.nfrag = int(idx_fw.nfrag)

    def record(self, reads, seeds, rec_cap=None):
        """reads: flat lane list; seeds: per-lane uint32 (mate1 seed).
        Returns (streams, overflow): streams[lane] = RecordedStream
        (None for overflowed lanes).  rec_cap stops each lane after
        that many recorded ranges (truncated streams are marked and
        escalate to a host fallback only if the replay pops past the
        recorded end)."""
        import jax.numpy as jnp
        B = len(reads)
        host_only = [b for b, r in enumerate(reads)
                     if len(r.seq) < 4 or len(r.seq) > 255]
        Bp = _bucket(B)
        L = _len_bucket(max(len(r.seq) for r in reads))
        seeds_p = np.zeros(Bp, np.uint32)
        seeds_p[:B] = seeds
        host = self.hostinit.build(reads, L, seeds_p[:B])
        if Bp > B:
            for k, v_ in host.items():
                pad = np.zeros((Bp - B,) + v_.shape[1:], dtype=v_.dtype)
                host[k] = np.concatenate([v_, pad], axis=0)
        from .best_device import _init_state_jit
        st = _init_state_jit(seeds_p, host, B=Bp, L=L,
                             nd=self.hostinit.nd,
                             ndt=self.hostinit.ndt,
                             maxbts=self.maxbts)
        dis = np.zeros(Bp, bool)
        dis[B:] = True
        for b in host_only:
            dis[b] = True
        if dis.any():
            st["mode"] = jnp.where(jnp.asarray(dis), M_DONE, st["mode"])
        out = run_compacting(
            self.cat, self.cfgj, st, L=L, nd=self.hostinit.nd,
            ndt=self.hostinit.ndt, nfrag=self.nfrag, n_k=INF32,
            m_max=INF32, strata=False, qual_lim=self.qual_lim,
            qual_order=self.qual_order, bt_on=self.bt_on,
            fc=self.cat.ftab_chars, has_seeded=self.has_seeded,
            max_steps=self.max_steps, record=True, rec_cap=rec_cap)
        o_fw = self.hostinit.cfg["o_fw"]
        o_efw = self.hostinit.cfg["o_chase_efw"]
        streams = []
        overflow = np.asarray(out["overflow"]).copy()
        for b in host_only:
            overflow[b] = True
        hits = np.asarray(out["hits"][:B])
        nh = np.asarray(out["nhits"][:B])
        for b, read in enumerate(reads):
            if overflow[b]:
                streams.append(None)
                continue
            streams.append(RecordedStream(hits[b, :int(nh[b])],
                                          len(read.seq), o_fw, o_efw))
        return streams, overflow


def _score_batch(ra, ref_cat, ref_base, ref_len, reqs):
    """Vectorized RefAlignerPy.score over many rescue requests at once.

    One request's window scan touches only ~250x35 cells — the per-call
    cost is numpy fixed overhead (~15 small-array ops), so batching all
    live pairs' scans into [n, NC, qlen] arrays is a ~30-50x win on the
    replay's dominant component.  Byte-equivalent to per-request
    score(): same zig-zag candidate order, same validity rules.
    reqs: list of (tidx, seq, qual, begin, end, seed_on_left)."""
    out = [None] * len(reqs)
    groups = {}
    for k, (tidx, seq, qual, begin, end, sol) in enumerate(reqs):
        seq = np.asarray(seq)
        if (seq > 3).any():
            continue            # Ns in query disqualify
        groups.setdefault((len(seq), bool(sol)), []).append(k)
    if len(reqs) < 48:
        # small waves (the long-grinding tail where few pairs remain
        # live): per-request scoring is as fast as a padded batch
        for k, (tidx, seq, qual, begin, end, sol) in enumerate(reqs):
            base = ref_base[tidx]
            ref = ref_cat[base:base + ref_len[tidx]]
            out[k] = ra.score(ref, np.asarray(seq), qual, begin, end,
                              sol)
        return out
    for (qlen, sol), ks in groups.items():
        n = len(ks)
        begin = np.array([reqs[k][3] for k in ks], np.int64)
        end = np.array([reqs[k][4] for k in ks], np.int64)
        tidxs = np.array([reqs[k][0] for k in ks], np.int64)
        qry = np.stack([np.asarray(reqs[k][1], np.uint8) for k in ks])
        reflen = ref_len[tidxs]
        if sol:
            qbegin, qend = begin, end - qlen
        else:
            qbegin, qend = begin + qlen, end
        lim = qend - qbegin
        halfway = qbegin + (lim >> 1)
        # window span per request: leftmost to rightmost candidate.
        # Gather ONE contiguous window per request ([n, W+qlen]) and
        # score in natural window order; the zig-zag ordering is
        # applied only at the per-request extraction of the (few)
        # valid candidates.
        lo_zz = halfway - ((lim + 1) >> 1)
        lo_w = (lo_zz if sol else lo_zz - qlen)
        lo_w = np.maximum(lo_w, 0)
        span = int(lim.max()) + qlen + 2
        npos = span - qlen + 1
        widx = lo_w[:, None] + np.arange(span, dtype=np.int64)
        widx = np.minimum(widx, (reflen - 1)[:, None])
        win = ref_cat[ref_base[tidxs][:, None] + widx]   # [n, span]
        sw = np.lib.stride_tricks.sliding_window_view(win, qlen,
                                                      axis=1)
        neq = sw != qry[:, None, :]                 # [n, npos, qlen]
        okn = ~(sw > 3).any(axis=2)
        if ra.v is not None:
            mmc = neq.sum(axis=2)
            okn &= mmc <= ra.v
            strat_all = mmc
            ham_all = np.zeros((n, npos), np.int64)
        else:
            slen = min(ra.seed_len, qlen)
            if sol:
                seedcols = np.arange(qlen) < slen
            else:
                seedcols = np.arange(qlen) >= qlen - slen
            seed_mm = (neq & seedcols[None, None, :]).sum(axis=2)
            quals = np.stack([np.frombuffer(reqs[k][2], np.uint8)
                              for k in ks]).astype(np.int32) - 33
            from .backtrack_oracle import QUAL_ROUNDS
            pens = QUAL_ROUNDS[quals] if ra.maq else quals
            ham_all = (pens[:, None, :] * neq).sum(axis=2)
            okn &= (seed_mm <= ra.seed_mms) & (ham_all <= ra.qual_max)
            strat_all = seed_mm
        # per-request zig-zag extraction (valid candidates are few)
        NC = int(lim.max()) + 1
        i = np.arange(1, NC + 1, dtype=np.int64)
        for r, k in enumerate(ks):
            ri = np.where(i & 1, halfway[r] - (i >> 1),
                          halfway[r] + (i >> 1))[:lim[r] + 1]
            left = ri if sol else ri - qlen
            inb = (left >= 0) & (left + qlen <= reflen[r])
            off = left - lo_w[r]
            offc = np.clip(off, 0, npos - 1)
            jj = np.flatnonzero(inb & (off >= 0) & (off < npos) &
                                okn[r, offc])
            if len(jj):
                oj = off[jj]
                out[k] = (left[jj], strat_all[r, oj], ham_all[r, oj],
                          sw[r, oj].copy(), neq[r, oj])
    return out


# set in the parent right before the replay pool forks; children
# inherit the whole aligner (incl. dense index tables) copy-on-write
_PE_WORKER = None


def _pe_replay_worker(chunk):
    out = []
    for i, rd1, rd2, streams in chunk:
        res, esc = _PE_WORKER._replay(rd1, rd2, streams)
        out.append((i, res, esc))
    return out


class DevicePairedBestAligner:
    """Drop-in replacement for make_paired_best_aligner's product:
    align_batch(pairs) with device-recorded anchor streams.

    threads > 1 forks a worker pool for the host replay stage (the
    device records the anchor streams; the byte-identical interleave/
    rescue replay then scales with host cores — the -p analog of the
    reference's per-thread aligner graphs, ebwt_search.cpp:1333)."""

    def __init__(self, idx_fw, idx_bw, refs, policy: KPolicy,
                 mode: str = "n", v: int = 0, seed_mms: int = 2,
                 seed_len: int = 28, qual_cutoff: int = 70,
                 fw1: bool = True, fw2: bool = False,
                 min_insert: int = 0, max_insert: int = 250,
                 pairtries: int = 100, mixed_thresh: int = 4,
                 sym_ceiling: int = 0xFFFFFFFF, maq: bool = True,
                 better: bool = False, global_seed: int = 0,
                 maxbts: int = 800, max_steps: int = 60000,
                 compact: bool | None = None, threads: int = 1):
        import os
        from .best_factories import make_paired_best_aligner
        if idx_fw.length >= (1 << 31):
            raise ValueError(
                f"the best-first device machine still compares rows as "
                f"signed int32; joined length {idx_fw.length:,} >= 2^31 "
                f"routes to the host engine (the DFS/-n engines carry "
                f"uint32 rows and stay on device)")
        from .golden import GoldenFM
        if compact is None:
            compact = (idx_fw.length > (1 << 28) or
                       bool(os.environ.get("BOWTIE_TPU_COMPACT")))
        self.cat = build_fmcat(idx_fw, idx_bw,
                               occ_every=128,
                               dense_sa=not compact)
        self._idx_fw, self._idx_bw = idx_fw, idx_bw
        kw = dict(mode=mode, v=v, seed_mms=seed_mms,
                  seed_len=seed_len, qual_cutoff=qual_cutoff,
                  fw=True, maq=maq, qual_order=not better,
                  maxbts=maxbts, max_steps=max_steps)
        self.m_fw = _StrandMachine(self.cat, idx_fw, idx_bw, **kw)
        kw["fw"] = False
        self.m_rc = _StrandMachine(self.cat, idx_fw, idx_bw, **kw)
        self.global_seed = global_seed
        # host replay aligner: its factory pops installed streams,
        # falling back to live host drivers for overflow pairs
        self._streams = None        # per-pair [d1f, d1r, d2f, d2r]
        self._host = make_paired_best_aligner(
            GoldenFM(idx_fw), GoldenFM(idx_bw), refs, policy,
            mode=mode, v=v, seed_mms=seed_mms, seed_len=seed_len,
            qual_cutoff=qual_cutoff, fw1=fw1, fw2=fw2,
            min_insert=min_insert, max_insert=max_insert,
            pairtries=pairtries, mixed_thresh=mixed_thresh,
            sym_ceiling=sym_ceiling, maq=maq, better=better,
            global_seed=global_seed, maxbts=maxbts)
        self._live_factory = self._host.driver_factory
        self._host.driver_factory = self._factory
        self.fw1, self.fw2 = fw1, fw2
        self.fallbacks = 0
        self.escalations = 0
        # record cap: stop each lane after this many recorded ranges
        # instead of running its driver to exhaustion; a pair whose
        # interleave outruns a capped stream re-records uncapped (a
        # NON-aligning pair must drain every driver to prove no pair,
        # so the cap sits near the hits-pool bound to keep those rare).
        # -k>1/-a/-m/-M chase every range, so record uncapped there.
        self.rec_cap = 12 if not policy.want_all_rows() else None
        # with the device interleave, escalation costs one batched
        # re-record instead of a host replay chain, and measured
        # fixture runs decide every pair from the FIRST range of each
        # stream — so freeze prolific lanes immediately
        if (policy.n == 1 and policy.max == 0xFFFFFFFF
                and os.environ.get("BOWTIE_TPU_PE_ILV", "1")
                not in ("", "0")):
            self.rec_cap = 1
        # device interleave (pe_ilv_device): covers the default -k 1
        # policy; other policies replay on host
        from .policy import INF as _PINF
        self.use_ilv = (
            os.environ.get("BOWTIE_TPU_PE_ILV", "1") not in ("", "0")
            and policy.n == 1 and policy.max == _PINF
            and idx_fw.length < (1 << 31) - 2
            and max_insert <= 2048)
        self._ilv_consts = None
        self.ilv_decided = 0
        # fork pool for the replay stage (-p)
        import os as _os
        self.threads = max(1, min(threads, _os.cpu_count() or 1))
        self._pool = None
        if self.threads > 1 and hasattr(_os, "fork"):
            import multiprocessing as _mp
            global _PE_WORKER
            _PE_WORKER = self
            self._pool = _mp.get_context("fork").Pool(self.threads)

    def _replay_all(self, pairs, items):
        """Replay (i, streams) items; returns [(i, result, escalate)].
        Stream items run the generator interleave in LOCKSTEP with
        batched rescue scoring (_score_batch); live-driver fallbacks
        (streams=None) run per pair.  The fork pool (threads > 1)
        splits the lockstep work across cores."""
        if self._pool is not None and len(items) >= 2 * self.threads:
            work = [(i, pairs[i][0], pairs[i][1], streams)
                    for i, streams in items]
            nchunks = min(len(work), self.threads * 4)
            size = -(-len(work) // nchunks)
            chunks = [work[k:k + size]
                      for k in range(0, len(work), size)]
            out = []
            for part in self._pool.map(_pe_replay_worker, chunks):
                out.extend(part)
            return out
        import os
        if os.environ.get("BOWTIE_TPU_PE_WAVE", "1") in ("", "0"):
            return [(i, *self._replay(*pairs[i], streams))
                    for i, streams in items]
        return self._replay_wave(pairs, items)

    def _ref_cat(self):
        if getattr(self, "_refcat", None) is None:
            refs = self._host.refs
            self._refcat = np.concatenate(
                [np.asarray(r, np.uint8) for r in refs])
            lens = np.array([len(r) for r in refs], np.int64)
            self._refbase = np.zeros(len(refs), np.int64)
            np.cumsum(lens[:-1], out=self._refbase[1:])
            self._reflen = lens
        return self._refcat, self._refbase, self._reflen

    def _replay_wave(self, pairs, items):
        """Advance every pair's interleave generator one heavy step at
        a time, scoring all pairs' rescue windows per wave in one
        vectorized batch."""
        host = self._host
        cat, base, rlen = self._ref_cat()
        out = []
        live = {}
        results_for = {}
        for i, streams in items:
            if streams is None:
                out.append((i, *self._replay(*pairs[i], None)))
                continue
            drivers = [ReplayDriver(s) for s in streams]
            live[i] = host.align_pair_gen(*pairs[i], drivers)
            results_for[i] = None
        while live:
            reqs = []
            for i in list(live):
                g = live[i]
                try:
                    req = g.send(results_for.pop(i, None))
                except StopIteration as e:
                    out.append((i, e.value, False))
                    del live[i]
                    continue
                except ReplayTruncated:
                    out.append((i, None, True))
                    del live[i]
                    continue
                reqs.append((i, req))
            if reqs:
                scored = _score_batch(host.ra, cat, base, rlen,
                                      [r for _, r in reqs])
                for (i, _), sc in zip(reqs, scored):
                    results_for[i] = sc
        return out

    def close(self):
        if self._pool is not None:
            self._pool.terminate()
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def _factory(self, rd1, rd2):
        if self._streams is not None:
            return [UnrecordedDriver() if isinstance(s, str)
                    else ReplayDriver(s) for s in self._streams]
        return self._live_factory(rd1, rd2)

    def _replay(self, rd1, rd2, streams):
        """Replay one pair; returns (result, escalate)."""
        self._streams = streams
        try:
            return self._host.align_pair(rd1, rd2), False
        except ReplayTruncated:
            return None, True
        finally:
            self._streams = None

    # -- fused 4-in-1 recording ----------------------------------------

    def _fused_cfg(self):
        """fw-DAG and rc-DAG cfg tables concatenated along the driver
        axis; lanes address their group via cfg0f/cfg0o bases
        (best_device._cfgF/_cfgO)."""
        import jax.numpy as jnp
        if getattr(self, "_fcfg", None) is None:
            self._fcfg = {
                k: jnp.concatenate([jnp.asarray(v),
                                    self.m_rc.cfgj[k]])
                for k, v in self.m_fw.cfgj.items()}
        return self._fcfg

    def _record_all(self, plan, idxs, seeds, cap):
        """Fused recording of all four anchor streams (the round-4
        RECORD-phase fusion): ONE lockstep machine run over every
        (pair, mate, orientation) lane — per-lane config-group bases
        select the fw- or rc-DAG inside the shared step — preceded by
        a phase-0 exact synthesis: with rec_cap == 1, a lane whose
        whole-read exact range is nonempty records exactly that range
        (the exact-reporting sub-driver starts at min_cost 0 while
        every other sub-driver's min_cost_adj is >= 1<<14, so the
        best-first engine's zero-cost descent reports the full exact
        range first), straight from one batched exact_ranges_cat
        launch — no machine steps for those lanes."""
        import jax.numpy as jnp
        from .exact import right_align
        from .pe_ilv_device import REC_W
        B = len(idxs)
        sections = []
        for mach, mates, slot in plan:
            grp = 0 if mach is self.m_fw else 1
            sections.append((mach, [mates[i] for i in idxs], slot, grp))
        sts = {i: [None] * 4 for i in idxs}
        ovd = {i: False for i in idxs}
        need = []
        if cap == 1:
            allb, efws = [], []
            for mach, reads, slot, grp in sections:
                cfg = mach.outers[0].cfg
                assert cfg.report_exacts
                for r in reads:
                    b = r.codes_fw if cfg.fw else r.codes_rc
                    allb.append(b if cfg.ebwt_fw else b[::-1])
                    efws.append(1 if cfg.ebwt_fw else 0)
            L = _len_bucket(max(8, max(len(b) for b in allb)))
            mat, lens = right_align(allb, pad_to=L)
            n4 = len(allb)
            Np = _bucket(n4)
            if Np > n4:
                mat = np.concatenate(
                    [mat, np.full((Np - n4, L), 4, mat.dtype)])
                lens = np.concatenate(
                    [lens, np.zeros(Np - n4, lens.dtype)])
                efws += [1] * (Np - n4)
            top, bot = _exact_ranges_cat_jit()(
                self.cat, jnp.asarray(mat), jnp.asarray(lens),
                jnp.asarray(np.asarray(efws, np.int32)))
            top = np.asarray(top)[:n4]
            bot = np.asarray(bot)[:n4]
            for sk, (mach, reads, slot, grp) in enumerate(sections):
                o_fw = mach.hostinit.cfg["o_fw"]
                o_efw = mach.hostinit.cfg["o_chase_efw"]
                for k, r in enumerate(reads):
                    j = sk * B + k
                    if bot[j] > top[j] and 4 <= len(r.seq) <= 255:
                        row = np.zeros((1, REC_W), np.int64)
                        row[0, 1] = top[j]
                        row[0, 2] = bot[j]
                        row[0, 6] = 2          # capped marker
                        row[0, 7] = len(r.seq)
                        sts[idxs[k]][slot] = RecordedStream(
                            row, len(r.seq), o_fw, o_efw)
                    else:
                        need.append((sk, k))
        else:
            need = [(sk, k) for sk in range(4) for k in range(B)]
        if need:
            # group-0 lanes first so each lane's cfg base is monotone
            need.sort(key=lambda t: (sections[t[0]][3], t[0], t[1]))
            self._record_fused(sections, need, idxs, seeds, cap, sts,
                               ovd)
        return sts, ovd

    def _record_fused(self, sections, need, idxs, seeds, cap, sts,
                      ovd):
        """One machine run over lanes from both driver DAGs."""
        import jax.numpy as jnp
        from .best_device import _init_state_jit
        mach0 = self.m_fw
        nd, ndt = mach0.hostinit.nd, mach0.hostinit.ndt
        reads_f = [sections[sk][1][k] for sk, k in need]
        grp_f = np.array([sections[sk][3] for sk, k in need], np.int32)
        seeds_f = seeds[np.array([k for _, k in need], np.int64)]
        host_only = [j for j, r in enumerate(reads_f)
                     if len(r.seq) < 4 or len(r.seq) > 255]
        B = len(reads_f)
        Bp = _bucket(B)
        L = _len_bucket(max(len(r.seq) for r in reads_f))
        parts = []
        for g, mach in ((0, self.m_fw), (1, self.m_rc)):
            sel = np.flatnonzero(grp_f == g)
            if len(sel):
                parts.append((sel, mach.hostinit.build(
                    [reads_f[j] for j in sel], L, seeds_f[sel])))
        host = {}
        for kname in parts[0][1]:
            arr = None
            for sel, h in parts:
                v = h[kname]
                if arr is None:
                    arr = np.zeros((B,) + v.shape[1:], v.dtype)
                arr[sel] = v
            host[kname] = arr
        host["cfg0f"] = grp_f * ndt
        host["cfg0o"] = grp_f * nd
        if Bp > B:
            for kname, v in host.items():
                pad = np.zeros((Bp - B,) + v.shape[1:], dtype=v.dtype)
                host[kname] = np.concatenate([v, pad], axis=0)
        seeds_p = np.zeros(Bp, np.uint32)
        seeds_p[:B] = seeds_f
        st = _init_state_jit(seeds_p, host, B=Bp, L=L, nd=nd, ndt=ndt,
                             maxbts=mach0.maxbts)
        dis = np.zeros(Bp, bool)
        dis[B:] = True
        for j in host_only:
            dis[j] = True
        if dis.any():
            st["mode"] = jnp.where(jnp.asarray(dis), M_DONE,
                                   st["mode"])
        out = run_compacting(
            self.cat, self._fused_cfg(), st, L=L, nd=nd, ndt=ndt,
            nfrag=mach0.nfrag, n_k=INF32, m_max=INF32, strata=False,
            qual_lim=mach0.qual_lim, qual_order=mach0.qual_order,
            bt_on=mach0.bt_on, fc=self.cat.ftab_chars,
            has_seeded=mach0.has_seeded, max_steps=mach0.max_steps,
            record=True, rec_cap=cap)
        overflow = np.asarray(out["overflow"])[:B].copy()
        for j in host_only:
            overflow[j] = True
        hits = np.asarray(out["hits"][:B])
        nh = np.asarray(out["nhits"][:B])
        for j, (sk, k) in enumerate(need):
            mach, reads, slot, grp = sections[sk]
            i = idxs[k]
            if overflow[j]:
                ovd[i] = True
                continue
            sts[i][slot] = RecordedStream(
                hits[j, :int(nh[j])], len(reads[k].seq),
                mach.hostinit.cfg["o_fw"],
                mach.hostinit.cfg["o_chase_efw"])

    # -- device interleave (pe_ilv_device) ------------------------------

    def _ilv_static_consts(self, Lq, span):
        """Per-configuration device constants + IlvStatic (cached —
        the reference concat alone is a multi-MB upload)."""
        import jax.numpy as jnp
        from .pe_ilv_device import IlvStatic
        cache = getattr(self, "_ilv_cache", None)
        if cache is not None and cache[0] == (Lq, span):
            return cache[1], cache[2]
        host = self._host
        ra = host.ra
        cat_r, base_r, len_r = self._ref_cat()
        nd = len(self.m_fw.hostinit.cfg["o_chase_efw"])
        efw_tab = np.zeros(4 * nd, np.int32)
        for slot in range(4):
            mach = self.m_fw if slot % 2 == 0 else self.m_rc
            efw_tab[slot * nd:(slot + 1) * nd] = \
                np.asarray(mach.hostinit.cfg["o_chase_efw"], np.int32)
        S = IlvStatic(
            Lq=Lq, SPAN=span, nfrag=int(self._idx_fw.nfrag), nd=nd,
            dense=self.cat.dense,
            v=-1 if ra.v is None else int(ra.v),
            seed_mms=int(ra.seed_mms), seed_len=int(ra.seed_len),
            qual_max=int(ra.qual_max),
            attempt_lim=int(host.mixed_attempt_lim),
            sym_ceiling=min(int(host.sym_ceiling), 0x7FFFFFFE),
            dont_reconcile=bool(host.dont_reconcile),
            slot_l0=(0 if self.fw1 else 1), slot_r0=(2 if self.fw2 else 3),
            slot_l1=(3 if self.fw2 else 2), slot_r1=(1 if self.fw1 else 0),
            max_steps=4096)
        consts = dict(
            efw_tab=jnp.asarray(efw_tab),
            reflen=jnp.asarray(len_r.astype(np.int32)),
            _refcat=jnp.asarray(cat_r),
            _refbase=jnp.asarray(base_r.astype(np.int32)),
        )
        self._ilv_cache = ((Lq, span), S, consts)
        return S, consts

    def _ilv_lane_consts(self, pairs, lanes, Lq, maq):
        """Per-lane outstanding-query tables, vectorized (one flat
        concat + scatter per field instead of a per-pair Python loop —
        this stage was ~25% of the PE wall).  Combos (pe_ilv_device
        ._combo): 0=(m1,fw1) 1=(m1,!fw1) 2=(m2,fw2) 3=(m2,!fw2)."""
        from .backtrack_oracle import QUAL_ROUNDS
        B = len(lanes)
        rds = [pairs[i] for i in lanes]
        l1 = np.fromiter((len(r.seq) for r, _ in rds), np.int32, B)
        l2 = np.fromiter((len(r.seq) for _, r in rds), np.int32, B)
        t15 = np.fromiter((r.trimmed5 for r, _ in rds), np.int32, B)
        t13 = np.fromiter((r.trimmed3 for r, _ in rds), np.int32, B)
        t25 = np.fromiter((r.trimmed5 for _, r in rds), np.int32, B)
        t23 = np.fromiter((r.trimmed3 for _, r in rds), np.int32, B)
        # _trim_adjusted_insert, vectorized (aligner.h:983-999)
        minins = np.full(B, self._host.minins, np.int64)
        maxins = np.full(B, self._host.maxins, np.int64)
        for t in ((t15 if self.fw1 else t13),
                  (t23 if self.fw2 else t25)):
            minins = np.maximum(0, minins - t)
            maxins = np.maximum(0, maxins - t)
        q_c = np.zeros((B, 4, Lq), np.uint8)
        pen_c = np.zeros((B, 4, Lq), np.int32)
        qn_c = np.zeros((B, 4), np.int32)
        combos = ((0, self.fw1), (0, not self.fw1),
                  (2, self.fw2), (2, not self.fw2))
        for c, (mate_i, ofw) in enumerate(combos):
            which = [p[mate_i >> 1] for p in rds]
            cat = np.concatenate(
                [np.asarray(r.codes_fw if ofw else r.codes_rc,
                            np.uint8) for r in which]) \
                if which else np.zeros(0, np.uint8)
            qcat = np.concatenate(
                [np.frombuffer(bytes(r.qual if ofw
                                     else r.qual[::-1]), np.uint8)
                 for r in which]) if which else np.zeros(0, np.uint8)
            lens = (l1 if mate_i == 0 else l2).astype(np.int64)
            rows = np.repeat(np.arange(B), lens)
            cols = np.concatenate([np.arange(n) for n in lens]) \
                if B else np.zeros(0, np.int64)
            q_c[rows, c, cols] = cat
            quals = qcat.astype(np.int32) - 33
            pen_c[rows, c, cols] = (QUAL_ROUNDS[quals] if maq
                                    else quals)
            nmask = cat > 3
            if nmask.any():
                qn_c[np.unique(rows[nmask]), c] = 1
        qlen_c = np.stack([l1, l1, l2, l2], axis=1)
        alen_c = np.stack([l2, l2, l1, l1], axis=1)
        sol_c = np.broadcast_to(np.array(
            [int(o) for _, o in combos], np.int32), (B, 4)).copy()
        wok_c = (maxins[:, None] >
                 np.maximum(qlen_c, alen_c)).astype(np.int32)
        return dict(
            q_c=q_c, pen_c=pen_c, qlen_c=qlen_c, alen_c=alen_c,
            qn_c=qn_c, sol_c=sol_c, wok_c=wok_c,
            minins=minins.astype(np.int32),
            maxins=maxins.astype(np.int32))

    def _ilv_run(self, pairs, items, seeds_all):
        """Run the device interleave over (i, streams) items; returns
        (decided [(i, result)], escalate_idx, host_items)."""
        import jax.numpy as jnp
        from .pe_ilv_device import REC_W, init_state, run_ilv
        import os as _os2
        import sys as _sys2
        import time as _time2
        _prof2 = bool(_os2.environ.get("BOWTIE_TPU_PROF"))
        _tc0 = _time2.time()
        lanes, host_items = [], []
        for i, streams in items:
            rd1, rd2 = pairs[i]
            if max(len(rd1.seq), len(rd2.seq)) > 64:
                host_items.append((i, streams))
            else:
                lanes.append((i, streams))
        if not lanes:
            return [], [], host_items
        B = len(lanes)
        Bp = _bucket(B)
        Lq = 40 if max(max(len(p[0].seq), len(p[1].seq))
                       for p in (pairs[i] for i, _ in lanes)) <= 40 \
            else 64
        span = ((int(self._host.maxins) + Lq + 2 + 63) // 64) * 64
        S, gconsts = self._ilv_static_consts(Lq, span)
        lconsts = self._ilv_lane_consts(pairs, [i for i, _ in lanes],
                                        Lq, self._host.ra.maq)
        for k, v in lconsts.items():
            v = np.asarray(v)
            if Bp > B:
                pad = np.zeros((Bp - B,) + v.shape[1:], v.dtype)
                v = np.concatenate([v, pad], axis=0)
            lconsts[k] = v
        hits = np.zeros((Bp, 4, H_MAX, REC_W), np.int32)
        nrec = np.zeros((Bp, 4), np.int32)
        capped = np.zeros((Bp, 4), np.int32)
        # one scatter per slot instead of a per-(lane,slot) loop
        for s in range(4):
            sls = [streams[s] for _, streams in lanes]
            ns = np.fromiter((len(x) for x in sls), np.int64, B)
            nrec[:B, s] = ns
            capped[:B, s] = np.fromiter((x.capped for x in sls),
                                        bool, B)
            tot = int(ns.sum())
            if tot:
                flat = np.concatenate(
                    [np.asarray(x.rows, np.int64).reshape(-1, REC_W)
                     for x in sls if len(x)]).astype(np.int32)
                rws = np.repeat(np.arange(B), ns)
                slt = np.concatenate([np.arange(n) for n in ns])
                hits[rws, s, slt] = flat
        seeds = np.zeros(Bp, np.uint32)
        seeds[:B] = seeds_all[np.asarray([i for i, _ in lanes],
                                         np.int64)]
        dis = np.zeros(Bp, np.int32)
        dis[B:] = 1
        from .pe_ilv_device import init_from_packed
        pack = np.concatenate([
            hits.reshape(Bp, -1), nrec, capped,
            seeds.view(np.int32)[:, None], dis[:, None],
            lconsts["qlen_c"], lconsts["alen_c"], lconsts["qn_c"],
            lconsts["sol_c"], lconsts["wok_c"],
            lconsts["minins"][:, None], lconsts["maxins"][:, None],
            lconsts["pen_c"].reshape(Bp, -1)], axis=1) \
            .astype(np.int32)
        st0 = init_from_packed(jnp.asarray(pack),
                               jnp.asarray(lconsts["q_c"]),
                               gconsts, S=S)
        import os as _os
        import sys as _sys
        import time as _time
        prof = bool(_os.environ.get("BOWTIE_TPU_PROF"))
        if prof:
            print(f"[prof pe-ilv] consts+repack+init="
                  f"{_time.time() - _tc0:.3f}s",
                  file=_sys.stderr, flush=True)
        t0 = _time.time()
        out, _ = run_ilv(self.cat, st0, S=S)
        out = {k: np.asarray(v[:B]) for k, v in out.items()}
        t_mach = _time.time() - t0
        t0 = _time.time()
        decided, escal = [], []
        for k, (i, streams) in enumerate(lanes):
            if out["escalate"][k]:
                escal.append(i)
            elif out["res_found"][k]:
                decided.append((i, self._ilv_assemble(
                    pairs[i], streams, {kk: int(out[kk][k])
                                        for kk in out})))
            else:
                decided.append((i, self._ilv_assemble(pairs[i], None,
                                                      None)))
        if prof:
            print(f"[prof pe-ilv] machine+poll={t_mach:.3f}s "
                  f"assemble={_time.time() - t0:.3f}s "
                  f"({len(decided)} decided)",
                  file=_sys.stderr, flush=True)
        self.ilv_decided += len(decided)
        return decided, escal, host_items

    def _ilv_assemble(self, pair, streams, res):
        """Host-side result assembly for a device-decided pair —
        mirrors _resolve_outstanding's reporting tail
        (best_paired.py:469-507) for the single winning candidate."""
        from .best_paired import PairedBestSink
        from .types import Hit
        rd1, rd2 = pair
        sink = type(self._host.sink)(self._host.sink.policy,
                                     self._host.sink.global_seed)
        sink.reset(rd1, rd2)
        if res is None:
            return sink.finish()
        phase, side = res["res_phase"], res["res_side"]
        fr, _ = streams[res["res_slot"]].materialize(res["res_idx"])
        anchor_is_left = side > 0
        Lis1 = phase == 0
        pair_fw = phase == 0
        fwL = self.fw1 if phase == 0 else (not self.fw2)
        fwR = self.fw2 if phase == 0 else (not self.fw1)
        out_is_1 = (not Lis1) if anchor_is_left else Lis1
        orr = rd1 if out_is_1 else rd2
        ar = rd2 if out_is_1 else rd1
        match_right = anchor_is_left
        ofw = fwR if anchor_is_left else fwL
        tidx, toff = res["res_tidx"], res["res_toff"]
        left, stratum, ham = (res["res_left"], res["res_strat"],
                              res["res_ham"])
        qlen = len(orr.seq)
        seq = np.asarray(orr.codes_fw if ofw else orr.codes_rc,
                         np.uint8)
        seg = np.asarray(self._host.refs[tidx][left:left + qlen],
                         np.uint8)
        mms = [(int(c), ord("ACGTN"[int(seg[c])]))
               for c in np.flatnonzero(seg != seq)]
        if not ofw:
            mms = sorted((qlen - 1 - p, ch) for p, ch in mms)
        else:
            mms = sorted(mms)
        cost = (stratum << 14) | ham
        oms = fr.bot - fr.top - 1
        a_mms = []
        for pos, refc in zip(fr.mms, fr.refcs):
            p5 = len(ar.seq) - pos - 1 if (fr.ebwt_fw != fr.fw) else pos
            a_mms.append((p5, ord("acgt"[refc])))
        anchor_hit = Hit(read=ar, fw=fr.fw, tidx=tidx, toff=toff,
                         oms=oms, stratum=fr.stratum, cost=fr.cost,
                         mms=sorted(a_mms), mate=(2 if out_is_1 else 1))
        out_hit = Hit(read=orr, fw=ofw, tidx=tidx, toff=left, oms=oms,
                      stratum=stratum, cost=cost, mms=mms,
                      mate=(1 if out_is_1 else 2))
        up, dn = ((anchor_hit, out_hit) if match_right
                  else (out_hit, anchor_hit))
        up.mate = 1 if pair_fw else 2
        dn.mate = 2 if pair_fw else 1
        for h, o in ((up, dn), (dn, up)):
            h.mfw = o.fw
            h.mtidx = o.tidx
            h.mtoff = o.toff
            h.mlen = o.length
        sink.report_hit(up)
        sink.report_hit(dn)
        return sink.finish()

    def align_batch(self, pairs):
        """Record ALL FOUR driver streams upfront (one batched machine
        run per (mate, orientation)), then replay every pair once.

        The earlier phased design (synth phase 0, fw-orientation
        phase A, rc on escalation) assumed most pairs decide on their
        first fw-orientation anchor; on real paired fixtures ~75% of
        pairs must visit the rc-orientation drivers (the V1 interleave
        tries both orientations whenever the first yields no pair,
        aligner.h:817-836), so phasing turned the COMMON case into a
        serial escalate-re-record-re-replay chain.  With the machine
        fast, four upfront batched recordings are cheaper.  Capped
        streams that the interleave outruns (rare) re-record uncapped;
        only cap-proof failures fall back to live host drivers."""
        if not pairs:
            return []
        import numpy as np_
        from ..utils.rng import fill_seed_caches
        s1 = fill_seed_caches([p[0] for p in pairs], self.global_seed)

        m1 = [p[0] for p in pairs]
        m2 = [p[1] for p in pairs]
        # stream slots in factory order [d1f, d1r, d2f, d2r]
        slotL = 0 if self.fw1 else 1          # mate1, fw-orientation
        slotR = 2 if self.fw2 else 3          # mate2, fw-orientation
        slotLb = 1 if self.fw1 else 0         # mate1, rc-orientation
        slotRb = 3 if self.fw2 else 2
        machL = self.m_fw if self.fw1 else self.m_rc
        machR = self.m_fw if self.fw2 else self.m_rc
        machLb = self.m_rc if self.fw1 else self.m_fw
        machRb = self.m_rc if self.fw2 else self.m_fw
        results = [None] * len(pairs)
        plan = ((machL, m1, slotL), (machR, m2, slotR),
                (machLb, m1, slotLb), (machRb, m2, slotRb))

        def record_round(idxs, cap):
            """Record the 4 streams for the given pair indices via the
            fused single-machine-run path (+ phase-0 exact synthesis).
            Returns (streams[i] -> [4 streams], overflow[i])."""
            seeds = s1[np_.asarray(idxs, np_.int64)]
            return self._record_all(plan, idxs, seeds, cap)

        # Round 1: capped recordings of all four streams, one replay.
        import os as _os
        import sys as _sys
        import time as _time
        prof = bool(_os.environ.get("BOWTIE_TPU_PROF"))
        t0 = _time.time()
        idxs = list(range(len(pairs)))
        sts, ovd = record_round(idxs, self.rec_cap)
        if prof:
            print(f"[prof pe] record x4: {_time.time() - t0:.3f}s",
                  file=_sys.stderr, flush=True)
            t0 = _time.time()
        items, fb_items, escal = [], [], []
        for i in idxs:
            if ovd.get(i):
                self.fallbacks += 1
                fb_items.append((i, None))
            else:
                items.append((i, sts[i]))
        for i, res, _ in self._replay_all(pairs, fb_items):
            results[i] = res
        if self.use_ilv:
            decided, esc_d, items = self._ilv_run(pairs, items, s1)
            for i, res in decided:
                results[i] = res
            escal.extend(esc_d)
        for i, res, esc in self._replay_all(pairs, items):
            if esc:
                escal.append(i)
            else:
                results[i] = res
        if prof:
            print(f"[prof pe] replay {len(items)}: "
                  f"{_time.time() - t0:.3f}s escal={len(escal)}",
                  file=_sys.stderr, flush=True)

        if escal:
            # Round 2: the interleave outran a capped stream —
            # re-record those pairs to exhaustion and replay again.
            escal.sort()
            self.escalations += len(escal)
            sts, ovd = record_round(escal, None)
            items, fb_items = [], []
            for i in escal:
                if ovd.get(i):
                    self.fallbacks += 1
                    fb_items.append((i, None))
                else:
                    items.append((i, sts[i]))
            for i, res, _ in self._replay_all(pairs, fb_items):
                results[i] = res
            if self.use_ilv:
                # uncapped streams cannot out-run the recording; any
                # residual device escalation (counter saturation) goes
                # to the live host drivers
                decided, esc_d, items = self._ilv_run(pairs, items, s1)
                for i, res in decided:
                    results[i] = res
                for i in esc_d:
                    self.fallbacks += 1
                    res, _ = self._replay(*pairs[i], None)
                    results[i] = res
            for i, res, esc in self._replay_all(pairs, items):
                if esc:       # cannot happen on uncapped streams
                    self.fallbacks += 1
                    res, _ = self._replay(*pairs[i], None)
                results[i] = res
        return results

    # -- phase-0 helpers -------------------------------------------------

    def _exact_fm(self, efw: bool):
        """FMIndexArrays of the fw (efw=True) or mirror index, ranges
        only (no SA)."""
        fms = getattr(self, "_fms", None)
        if fms is None:
            fms = self._fms = {}
        if efw not in fms:
            from ..index.arrays import from_ebwt
            oe = self.cat.occ_every
            fms[efw] = from_ebwt(self._idx_fw if efw else self._idx_bw,
                                 occ_every=oe, dense_sa=False)
        return fms[efw]

    def _synth_streams(self, mach, reads):
        """Per-read SynthStream of the machine's exact-reporting
        sub-driver (outer 0: always min_cost 0 while every other
        sub-driver starts >= 1<<14), or None when the read has no
        whole-read exact hit (or is out of machine bounds)."""
        import jax.numpy as jnp
        from .exact import right_align
        from .exact import exact_ranges
        cfg = mach.outers[0].cfg
        assert cfg.report_exacts
        base = [(r.codes_fw if cfg.fw else r.codes_rc) for r in reads]
        if not cfg.ebwt_fw:
            # mirror-index backward search consumes the read forward
            base = [b[::-1] for b in base]
        L = max(8, max(len(b) for b in base))
        mat, lens = right_align(base, pad_to=L)
        top, bot = exact_ranges(self._exact_fm(cfg.ebwt_fw),
                                jnp.asarray(mat), jnp.asarray(lens))
        top = np.asarray(top).tolist()
        bot = np.asarray(bot).tolist()
        out = []
        for i, r in enumerate(reads):
            if bot[i] > top[i] and 4 <= len(r.seq) <= 255:
                out.append(SynthStream(top[i], bot[i], len(r.seq),
                                       cfg.fw, cfg.ebwt_fw))
            else:
                out.append(None)
        return out


def dryrun_pe(n_lanes_per_dev: int = 4, mesh=None) -> int:
    """Compile + run one tiny sharded record-mode batch (the PE anchor
    stream recorder, -n 2 defaults) over the mesh; used by the
    driver's multi-chip dry run."""
    import jax
    import jax.numpy as jnp
    from ..index.ebwt_io import read_ebwt
    from ..io.readers import ReadSource
    from ..parallel.dfs_mesh import make_dp_mesh, replicate_cat
    from .best_device import (_init_state, _len_bucket, run_chunk,
                              shard_best_state)

    mesh = mesh or make_dp_mesh()
    ndev = mesh.devices.size
    B = n_lanes_per_dev * ndev
    idx = read_ebwt("/root/reference/indexes/e_coli")
    idx_bw = read_ebwt("/root/reference/indexes/e_coli.rev")
    from .best_device import build_fmcat
    cat = build_fmcat(idx, idx_bw, occ_every=1, dense_sa=True)
    sm = _StrandMachine(cat, idx, idx_bw, mode="n", v=0, seed_mms=2,
                        seed_len=28, qual_cutoff=70, fw=True, maq=True,
                        qual_order=True, maxbts=800, max_steps=60000)
    reads = list(ReadSource(["/root/reference/reads/e_coli_1000_1.fq"],
                            "fastq", upto=B).records())
    while len(reads) < B:
        reads.append(reads[len(reads) % 1000])
    L = _len_bucket(max(len(r.seq) for r in reads))
    seeds = np.array([r.seed(0) for r in reads], np.uint32)
    host = sm.hostinit.build(reads, L, seeds)
    st = _init_state(B, L, sm.hostinit.nd, sm.hostinit.ndt, seeds,
                     host, sm.maxbts)
    catr = replicate_cat(cat, mesh)
    cfgj = {k: jax.device_put(v, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec())) for k, v in sm.cfgj.items()}
    st = shard_best_state(st, mesh)
    kw = dict(nd=sm.hostinit.nd, ndt=sm.hostinit.ndt, L=L,
              nfrag=sm.nfrag, n_k=INF32, m_max=INF32, strata=False,
              qual_lim=sm.qual_lim, qual_order=True, bt_on=sm.bt_on,
              fc=cat.ftab_chars, has_seeded=True, record=True)
    for _ in range(60):
        st, mode = run_chunk(catr, cfgj, st, chunk=256, **kw)
        if int(jnp.sum((mode != M_DONE).astype(jnp.int32))) == 0:
            break
    nranges = int(jnp.sum(st["nhits"]))
    assert nranges > 0, "no PE lane recorded a range"
    return nranges
