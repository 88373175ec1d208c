"""Seeded -n mode (bowtie's default, Maq-like) on the device DFS engine.

Mirrors seededQualCutoffSearchFull + search_seeded_phase1-4.c
(ebwt_search.cpp:2735-2952) as TWO device launches per batch:

  launch A  phase 1 (exact fw + seed-cases on rc), phase 2 (seed cases
            on the mirror index + rc partial collection), and the
            phase-3 tail (fw partial collection) — all statically known
            jobs per read.
  launch B  phase 3/4 partial extensions (one job per collected
            partial, with the seed mutations applied to the query and
            the prior qual cost as entry ham) + the half-and-half
            searches.  RNG/hit-count state carries from A.

The host sync between launches is the device analog of the
PartialAlignmentManager handoff (ebwt_search_util.h:168); splitting at
that point keeps every job's query row statically precomputable.

Per-read host-oracle fallback on overflow keeps bit-identical output.
"""
from __future__ import annotations

import numpy as np

from ..index.ebwt_io import EbwtIndex
from .dfs_device import (DeviceDFSAligner, INF32, JOB_FIELDS, P_MAX,
                         build_fmcat, fill_job, run_compacting,
                         _bucket, _len_bucket)
from .dfs_jobs import attach_base, empty_jobs_vec, read_matrices
from .drivers import to_muts


class _Pal:
    __slots__ = ("muts",)

    def __init__(self, muts):
        self.muts = muts


def _hh_offs(qs, s, n):
    """Half-and-half setOffs (search_seeded_phase3.c:29-92 analog)."""
    q = min(qs, s)
    q5 = (q >> 1) + (q & 1)
    return (q5, q, 0, q5 if n <= 2 else 0, q if n < 3 else q5, q)


def _poll_one(st):
    import jax.numpy as jnp
    ks = ("mode", "result", "overflow", "count", "nhits")
    return jnp.stack([st[k].astype(jnp.int32) for k in ks])


_HITS_SLICE_CACHE: dict = {}


def _hits_slice(st, ncols: int):
    """Static [:, :ncols] slice of the flat hits pool (jitted per
    width) — a data-INDEPENDENT transfer that can be enqueued ahead of
    the next launch's compute."""
    import jax
    fn = _HITS_SLICE_CACHE.get(ncols)
    if fn is None:
        fn = _HITS_SLICE_CACHE[ncols] = \
            jax.jit(lambda h: h[:, :ncols])
    return fn(st["hits"])


def _poll_pair(st_a, st_b):
    """A+B per-lane scalars in ONE [10, B] transfer."""
    import jax.numpy as jnp
    ks = ("mode", "result", "overflow", "count", "nhits")
    return jnp.stack([s[k].astype(jnp.int32)
                      for s in (st_a, st_b) for k in ks])


def _pack_hits2(st_a, st_b, la_a, sl_a, la_b, sl_b):
    """A-hit rows + B-hit rows in ONE gather+transfer."""
    import jax.numpy as jnp
    from .dfs_device import _gather_rows
    return jnp.concatenate([_gather_rows(st_a["hits"], la_a, sl_a),
                            _gather_rows(st_b["hits"], la_b, sl_b)],
                           axis=0)


def _derive_b_jobs_device(st_a, gated, base_codes, base_qual,
                          base_plen, qr_tab, *, J, jrc, n, s, qt,
                          maxbts, maq, norc, nofw, L, fc):
    """jnp twin of _jobs_b_vec, run ON DEVICE from launch-A state: the
    A->B host round trip (poll + partial download + job upload) costs
    ~3 tunnel syncs x ~0.7 s per batch, which dominated -n 2.  Field-
    for-field identical to the host derivation (test_n_device)."""
    import jax
    import jax.numpy as jnp

    B = st_a["mode"].shape[0]
    res = st_a["result"]
    ovf = st_a["overflow"] | (st_a["mode"] != 0)    # M_DONE == 0
    npart = st_a["npart"]
    active = (res == 0) & ~ovf & ~gated & (n > 0)
    plen = base_plen.astype(jnp.int32)
    qs = jnp.minimum(plen, s)
    pj = st_a["part_job"]                           # [B, P]
    P = pj.shape[1]
    # raw machine state keeps the per-slot mutation triplets flat
    # ([B, P*3], slot-major) — the host path only sees them 3-D after
    # _fuse_parts; reshape here before the per-k column indexing.
    ppos = st_a["part_pos"].reshape(B, P, 3)        # [B, P, 3]
    prefc = st_a["part_refc"].reshape(B, P, 3)
    pn = st_a["part_n"]
    slot = jnp.arange(P)[None, :]
    vpart = (slot < npart[:, None]) & active[:, None]
    rc = vpart & (pj == jrc)
    fw = vpart & ~rc
    nrc = rc.sum(axis=1).astype(jnp.int32)
    nfw = fw.sum(axis=1).astype(jnp.int32)
    hh_on = n >= 2
    hh_rc_on = hh_on and not norc
    hh_fw_on = hh_on and not nofw
    fw_base = nrc + (1 if hh_rc_on else 0) * active.astype(jnp.int32)

    jobs = {f: jnp.zeros((B, J), jnp.int32) for f in JOB_FIELDS}
    qm = base_qual.astype(jnp.int32)
    mutq = jnp.take_along_axis(
        jnp.pad(qm, ((0, 0), (0, 4))),
        jnp.clip(ppos.reshape(B, -1), 0, L + 3), 1).reshape(B, P, 3)
    pens = qr_tab[jnp.clip(mutq, 0, 255)] if maq else mutq
    kmask = jnp.arange(3)[None, None, :] < pn[:, :, None]
    ham0 = (pens * kmask).sum(axis=2).astype(jnp.int32)
    tpos = plen[:, None, None] - 1 - ppos

    bcol = jnp.broadcast_to(jnp.arange(B)[:, None], (B, P))

    def scatter(jobs, mask, jj, is_rc_block):
        j = jnp.where(mask, jj, J)                  # J -> dropped
        def sj(jobs, f, val):
            jobs[f] = jobs[f].at[bcol, j].set(
                jnp.broadcast_to(val, (B, P)).astype(jnp.int32),
                mode="drop")
            return jobs
        jobs = sj(jobs, "valid", 1)
        jobs = sj(jobs, "qlen", plen[:, None])
        jobs = sj(jobs, "fw", 0 if is_rc_block else 1)
        jobs = sj(jobs, "ebwt_fw", 1 if is_rc_block else 0)
        for f in ("unrev", "rev1", "rev2", "rev3"):
            jobs = sj(jobs, f, qs[:, None])
        jobs = sj(jobs, "ham0", ham0)
        jobs = sj(jobs, "report_exacts", 1)
        jobs = sj(jobs, "max_bts", maxbts)
        jobs = sj(jobs, "consider_quals", 1)
        jobs = sj(jobs, "qual_thresh", qt)
        jobs = sj(jobs, "maq_round", int(maq))
        first = jj == (0 if is_rc_block else fw_base[:, None])
        jobs = sj(jobs, "reset_rng", first.astype(jnp.int32))
        jobs = sj(jobs, "npremut", pn)
        for k in range(3):
            jobs = sj(jobs, f"premut_pos{k}",
                      jnp.where(pn > k, tpos[:, :, k], 0))
            jobs = sj(jobs, f"premut_refc{k}",
                      jnp.where(pn > k, prefc[:, :, k], 0))
        return jobs

    rc_rank = jnp.cumsum(rc, axis=1).astype(jnp.int32) - 1
    fw_rank = jnp.cumsum(fw, axis=1).astype(jnp.int32) - 1 \
        + fw_base[:, None]
    if not norc:
        jobs = scatter(jobs, rc, rc_rank, True)
    if not nofw:
        jobs = scatter(jobs, fw, fw_rank, False)

    # half-and-half jobs
    q5 = (qs >> 1) + (qs & 1)
    z = jnp.zeros_like(qs)
    hh_offs = (q5, qs, z, q5 if n <= 2 else z,
               qs if n < 3 else q5, qs)
    brow = jnp.arange(B)
    for on, jcol, isrc in ((hh_rc_on, nrc, True),
                           (hh_fw_on, fw_base + nfw, False)):
        if not on:
            continue
        j = jnp.where(active, jcol, J)
        def sh(jobs, f, val):
            jobs[f] = jobs[f].at[brow, j].set(
                jnp.broadcast_to(val, (B,)).astype(jnp.int32),
                mode="drop")
            return jobs
        jobs = sh(jobs, "valid", 1)
        jobs = sh(jobs, "qlen", plen)
        jobs = sh(jobs, "fw", 0 if isrc else 1)
        jobs = sh(jobs, "ebwt_fw", 1 if isrc else 0)
        for f, v in zip(("d5", "d3", "unrev", "rev1", "rev2",
                         "rev3"), hh_offs):
            jobs = sh(jobs, f, v)
        jobs = sh(jobs, "half_and_half", 1)
        jobs = sh(jobs, "report_exacts", 1)
        jobs = sh(jobs, "max_bts", maxbts)
        jobs = sh(jobs, "consider_quals", 1)
        jobs = sh(jobs, "qual_thresh", qt)
        jobs = sh(jobs, "maq_round", int(maq))
        jobs = sh(jobs, "reset_rng", 1)
    # pack to the device job format + derive by-depth rows, all still
    # inside this jit (no host round trip)
    from .dfs_device import JOB_FIELDS as JF, NJF, _derive_rows_impl
    scal = jnp.stack([jobs[f] for f in JF], axis=-1).reshape(B, J * NJF)
    scal, qqp_r = _derive_rows_impl(
        scal, base_codes, base_qual, base_plen, J=J, L=L, fc=fc)
    return {"scal": scal, "qqp_r": qqp_r, "base_codes": base_codes,
            "base_qual": base_qual, "base_plen": base_plen}


class DeviceNAligner(DeviceDFSAligner):
    """-n mode aligner: two device launches + host partial handoff."""

    def __init__(self, idx_fw: EbwtIndex, idx_bw: EbwtIndex, policy,
                 seed_mms: int = 2, seed_len: int = 28,
                 qual_thresh: int = 70, maxbts: int = 125,
                 maq_round: bool = True, nofw: bool = False,
                 norc: bool = False, global_seed: int = 0,
                 max_steps: int = 60000, compact: bool | None = None):
        super().__init__(idx_fw, idx_bw, policy, v=0, nofw=nofw,
                         norc=norc, global_seed=global_seed,
                         max_steps=max_steps, compact=compact)
        self.n_mms = seed_mms
        self.seed_len = seed_len
        self.qt = qual_thresh
        self.maxbts = maxbts
        self.maq = maq_round

    def _oracle_aligner(self):
        if self._oracle is None:
            from .drivers import OracleAligner
            from .golden import GoldenFM
            self._oracle = OracleAligner(
                GoldenFM(self.idx_fw), GoldenFM(self.idx_bw), self.policy,
                mode="n", nofw=self.nofw, norc=self.norc,
                global_seed=self.global_seed, seed_mms=self.n_mms,
                seed_len=self.seed_len, qual_thresh=self.qt,
                maxbts=self.maxbts, maq_round=self.maq)
        return self._oracle

    # -- launch B job table (phase 3/4 extensions + half-and-half) ------
    def _jobs_b_vec(self, reads, out_a, L, fc, gated, jrc):
        """Vectorized launch-B construction (derive-rows mode): the
        per-partial extension jobs and half-and-half jobs are scattered
        into the job table with numpy fancy indexing instead of a
        per-(read, job) fill loop — the python loop dominated host time
        at 16k-read batches."""
        from .backtrack_oracle import QUAL_ROUNDS
        from .dfs_jobs import attach_base, read_matrices
        n, s, qt = self.n_mms, self.seed_len, self.qt
        B = len(reads)
        res = np.asarray(out_a["result"][:B])
        ovf = np.asarray(out_a["overflow"][:B])
        npart = np.asarray(out_a["npart"][:B])
        active = (res == 0) & ~ovf & ~np.asarray(gated[:B], bool) & \
            (n > 0)
        if not active.any():
            return None, 0
        fwm, qm, lens = read_matrices(reads, L)
        plen = lens
        qs = np.minimum(plen, s)
        pj = np.asarray(out_a["part_job"][:B])        # [B, P]
        ppos = np.asarray(out_a["part_pos"][:B])      # [B, P, 3]
        prefc = np.asarray(out_a["part_refc"][:B])
        pn = np.asarray(out_a["part_n"][:B])
        P = pj.shape[1]
        slot = np.arange(P)[None, :]
        vpart = (slot < npart[:, None]) & active[:, None]
        rc = vpart & (pj == jrc)
        fw = vpart & ~rc
        nrc = rc.sum(axis=1)
        nfw = fw.sum(axis=1)
        hh_on = n >= 2
        hh_rc_on = hh_on and not self.norc
        hh_fw_on = hh_on and not self.nofw
        fw_base = nrc + (1 if hh_rc_on else 0) * active
        njobs = fw_base + nfw + (1 if hh_fw_on else 0) * active
        nj = int(njobs.max()) if B else 0
        if nj == 0:
            return None, 0
        J = _bucket(nj, (4, 8, 16, P_MAX + 4))
        from .dfs_jobs import empty_jobs_vec
        jobs = empty_jobs_vec(B, J, L, rows=False)
        # penalty of each partial's quality (to_muts: oldq sums the
        # penalty at the RAW stored positions)
        mutq = np.take_along_axis(
            np.pad(qm, ((0, 0), (0, 4))),
            np.clip(ppos.reshape(B, -1), 0, L + 3), 1).reshape(B, P, 3)
        pens = (QUAL_ROUNDS[np.clip(mutq, 0, 255)] if self.maq
                else mutq)
        kmask = np.arange(3)[None, None, :] < pn[:, :, None]
        ham0 = (pens * kmask).sum(axis=2)             # [B, P]
        tpos = plen[:, None, None] - 1 - ppos         # mutation coords

        def scatter(mask, jj, is_rc_block):
            bb, pp = np.nonzero(mask)
            j = jj[bb, pp]
            jobs["valid"][bb, j] = 1
            jobs["qlen"][bb, j] = plen[bb]
            jobs["fw"][bb, j] = 0 if is_rc_block else 1
            jobs["ebwt_fw"][bb, j] = 1 if is_rc_block else 0
            for f in ("unrev", "rev1", "rev2", "rev3"):
                jobs[f][bb, j] = qs[bb]
            jobs["ham0"][bb, j] = ham0[bb, pp]
            jobs["report_exacts"][bb, j] = 1
            jobs["max_bts"][bb, j] = self.maxbts
            jobs["consider_quals"][bb, j] = 1
            jobs["qual_thresh"][bb, j] = qt
            jobs["maq_round"][bb, j] = int(self.maq)
            # reset_rng only on the first extension of the block
            first = (jj[bb, pp] == (0 if is_rc_block else fw_base[bb]))
            jobs["reset_rng"][bb, j] = first.astype(np.int32)
            jobs["npremut"][bb, j] = pn[bb, pp]
            for k in range(3):
                jobs[f"premut_pos{k}"][bb, j] = \
                    np.where(pn[bb, pp] > k, tpos[bb, pp, k], 0)
                jobs[f"premut_refc{k}"][bb, j] = \
                    np.where(pn[bb, pp] > k, prefc[bb, pp, k], 0)

        rc_rank = np.cumsum(rc, axis=1) - 1
        fw_rank = np.cumsum(fw, axis=1) - 1 + fw_base[:, None]
        if not self.norc:
            scatter(rc, rc_rank, True)
        if not self.nofw:
            scatter(fw, fw_rank, False)

        # half-and-half jobs
        q5 = (qs >> 1) + (qs & 1)
        hh_offs = (q5, qs, np.zeros_like(qs),
                   q5 if n <= 2 else np.zeros_like(qs),
                   qs if n < 3 else q5, qs)
        for on, jcol, isrc in ((hh_rc_on, nrc, True),
                               (hh_fw_on, fw_base + nfw, False)):
            if not on:
                continue
            bb = np.flatnonzero(active)
            j = jcol[bb]
            jobs["valid"][bb, j] = 1
            jobs["qlen"][bb, j] = plen[bb]
            jobs["fw"][bb, j] = 0 if isrc else 1
            jobs["ebwt_fw"][bb, j] = 1 if isrc else 0
            for f, v in zip(("d5", "d3", "unrev", "rev1", "rev2",
                             "rev3"), hh_offs):
                jobs[f][bb, j] = v[bb]
            jobs["half_and_half"][bb, j] = 1
            jobs["report_exacts"][bb, j] = 1
            jobs["max_bts"][bb, j] = self.maxbts
            jobs["consider_quals"][bb, j] = 1
            jobs["qual_thresh"][bb, j] = qt
            jobs["maq_round"][bb, j] = int(self.maq)
            jobs["reset_rng"][bb, j] = 1
        attach_base(jobs, fwm, qm, lens)
        return jobs, J

    def _jobs_b(self, reads, out_a, L, fc, gated, jrc):
        n, s, qt = self.n_mms, self.seed_len, self.qt
        B = len(reads)
        kw = dict(consider_quals=True, qual_thresh=qt, maq=self.maq,
                  max_bts=self.maxbts, fc=fc)
        specs = [[] for _ in range(B)]
        for b, read in enumerate(reads):
            if out_a["result"][b] != 0 or out_a["overflow"][b] or \
                    gated[b] or n == 0:
                continue
            plen = len(read.seq)
            qs = min(plen, s)
            ext = (0, 0, qs, qs, qs, qs) if qs < s else (0, 0, s, s, s, s)
            pam_rc, pam_fw = [], []
            for t in range(int(out_a["npart"][b])):
                pal = _Pal([(int(out_a["part_pos"][b, t, k]),
                             int(out_a["part_refc"][b, t, k]))
                            for k in range(int(out_a["part_n"][b, t]))])
                if int(out_a["part_job"][b, t]) == jrc:
                    pam_rc.append(pal)
                else:
                    pam_fw.append(pal)
            sp = specs[b]
            if not self.norc:
                # phase 3: extend rc partials on the fw index (btr3)
                for i, pal in enumerate(pam_rc):
                    muts, oldq = to_muts(pal, read.codes_rc,
                                         read.qual[::-1], self.maq)
                    qd = np.asarray(read.codes_rc, np.int32).copy()
                    for pos, ch in muts:
                        qd[pos] = ch
                    sp.append(dict(fw=False, ebwt_fw=True, offs=ext,
                                   ham0=oldq, premuts=muts,
                                   qd_override=qd, reset_rng=(i == 0),
                                   **kw))
                if n >= 2:     # btr23 half-and-half
                    sp.append(dict(fw=False, ebwt_fw=True,
                                   offs=_hh_offs(qs, s, n),
                                   half_and_half=True, **kw))
            if self.nofw:
                continue
            # phase 4: extend fw partials on the mirror index (btf4)
            for i, pal in enumerate(pam_fw):
                muts, oldq = to_muts(pal, read.codes_fw[::-1],
                                     read.qual[::-1], self.maq)
                qd = np.asarray(read.codes_fw, np.int32)[::-1].copy()
                for pos, ch in muts:
                    qd[pos] = ch
                sp.append(dict(fw=True, ebwt_fw=False, offs=ext,
                               ham0=oldq, premuts=muts, qd_override=qd,
                               reset_rng=(i == 0), **kw))
            if n >= 2:         # btf24 half-and-half
                sp.append(dict(fw=True, ebwt_fw=False,
                               offs=_hh_offs(qs, s, n),
                               half_and_half=True, **kw))
        nj = max((len(sp) for sp in specs), default=0)
        if nj == 0:
            return None, 0
        from .dfs_jobs import derive_rows_enabled
        J = _bucket(nj, (4, 8, 16, P_MAX + 4))
        derive = derive_rows_enabled()
        jobs = empty_jobs_vec(B, J, L, rows=not derive)
        for b, read in enumerate(reads):
            for j, spec in enumerate(specs[b]):
                if derive:
                    spec = dict(spec)
                    spec.pop("qd_override", None)  # device applies muts
                fill_job(jobs, b, j, read, **spec)
        if derive:
            fwm, qm, lens = read_matrices(reads, L)
            attach_base(jobs, fwm, qm, lens)
        return jobs, J

    def align_batch(self, reads) -> list:
        if not reads:
            return []
        # exact-hit fast path (see DeviceDFSAligner._exact_gate)
        return self._exact_gate(reads, self._align_batch_n)

    def _align_batch_n(self, reads) -> list:
        import jax.numpy as jnp
        B = len(reads)
        Bp = _bucket(B)
        L = _len_bucket(max(max(len(r.seq) for r in reads),
                            self.seed_len))
        fc = self.cat.ftab_chars
        n_k = self.policy.n if self.policy.n < INF32 else INF32
        m_max = self.policy.max if self.policy.max < INF32 else INF32
        from ..utils.rng import fill_seed_caches
        seeds = np.zeros(Bp, dtype=np.uint32)
        seeds[:len(reads)] = fill_seed_caches(reads, self.global_seed)

        from .dfs_device import upload_jobs

        def pad(jobs, J):
            for k, v in jobs.items():
                if v.shape[0] < Bp:
                    z = np.zeros((Bp - v.shape[0],) + v.shape[1:],
                                 dtype=v.dtype)
                    jobs[k] = np.concatenate([v, z], axis=0)
            return upload_jobs(jobs, J, L, fc)

        from .dfs_jobs import build_n_jobs_a_vec, derive_rows_enabled
        jobs_a, J_A, gated, jrc, jfw = build_n_jobs_a_vec(
            reads, self.n_mms, self.seed_len, self.qt, self.maxbts,
            self.maq, self.nofw, self.norc, L, fc)
        if derive_rows_enabled() and not int(
                __import__("os").environ.get("BOWTIE_TPU_N2_UNFUSED",
                                             0)):
            return self._align_batch_fused(
                reads, pad(jobs_a, J_A), J_A, gated, jrc, seeds, Bp, L,
                n_k, m_max)
        out_a = run_compacting(
            self.cat, pad(jobs_a, J_A), seeds,
            np.zeros(Bp, np.int32), J=J_A, L=L, nfrag=self.nfrag,
            n_k=n_k, m_max=m_max, max_steps=self.max_steps)

        if derive_rows_enabled():
            jobs_b, J_B = self._jobs_b_vec(reads, out_a, L, fc, gated,
                                           jrc)
        else:
            jobs_b, J_B = self._jobs_b(reads, out_a, L, fc, gated, jrc)
        if jobs_b is not None:
            out_b = run_compacting(
                self.cat, pad(jobs_b, J_B), seeds,
                np.asarray(out_a["count"], np.int32), J=J_B, L=L,
                nfrag=self.nfrag, n_k=n_k, m_max=m_max,
                max_steps=self.max_steps)
        else:
            out_b = None
        return self._assemble_n(reads, out_a, out_b, seeds, gated)

    def _align_batch_fused(self, reads, jobs_a, J_A, gated, jrc,
                           seeds, Bp, L, n_k, m_max):
        """Single-round-trip -n path: launch A, derive the launch-B
        job table ON DEVICE from A's partial pools, launch B, then one
        stacked poll + one fused hit-pack transfer.  Each tunnel sync
        costs ~0.7 s, so the host A->B handoff (poll, partial
        download, job upload) dominated the old flow."""
        import os
        import sys
        import time
        import jax.numpy as jnp
        from .backtrack_oracle import QUAL_ROUNDS
        from .dfs_device import (M_DONE, _pad_pow2, _gather_rows,
                                 run_chunk, _init_state, MM_SLOTS,
                                 H_MAX)
        prof = bool(os.environ.get("BOWTIE_TPU_PROF"))
        t00 = time.time()
        B = len(reads)
        seeds_d = jnp.asarray(seeds)
        st_a = _init_state(Bp, L, seeds_d,
                           jnp.zeros(Bp, jnp.int32))
        st_a, it_a = run_chunk(self.cat, jobs_a, st_a, J=J_A, L=L,
                               nfrag=self.nfrag, n_k=n_k, m_max=m_max,
                               chunk=self.max_steps)
        if prof:
            print(f"[prof n2] launch A: B={Bp} J={J_A} "
                  f"steps={int(np.asarray(it_a))} "
                  f"t={time.time() - t00:.3f}s",
                  file=sys.stderr, flush=True)
            t00 = time.time()
        # A-result transfers: enqueue BEFORE launch B's compute so the
        # DMA overlaps it (the tunnel serializes ops FIFO).  The hits
        # pool is fetched as a POLICY-BOUNDED static slice — a lane
        # buffers at most n_k hits under plain -k (no data-dependent
        # gather round trip needed)
        W = 8 + 2 * MM_SLOTS
        nslots = H_MAX if (n_k == INF32 or m_max != INF32) \
            else min(n_k, H_MAX)
        poll_dev = _poll_one(st_a)
        hits_dev = _hits_slice(st_a, nslots * W)
        for x in (poll_dev, hits_dev):
            try:
                x.copy_to_host_async()
            except Exception:
                pass
        J_B = P_MAX + 4
        if self.n_mms > 0:
            gp = np.ones(Bp, bool)
            gp[:B] = np.asarray(gated, bool)[:B]
            jobs_b = self._derive_b_jit(
                st_a, jnp.asarray(gp), jobs_a["base_codes"],
                jobs_a["base_qual"], jobs_a["base_plen"],
                jnp.asarray(QUAL_ROUNDS.astype(np.int32)), J_B, L,
                int(jrc))
            st_b0 = _init_state(Bp, L, seeds_d, st_a["count"])
            # dispatch B's first chunk; the A transfers above ride
            # ahead of it in the queue and land while it computes
            st_b0, _ = run_chunk(self.cat, jobs_b, st_b0, J=J_B, L=L,
                                 nfrag=self.nfrag, n_k=n_k,
                                 m_max=m_max, chunk=192)
        if prof:
            print(f"[prof n2] derive+B256 dispatch: "
                  f"t={time.time() - t00:.3f}s",
                  file=sys.stderr, flush=True)
            t00 = time.time()
        poll_a = np.asarray(poll_dev)
        ks = ("mode", "result", "overflow", "count", "nhits")

        def unpack(rows):
            o = {k: rows[i][:B].copy() for i, k in enumerate(ks)}
            o["overflow"] = (o["overflow"] | (o["mode"] != M_DONE)) \
                .astype(bool)
            return o
        out_a = unpack(poll_a)
        ha = np.zeros((B, H_MAX, W), np.int32)
        ha[:, :nslots] = np.asarray(hits_dev)[:B].reshape(B, nslots, W)
        out_a["hits"] = ha
        if prof:
            print(f"[prof n2] A poll+pack: t={time.time() - t00:.3f}s",
                  file=sys.stderr, flush=True)
            t00 = time.time()
        if self.n_mms > 0:
            # launch B with straggler compaction (death is bimodal:
            # ~half the lanes finish in <=64 steps, half-and-half
            # searches run to ~640)
            # chunk 0 first: poll+compact the B192 state BEFORE running
            # more full-width steps (half the lanes die in the first
            # couple hundred B steps; per-step cost scales with bucket)
            out_b = run_compacting(
                self.cat, jobs_b, None, None, J=J_B, L=L,
                nfrag=self.nfrag, n_k=n_k, m_max=m_max,
                max_steps=self.max_steps - 192, chunk=(0, 192, 512),
                st0=st_b0, parts=False)
            out_b = {k: (v[:B] if hasattr(v, "shape") else v)
                     for k, v in out_b.items()}
        else:
            out_b = None
        if prof:
            print(f"[prof n2] launch B: t={time.time() - t00:.3f}s",
                  file=sys.stderr, flush=True)
            t00 = time.time()
        res = self._assemble_n(reads, out_a, out_b, seeds, gated)
        if prof:
            print(f"[prof n2] assemble: t={time.time() - t00:.3f}s",
                  file=sys.stderr, flush=True)
        return res

    def _derive_b_jit(self, st_a, gated_d, bc, bq, bp, qr, J_B, L,
                      jrc):
        import jax
        key = (J_B, L, jrc)
        cache = getattr(self, "_derive_b_cache", None)
        if cache is None:
            cache = self._derive_b_cache = {}
        if key not in cache:
            from functools import partial as _p
            cache[key] = jax.jit(_p(
                _derive_b_jobs_device, J=J_B, jrc=jrc,
                n=self.n_mms, s=self.seed_len, qt=self.qt,
                maxbts=self.maxbts, maq=self.maq, norc=self.norc,
                nofw=self.nofw, L=L, fc=self.cat.ftab_chars))
        return cache[key](st_a, gated_d, bc, bq, bp, qr)

    def _assemble_n(self, reads, out_a, out_b, seeds, gated) -> list:
        from .dfs_device import decode_hit_cols
        n = len(reads)
        ova = np.asarray(out_a["overflow"])[:n].copy()
        if out_b is not None:
            ovb = np.asarray(out_b["overflow"])[:n]
        else:
            ovb = np.zeros(n, bool)
        ovf = ova | ovb
        ca = np.asarray(out_a["count"]).tolist()
        ra = np.asarray(out_a["result"]).tolist()
        bounds_a, mk_a = decode_hit_cols(out_a, n, ovf)
        if out_b is not None:
            cb = np.asarray(out_b["count"]).tolist()
            bounds_b, mk_b = decode_hit_cols(out_b, n, ovf)
        seeds_l = np.asarray(seeds).tolist()
        results = []
        finish = self.policy.finish
        for b, read in enumerate(reads):
            if gated[b]:
                results.append(finish([], 0, seeds_l[b]))
                continue
            if ovf[b]:
                self.fallbacks += 1
                results.append(self._oracle_aligner().align_read(read))
                continue
            # merged sink stream: A-hits then B-hits, final count
            hits = [mk_a(read, j) for j in range(bounds_a[b],
                                                 bounds_a[b + 1])]
            count = ca[b]
            if out_b is not None and ra[b] == 0:
                hits += [mk_b(read, j) for j in range(bounds_b[b],
                                                      bounds_b[b + 1])]
                count = cb[b]
            results.append(finish(hits, count, seeds_l[b]))
        return results

