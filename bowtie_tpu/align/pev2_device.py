"""Device-recorded PairedBWAlignerV2 (--best PE / --pev2).

The V2 engine (aligner.h:1483-1998) runs ONE cost-merged CostAware
driver over all (mate, strand) source groups; every found range is
chased and each resolved anchor row immediately mate-rescued in
reference space.  The merged driver IS the best-first machine's outer
CostAware — so the device path records the merged stream directly:

1. RECORD (device): one lane per pair runs the lockstep best-first
   machine in record mode over a MERGED driver DAG (mate1's groups +
   mate2's groups, range_source.h:2084): per-outer qlen/seed tables
   serve each driver its own mate's read, the strandFix scan matches
   mates (range_source.h:2322-2327), and CostAware mate elimination
   (range_source.h:2233) terminates the stream exactly where the host
   driver dies.  Each record also carries the driver's min_cost at the
   host's last pruning check before the emission (aligner.h:1638-1681)
   — minCost is nondecreasing, so that single value decides the V2
   replay's pruning exactly.
2. REPLAY (host): the V2 control loop (PairedBestAlignerV2.align_pair)
   re-expressed over the recorded stream: pruning via the recorded
   pre-advance min-cost, then the chase + resolveOutstandingInRef tail
   unchanged — byte-identical output.

Pairs whose stream overflows the pool, outruns a rec_cap-truncated
recording, or uses --reportse (whose removeMate feedback changes the
driver's RNG sequence mid-run) fall back to the host V2 aligner.
"""
from __future__ import annotations

import numpy as np

from .best import FoundRange
from .best_device import (
    H_MAX, HostInit, INF32, M_DONE, MM_SLOTS, PEX, _bucket,
    _host_sort_actives, _init_state_jit, _len_bucket, build_fmcat,
    run_compacting, seeded_mode_configs, v_mode_configs,
)
from .best_factories import _pe_do_matrix
from .policy import KPolicy

REC_W = 8 + 2 * MM_SLOTS
MIN_SLOT = 8 + MM_SLOTS - 1     # ed pad slot carrying pre-advance min

# per-flat-driver / per-outer / per-branch-slot host-state keys to
# splice by mate when merging the two builds (see build_paired)
_NDT_KEYS = ("dqlen", "dd5", "dd3", "rows_qp", "drv_adj", "drv_done",
             "drv_found", "drv_min", "drv_nextid", "rr")
_ND_KEYS = ("od_done", "od_found", "od_min")
_P_KEYS = ("p_valid", "p_drv", "p_cost", "p_ham", "p_rdepth", "p_len",
           "p_top", "p_bot", "p_curt", "p_dly", "p_dlyf", "p_id",
           "p_ne", "p_d0", "p_d1", "p_d2", "p_d3")


class PairedV2Machine:
    """The merged-DAG record machine for one configuration."""

    def __init__(self, cat, idx_fw, idx_bw, mode, v, seed_mms,
                 seed_len, qual_cutoff, maq, qual_order, maxbts,
                 max_steps, nofw, norc, fw1, fw2, order=None):
        import jax.numpy as jnp
        self.cat = cat
        if order is None:
            # drVec construction order (aligner_0mm.h:323-339 for -v;
            # aligner_seed_mm.h:700-703 for -n: all four vectors alias
            # dr1FwVec)
            order = ([(True, True), (True, False), (False, True),
                      (False, False)] if mode != "n" else
                     [(True, True), (False, True), (True, False),
                      (False, False)])
        do = _pe_do_matrix(nofw, norc, fw1, fw2)
        outers = []
        self.o_mate1: list[bool] = []
        for mate1, fw in order:
            if not do[(mate1, fw)]:
                continue
            if mode == "n":
                grp = seeded_mode_configs(seed_mms, not fw, fw)
            else:
                grp = v_mode_configs(v, not fw, fw)
            outers.extend(grp)
            self.o_mate1 += [mate1] * len(grp)
        if mode == "n":
            self.qual_lim = qual_cutoff
            self.bt_on = seed_mms >= 2
            sl = seed_len
        else:
            self.qual_lim = INF32
            self.bt_on = False
            sl = 0
        self.has_seeded = mode == "n"
        self.hostinit = HostInit(outers, idx_fw, idx_bw, maq,
                                 qual_order, self.qual_lim, sl)
        # per-outer mate flags for the strandFix scan + elimination
        self.hostinit.cfg["o_m1"] = np.array(
            [int(m1) for m1 in self.o_mate1], np.int32)
        # per-flat-driver mate flags (splice + rng_rs seeding)
        flat_m1 = []
        for oc, m1 in zip(outers, self.o_mate1):
            n = 1 if oc.kind == "plain" else 1 + PEX
            flat_m1 += [m1] * n
        self.flat_m1 = np.array(flat_m1, bool)
        self.out_m1 = np.array(self.o_mate1, bool)
        # slot -> flat-driver map (HostInit.build's slot_cursor order)
        self.slot_flat = [f for f, c in enumerate(self.hostinit.flat)
                          if not self.hostinit.cfg["is_ext"][f]]
        self.cfgj = {k: jnp.asarray(v)
                     for k, v in self.hostinit.cfg.items()}
        self.qual_order = qual_order
        self.maxbts = maxbts
        self.max_steps = max_steps
        self.nfrag = int(idx_fw.nfrag)

    def build_paired(self, reads1, reads2, L, seeds1, seeds2):
        """HostInit.build for the merged DAG: build once per mate with
        the SAME merged outer list, then splice every per-driver-axis
        table by its driver's mate; re-run the initial sortActives on
        the merged outer states with mate1's seed (the paired
        CostAware RNG, range_source.h:2084)."""
        hi = self.hostinit
        h1 = hi.build(reads1, L, seeds1)
        h2 = hi.build(reads2, L, seeds1)
        B = len(reads1)
        nd, ndt = hi.nd, hi.ndt
        host = dict(h1)
        fm1 = self.flat_m1
        om1 = self.out_m1
        for k in _NDT_KEYS:
            sel = fm1.reshape((1, ndt) + (1,) * (h1[k].ndim - 2))
            host[k] = np.where(sel, h1[k], h2[k])
        for k in _ND_KEYS:
            host[k] = np.where(om1[None, :], h1[k], h2[k])
        nbr = h1["p_valid"].shape[1]
        slot_m1 = np.ones(nbr, bool)
        for s, f in enumerate(self.slot_flat):
            slot_m1[s] = fm1[f]
        for k in _P_KEYS:
            host[k] = np.where(slot_m1[None, :], h1[k], h2[k])
        # merged initial sortActives (seeded from mate1)
        act = np.tile(np.arange(nd, dtype=np.int32), (B, 1))
        act_n = np.full(B, nd, np.int32)
        act, act_n, rng_ca, ca_min = _host_sort_actives(
            act, act_n, host["od_done"], host["od_found"],
            host["od_min"], seeds1.astype(np.uint32).copy(),
            np.zeros(B, np.int32))
        host.update(act=act, act_n=act_n, rng_ca=rng_ca, ca_min=ca_min)
        # per-outer read length + per-driver RNG seeds by mate
        q1 = h1["qlen"].astype(np.int32)
        q2 = h2["qlen"].astype(np.int32)
        host["qlen_o"] = np.where(om1[None, :], q1[:, None],
                                  q2[:, None])
        host["seed_o"] = np.where(om1[None, :], seeds1[:, None],
                                  seeds2[:, None]).astype(np.uint32)
        host["rng_rs"] = np.where(fm1[None, :], seeds1[:, None],
                                  seeds2[:, None]).astype(np.uint32)
        return host

    def record(self, pairs, seeds1, seeds2, rec_cap=None):
        """Record the merged stream for every pair.  Returns
        (streams, overflow): streams[i] = np [n, REC_W] rows (None for
        overflowed / out-of-bounds lanes)."""
        import jax.numpy as jnp
        B = len(pairs)
        host_only = [b for b, (r1, r2) in enumerate(pairs)
                     if max(len(r1.seq), len(r2.seq)) > 255
                     or min(len(r1.seq), len(r2.seq)) < 4]
        Bp = _bucket(B)
        L = _len_bucket(max(max(len(r1.seq), len(r2.seq))
                            for r1, r2 in pairs))
        host = self.build_paired([p[0] for p in pairs],
                                 [p[1] for p in pairs], L,
                                 seeds1, seeds2)
        if Bp > B:
            for k, v_ in host.items():
                pad = np.zeros((Bp - B,) + v_.shape[1:], dtype=v_.dtype)
                host[k] = np.concatenate([v_, pad], axis=0)
        seeds_p = np.zeros(Bp, np.uint32)
        seeds_p[:B] = seeds1
        st = _init_state_jit(seeds_p, host, B=Bp, L=L,
                             nd=self.hostinit.nd,
                             ndt=self.hostinit.ndt,
                             maxbts=self.maxbts)
        dis = np.zeros(Bp, bool)
        dis[B:] = True
        for b in host_only:
            dis[b] = True
        if dis.any():
            st["mode"] = jnp.where(jnp.asarray(dis), M_DONE,
                                   st["mode"])
        out = run_compacting(
            self.cat, self.cfgj, st, L=L, nd=self.hostinit.nd,
            ndt=self.hostinit.ndt, nfrag=self.nfrag, n_k=INF32,
            m_max=INF32, strata=False, qual_lim=self.qual_lim,
            qual_order=self.qual_order, bt_on=self.bt_on,
            fc=self.cat.ftab_chars, has_seeded=self.has_seeded,
            max_steps=self.max_steps, record=True, rec_cap=rec_cap,
            paired=True)
        overflow = np.asarray(out["overflow"])[:B].copy()
        for b in host_only:
            overflow[b] = True
        hits = np.asarray(out["hits"][:B])
        nh = np.asarray(out["nhits"][:B])
        streams = [None if overflow[b] else hits[b, :int(nh[b])]
                   for b in range(B)]
        return streams, overflow


class DevicePairedV2Aligner:
    """Drop-in replacement for make_paired_best_aligner_v2's product:
    align_batch(pairs) with a device-recorded merged stream and a host
    replay of the V2 control loop."""

    def __init__(self, idx_fw, idx_bw, refs, policy: KPolicy,
                 mode: str = "n", v: int = 0, seed_mms: int = 2,
                 seed_len: int = 28, qual_cutoff: int = 70,
                 fw1: bool = True, fw2: bool = False,
                 min_insert: int = 0, max_insert: int = 250,
                 pairtries: int = 100, nofw: bool = False,
                 norc: bool = False, maq: bool = True,
                 better: bool = False, report_se: bool = False,
                 best_sink: bool = True, global_seed: int = 0,
                 maxbts: int = 800, max_steps: int = 60000,
                 compact: bool | None = None):
        import os
        from .best_factories import make_paired_best_aligner_v2
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
        self.cat = build_fmcat(idx_fw, idx_bw, occ_every=128,
                               dense_sa=not compact)
        self.machine = PairedV2Machine(
            self.cat, idx_fw, idx_bw, mode, v, seed_mms, seed_len,
            qual_cutoff, maq, not better, maxbts, max_steps,
            nofw, norc, fw1, fw2)
        self.global_seed = global_seed
        self.report_se = report_se
        self._host = make_paired_best_aligner_v2(
            GoldenFM(idx_fw), GoldenFM(idx_bw), refs, policy,
            mode=mode, v=v, seed_mms=seed_mms, seed_len=seed_len,
            qual_cutoff=qual_cutoff, fw1=fw1, fw2=fw2,
            min_insert=min_insert, max_insert=max_insert,
            pairtries=pairtries, nofw=nofw, norc=norc, maq=maq,
            better=better, report_se=report_se, best_sink=best_sink,
            global_seed=global_seed, maxbts=maxbts)
        self.fallbacks = 0
        self.escalations = 0
        # --reportse's removeMate feedback mutates the live driver's
        # RNG sequence mid-run: the recorded no-feedback stream can't
        # reproduce it, so those runs replay on the host engine
        self.use_device = not report_se
        # stream cap: the -k 1 replay usually consumes few ranges;
        # pairs that outrun a truncated stream re-record uncapped
        self.rec_cap = 8 if not policy.want_all_rows() else None

    def align_batch(self, pairs):
        if not pairs:
            return []
        if not self.use_device:
            return [self.align_pair_host(a, b) for a, b in pairs]
        from ..utils.rng import fill_seed_caches
        s1 = fill_seed_caches([p[0] for p in pairs], self.global_seed)
        s2 = fill_seed_caches([p[1] for p in pairs], self.global_seed)
        results = [None] * len(pairs)
        idxs = list(range(len(pairs)))
        streams, _ov = self.machine.record(
            [pairs[i] for i in idxs], s1, s2, rec_cap=self.rec_cap)
        escal = []
        for k, i in enumerate(idxs):
            if streams[k] is None:
                self.fallbacks += 1
                results[i] = self.align_pair_host(*pairs[i])
            else:
                res = self._replay(*pairs[i], streams[k],
                                   capped=self.rec_cap is not None)
                if res is None:
                    escal.append(i)
                else:
                    results[i] = res
        if escal:
            self.escalations += len(escal)
            streams, _ov = self.machine.record(
                [pairs[i] for i in escal],
                s1[np.asarray(escal, np.int64)],
                s2[np.asarray(escal, np.int64)], rec_cap=None)
            for k, i in enumerate(escal):
                if streams[k] is None:
                    self.fallbacks += 1
                    results[i] = self.align_pair_host(*pairs[i])
                else:
                    res = self._replay(*pairs[i], streams[k],
                                       capped=False)
                    assert res is not None
                    results[i] = res
        return results

    def align_pair_host(self, rd1, rd2):
        return self._host.align_pair(rd1, rd2)

    def _materialize(self, rec, qlen_of):
        drv = int(rec[0])
        cfg = self.machine.hostinit.cfg
        mate1 = bool(self.machine.o_mate1[drv])
        qlen = qlen_of(mate1)
        ne = int(rec[5])
        mms = [qlen - int(rec[8 + k]) - 1 for k in range(ne)]
        refcs = [int(rec[8 + MM_SLOTS + k]) for k in range(ne)]
        return FoundRange(top=int(rec[1]), bot=int(rec[2]),
                          cost=int(rec[3]), stratum=int(rec[4]),
                          num_mms=ne, fw=bool(cfg["o_fw"][drv]),
                          ebwt_fw=bool(cfg["o_chase_efw"][drv]),
                          mms=mms, refcs=refcs, mate1=mate1)

    def _replay(self, rd1, rd2, rows, capped):
        """The V2 control loop (best_paired.PairedBestAlignerV2
        .align_pair) over the recorded stream.  Returns the pair's
        ReadResult, or None when the replay outran a truncated stream
        (caller re-records uncapped)."""
        from ..utils.rng import BtRandom
        host = self._host
        host.sink.reset(rd1, rd2)
        host.se1 = host.se2 = None
        if len(rd1.seq) < 4 or len(rd2.seq) < 4:
            return host._finish()
        host.rd1, host.rd2 = rd1, rd2
        host.rand = BtRandom(int(rd1.seed(self.global_seed)))
        host.donePe = host.doneSe1 = host.doneSe2 = False
        host.mixed_attempts = 0
        host.pairs_fw = set()
        host.pairs_rc = set()
        host.done = False
        host.driver = None

        def qlen_of(mate1):
            return len(rd1.seq) if mate1 else len(rd2.seq)

        n = len(rows)
        truncated = capped and n > 0 and int(rows[-1][6]) == 2
        for t in range(n):
            rec = rows[t]
            if t > 0:
                # minCost pruning between advances (aligner.h:1638-
                # 1681): minCost is nondecreasing, so the recorded
                # LAST pre-advance value decides every intermediate
                # check at once; with no SE holds, donePe breaks
                # unconditionally
                host.donePe = host.sink.irrelevant_cost(
                    int(rec[MIN_SLOT]))
                if host.donePe:
                    return host._finish()
            fr = self._materialize(rec, qlen_of)
            host._chase(fr)
            if host.done:
                return host._finish()
            if int(rec[6]) == 1:          # driver done at emission
                return host._finish()
        if truncated:
            return None                   # outran the capped stream
        return host._finish()


def dryrun_pev2(n_lanes_per_dev: int = 2, mesh=None) -> int:
    """Compile + run one tiny sharded merged-DAG record batch over the
    mesh (the --best PE recorder); used by the driver's multi-chip dry
    run."""
    import jax
    import jax.numpy as jnp
    from ..index.ebwt_io import read_ebwt
    from ..io.readers import ReadSource
    from ..parallel.dfs_mesh import make_dp_mesh, replicate_cat
    from ..utils.rng import fill_seed_caches
    from .best_device import (_init_state, run_chunk,
                              shard_best_state)

    mesh = mesh or make_dp_mesh()
    ndev = mesh.devices.size
    B = n_lanes_per_dev * ndev
    idx = read_ebwt("/root/reference/indexes/e_coli")
    idx_bw = read_ebwt("/root/reference/indexes/e_coli.rev")
    cat = build_fmcat(idx, idx_bw, occ_every=1, dense_sa=True)
    m = PairedV2Machine(cat, idx, idx_bw, "n", 0, 2, 28, 70, True,
                        True, 800, 60000, False, False, True, False)
    r1 = list(ReadSource(["/root/reference/reads/e_coli_1000_1.fq"],
                         "fastq", upto=B).records())
    r2 = list(ReadSource(["/root/reference/reads/e_coli_1000_2.fq"],
                         "fastq", upto=B).records())
    while len(r1) < B:
        r1.append(r1[len(r1) % 1000])
        r2.append(r2[len(r2) % 1000])
    pairs = list(zip(r1[:B], r2[:B]))
    s1 = fill_seed_caches([p[0] for p in pairs], 0)
    s2 = fill_seed_caches([p[1] for p in pairs], 0)
    L = _len_bucket(max(max(len(a.seq), len(b.seq)) for a, b in pairs))
    host = m.build_paired([p[0] for p in pairs],
                          [p[1] for p in pairs], L, s1, s2)
    st = _init_state(B, L, m.hostinit.nd, m.hostinit.ndt, s1, host,
                     m.maxbts)
    catr = replicate_cat(cat, mesh)
    cfgj = {k: jax.device_put(np.asarray(v), jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec())) for k, v in m.cfgj.items()}
    st = shard_best_state(st, mesh)
    kw = dict(nd=m.hostinit.nd, ndt=m.hostinit.ndt, L=L, nfrag=m.nfrag,
              n_k=INF32, m_max=INF32, strata=False,
              qual_lim=m.qual_lim, qual_order=True, bt_on=m.bt_on,
              fc=cat.ftab_chars, has_seeded=True, record=True,
              paired=True)
    for _ in range(60):
        st, mode = run_chunk(catr, cfgj, st, chunk=256, **kw)
        if int(jnp.sum((mode != M_DONE).astype(jnp.int32))) == 0:
            break
    nranges = int(jnp.sum(st["nhits"]))
    assert nranges > 0, "no V2 lane recorded a range"
    return nranges
