"""Vectorized host-side job-table construction for the device DFS.

Builds the per-(lane, job) query/qual/penalty by-depth rows and N-gates
for a whole batch with numpy array ops instead of per-read Python
(fill_job) — the host must keep up with a device engine that retires
tens of thousands of reads per second.

Coordinate identities used (qd[d] = search-query char at depth d, i.e.
position qlen-1-d of the possibly-reversed/truncated query;
set_query semantics at backtrack_oracle.set_query / fill_job):

  (ebwt_fw=1, fw=1): qd[d] = fw[qs-1-d]          quald[d] = q[qs-1-d]
  (ebwt_fw=1, fw=0): qd[d] = comp(fw[plen-qs+d]) quald[d] = q[plen-qs+d]
  (ebwt_fw=0, fw=1): qd[d] = fw[plen-qs+d]       quald[d] = q[plen-qs+d]
  (ebwt_fw=0, fw=0): qd[d] = comp(fw[qs-1-d])    quald[d] = q[qs-1-d]

(complement applies to the rc-based variants, i.e. fw=0.)

where qs = search qlen (min(plen, seed) for set_qlen jobs).
"""
from __future__ import annotations

import numpy as np

from .dfs_device import JOB_FIELDS, INF32

_QR = np.zeros(256, dtype=np.int8)    # Maq rounding (qual.cpp:4)
_QR[5:15] = 10
_QR[15:25] = 20
_QR[25:] = 30


def read_matrices(reads, L: int):
    """Left-aligned fw-code and qual matrices + lengths."""
    B = len(reads)
    fwm = np.full((B, L), 4, dtype=np.int8)
    qm = np.zeros((B, L), dtype=np.int16)
    lens = np.zeros(B, dtype=np.int32)
    for b, r in enumerate(reads):
        n = len(r.seq)
        lens[b] = n
        fwm[b, :n] = r.codes_fw[:L]
        qm[b, :n] = np.frombuffer(r.qual, dtype=np.uint8)[:L]
    return fwm, qm - 33, lens


def empty_jobs_vec(B: int, J: int, L: int, rows: bool = False):
    """Scalar job table; with rows=True also the by-depth row arrays
    (the device derives rows itself from base read arrays otherwise —
    see _step_job's derive path)."""
    jobs = {f: np.zeros((B, J), dtype=np.int32) for f in JOB_FIELDS}
    if rows:
        jobs["qd"] = np.full((B, J, L), 4, dtype=np.int8)
        jobs["quald"] = np.zeros((B, J, L), dtype=np.int8)
        jobs["pend"] = np.zeros((B, J, L), dtype=np.int8)
    return jobs


def attach_base(jobs, fwm, qm, lens):
    """Base read arrays for device-side row derivation."""
    jobs["base_codes"] = fwm
    jobs["base_qual"] = np.clip(qm, 0, 127).astype(np.int8)
    jobs["base_plen"] = lens
    return jobs


def fill_job_vec(jobs, j, fwm, qm, lens, qs, *, fw, ebwt_fw, offs,
                 valid=None, report_exacts=True, report_partials=0,
                 half_and_half=False, max_bts=INF32,
                 consider_quals=False, qual_thresh=INF32,
                 reset_rng=True, maq=True, fc=10):
    """Fill job column j for every lane at once.

    offs: 6-tuple of per-lane int arrays (or scalars) —
    (d5, d3, unrev, rev1, rev2, rev3).  qs: per-lane search qlen."""
    B, L = fwm.shape
    d = np.arange(L, dtype=np.int32)[None, :]
    qs = np.broadcast_to(np.asarray(qs, np.int32), (B,))
    plen = lens
    in_q = d < qs[:, None]
    with_rows = "qd" in jobs
    if not with_rows:
        d5, d3, unrev, rev1, rev2, rev3 = [
            np.broadcast_to(np.asarray(o, np.int32), (B,)) for o in offs]
        gate = np.zeros(B, np.int32)          # device computes gates
        ns_ftab = np.zeros(B, np.int32)
    else:
        if (ebwt_fw and fw) or (not ebwt_fw and not fw):
            take = qs[:, None] - 1 - d
        else:
            take = plen[:, None] - qs[:, None] + d
        take = np.clip(take, 0, L - 1)
        qd = np.take_along_axis(fwm, take, axis=1)
        if not fw:             # rc-based variants read the complement
            qd = np.where(qd < 4, 3 - qd, 4).astype(np.int8)
        qd = np.where(in_q, qd, 4).astype(np.int8)
        quald = np.take_along_axis(qm, take, axis=1)
        quald = np.where(in_q, quald, 0)
        jobs["qd"][:, j, :] = qd
        jobs["quald"][:, j, :] = np.clip(quald, 0, 127).astype(np.int8)
        jobs["pend"][:, j, :] = _QR[np.clip(quald, 0, 255)] if maq \
            else np.clip(quald, 0, 127).astype(np.int8)

        d5, d3, unrev, rev1, rev2, rev3 = [
            np.broadcast_to(np.asarray(o, np.int32), (B,)) for o in offs]
        # N tally gate (_tally_ns, backtrack_oracle.py:163-184)
        region = in_q & (d < rev3[:, None])
        isn = (qd == 4) & region
        nscum = np.cumsum(isn, axis=1)
        total = nscum[:, -1]

        def kth_pos(k):
            at = isn & (nscum == k)
            has = at.any(axis=1)
            pos = np.argmax(at, axis=1)
            return has, pos

        h1, p1 = kth_pos(1)
        h2, p2 = kth_pos(2)
        h3, p3 = kth_pos(3)
        gate = ((h1 & (p1 < unrev)) | (h2 & (p2 < rev1)) |
                (h3 & (p3 < rev2)) | (total > 3))
        ns_ftab = ((qd[:, :fc] == 4) & in_q[:, :fc]).sum(axis=1)

    jobs["valid"][:, j] = 1 if valid is None else valid.astype(np.int32)
    jobs["qlen"][:, j] = qs
    jobs["ebwt_fw"][:, j] = int(ebwt_fw)
    jobs["fw"][:, j] = int(fw)
    jobs["d5"][:, j] = d5
    jobs["d3"][:, j] = d3
    jobs["unrev"][:, j] = unrev
    jobs["rev1"][:, j] = rev1
    jobs["rev2"][:, j] = rev2
    jobs["rev3"][:, j] = rev3
    jobs["report_exacts"][:, j] = int(report_exacts)
    jobs["report_partials"][:, j] = report_partials
    jobs["half_and_half"][:, j] = int(half_and_half)
    jobs["max_bts"][:, j] = max_bts
    jobs["consider_quals"][:, j] = int(consider_quals)
    jobs["qual_thresh"][:, j] = qual_thresh
    jobs["reset_rng"][:, j] = int(reset_rng)
    jobs["maq_round"][:, j] = int(maq)
    jobs["ns_gate"][:, j] = gate.astype(np.int32)
    jobs["ns_ftab"][:, j] = ns_ftab.astype(np.int32)
    jobs["collect_partials"][:, j] = int(report_partials > 0)


def derive_rows_enabled() -> bool:
    """Device-side row derivation: removes the per-batch [B, J, L]
    uploads and job-row gathers (+~50% -v throughput on TPU).  Default
    on accelerators; off on CPU where the extra kernel mainly costs
    compile time.  Override with BOWTIE_TPU_DERIVE_ROWS=0/1."""
    import os
    v = os.environ.get("BOWTIE_TPU_DERIVE_ROWS")
    if v is not None:
        return v not in ("", "0")
    import jax
    return jax.default_backend() != "cpu"


def build_v_jobs_vec(reads, v: int, nofw: bool, norc: bool, L: int,
                     fc: int, rows: bool | None = None):
    """Vectorized job tables for -v 1/2/3 (see build_v_jobs for the
    phase structure source mapping)."""
    B = len(reads)
    fwm, qm, lens = read_matrices(reads, L)
    s = lens
    s3 = s >> 1
    s5 = s3 + (s & 1)
    if v == 1:
        seq = []
        if not nofw:
            seq.append(dict(fw=True, ebwt_fw=True, offs=(0, 0, s, s, s, s)))
        if not norc:
            seq.append(dict(fw=False, ebwt_fw=True,
                            offs=(0, 0, s, s, s, s)))
        if not norc:
            seq.append(dict(fw=False, ebwt_fw=True,
                            offs=(0, 0, s5, s, s, s), report_exacts=False))
        if not nofw:
            seq.append(dict(fw=True, ebwt_fw=True,
                            offs=(0, 0, s5, s, s, s), report_exacts=False))
        if not norc:
            seq.append(dict(fw=False, ebwt_fw=False,
                            offs=(0, 0, s3, s, s, s), report_exacts=False))
        if not nofw:
            seq.append(dict(fw=True, ebwt_fw=False,
                            offs=(0, 0, s3, s, s, s), report_exacts=False))
    else:
        two = v == 2
        m2 = s if two else s5
        m3 = s if two else s3
        z = np.zeros_like(s)
        seq = []
        if not nofw:
            seq.append(dict(fw=True, ebwt_fw=True, offs=(0, 0, s, s, s, s)))
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
                            offs=(s3, s, z, s3 if two else z,
                                  s if two else s3, s)))
        if not norc:
            seq.append(dict(fw=False, ebwt_fw=True, half_and_half=True,
                            offs=(s5, s, z, s5 if two else z,
                                  s if two else s5, s)))
    J = len(seq)
    if rows is None:
        rows = not derive_rows_enabled()
    jobs = empty_jobs_vec(B, J, L, rows=rows)
    for j, spec in enumerate(seq):
        fill_job_vec(jobs, j, fwm, qm, lens, lens, fc=fc, **spec)
    if not rows:
        attach_base(jobs, fwm, qm, lens)
    return jobs, J


def build_n_jobs_a_vec(reads, n: int, s_seed: int, qt: int, mb: int,
                       maq: bool, nofw: bool, norc: bool, L: int,
                       fc: int):
    """Vectorized launch-A job tables for -n mode (phases 1, 2 and the
    phase-3 tail; see DeviceNAligner._jobs_a for the source mapping).
    Returns (jobs, J, gated, j_pam_rc, j_pam_fw)."""
    B = len(reads)
    fwm, qm, lens = read_matrices(reads, L)
    plen = lens
    qs = np.minimum(plen, s_seed)
    eff = np.minimum(qs, s_seed)           # seed length actually used
    e5 = (eff >> 1) + (eff & 1)
    e3 = eff >> 1
    z = np.zeros_like(plen)

    def so(v, thr):                        # seed-offs helper
        return np.where(np.full(B, n) > thr, v, eff).astype(np.int32)

    offs15 = (z, z, so(e5, 0), so(e5, 1), so(e5, 2), so(e5, 3))
    offs3 = (z, z, so(e3, 0), so(e3, 1), so(e3, 2), so(e3, 3))

    # phase-1 gates
    slen = np.minimum(plen, s_seed)
    nsin = np.zeros(B, np.int32)
    for b, r in enumerate(reads):          # tiny loop; could vectorize
        nsin[b] = int((np.asarray(r.codes_fw[:slen[b]]) == 4).sum())
    gated = (plen < 4) | (nsin > n)
    ok = ~gated

    specs = []
    kw = dict(consider_quals=True, qual_thresh=qt, max_bts=mb, maq=maq,
              fc=fc)
    if not nofw:    # btf1: exact fw, quals off
        specs.append(("p1fw", dict(fw=True, ebwt_fw=True,
                                   offs=(z, plen, plen, plen, plen, plen),
                                   consider_quals=False, qual_thresh=qt,
                                   max_bts=mb, maq=maq, fc=fc)))
    if not norc:    # bt1
        specs.append(("p1rc", dict(fw=False, ebwt_fw=True, offs=offs15,
                                   **kw)))
    if not nofw:    # btf2
        specs.append(("p2fw", dict(fw=True, ebwt_fw=False, offs=offs15,
                                   report_exacts=False, **kw)))
    j_pam_rc = j_pam_fw = -1
    if n > 0:
        if not norc:    # btr2: rc partial collection
            j_pam_rc = len(specs)
            specs.append(("p2rc", dict(fw=False, ebwt_fw=False,
                                       offs=offs3, report_exacts=False,
                                       report_partials=n, **kw)))
        if not nofw:    # btf3: fw partial collection
            j_pam_fw = len(specs)
            specs.append(("p3fw", dict(fw=True, ebwt_fw=True,
                                       offs=offs3, report_partials=n,
                                       **kw)))
    J = len(specs)
    rows = not derive_rows_enabled()
    jobs = empty_jobs_vec(B, J, L, rows=rows)
    for j, (name, spec) in enumerate(specs):
        is_partial = spec.get("report_partials", 0) > 0
        qlen_j = qs if is_partial else plen
        fill_job_vec(jobs, j, fwm, qm, lens, qlen_j, valid=ok, **spec)
    if not rows:
        attach_base(jobs, fwm, qm, lens)
    return jobs, J, gated, j_pam_rc, j_pam_fw
