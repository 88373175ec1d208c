"""Benchmark: reads/s of bowtie-tpu's engines on the real TPU.

Prints ONE JSON line per mode, then a final summary line whose
metric/value is the flagship exact-path number and whose "modes" field
carries every mode's reads/s and baseline ratio.  Baseline: bowtie's
published ~7,000 reads/s (>25M 35-bp reads/hour on a 2009 workstation,
MANUAL.markdown:11-14; see BASELINE.md).

Methodology: the exact kernel is timed over distinct pre-staged device
batches with a forced 4-byte data-dependent readback per iteration
(the remote runtime's block_until_ready is unreliable and bulk
transfers over its tunnel are slow).  The end-to-end modes ( -v 1,
-n 2, --best) time `align_batch` calls, which include job building,
device search, result download and per-read result assembly — the
whole user-visible path minus file I/O.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

BASELINE_READS_PER_SEC = 7000.0
_HERE = os.path.dirname(os.path.abspath(__file__))
ORACLE = os.path.join(_HERE, ".oracle", "bowtie-align-s")


def _emit(metric, reads_per_sec, extra=None, oracle=None):
    rec = {
        "metric": metric,
        "value": round(reads_per_sec, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_sec / BASELINE_READS_PER_SEC, 2),
    }
    if oracle:
        rec["oracle_reads_per_sec"] = round(oracle, 1)
        rec["vs_oracle"] = round(reads_per_sec / oracle, 2)
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)
    return rec


def _replicate_fastq(src_paths, n, out_paths):
    """Write n reads per file by cycling src with uniquified names."""
    for sp, op in zip(src_paths, out_paths):
        recs = open(sp, "rb").read().strip().split(b"\n")
        recs = [recs[i:i + 4] for i in range(0, len(recs), 4)]
        with open(op, "wb") as f:
            k = 0
            while k < n:
                r = recs[k % len(recs)]
                f.write(b"@r%d\n" % k + b"\n".join(r[1:]) + b"\n")
                k += 1


def bench_oracle(cfg, idx, n=16384, paired=False,
                 src1="/root/reference/reads/e_coli_1000_1.fq",
                 src2="/root/reference/reads/e_coli_1000_2.fq",
                 srcu="/root/reference/reads/e_coli_1000.fq",
                 reads_files=None):
    """Time the actual bowtie 1.3.1 binary (one core of THIS host) on
    the same index + read set, so every mode row carries the real
    competitor's number, not just the 2009 published baseline
    (round-3 verdict: the 7k figure understates a modern core 5-25x).
    Subtracts startup+index-load time via a 4-read calibration run."""
    if not os.path.exists(ORACLE):
        return None
    with tempfile.TemporaryDirectory() as td:
        if reads_files is None:
            if paired:
                reads_files = [td + "/r1.fq", td + "/r2.fq"]
                _replicate_fastq([src1, src2], n, reads_files)
            else:
                reads_files = [td + "/r.fq"]
                _replicate_fastq([srcu], n, reads_files)
        tiny = [td + "/t%d.fq" % i for i in range(len(reads_files))]
        _replicate_fastq(reads_files, 4, tiny)

        def run(files):
            args = [ORACLE, "--wrapper", "basic-0"] + cfg
            if paired:
                args += [idx, "-1", files[0], "-2", files[1]]
            else:
                args += [idx, files[0]]
            args += [os.path.join(td, "out")]
            t0 = time.time()
            r = subprocess.run(args, capture_output=True)
            if r.returncode != 0:
                raise RuntimeError(r.stderr.decode()[:200])
            return time.time() - t0
        t_load = min(run(tiny) for _ in range(2))
        dt = run(reads_files) - t_load
        return n / max(dt, 1e-9)


def bench_exact(idx, reads):
    import jax
    import jax.numpy as jnp
    from bowtie_tpu.index.arrays import from_ebwt
    from bowtie_tpu.align.exact import right_align
    from bowtie_tpu.parallel.mesh import sharded_align_step
    from bowtie_tpu.utils.alphabet import revcomp_codes

    fm = from_ebwt(idx, occ_every=1, dense_sa=True)
    base = [r.codes_fw for r in reads]
    B = 524288
    ITERS = 10
    batches = []
    for it in range(ITERS + 1):
        codes = [base[(i + it * 37) % len(base)] if (i + it) % 2 == 0
                 else revcomp_codes(base[(i + it * 41) % len(base)])
                 for i in range(B)]
        mat, lens = right_align(codes, pad_to=36)
        batches.append((jnp.asarray(mat), jnp.asarray(lens)))

    @jax.jit
    def bench_step(fm, reads_d, lens):
        t, b, o, k = sharded_align_step(fm, reads_d, lens)
        return (jnp.sum(k.astype(jnp.int32)) + jnp.sum(o % 7) +
                jnp.sum(b - t))

    found = int(bench_step(fm, *batches[0]))     # warm-up / compile
    t0 = time.time()
    for it in range(1, ITERS + 1):
        found += int(bench_step(fm, *batches[it]))
    dt = time.time() - t0
    return (B * ITERS / 2) / dt


def _replicate(reads, n):
    """n distinct-name copies so batches are large but realistic."""
    from bowtie_tpu.io.readers import ReadRecord
    out = []
    k = 0
    while len(out) < n:
        for r in reads:
            out.append(ReadRecord(name=r.name + b"/%d" % (k // 1000),
                                  seq=r.seq, qual=r.qual, rdid=k))
            k += 1
            if len(out) >= n:
                break
    return out


def bench_aligner(make, reads, total, batch):
    """Time align_batch end-to-end (incl. assembly), two batches in
    flight like the CLI's pipelined writer loop: batch k+1's device
    work overlaps batch k's host-side assembly."""
    from concurrent.futures import ThreadPoolExecutor
    al = make()
    big = _replicate(reads, total + batch)
    al.align_batch(big[total:total + batch])     # warm-up / compile
    batches = [big[i:i + batch] for i in range(0, total, batch)]
    t0 = time.time()
    n = 0
    with ThreadPoolExecutor(2) as ex:
        for res in ex.map(al.align_batch, batches):
            n += len(res)
    dt = time.time() - t0
    assert n == total
    fb = getattr(al, "fallbacks", 0)
    return total / dt, fb


def bench_hg(base="/root/hg_synth/hg_synth", B=262144,
             ITERS=4, v1_n=16384, n2_n=8192):
    """hg-scale benchmark: exact search + walk-left resolve against a
    ~3 Gbp synthetic genome index in the compact device layout
    (occ checkpoints every 128 rows + packed 2-bit BWT + 2^offRate SA
    sample; ~1.5 GB HBM) — the BASELINE.json hg-scale metric."""
    import os
    import jax
    import jax.numpy as jnp
    from bowtie_tpu.index.ebwt_io import read_ebwt
    from bowtie_tpu.index.arrays import from_ebwt
    from bowtie_tpu.align.exact import right_align
    from bowtie_tpu.parallel.mesh import sharded_align_step

    # a bench run during the multi-hour build must not read
    # half-written files: read_ebwt raises EOFError on a truncated
    # index, which maps to an explicit SKIPPED record
    try:
        idx = read_ebwt(base)
    except (FileNotFoundError, EOFError) as e:
        print(json.dumps({
            "metric": "hg-scale modes",
            "hg": f"SKIPPED — index not (fully) built ({e})"[:160],
            "hint": "python scripts/make_hg_synth.py /root/hg_synth",
        }), flush=True)
        return None
    fm = from_ebwt(idx, occ_every=128, dense_sa=False)
    # reads sampled from the genome itself (N-free 35-mers)
    rng = np.random.default_rng(7)
    from bowtie_tpu.index.ebwt_io import (read_bitpair_reference,
                                          unpack_reference)
    recs, packed = read_bitpair_reference(base)
    refs = unpack_reference(recs, packed)
    big = max(refs, key=len)
    batches = []
    for it in range(ITERS + 1):
        pos = rng.integers(0, len(big) - 36, B)
        codes = [np.where(big[p:p + 35] > 3, 0,
                          big[p:p + 35]).astype(np.uint8)
                 for p in pos]
        mat, lens = right_align(codes, pad_to=36)
        batches.append((jnp.asarray(mat), jnp.asarray(lens)))
    del refs, packed, big

    @jax.jit
    def bench_step(fm, reads_d, lens):
        t, b, o, k = sharded_align_step(fm, reads_d, lens)
        return (jnp.sum(k.astype(jnp.int32)) + jnp.sum(o % 7) +
                jnp.sum(b - t))

    found = int(bench_step(fm, *batches[0]))
    t0 = time.time()
    for it in range(1, ITERS + 1):
        found += int(bench_step(fm, *batches[it]))
    dt = time.time() - t0
    hbm = sum(int(np.asarray(x).nbytes) for x in
              (fm.bwt, fm.occ, fm.offs, fm.ftab_hi, fm.ftab_lo))

    # -v 1 end-to-end on the same hg-scale index (compact layout, DFS
    # engine): the second half of BASELINE.json's hg-scale metric.
    # Mutate a realistic fraction of the genome-sampled reads (which
    # would otherwise ALL take the exact-hit fast path): ~35% stay
    # exact, ~40% get 1 mismatch, ~15% get 2, ~10% are garbage.
    from bowtie_tpu.io.readers import ReadRecord
    from bowtie_tpu.align.dfs_device import DeviceDFSAligner
    from bowtie_tpu.align.policy import INF, KPolicy
    try:
        idx_bw = read_ebwt(base + ".rev")
    except (FileNotFoundError, EOFError) as e:
        # mirror still building: report the exact row alone
        print(json.dumps({
            "metric": "hg-scale -v1/-n2",
            "hg": f"SKIPPED — mirror index not (fully) built"}),
            flush=True)
        return (B * ITERS) / dt, None, None, idx.length, hbm
    al = DeviceDFSAligner(idx, idx_bw, KPolicy(1, INF), v=1,
                          compact=True)
    recs = []
    mat0 = np.asarray(batches[0][0])
    lens0 = np.asarray(batches[0][1])
    for i in range(2 * v1_n):
        r = mat0[i % mat0.shape[0]]
        n = int(lens0[i % lens0.shape[0]])
        codes = np.array(r[-n:])
        u = rng.random()
        if u < 0.10:
            codes = rng.integers(0, 4, n)
        else:
            nmm = 1 if u < 0.50 else (2 if u < 0.65 else 0)
            for _ in range(nmm):
                p = int(rng.integers(0, n))
                codes[p] = (codes[p] + 1 + rng.integers(0, 3)) % 4
        seq = bytes(b"ACGT"[c] for c in codes)
        recs.append(ReadRecord(name=b"hg%d" % i, seq=seq,
                               qual=b"I" * n, rdid=i))
    al.align_batch(recs[v1_n:])              # warm-up / compile
    t0 = time.time()
    nn = len(al.align_batch(recs[:v1_n]))
    v1_rate = nn / (time.time() - t0)

    # -n 2 (the default mode) at hg scale on the compact layout
    from bowtie_tpu.align.n_device import DeviceNAligner
    al2 = DeviceNAligner(idx, idx_bw, KPolicy(1, INF), compact=True)
    al2.align_batch(recs[n2_n:2 * n2_n])     # warm-up / compile
    t0 = time.time()
    nn = len(al2.align_batch(recs[:n2_n]))
    n2_rate = nn / (time.time() - t0)

    # the reference binary on the SAME hg index + read sets (one core
    # of this host) — the round-3 verdict's missing comparison
    oracle_rates = {}
    if os.path.exists(ORACLE):
        with tempfile.TemporaryDirectory() as td:
            exact_fq = td + "/hg_exact.fq"
            with open(exact_fq, "wb") as f:
                m0 = np.asarray(batches[0][0])
                l0 = np.asarray(batches[0][1])
                for i in range(65536):
                    r = m0[i % m0.shape[0]]
                    nch = int(l0[i % l0.shape[0]])
                    seq = bytes(b"ACGT"[c] for c in r[-nch:])
                    f.write(b"@e%d\n" % i + seq + b"\n+\n"
                            + b"I" * nch + b"\n")
            mut_fq = td + "/hg_mut.fq"
            with open(mut_fq, "wb") as f:
                for r in recs[:v1_n]:
                    f.write(b"@" + r.name + b"\n" + r.seq + b"\n+\n"
                            + r.qual + b"\n")
            for key, cfg, fq, nr in [
                    ("exact", ["-v", "0"], exact_fq, 65536),
                    ("v1", ["-v", "1"], mut_fq, v1_n),
                    ("n2", ["-n", "2"], mut_fq, v1_n)]:
                try:
                    oracle_rates[key] = bench_oracle(
                        cfg, base, n=nr, reads_files=[fq])
                except Exception as e:
                    print(json.dumps({"metric": f"hg oracle {key}",
                                      "error": str(e)[:160]}),
                          flush=True)

    return ((B * ITERS) / dt, v1_rate, n2_rate, idx.length, hbm,
            oracle_rates)


def _guard(modes, key, metric, fn, extra_keys=()):
    """Run one bench mode; a failure records the error instead of
    killing the whole bench (the driver needs the summary line even if
    one mode trips on a flaky tunnel)."""
    import traceback
    try:
        r = fn()
    except Exception as e:
        traceback.print_exc()
        print(json.dumps({"metric": metric, "error": str(e)[:200]}),
              flush=True)
        return None
    return r


def main():
    from bowtie_tpu.index.ebwt_io import read_ebwt
    from bowtie_tpu.io.readers import ReadSource
    from bowtie_tpu.align.policy import INF, KPolicy

    idx = read_ebwt("/root/reference/indexes/e_coli")
    idx_bw = read_ebwt("/root/reference/indexes/e_coli.rev")
    src = ReadSource(["/root/reference/reads/e_coli_1000.fq"], "fastq")
    reads = [r for r in src.records()]
    modes = {}

    ecoli = "/root/reference/indexes/e_coli"

    def oracle(key, cfg, **kw):
        try:
            return bench_oracle(cfg, ecoli, **kw)
        except Exception as e:
            print(json.dumps({"metric": f"oracle {key}",
                              "error": str(e)[:160]}), flush=True)
            return None

    # flagship: exact search+resolve kernel
    v0 = bench_exact(idx, reads)
    modes["v0_exact_kernel"] = _emit(
        "exact-search+resolve reads/s/chip (e_coli, 36bp, fw+rc)", v0,
        oracle=oracle("v0", ["-v", "0"], n=65536))

    # -v 1 end-to-end (device DFS engine)
    def mk_v1():
        from bowtie_tpu.align.dfs_device import DeviceDFSAligner
        return DeviceDFSAligner(idx, idx_bw, KPolicy(1, INF), v=1)
    out = _guard(modes, "v1", "-v 1 end-to-end reads/s/chip",
                 lambda: bench_aligner(mk_v1, reads, 32768, 16384))
    if out:
        modes["v1"] = _emit("-v 1 end-to-end reads/s/chip", out[0],
                            {"fallbacks": out[1]},
                            oracle=oracle("v1", ["-v", "1"], n=65536))

    # -n 2 end-to-end (device seeded engine, bowtie's default mode)
    def mk_n2():
        from bowtie_tpu.align.n_device import DeviceNAligner
        return DeviceNAligner(idx, idx_bw, KPolicy(1, INF))
    out = _guard(modes, "n2", "-n 2 end-to-end reads/s/chip",
                 lambda: bench_aligner(mk_n2, reads, 32768, 16384))
    if out:
        modes["n2"] = _emit(
            "-n 2 (default mode) end-to-end reads/s/chip",
            out[0], {"fallbacks": out[1]},
            oracle=oracle("n2", ["-n", "2"], n=32768))

    # -v 2 --best end-to-end (device best-first engine)
    def mk_best():
        from bowtie_tpu.align.best_device import DeviceBestAligner
        return DeviceBestAligner(idx, idx_bw, KPolicy(1, INF), v=2,
                                 strata=False, all_hits=False)
    out = _guard(modes, "v2_best", "-v 2 --best end-to-end reads/s/chip",
                 lambda: bench_aligner(mk_best, reads, 32768, 16384))
    if out:
        modes["v2_best"] = _emit("-v 2 --best end-to-end reads/s/chip",
                                 out[0], {"fallbacks": out[1]},
                                 oracle=oracle("v2_best",
                                               ["-v", "2", "--best"],
                                               n=32768))

    # paired-end, device-recorded anchor streams + host replay
    src1 = ReadSource(["/root/reference/reads/e_coli_1000_1.fq"],
                      "fastq")
    src2 = ReadSource(["/root/reference/reads/e_coli_1000_2.fq"],
                      "fastq")
    p1, p2 = list(src1.records()), list(src2.records())

    def mk_pe_dev():
        from bowtie_tpu.align.pe_device import DevicePairedBestAligner
        from bowtie_tpu.index.ebwt_io import (read_bitpair_reference,
                                              unpack_reference)
        recs, packed = read_bitpair_reference(
            "/root/reference/indexes/e_coli")
        refs = unpack_reference(recs, packed)
        return DevicePairedBestAligner(idx, idx_bw, refs,
                                       KPolicy(1, INF))
    def run_pe_dev():
        pairs_big = list(zip(_replicate(p1, 8192 + 2048),
                             _replicate(p2, 8192 + 2048)))
        pe_dev = mk_pe_dev()
        pe_dev.align_batch(pairs_big[8192:])     # warm-up / compile
        t0 = time.time()
        n = 0
        for i in range(0, 8192, 2048):
            n += len(pe_dev.align_batch(pairs_big[i:i + 2048]))
        return n / (time.time() - t0), pe_dev.fallbacks
    out = _guard(modes, "pe_n2_device",
                 "paired -n 2 end-to-end reads/s/chip (device)",
                 run_pe_dev)
    pe_oracle_pairs = oracle("pe_n2", ["-n", "2"], n=16384, paired=True)
    if out:
        modes["pe_n2_device"] = _emit(
            "paired -n 2 end-to-end pairs/s/chip (device)",
            out[0], {"fallbacks": out[1],
                     "reads_per_sec": round(2 * out[0], 1)},
            oracle=pe_oracle_pairs)

    # paired-end host engine (parity/reference point)
    def run_pe_host():
        from bowtie_tpu.align.golden import GoldenFM
        from bowtie_tpu.align.best_factories import \
            make_paired_best_aligner
        from bowtie_tpu.index.ebwt_io import (read_bitpair_reference,
                                              unpack_reference)
        recs, packed = read_bitpair_reference(
            "/root/reference/indexes/e_coli")
        refs = unpack_reference(recs, packed, plen=idx.plen)
        pe_al = make_paired_best_aligner(
            GoldenFM(idx), GoldenFM(idx_bw), refs, KPolicy(1, INF))
        pairs = list(zip(p1, p2))
        pe_al.align_batch(pairs[:64])            # warm-up
        t0 = time.time()
        pe_al.align_batch(pairs)
        return len(pairs) / (time.time() - t0)
    r = _guard(modes, "pe_n2", "paired -n 2 reads/s (host engine)",
               run_pe_host)
    if r:
        modes["pe_n2"] = _emit("paired -n 2 pairs/s (host engine)", r,
                               {"reads_per_sec": round(2 * r, 1)},
                               oracle=pe_oracle_pairs)

    # hg-scale exact (compact layout) when the synthetic index exists
    hg = _guard(modes, "hg", "hg-scale modes", bench_hg)
    if hg is not None:
        r, v1r, n2r, glen, hbm, orc = (hg if len(hg) == 6
                                       else (*hg, {}))
        modes["hg_exact"] = _emit(
            f"hg-scale exact reads/s/chip ({glen/1e9:.2f} Gbp synthetic"
            f" genome, compact layout, {hbm/1e9:.2f} GB HBM)", r,
            {"genome_bp": glen, "hbm_bytes": hbm},
            oracle=orc.get("exact"))
        if v1r is not None:
            modes["hg_v1"] = _emit(
                f"hg-scale -v 1 end-to-end reads/s/chip ({glen/1e9:.2f}"
                " Gbp synthetic genome, compact layout)", v1r,
                oracle=orc.get("v1"))
        if n2r is not None:
            modes["hg_n2"] = _emit(
                f"hg-scale -n 2 end-to-end reads/s/chip ({glen/1e9:.2f}"
                " Gbp synthetic genome, compact layout)", n2r,
                oracle=orc.get("n2"))

    # summary line: flagship value + all modes
    print(json.dumps({
        "metric": "exact-search+resolve reads/s/chip (e_coli, 36bp, "
                  "fw+rc)",
        "value": round(v0, 1),
        "unit": "reads/s",
        "vs_baseline": round(v0 / BASELINE_READS_PER_SEC, 2),
        "modes": {k: {"reads_per_sec": v["value"],
                      "vs_baseline": v["vs_baseline"],
                      **({"oracle_reads_per_sec":
                          v["oracle_reads_per_sec"],
                          "vs_oracle": v["vs_oracle"]}
                         if "vs_oracle" in v else {})}
                  for k, v in modes.items()},
    }))


if __name__ == "__main__":
    sys.exit(main())
