#!/usr/bin/env python
"""Phase-level profiler for the device engines on the real chip.

Runs one warm-up + one timed 16k batch per mode with BOWTIE_TPU_PROF=1
so run_compacting / the fused -n path print per-chunk live-lane counts
and wall times.  Use this to find where a mode's time goes before
touching kernel layouts.

Usage: python scripts/profile_engines.py [n2|v1|best|pe] ...
"""
import os
import sys
import time

os.environ.setdefault("BOWTIE_TPU_PROF", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def load():
    from bowtie_tpu.index.ebwt_io import read_ebwt
    from bowtie_tpu.io.readers import ReadSource
    idx = read_ebwt("/root/reference/indexes/e_coli")
    idx_bw = read_ebwt("/root/reference/indexes/e_coli.rev")
    src = ReadSource(["/root/reference/reads/e_coli_1000.fq"], "fastq")
    return idx, idx_bw, list(src.records())


def replicate(reads, n):
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


def main():
    modes = sys.argv[1:] or ["n2"]
    idx, idx_bw, reads = load()
    from bowtie_tpu.align.policy import INF, KPolicy
    B = int(os.environ.get("PROF_B", 16384))
    big = replicate(reads, 2 * B)

    for m in modes:
        if m == "n2":
            from bowtie_tpu.align.n_device import DeviceNAligner
            al = DeviceNAligner(idx, idx_bw, KPolicy(1, INF))
        elif m == "v1":
            from bowtie_tpu.align.dfs_device import DeviceDFSAligner
            al = DeviceDFSAligner(idx, idx_bw, KPolicy(1, INF), v=1)
        elif m == "best":
            from bowtie_tpu.align.best_device import DeviceBestAligner
            al = DeviceBestAligner(idx, idx_bw, KPolicy(1, INF), v=2,
                                   strata=False, all_hits=False)
        elif m == "pe":
            import time as _t
            from bowtie_tpu.align.pe_device import \
                DevicePairedBestAligner
            from bowtie_tpu.index.ebwt_io import (
                read_bitpair_reference, unpack_reference)
            from bowtie_tpu.io.readers import ReadSource
            rc, packed = read_bitpair_reference(
                "/root/reference/indexes/e_coli")
            refs = unpack_reference(rc, packed)
            p1 = list(ReadSource(
                ["/root/reference/reads/e_coli_1000_1.fq"],
                "fastq").records())
            p2 = list(ReadSource(
                ["/root/reference/reads/e_coli_1000_2.fq"],
                "fastq").records())
            al = DevicePairedBestAligner(idx, idx_bw, refs,
                                         KPolicy(1, INF))
            pairs = list(zip(replicate(p1, 6144), replicate(p2, 6144)))
            al.align_batch(pairs[4096:])
            t0 = _t.time()
            n = len(al.align_batch(pairs[:4096]))
            dt = _t.time() - t0
            print(f"=== pe: {n} pairs in {dt:.3f}s = {n / dt:.1f} "
                  f"pairs/s fallbacks={al.fallbacks} "
                  f"escalations={al.escalations} ===", flush=True)
            continue
        else:
            print(f"unknown mode {m}")
            continue
        print(f"=== {m}: warm-up ===", file=sys.stderr, flush=True)
        al.align_batch(big[B:2 * B])
        print(f"=== {m}: timed ===", file=sys.stderr, flush=True)
        t0 = time.time()
        res = al.align_batch(big[:B])
        dt = time.time() - t0
        print(f"=== {m}: {B} reads in {dt:.3f}s = {B / dt:.1f} reads/s "
              f"fallbacks={al.fallbacks} ===", flush=True)


if __name__ == "__main__":
    main()
