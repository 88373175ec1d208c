#!/usr/bin/env python
"""Capture a jax.profiler trace of one warmed align_batch and print the
top device ops by total time, grouped by jit program.

Usage: python scripts/trace_mode.py [n2|v1|best] [outdir]
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load():
    from bowtie_tpu.index.ebwt_io import read_ebwt
    from bowtie_tpu.io.readers import ReadSource
    idx = read_ebwt("/root/reference/indexes/e_coli")
    idx_bw = read_ebwt("/root/reference/indexes/e_coli.rev")
    src = ReadSource(["/root/reference/reads/e_coli_1000.fq"], "fastq")
    return idx, idx_bw, list(src.records())


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "n2"
    outdir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/trace_{mode}"
    import jax
    from profile_engines import replicate
    idx, idx_bw, reads = load()
    from bowtie_tpu.align.policy import INF, KPolicy
    B = int(os.environ.get("PROF_B", 16384))
    big = replicate(reads, 2 * B)
    if mode == "n2":
        from bowtie_tpu.align.n_device import DeviceNAligner
        al = DeviceNAligner(idx, idx_bw, KPolicy(1, INF))
    elif mode == "v1":
        from bowtie_tpu.align.dfs_device import DeviceDFSAligner
        al = DeviceDFSAligner(idx, idx_bw, KPolicy(1, INF), v=1)
    else:
        from bowtie_tpu.align.best_device import DeviceBestAligner
        al = DeviceBestAligner(idx, idx_bw, KPolicy(1, INF), v=2,
                               strata=False, all_hits=False)
    al.align_batch(big[B:2 * B])        # warm-up / compile
    with jax.profiler.trace(outdir):
        al.align_batch(big[:B])

    # ---- parse the trace ------------------------------------------------
    tr = sorted(glob.glob(os.path.join(
        outdir, "plugins/profile/*/*.trace.json.gz")))[-1]
    with gzip.open(tr) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    # device-lane pids: find thread names that look like TPU/device
    names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in names.items()
                if "TPU" in n or "/device" in n or "Axon" in n
                or "XLA" in n}
    print("processes:", {p: n for p, n in names.items()}, file=sys.stderr)
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in ev:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        nm = e.get("name", "?")
        tot[nm] += e.get("dur", 0)
        cnt[nm] += 1
    grand = sum(tot.values())
    print(f"total device op time: {grand/1e6:.3f}s  ({len(tot)} ops)")
    for nm, t in sorted(tot.items(), key=lambda kv: -kv[1])[:60]:
        print(f"{t/1e6:9.3f}s  x{cnt[nm]:<7} {nm[:120]}")


if __name__ == "__main__":
    main()
