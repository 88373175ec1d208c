"""Bounded-memory build demonstration.

Builds the same genome twice with bowtie-tpu-build — once with the
default in-memory SA-IS path, once with the blockwise bounded-memory
path (--bmax) — verifies the 6 output files are byte-identical, and
reports each child's peak RSS.  This is the evidence for the
reference's bowtie-build --bmax/--dcv contract (blockwise.cpp /
diff_sample.cpp): huge genomes build in bounded memory at the cost of
time, with identical output.

Usage:  python scripts/measure_blockwise_rss.py [MBP] [--skip-inmem]

The per-char footprint scales linearly, so the blockwise bytes/char
measured here extrapolates directly to 3 Gbp.
"""
from __future__ import annotations

import json
import os
import random
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import resource, sys
sys.path.insert(0, %(repo)r)
sys.argv = ["bowtie-tpu-build"] + %(args)s
from bowtie_tpu.cli.build import main
main(sys.argv[1:])
rss_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
print("PEAK_RSS_KB %%d" %% rss_kb, file=sys.stderr)
"""


def run_build(args):
    code = CHILD % {"repo": REPO, "args": repr(args)}
    p = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True)
    if p.returncode != 0:
        sys.stderr.write(p.stderr)
        raise SystemExit("build failed")
    for line in p.stderr.splitlines():
        if line.startswith("PEAK_RSS_KB"):
            return int(line.split()[1]) * 1024
    raise SystemExit("no RSS line")


def main():
    mbp = float(sys.argv[1]) if len(sys.argv) > 1 else 100.0
    skip_inmem = "--skip-inmem" in sys.argv
    n = int(mbp * 1e6)
    rng = random.Random(42)
    with tempfile.TemporaryDirectory() as td:
        fa = os.path.join(td, "g.fa")
        with open(fa, "w") as f:
            f.write(">chr1\n")
            # repeat-rich so bucket sizes are uneven (the hard case)
            unit = "".join(rng.choice("ACGT") for _ in range(50000))
            written = 0
            while written < n:
                if rng.random() < 0.3:
                    chunk = unit[: rng.randrange(1000, 50000)]
                else:
                    chunk = "".join(rng.choice("ACGT")
                                    for _ in range(20000))
                f.write(chunk + "\n")
                written += len(chunk)

        bmax = max(1, n // 40)  # ~40 blocks
        import time
        t0 = time.time()
        rss_blk = run_build(
            ["--bmax", str(bmax), "--dcv", "1024", fa,
             os.path.join(td, "blk")])
        t_blk = time.time() - t0
        result = {
            "genome_bp": written,
            "blockwise": {"peak_rss_bytes": rss_blk,
                          "bytes_per_char": round(rss_blk / written, 2),
                          "seconds": round(t_blk, 1)},
            "extrapolated_3gbp_rss_gb": round(
                rss_blk / written * 3.03e9 / 2**30, 2),
        }
        if not skip_inmem:
            t0 = time.time()
            rss_mem = run_build([fa, os.path.join(td, "mem")])
            t_mem = time.time() - t0
            same = all(
                open(os.path.join(td, f"blk.{ext}"), "rb").read()
                == open(os.path.join(td, f"mem.{ext}"), "rb").read()
                for ext in ("1.ebwt", "2.ebwt", "3.ebwt", "4.ebwt",
                            "rev.1.ebwt", "rev.2.ebwt"))
            result["in_memory"] = {
                "peak_rss_bytes": rss_mem,
                "bytes_per_char": round(rss_mem / written, 2),
                "seconds": round(t_mem, 1)}
            result["byte_identical"] = same
            if not same:
                raise SystemExit(json.dumps(result) + "\nMISMATCH")
        print(json.dumps(result))


if __name__ == "__main__":
    main()
