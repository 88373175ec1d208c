"""Multi-host launch: jax.distributed + sharded read input.

The TPU-native replacement for the reference's cross-machine story
(file-level scatter via Hadoop streaming, SURVEY §2.7): every host
joins one jax.distributed job, loads/replicates the index into its
chips' HBM (the --mm/--shmem analog), aligns its contiguous slice of
the read file, and writes a part file; part files concatenate in read
order, so the merged output is deterministic (--reorder semantics for
free).

Usage (same command on every host):

  python -m bowtie_tpu.parallel.launch \
      --coordinator host0:9876 --num-hosts 4 --host-id $ID \
      -- -n 2 <ebwt-base> reads.fq hits.txt

Each host writes hits.txt.part<ID>; host 0 merges when all parts are
present (or merge manually / leave parted for downstream scatter-aware
consumers).  The alignment math itself needs no cross-host
communication — reads are embarrassingly data-parallel over hosts and
lanes are data-parallel over each host's chips (parallel/dfs_mesh.py).
"""
from __future__ import annotations

import argparse
import os
import sys
import time


def _open_maybe_compressed(path: str):
    if path.endswith(".gz"):
        import gzip
        return gzip.open(path, "rb")
    if path.endswith(".bz2"):
        import bz2
        return bz2.open(path, "rb")
    return open(path, "rb")


def _count_reads(path: str, fmt: str = "fastq") -> int:
    """Count reads in `path` for host-slice arithmetic.  Handles
    multi-line FASTA, 4-line FASTQ, raw (1/line), tabbed (1/line) and
    gz/bz2 compression — a wrong count here would misalign global read
    ids (and therefore per-read RNG seeds) across hosts."""
    n = 0
    with _open_maybe_compressed(path) as f:
        if fmt == "fasta":
            for line in f:
                if line.startswith(b">"):
                    n += 1
        elif fmt == "fastq":
            for _ in f:
                n += 1
            n //= 4
        else:                      # raw / tabbed: one read per line
            for line in f:
                if line.strip():
                    n += 1
    return n


def _fmt_from_opts(opts: list[str]) -> str:
    if "-f" in opts:
        return "fasta"
    if "-r" in opts:
        return "raw"
    if "--12" in opts or "--tab5" in opts or "--tab6" in opts:
        return "tab"
    return "fastq"


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="bowtie-tpu-distributed")
    p.add_argument("--coordinator", required=True,
                   help="host:port of host 0 (jax.distributed)")
    p.add_argument("--num-hosts", type=int, required=True)
    p.add_argument("--host-id", type=int, required=True)
    p.add_argument("--no-merge", action="store_true",
                   help="leave per-host part files unmerged")
    p.add_argument("rest", nargs=argparse.REMAINDER,
                   help="-- then bowtie-tpu arguments")
    args = p.parse_args(argv)
    rest = args.rest[1:] if args.rest[:1] == ["--"] else args.rest
    if len(rest) < 3:
        p.error("expected: -- <bowtie-tpu args> <ebwt> <reads> <hits>")

    import jax
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_hosts,
                               process_id=args.host_id)

    ebwt, reads, hits = rest[-3], rest[-2], rest[-1]
    opts = rest[:-3]
    # contiguous read slice for this host (global read ids preserved
    # through -s/-u so per-read RNG seeds and output order match a
    # single-host run)
    total = _count_reads(reads, _fmt_from_opts(opts))
    per = -(-total // args.num_hosts)
    skip = args.host_id * per
    upto = min(per, max(0, total - skip))
    part = f"{hits}.part{args.host_id}"
    from ..cli.align import main as align_main
    rc = align_main([*opts, "-s", str(skip), "-u", str(upto),
                     ebwt, reads, part])
    if rc not in (0, None):
        return rc

    if args.host_id == 0 and not args.no_merge:
        # wait for all parts, then concatenate in host order
        parts = [f"{hits}.part{i}" for i in range(args.num_hosts)]
        deadline = time.time() + 24 * 3600
        done_marks = [pp + ".done" for pp in parts]
        open(part + ".done", "w").close()
        while not all(os.path.exists(m) for m in done_marks):
            if time.time() > deadline:
                print("timed out waiting for part files",
                      file=sys.stderr)
                return 1
            time.sleep(2)
        with open(hits, "wb") as out:
            for pp in parts:
                with open(pp, "rb") as f:
                    out.write(f.read())
        print(f"merged {len(parts)} parts -> {hits}", file=sys.stderr)
    else:
        open(part + ".done", "w").close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
