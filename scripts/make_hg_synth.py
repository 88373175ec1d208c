#!/usr/bin/env python
"""Synthesize an hg-scale genome (default ~3.1 Gbp over 24 chromosomes
with N runs) and build its bowtie index with the streaming writer.

The resulting index is the BASELINE.json hg-scale benchmark target:
reads/s/chip against an index the size of the human genome (the
reference claims ~2.2 GB for human, MANUAL.markdown:14-16).

Usage: python scripts/make_hg_synth.py [outdir] [--gbp 3.1] [--quick]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synth_genome(total_bp: int, outdir: str, seed: int = 42):
    """Write hg-like FASTA: 24 chromosomes, telomeric/centromeric N
    runs, GC-varying composition, and a sprinkling of repeated
    segments so the text isn't pure iid noise."""
    rng = np.random.default_rng(seed)
    # human-ish relative chromosome sizes
    rel = np.array([8.0, 7.8, 6.4, 6.1, 5.8, 5.5, 5.1, 4.7, 4.5, 4.3,
                    4.3, 4.3, 3.7, 3.4, 3.3, 2.9, 2.7, 2.6, 1.9, 2.1,
                    1.5, 1.6, 5.0, 1.9])
    sizes = (rel / rel.sum() * total_bp).astype(np.int64)
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, "hg_synth.fa")
    CH = np.frombuffer(b"ACGTN", np.uint8)
    t0 = time.time()
    with open(path, "wb") as f:
        repeat_bank = rng.integers(0, 4, 300).astype(np.uint8)
        for ci, n in enumerate(sizes):
            f.write(f">chr{ci + 1} synthetic\n".encode())
            # composition varies along the chromosome
            chunks = []
            done = 0
            while done < n:
                m = int(min(n - done, 1 << 22))
                gc = 0.38 + 0.1 * rng.random()
                p = np.array([(1 - gc) / 2, gc / 2, gc / 2,
                              (1 - gc) / 2])
                seg = rng.choice(4, size=m, p=p).astype(np.uint8)
                # occasional Alu-like repeat insertions (diverged)
                for _ in range(m // 100000):
                    at = int(rng.integers(0, max(1, m - 300)))
                    rep = repeat_bank.copy()
                    muts = rng.integers(0, 300, 30)
                    rep[muts] = rng.integers(0, 4, 30)
                    seg[at:at + 300] = rep[:min(300, m - at)]
                chunks.append(seg)
                done += m
            codes = np.concatenate(chunks)[:n]
            # telomeres + a centromeric N run
            tel = int(min(10000, n // 100))
            codes[:tel] = 4
            codes[-tel:] = 4
            cen = int(n * (0.4 + 0.2 * rng.random()))
            cw = int(min(3_000_000, n // 50))
            codes[cen:cen + cw] = 4
            seq = CH[codes]
            # 60-col FASTA lines, vectorized newline insertion
            full = (len(seq) // 60) * 60
            step = 60 * (1 << 20)
            for off in range(0, full, step):
                lines = seq[off:min(off + step, full)].reshape(-1, 60)
                out = np.concatenate(
                    [lines, np.full((len(lines), 1), ord("\n"),
                                    np.uint8)], axis=1)
                f.write(out.reshape(-1).tobytes())
            if full < len(seq):
                f.write(seq[full:].tobytes() + b"\n")
            print(f"chr{ci + 1}: {n:,} bp "
                  f"({time.time() - t0:.0f}s)", flush=True)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir", nargs="?", default="/root/hg_synth")
    # default 2.0 Gbp: the device engines keep BWT rows in int32 lane
    # registers, so the joined text must stay under 2^31 (the
    # reference's small-index TIndexOffU=uint32 analog; genomes beyond
    # that use the host paths / .ebwtl).  2 Gbp is already far outside
    # any CPU cache, which is the regime this benchmark probes.
    ap.add_argument("--gbp", type=float, default=2.0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--skip-genome", action="store_true")
    ap.add_argument("--norev", action="store_true",
                    help="forward index only (exact mode needs no "
                         "mirror)")
    args = ap.parse_args()

    path = os.path.join(args.outdir, "hg_synth.fa")
    if not args.skip_genome or not os.path.exists(path):
        path = synth_genome(int(args.gbp * 1e9), args.outdir,
                            args.seed)

    from bowtie_tpu.build.builder import (build_one_streaming,
                                          build_index, fasta_to_records,
                                          write_ref_files)
    from bowtie_tpu.build.sa import suffix_array
    from bowtie_tpu.io.readers import parse_fasta
    from bowtie_tpu.utils.alphabet import seq_to_codes

    t0 = time.time()
    seqs, names = [], []
    for name, seq, _q in parse_fasta(path):
        names.append(name.decode().split()[0])
        seqs.append(seq_to_codes(seq))
    print(f"parsed {len(seqs)} sequences "
          f"({sum(map(len, seqs)):,} bp) in {time.time() - t0:.0f}s",
          flush=True)

    base = os.path.join(args.outdir, "hg_synth")
    records, frags = fasta_to_records(seqs)
    write_ref_files(base, records, frags)
    plen = np.array([len(x) for x in seqs], dtype=np.uint32)
    rstarts = []
    joined_off = 0
    for ridx, roff, codes in frags:
        rstarts.append((joined_off, ridx, roff))
        joined_off += len(codes)
    rstarts = np.array(rstarts, dtype=np.uint32).reshape(-1, 3)
    joined = np.concatenate([f_[2] for f_ in frags])
    del seqs, frags
    print(f"joined length {len(joined):,}; SA-IS fw index...",
          flush=True)

    def run(text, o1, o2):
        t1 = time.time()
        sa = suffix_array(text)
        print(f"  SA built in {time.time() - t1:.0f}s", flush=True)
        t1 = time.time()
        build_one_streaming(
            (c for c in np.array_split(sa, max(1, len(sa) >> 26))),
            text, rstarts, plen, names, o1, o2)
        print(f"  streamed to disk in {time.time() - t1:.0f}s",
              flush=True)
        del sa

    run(joined, base + ".1.ebwt", base + ".2.ebwt")
    if not args.norev:
        print("mirror index...", flush=True)
        # reverse each fragment in place = reverse within rstarts spans
        rev = joined.copy()
        starts = rstarts[:, 0].astype(np.int64)
        ends = np.append(starts[1:], len(joined))
        for s_, e_ in zip(starts, ends):
            rev[s_:e_] = joined[s_:e_][::-1]
        del joined
        run(rev, base + ".rev.1.ebwt", base + ".rev.2.ebwt")
    print(f"total {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
