#!/usr/bin/env python
"""Byte-parity spot check of the device engines on a >2^31 bp genome
(the uint32 row-bit-pattern path, round-5): sample reads from the
hg_full synthetic genome, run the reference binary and bowtie-tpu on
the SAME index, and byte-compare outputs.

Usage: python scripts/check_hg_full_parity.py [base] [n_reads] [modes]
"""
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE = os.path.join(REPO, ".oracle", "bowtie-align-s")


def main():
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/hg_full/hg_synth"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    modes = sys.argv[3].split(";") if len(sys.argv) > 3 else \
        ["-v 0", "-v 1", "-n 2"]
    from bowtie_tpu.index.ebwt_io import (read_bitpair_reference,
                                          unpack_reference)
    recs, packed = read_bitpair_reference(base)
    refs = unpack_reference(recs, packed)
    big = np.asarray(max(refs, key=len))
    del refs, packed
    rng = np.random.default_rng(13)
    pos = rng.integers(0, len(big) - 36, n)
    win = big[pos[:, None] + np.arange(35)]
    win = np.where(win > 3, 0, win).astype(np.uint8)
    # ~half get 1-2 mismatches
    for i in range(n):
        u = rng.random()
        nmm = 1 if 0.3 < u < 0.6 else (2 if u >= 0.85 else 0)
        for _ in range(nmm):
            p = int(rng.integers(0, 35))
            win[i, p] = (win[i, p] + 1 + rng.integers(0, 3)) % 4
    del big
    fails = 0
    with tempfile.TemporaryDirectory() as td:
        fq = td + "/r.fq"
        with open(fq, "wb") as f:
            for i in range(n):
                seq = bytes(b"ACGT"[c] for c in win[i])
                f.write(b"@p%d\n" % i + seq + b"\n+\n" + b"I" * 35
                        + b"\n")
        for cfg in modes:
            args = cfg.split()
            ro = td + "/ref_" + "".join(args)
            mo = td + "/tpu_" + "".join(args)
            r = subprocess.run([ORACLE, "--wrapper", "basic-0", *args,
                                base, fq, ro], capture_output=True)
            assert r.returncode == 0, r.stderr.decode()[:300]
            r = subprocess.run([os.path.join(REPO, "bin", "bowtie-tpu"),
                                *args, base, fq, mo],
                               capture_output=True)
            if r.returncode != 0:
                print(f"{cfg}: bowtie-tpu FAILED: "
                      f"{r.stderr.decode()[-300:]}")
                fails += 1
                continue
            w = open(ro, "rb").read()
            g = open(mo, "rb").read()
            if w == g:
                print(f"{cfg}: IDENTICAL ({n} reads, "
                      f"{len(w.splitlines())} hits)")
            else:
                print(f"{cfg}: DIFF")
                fails += 1
    return fails


if __name__ == "__main__":
    sys.exit(main())
