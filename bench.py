"""Benchmark: reads/s of the device exact-alignment step on real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: bowtie's published ~7,000 reads/s (>25M 35-bp reads/hour on a
2009 workstation, MANUAL.markdown:11-14; see BASELINE.md).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_READS_PER_SEC = 7000.0


def main():
    import jax
    import jax.numpy as jnp
    from bowtie_tpu.index.ebwt_io import read_ebwt
    from bowtie_tpu.index.arrays import from_ebwt
    from bowtie_tpu.io.readers import ReadSource
    from bowtie_tpu.align.exact import right_align
    from bowtie_tpu.parallel.mesh import sharded_align_step

    idx = read_ebwt("/root/reference/indexes/e_coli")
    fm = from_ebwt(idx)

    src = ReadSource(["/root/reference/reads/e_coli_1000.fq"], "fastq")
    base = [r.codes_fw for r in src.records()]
    rcs = None
    # build a large batch by tiling the 1000 fixture reads: fw + rc
    # lanes both searched, as the aligner does
    from bowtie_tpu.utils.alphabet import revcomp_codes
    BATCH = 65536
    codes = []
    i = 0
    while len(codes) < BATCH:
        r = base[i % len(base)]
        codes.append(r if (i // len(base)) % 2 == 0 else revcomp_codes(r))
        i += 1
    mat, lens = right_align(codes, pad_to=36)
    reads_d = jnp.asarray(mat)
    lens_d = jnp.asarray(lens)

    # warm-up / compile
    top, bot, offs, ok = sharded_align_step(fm, reads_d, lens_d)
    top.block_until_ready()

    t0 = time.time()
    iters = 5
    for _ in range(iters):
        top, bot, offs, ok = sharded_align_step(fm, reads_d, lens_d)
    top.block_until_ready()
    dt = time.time() - t0

    # each searched row is one strand of one read; bowtie's reads/s
    # counts reads (2 strand searches worst-case), so count batch rows
    # as strand-searches and halve.
    reads_per_sec = (BATCH * iters / 2) / dt
    print(json.dumps({
        "metric": "exact-search reads/s/chip (e_coli, 36bp, fw+rc)",
        "value": round(reads_per_sec, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_sec / BASELINE_READS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
