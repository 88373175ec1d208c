"""Benchmark: reads/s of the device exact-alignment step on real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: bowtie's published ~7,000 reads/s (>25M 35-bp reads/hour on a
2009 workstation, MANUAL.markdown:11-14; see BASELINE.md).

Methodology: distinct shuffled batches per iteration; each iteration is
ONE jitted call that returns a single data-dependent checksum scalar
(the remote runtime's block_until_ready is unreliable and bulk host
transfers over its tunnel are slow, so a 4-byte forced read per
iteration is the honest sync).  Each batch row is one strand search
(fw or rc); reads/s counts fw+rc as one read, matching how bowtie
counts.
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
    from bowtie_tpu.utils.alphabet import revcomp_codes

    idx = read_ebwt("/root/reference/indexes/e_coli")
    # full per-row rank table + dense SA: one gather per LF step, one
    # gather per offset resolution (see index/arrays.py)
    fm = from_ebwt(idx, occ_every=1, dense_sa=True)

    src = ReadSource(["/root/reference/reads/e_coli_1000.fq"], "fastq")
    base = [r.codes_fw for r in src.records()]
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
    def bench_step(fm, reads, lens):
        t, b, o, k = sharded_align_step(fm, reads, lens)
        return (jnp.sum(k.astype(jnp.int32)) + jnp.sum(o % 7) +
                jnp.sum(b - t))

    # warm-up / compile
    found = int(bench_step(fm, *batches[0]))

    t0 = time.time()
    for it in range(1, ITERS + 1):
        # int() forces a data-dependent 4-byte host read per call
        found += int(bench_step(fm, *batches[it]))
    dt = time.time() - t0

    reads_per_sec = (B * ITERS / 2) / dt
    print(json.dumps({
        "metric": "exact-search+resolve reads/s/chip (e_coli, 36bp, fw+rc)",
        "value": round(reads_per_sec, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_sec / BASELINE_READS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
