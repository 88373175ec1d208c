"""bowtie-build-compatible CLI.

Usage: python -m bowtie_tpu.cli.build [options] <reference_in> <ebwt_base>
"""
from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="bowtie-tpu-build")
    p.add_argument("reference_in",
                   help="comma-separated FASTA files (or sequences with -c)")
    p.add_argument("ebwt_base")
    p.add_argument("-c", dest="cmdline", action="store_true")
    p.add_argument("-o", "--offrate", type=int, default=5)
    p.add_argument("-t", "--ftabchars", type=int, default=10)
    p.add_argument("--noref", "-r", action="store_true",
                   help="don't build .3/.4 reference portion")
    p.add_argument("--norev", action="store_true",
                   help="skip the mirror (.rev) index")
    p.add_argument("--large-index", action="store_true",
                   help="write the 64-bit .ebwtl variant")
    p.add_argument("--jax-sa", action="store_true",
                   help="compute suffix arrays on the accelerator")
    p.add_argument("-q", "--quiet", action="store_true")
    args = p.parse_args(argv)

    from ..build import builder
    from ..build.sa import suffix_array, suffix_array_jax
    sa_fn = suffix_array_jax if args.jax_sa else suffix_array

    t0 = time.time()
    if args.cmdline:
        from ..utils.alphabet import seq_to_codes
        seqs = [seq_to_codes(s) for s in args.reference_in.split(",")]
        names = [str(i) for i in range(len(seqs))]
        builder.build_index(seqs, names, args.ebwt_base,
                            off_rate=args.offrate,
                            ftab_chars=args.ftabchars, sa_fn=sa_fn,
                            both=not args.norev,
                            large=args.large_index)
    else:
        builder.build_from_fasta(args.reference_in.split(","),
                                 args.ebwt_base, off_rate=args.offrate,
                                 ftab_chars=args.ftabchars, sa_fn=sa_fn,
                                 both=not args.norev,
                                 large=args.large_index)
    if not args.quiet:
        print(f"Total time for build: {time.time() - t0:.2f}s",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
