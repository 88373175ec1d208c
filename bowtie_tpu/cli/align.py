"""bowtie-compatible alignment CLI (option surface of ebwt_search.cpp:332-428).

Usage: python -m bowtie_tpu.cli.align [options] <ebwt-base> <reads> [<hits>]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from ..align.policy import INF, KPolicy
from ..index.ebwt_io import read_ebwt
from ..io.readers import ReadSource
from ..io.sam import SamWriter
from ..io.verbose import VerboseWriter


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="bowtie-tpu",
        description="TPU-native ultrafast short-read aligner "
                    "(bowtie-1-compatible)")
    p.add_argument("-x", dest="index_opt", default=None,
                   help="index basename (positional form deprecated)")
    p.add_argument("ebwt_base", nargs="?", default=None)
    p.add_argument("reads", nargs="?", default=None)
    p.add_argument("hits", nargs="?", default=None)
    # paired-end input
    p.add_argument("-1", dest="mates1", default=None)
    p.add_argument("-2", dest="mates2", default=None)
    p.add_argument("--12", dest="tabbed", default=None)
    p.add_argument("--interleaved", default=None)
    p.add_argument("-I", "--minins", type=int, default=0)
    p.add_argument("-X", "--maxins", type=int, default=250)
    p.add_argument("--ff", action="store_true")
    p.add_argument("--rf", action="store_true")
    p.add_argument("--fr", action="store_true", default=True)
    p.add_argument("--pairtries", type=int, default=100)
    p.add_argument("--allow-contain", action="store_true")
    # input
    p.add_argument("-q", dest="fastq", action="store_true", default=True)
    p.add_argument("-f", dest="fasta", action="store_true")
    p.add_argument("-r", dest="raw", action="store_true")
    p.add_argument("-c", dest="cmdline", action="store_true")
    p.add_argument("-F", dest="fasta_cont", default=None, metavar="k,i")
    p.add_argument("-s", "--skip", type=int, default=0)
    p.add_argument("-u", "--qupto", type=int, default=None)
    p.add_argument("-5", "--trim5", type=int, default=0)
    p.add_argument("-3", "--trim3", type=int, default=0)
    p.add_argument("--phred33-quals", action="store_true", default=True)
    p.add_argument("--phred64-quals", action="store_true", default=False)
    p.add_argument("--solexa-quals", action="store_true", default=False)
    p.add_argument("--solexa1.3-quals", dest="solexa13", action="store_true")
    p.add_argument("--integer-quals", action="store_true", default=False)
    # alignment policy
    p.add_argument("-v", dest="mismatches", type=int, default=-1)
    p.add_argument("-n", "--seedmms", type=int, default=2)
    p.add_argument("-e", "--maqerr", type=int, default=70)
    p.add_argument("-l", "--seedlen", type=int, default=28)
    p.add_argument("--nomaqround", action="store_true")
    p.add_argument("--nofw", action="store_true")
    p.add_argument("--norc", action="store_true")
    p.add_argument("--maxbts", type=int, default=None)
    p.add_argument("-y", "--tryhard", action="store_true")
    # reporting
    p.add_argument("-k", dest="khits", type=int, default=1)
    p.add_argument("-a", "--all", action="store_true")
    p.add_argument("-m", dest="mhits", type=int, default=None)
    p.add_argument("-M", dest="sample_mhits", type=int, default=None)
    p.add_argument("--best", action="store_true")
    p.add_argument("--strata", action="store_true")
    # output
    p.add_argument("-S", "--sam", action="store_true")
    p.add_argument("--mapq", type=int, default=255)
    p.add_argument("--sam-nohead", action="store_true")
    p.add_argument("--sam-nosq", action="store_true")
    p.add_argument("--sam-RG", action="append", default=None,
                   help="field for the @RG header; repeatable, fields "
                        "joined with tabs (ebwt_search.cpp:791-795)")
    p.add_argument("--fullref", action="store_true")
    p.add_argument("--no-qname-trunc", action="store_true")
    p.add_argument("--refidx", action="store_true")
    p.add_argument("-B", "--offbase", type=int, default=0)
    p.add_argument("--suppress", default=None)
    p.add_argument("--cost", action="store_true")
    p.add_argument("--showseed", action="store_true")
    p.add_argument("--partition", type=int, default=0)
    p.add_argument("--un", default=None)
    p.add_argument("--al", default=None)
    p.add_argument("--max", dest="maxfile", default=None)
    p.add_argument("--quiet", action="store_true")
    p.add_argument("-t", "--time", action="store_true")
    # performance
    p.add_argument("-p", "--threads", type=int, default=1)
    p.add_argument("--batch-size", type=int, default=8192,
                   help="reads per device batch (TPU-specific)")
    p.add_argument("--reads-per-batch", type=int, default=None,
                   help="alias of --batch-size (bowtie compat)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--stats", action="store_true",
                   help="print aligner metrics (AlignerMetrics analog)")
    # accepted-for-compatibility flags (no-ops in this architecture;
    # single-stream batched output is already deterministic, and the
    # index lives replicated in device HBM rather than mmap/SysV shm)
    p.add_argument("--reorder", action="store_true")
    p.add_argument("--mm", action="store_true")
    p.add_argument("--shmem", action="store_true")
    p.add_argument("--mmsweep", action="store_true")
    p.add_argument("--chunkmbs", type=int, default=64)
    p.add_argument("--pairtries-unused", dest="_pt", default=None,
                   help=argparse.SUPPRESS)
    p.add_argument("--prewidth", type=int, default=1)
    p.add_argument("--large-index", action="store_true",
                   help="prefer the .ebwtl variant if both exist")
    p.add_argument("-o", "--offrate", type=int, default=-1,
                   help="re-thin the SA sample at load (must be >= the"
                        " index's offrate; ebwt.h:438-441)")
    p.add_argument("--no-unal", action="store_true",
                   help="suppress SAM records for unaligned reads")
    p.add_argument("--version", action="store_true")
    p.add_argument("-Q", "--quals", default=None,
                   help="QV files (colorspace-era; ignored, like the "
                        "reference since colorspace removal in 1.3.0)")
    p.add_argument("--Q1", default=None, help=argparse.SUPPRESS)
    p.add_argument("--Q2", default=None, help=argparse.SUPPRESS)
    p.add_argument("--usage", action="help", help=argparse.SUPPRESS)
    # long aliases (getopt table, ebwt_search.cpp:332-428)
    p.add_argument("--khits", dest="khits", type=int)
    p.add_argument("--mhits", dest="mhits", type=int)
    p.add_argument("--sam-noSQ", dest="sam_nosq", action="store_true")
    p.add_argument("--sam-no-qname-trunc", dest="no_qname_trunc",
                   action="store_true")
    p.add_argument("--hadoopout", action="store_true",
                   help="Hadoop streaming counters on stderr "
                        "(hit.h:338-344)")
    # legacy/debug/perf-tuning flags accepted for compatibility; they
    # select internal strategies that have no analog (or are always-on)
    # in the batched TPU architecture
    p.add_argument("--pev2", action="store_true",
                   help="use PairedBWAlignerV2 for paired-end")
    for flag in ("--filepar", "--noreconcile", "--strandfix",
                 "--better", "--oldbest", "--stateful", "--phased",
                 "--reportopps", "--sanity", "--startverbose",
                 "--chunkverbose", "--pause"):
        p.add_argument(flag, action="store_true", help=argparse.SUPPRESS)
    for flag, dv in (("--cachelim", 0), ("--cachesz", 0),
                     ("--chunksz", 0), ("--isarate", -1),
                     ("--mixthresh", 4), ("--thread-ceiling", 0)):
        p.add_argument(flag, type=int, default=dv,
                       help=argparse.SUPPRESS)
    p.add_argument("--reportse", action="store_true",
                   help=argparse.SUPPRESS)
    p.add_argument("--thread-piddir", default=None,
                   help=argparse.SUPPRESS)
    p.add_argument("--orig", default=None, help=argparse.SUPPRESS)
    p.add_argument("--range", action="store_true",
                   help=argparse.SUPPRESS)
    p.add_argument("--wrapper", default=None, help=argparse.SUPPRESS)
    return p


_IDX_CACHE: "OrderedDict" = None
_GFM_CACHE: "OrderedDict" = None


def _index_key(base: str):
    from ..index.ebwt_io import index_paths
    f1, _f2, _ = index_paths(base)
    st = os.stat(f1)
    return (base, st.st_mtime_ns, st.st_size)


def read_ebwt_cached(base: str):
    """Process-level LRU of parsed indexes: repeated in-process CLI
    invocations (tests, library use, the -A argfile batch mode) skip
    the ~1 s parse + side unpack.  Mutating callers must copy first."""
    global _IDX_CACHE
    from collections import OrderedDict
    if _IDX_CACHE is None:
        _IDX_CACHE = OrderedDict()
    key = _index_key(base)
    if key in _IDX_CACHE:
        _IDX_CACHE.move_to_end(key)
        return _IDX_CACHE[key]
    idx = read_ebwt(base)
    _IDX_CACHE[key] = idx
    while len(_IDX_CACHE) > 4:
        _IDX_CACHE.popitem(last=False)
    return idx


def golden_cached(base: str, idx):
    """LRU of GoldenFM oracles (dense host tables take seconds to
    build).  Keyed by index file identity + effective offrate."""
    global _GFM_CACHE
    from collections import OrderedDict
    from ..align.golden import GoldenFM
    if _GFM_CACHE is None:
        _GFM_CACHE = OrderedDict()
    nsamp = len(idx.offs) if idx.offs is not None else 0
    key = _index_key(base) + (idx.off_rate, nsamp)
    if key in _GFM_CACHE:
        _GFM_CACHE.move_to_end(key)
        return _GFM_CACHE[key]
    g = GoldenFM(idx)
    _GFM_CACHE[key] = g
    while len(_GFM_CACHE) > 4:
        _GFM_CACHE.popitem(last=False)
    return g


def adjust_ebwt_base(base: str) -> str:
    """Locate the index like adjustEbwtBase (ebwt.h:4397): try the
    given path, then $BOWTIE_INDEXES/<base>."""
    if os.path.exists(base + ".1.ebwt"):
        return base
    env = os.environ.get("BOWTIE_INDEXES")
    if env:
        cand = os.path.join(env, base)
        if os.path.exists(cand + ".1.ebwt"):
            return cand
    return base


def _enable_compile_cache():
    """Persistent XLA compilation cache: CLI invocations are separate
    processes, and the DFS-engine compiles are expensive (~30-60 s per
    batch/length/policy shape)."""
    import jax
    # honor JAX_PLATFORMS even when a site hook pre-selected a remote
    # backend through jax.config (env alone is ignored after that)
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
    cache = os.environ.get("BOWTIE_TPU_CACHE",
                           os.path.expanduser("~/.cache/bowtie-tpu-xla"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass


def main(argv=None) -> int:
    if "--version" in (argv if argv is not None else sys.argv[1:]):
        import platform
        print("bowtie-tpu version 1.3.1-tpu")
        print("64-bit")
        print(f"Python {platform.python_version()}")
        return 0
    args = build_parser().parse_args(argv)

    # index via -x or positional (ebwt_search.cpp:3358-3393: the
    # positional form is accepted with a deprecation warning; with -x
    # the positionals shift left to [query, output])
    if args.index_opt is not None:
        args.hits = args.reads
        args.reads = args.ebwt_base
        args.ebwt_base = args.index_opt
    else:
        if args.ebwt_base is None:
            print("No index, query, or output file specified!",
                  file=sys.stderr)
            return 1
        print("Setting the index via positional argument will be "
              "deprecated in a future release. Please use -x option "
              "instead.", file=sys.stderr)

    # arg validation (parseOptions, ebwt_search.cpp:614+)
    if args.mismatches >= 0 and not 0 <= args.mismatches <= 3:
        print("-v arg must be at least 0 and at most 3", file=sys.stderr)
        return 1
    if not 0 <= args.seedmms <= 3:
        print("-n arg must be at least 0 and at most 3", file=sys.stderr)
        return 1
    if args.strata and not args.best:
        print("--strata must be combined with --best", file=sys.stderr)
        return 1
    if args.strata and not (args.all or args.mhits is not None or
                            args.khits > 1 or
                            args.sample_mhits is not None):
        print("--strata has no effect unless combined with -m, -a, or "
              "-k N where N > 1", file=sys.stderr)
        return 1

    fmt = "fastq"
    if args.fasta:
        fmt = "fasta"
    if args.raw:
        fmt = "raw"
    if args.cmdline:
        fmt = "cmdline"
    cont = None
    if args.fasta_cont:
        k, i = args.fasta_cont.split(",")
        fmt, cont = "fasta_cont", (int(k), int(i))

    t0 = time.time()
    args.ebwt_base = adjust_ebwt_base(args.ebwt_base)
    idx = read_ebwt_cached(args.ebwt_base)
    if args.offrate >= 0:
        # re-thin the SA sample at load (Ebwt ctor offRate override,
        # ebwt.h:438-441): keep every 2^(new-old)'th entry
        if args.offrate < idx.off_rate:
            print(f"Warning: -o/--offrate {args.offrate} is less than "
                  f"the index's offrate ({idx.off_rate}); ignoring",
                  file=sys.stderr)
        else:
            import copy
            step = 1 << (args.offrate - idx.off_rate)
            idx = copy.copy(idx)            # don't mutate the cache
            idx.offs = idx.offs[::step].copy()
            idx.off_rate = args.offrate
    if args.time:
        print(f"Time loading ebwt: {time.time()-t0:.2f}s", file=sys.stderr)

    khits = args.khits
    mhits = args.mhits if args.mhits is not None else (
        args.sample_mhits if args.sample_mhits is not None else INF)
    if args.all:
        khits = INF
    policy = KPolicy(khits=khits, mhits=mhits,
                     sample_max=args.sample_mhits is not None)

    paired = bool(args.mates1 or args.tabbed or args.interleaved)
    host_engine = False        # pure-Python engine -> -p fork pool
    if paired:
        host_engine = True
        from ..align.best_factories import make_paired_best_aligner
        from ..index.ebwt_io import read_bitpair_reference, unpack_reference
        idx_bw = read_ebwt_cached(args.ebwt_base + ".rev")
        g_fw = golden_cached(args.ebwt_base, idx)
        g_bw = golden_cached(args.ebwt_base + ".rev", idx_bw)
        recs, packed = read_bitpair_reference(args.ebwt_base)
        refs = unpack_reference(recs, packed, plen=idx.plen)
        m1fw, m2fw = True, False          # --fr default
        if args.ff:
            m1fw, m2fw = True, True
        elif args.rf:
            m1fw, m2fw = False, True
        mode = "n" if args.mismatches < 0 else "v"
        if args.best or args.pev2:
            # PairedBWAlignerV2 (the reference's engine for --best PE
            # and --pev2).  NOTE: --reportse alone does NOT select V2 —
            # the reference then runs V1, which ignores its SE sinks,
            # making the flag a no-op (aligner_0mm.h:309-321)
            kw_v2 = dict(
                mode=mode,
                v=max(args.mismatches, 0), seed_mms=args.seedmms,
                seed_len=args.seedlen, qual_cutoff=args.maqerr,
                fw1=m1fw, fw2=m2fw, min_insert=args.minins,
                max_insert=args.maxins, pairtries=args.pairtries,
                nofw=args.nofw, norc=args.norc,
                maq=not args.nomaqround, better=args.best,
                report_se=args.reportse, best_sink=args.strata,
                global_seed=args.seed,
                maxbts=args.maxbts if args.maxbts is not None else 800)
            aligner = None
            if (_device_pe_enabled(args) and not args.reportse
                    and not os.environ.get("BOWTIE_TPU_HOST_ENGINE")):
                # device path: the merged V2 driver records its stream
                # on the lockstep machine; host replays the control
                # loop byte-identically (align/pev2_device.py)
                _enable_compile_cache()
                from ..align.pev2_device import DevicePairedV2Aligner
                try:
                    aligner = DevicePairedV2Aligner(
                        idx, idx_bw, refs, policy, **kw_v2)
                    host_engine = False
                except ValueError:
                    aligner = None     # row-range limit: host engine
            if aligner is None:
                from ..align.best_factories import \
                    make_paired_best_aligner_v2
                aligner = make_paired_best_aligner_v2(
                    g_fw, g_bw, refs, policy, **kw_v2)
        elif (_device_pe_enabled(args)
              and idx.length < (1 << 31)
              and not (os.environ.get("BOWTIE_TPU_HOST_ENGINE")
                       or args.nofw or args.norc)):
            # PairedBWAlignerV1 with device-recorded anchor streams:
            # the four per-(mate,strand) best-first drivers run as
            # lanes of the lockstep machine; the interleave/rescue
            # replay on host is byte-identical (align/pe_device.py).
            # Default on accelerators: ~70% of the host engine's time
            # is advance_branch (the anchor search the recorder
            # replaces); opt out with BOWTIE_TPU_DEVICE_PE=0.
            _enable_compile_cache()
            from ..align.pe_device import DevicePairedBestAligner
            host_engine = False
            aligner = DevicePairedBestAligner(
                idx, idx_bw, refs, policy, mode=mode,
                v=max(args.mismatches, 0), seed_mms=args.seedmms,
                seed_len=args.seedlen, qual_cutoff=args.maqerr,
                fw1=m1fw, fw2=m2fw, min_insert=args.minins,
                max_insert=args.maxins, pairtries=args.pairtries,
                sym_ceiling=policy.max,
                maq=not args.nomaqround, better=args.best,
                global_seed=args.seed,
                maxbts=args.maxbts if args.maxbts is not None else 800,
                threads=args.threads)
        else:
            aligner = make_paired_best_aligner(
                g_fw, g_bw, refs, policy, mode=mode,
                v=max(args.mismatches, 0), seed_mms=args.seedmms,
                seed_len=args.seedlen, qual_cutoff=args.maqerr,
                fw1=m1fw, fw2=m2fw, min_insert=args.minins,
                max_insert=args.maxins, pairtries=args.pairtries,
                sym_ceiling=policy.max, nofw=args.nofw, norc=args.norc,
                maq=not args.nomaqround, better=args.best,
                global_seed=args.seed,
                maxbts=args.maxbts if args.maxbts is not None else 800)
    else:
        aligner, host_engine = _build_se_aligner(args, idx, policy)

    if args.sanity and not host_engine:
        # --sanity: the in-run oracle (analog of the reference's
        # --sanity/--orig brute-force assertions, ebwt_search.cpp:
        # 1893-1937): every batch ALSO runs the host oracle engine and
        # any device/host divergence aborts with a diagnostic.
        twin = _build_sanity_twin(args, idx, policy, paired)
        if twin is not None:
            aligner = SanityAligner(aligner, twin)

    if host_engine and args.threads > 1:
        # -p for the host engines: fork pool over read-batch slices,
        # byte-identical output (align/parallel_host.py)
        from ..align.parallel_host import ParallelHostAligner
        aligner = ParallelHostAligner(aligner, args.threads)

    return _run(args, argv, idx, policy, aligner, paired, fmt, cont)


class SanityAligner:
    """--sanity cross-check wrapper: align each batch on the device
    engine AND the host oracle engine, assert result-for-result
    equality, return the device results.  The in-binary analog of
    ASSERT_NO_HITS_FW/RC + checkOrigs (ebwt_search.cpp:1893-1937;
    ebwt.h:2787) — the device kernels are the subject, the pure-host
    re-expression (itself byte-verified against the reference binary)
    is the oracle."""

    def __init__(self, dev, host):
        self._dev, self._host = dev, host

    def __getattr__(self, k):
        return getattr(self._dev, k)

    @staticmethod
    def _key(r):
        return ([(h.fw, h.tidx, h.toff, h.oms, h.stratum, h.cost,
                  tuple(h.mms), getattr(h, "mate", 0)) for h in r.hits],
                r.maxed, r.nvalid)

    def align_batch(self, items):
        dev = self._dev.align_batch(items)
        host = self._host.align_batch(items)
        for it, dr, hr in zip(items, dev, host):
            if self._key(dr) != self._key(hr):
                name = (it[0].name if isinstance(it, tuple)
                        else it.name)
                raise AssertionError(
                    f"--sanity: device/host divergence on read "
                    f"{name!r}: device={self._key(dr)} "
                    f"host={self._key(hr)}")
        return dev


def _build_sanity_twin(args, idx, policy, paired):
    """Build the host-oracle twin of the current device engine by
    re-running the dispatch with BOWTIE_TPU_HOST_ENGINE forced."""
    prev = os.environ.get("BOWTIE_TPU_HOST_ENGINE")
    prev_pe = os.environ.get("BOWTIE_TPU_DEVICE_PE")
    os.environ["BOWTIE_TPU_HOST_ENGINE"] = "1"
    os.environ["BOWTIE_TPU_DEVICE_PE"] = "0"
    try:
        if paired:
            return None     # PE: device engine already host-replays
        twin, _ = _build_se_aligner(args, idx, policy)
        return twin
    finally:
        if prev is None:
            os.environ.pop("BOWTIE_TPU_HOST_ENGINE", None)
        else:
            os.environ["BOWTIE_TPU_HOST_ENGINE"] = prev
        if prev_pe is None:
            os.environ.pop("BOWTIE_TPU_DEVICE_PE", None)
        else:
            os.environ["BOWTIE_TPU_DEVICE_PE"] = prev_pe


def _device_pe_enabled(args) -> bool:
    """Device-recorded paired-end is the default on accelerators
    (BOWTIE_TPU_DEVICE_PE=0 opts out, =1 forces on even on CPU)."""
    v = os.environ.get("BOWTIE_TPU_DEVICE_PE")
    if v is not None:
        return v not in ("", "0")
    import jax
    return jax.default_backend() != "cpu"


def _build_se_aligner(args, idx, policy):
    """Single-end aligner for the mode flags; returns
    (aligner, host_engine).  Mirrors the reference's per-mode dispatch
    (driver(), ebwt_search.cpp:2955-3295)."""
    host_engine = False
    if args.mismatches >= 0 and (
            args.best or args.strata or args.sample_mhits is not None
            or args.mismatches == 3):
        # best-first engine (bowtie forces it for --best, -M, --strata
        # and -v 3; ebwt_search.cpp:852,877) — device lockstep machine
        # by default, host engine on request or per-read overflow
        idx_bw = read_ebwt_cached(args.ebwt_base + ".rev")
        if os.environ.get("BOWTIE_TPU_HOST_ENGINE"):
            host_engine = True
            from ..align.best_factories import make_best_aligner
            g_fw = golden_cached(args.ebwt_base, idx)
            g_bw = golden_cached(args.ebwt_base + ".rev", idx_bw)
            aligner = make_best_aligner(
                g_fw, g_bw, args.mismatches, policy, strata=args.strata,
                all_hits=args.all, nofw=args.nofw, norc=args.norc,
                maq=not args.nomaqround, global_seed=args.seed,
                maxbts=args.maxbts if args.maxbts is not None else 800)
        else:
            _enable_compile_cache()
            from ..align.best_device import DeviceBestAligner
            try:
                aligner = DeviceBestAligner(
                    idx, idx_bw, policy, v=args.mismatches,
                    strata=args.strata, all_hits=args.all,
                    nofw=args.nofw, norc=args.norc,
                    maq=not args.nomaqround, global_seed=args.seed)
            except ValueError:       # row-range limit: host engine
                host_engine = True
                from ..align.best_factories import make_best_aligner
                g_fw = golden_cached(args.ebwt_base, idx)
                g_bw = golden_cached(args.ebwt_base + ".rev", idx_bw)
                aligner = make_best_aligner(
                    g_fw, g_bw, args.mismatches, policy,
                    strata=args.strata, all_hits=args.all,
                    nofw=args.nofw, norc=args.norc,
                    maq=not args.nomaqround, global_seed=args.seed,
                    maxbts=args.maxbts if args.maxbts is not None
                    else 800)
    elif args.mismatches == 0:
        _enable_compile_cache()
        from ..align.pipeline import ExactAligner
        from ..index.arrays import from_ebwt
        aligner = ExactAligner(from_ebwt(idx), idx, policy,
                               nofw=args.nofw,
                               norc=args.norc, global_seed=args.seed)
    elif args.mismatches in (1, 2, 3):
        idx_bw = read_ebwt_cached(args.ebwt_base + ".rev")
        if os.environ.get("BOWTIE_TPU_HOST_ENGINE"):
            host_engine = True
            from ..align.drivers import OracleAligner
            g_fw = golden_cached(args.ebwt_base, idx)
            g_bw = golden_cached(args.ebwt_base + ".rev", idx_bw)
            aligner = OracleAligner(g_fw, g_bw, policy,
                                    v=args.mismatches,
                                    nofw=args.nofw, norc=args.norc,
                                    global_seed=args.seed)
        else:
            _enable_compile_cache()
            from ..align.dfs_device import DeviceDFSAligner
            aligner = DeviceDFSAligner(idx, idx_bw, policy,
                                       v=args.mismatches,
                                       nofw=args.nofw, norc=args.norc,
                                       global_seed=args.seed)
    elif args.best or args.strata or args.sample_mhits is not None:
        # seeded -n with the best-first engine: device lockstep machine
        # by default, host engine on request or per-read overflow
        idx_bw = read_ebwt_cached(args.ebwt_base + ".rev")
        if os.environ.get("BOWTIE_TPU_HOST_ENGINE"):
            host_engine = True
            from ..align.best_factories import make_seeded_best_aligner
            g_fw = golden_cached(args.ebwt_base, idx)
            g_bw = golden_cached(args.ebwt_base + ".rev", idx_bw)
            aligner = make_seeded_best_aligner(
                g_fw, g_bw, args.seedmms, args.seedlen, args.maqerr,
                policy, strata=args.strata, all_hits=args.all,
                nofw=args.nofw, norc=args.norc,
                maq=not args.nomaqround, global_seed=args.seed,
                maxbts=args.maxbts if args.maxbts is not None else 800)
        else:
            _enable_compile_cache()
            from ..align.best_device import DeviceBestAligner
            try:
                aligner = DeviceBestAligner(
                    idx, idx_bw, policy, mode="n",
                    seed_mms=args.seedmms,
                    seed_len=args.seedlen, qual_cutoff=args.maqerr,
                    strata=args.strata, all_hits=args.all,
                    nofw=args.nofw, norc=args.norc,
                    maq=not args.nomaqround, global_seed=args.seed,
                    maxbts=args.maxbts if args.maxbts is not None
                    else 800)
            except ValueError:       # row-range limit: host engine
                host_engine = True
                from ..align.best_factories import \
                    make_seeded_best_aligner
                g_fw = golden_cached(args.ebwt_base, idx)
                g_bw = golden_cached(args.ebwt_base + ".rev", idx_bw)
                aligner = make_seeded_best_aligner(
                    g_fw, g_bw, args.seedmms, args.seedlen,
                    args.maqerr, policy, strata=args.strata,
                    all_hits=args.all, nofw=args.nofw, norc=args.norc,
                    maq=not args.nomaqround, global_seed=args.seed,
                    maxbts=args.maxbts if args.maxbts is not None
                    else 800)
    else:
        # default seeded Maq-like -n mode
        idx_bw = read_ebwt_cached(args.ebwt_base + ".rev")
        mb = args.maxbts if args.maxbts is not None else 125
        if os.environ.get("BOWTIE_TPU_HOST_ENGINE"):
            host_engine = True
            from ..align.drivers import OracleAligner
            g_fw = golden_cached(args.ebwt_base, idx)
            g_bw = golden_cached(args.ebwt_base + ".rev", idx_bw)
            aligner = OracleAligner(
                g_fw, g_bw, policy, mode="n",
                nofw=args.nofw, norc=args.norc, global_seed=args.seed,
                seed_mms=args.seedmms, seed_len=args.seedlen,
                qual_thresh=args.maqerr, maxbts=mb,
                maq_round=not args.nomaqround)
        else:
            _enable_compile_cache()
            from ..align.n_device import DeviceNAligner
            aligner = DeviceNAligner(
                idx, idx_bw, policy, seed_mms=args.seedmms,
                seed_len=args.seedlen, qual_thresh=args.maqerr,
                maxbts=mb, maq_round=not args.nomaqround,
                nofw=args.nofw, norc=args.norc, global_seed=args.seed)
    return aligner, host_engine


def _build_stateful_se_aligner(args, idx, policy):
    """SE aligner for solo records inside a paired run.  ANY paired
    input forces the stateful path for the whole run
    (ebwt_search.cpp:3002 `if(paired) stateful = true`), so --12 solo
    reads go through UnpairedAlignerV2-style engines with an NGood
    sink — NOT the phased greedy workers — and their random draws
    (e.g. report-row choice) follow that engine's order."""
    if (args.best or args.strata or args.sample_mhits is not None
            or args.mismatches == 3):
        return _build_se_aligner(args, idx, policy)[0]  # already stateful
    mb = args.maxbts if args.maxbts is not None else 800
    idx_bw = read_ebwt_cached(args.ebwt_base + ".rev")
    g_fw = golden_cached(args.ebwt_base, idx)
    g_bw = golden_cached(args.ebwt_base + ".rev", idx_bw)
    if args.mismatches >= 0:
        from ..align.best_factories import make_best_aligner
        return make_best_aligner(
            g_fw, g_bw, args.mismatches, policy, strata=False,
            all_hits=args.all, nofw=args.nofw, norc=args.norc,
            maq=not args.nomaqround, global_seed=args.seed, maxbts=mb)
    from ..align.best_factories import make_seeded_best_aligner
    return make_seeded_best_aligner(
        g_fw, g_bw, args.seedmms, args.seedlen, args.maqerr, policy,
        strata=False, all_hits=args.all, nofw=args.nofw,
        norc=args.norc, maq=not args.nomaqround,
        global_seed=args.seed, maxbts=mb)


def _run(args, argv, idx, policy, aligner, paired, fmt, cont):
    dumps_active = bool(args.un or args.al or args.maxfile)
    qual_kw = dict(trim5=args.trim5, trim3=args.trim3,
                   solexa=args.solexa_quals,
                   phred64=args.phred64_quals or args.solexa13,
                   integer_quals=args.integer_quals,
                   keep_orig=dumps_active)
    if paired:
        # hits positional shifts when reads positional is absent
        if args.reads and args.hits is None:
            args.hits = args.reads
        from ..io.readers import PairedReadSource
        pe_kw = dict(upto=args.qupto, skip=args.skip, **qual_kw)
        if args.tabbed:
            src = PairedReadSource(args.tabbed.split(","), None,
                                   tabbed=True, **pe_kw)
        elif args.interleaved:
            src = PairedReadSource(args.interleaved.split(","), None,
                                   interleaved=True, **pe_kw)
        else:
            src = PairedReadSource(args.mates1.split(","),
                                   args.mates2.split(","), fmt=fmt,
                                   **pe_kw)
    else:
        reads_arg = args.reads
        src = ReadSource(
            paths=None if fmt == "cmdline" else reads_arg.split(","),
            fmt=fmt, upto=args.qupto, skip=args.skip,
            cmdline_seqs=reads_arg.split(",") if fmt == "cmdline" else None,
            cont_params=cont, **qual_kw)

    out = open(args.hits, "wb") if args.hits else sys.stdout.buffer
    refnames = ([str(i) for i in range(idx.npat)] if args.refidx
                else idx.refnames)
    if args.sam:
        # --refidx SAM keeps real names in @SQ but indices in records
        writer = SamWriter(out, idx.refnames, idx.plen.tolist(),
                           mapq=args.mapq, full_ref=args.fullref,
                           no_qname_trunc=args.no_qname_trunc,
                           sam_nohead=args.sam_nohead,
                           sam_nosq=args.sam_nosq,
                           cmdline=" ".join(argv or sys.argv[1:]),
                           rgline=("\t".join(args.sam_RG)
                                   if args.sam_RG else None),
                           refidx=args.refidx)
    else:
        suppress = (set(int(x) for x in args.suppress.split(","))
                    if args.suppress else set())
        writer = VerboseWriter(out, refnames, off_base=args.offbase,
                               full_ref=args.fullref, suppress=suppress,
                               cost=args.cost, show_seed=args.showseed,
                               partition=args.partition,
                               global_seed=args.seed)

    one_pair_file = bool(args.tabbed)    # --12: whole pair in one record
    un_f = _DumpStream(args.un, one_pair_file, fmt) if args.un else None
    al_f = _DumpStream(args.al, one_pair_file, fmt) if args.al else None
    max_f = (_DumpStream(args.maxfile, one_pair_file, fmt)
             if args.maxfile else None)
    if max_f is None:
        # maxed reads dump to --un when --max isn't given
        # (HitSink::dumpMaxed falls through to dumpUnal, hit.h:458-460)
        max_f = un_f

    from ..align.policy import AlignStats
    stats = AlignStats()
    metrics = None
    if args.stats:
        from ..utils.metrics import AlignerMetrics
        metrics = AlignerMetrics()
    args._metrics = metrics
    batch_size = args.reads_per_batch or args.batch_size
    t0 = time.time()
    from concurrent.futures import ThreadPoolExecutor

    def pipelined(batches, align):
        """Depth-1 pipeline: batch k+1 aligns (device) while batch k's
        results are formatted and written (host) — the batched analog
        of the reference's overlapped worker threads."""
        with ThreadPoolExecutor(1) as ex:
            pending = None
            for batch in batches:
                fut = ex.submit(align, batch)
                if pending is not None:
                    yield pending[0], pending[1].result()
                pending = (batch, fut)
            if pending is not None:
                yield pending[0], pending[1].result()

    def emit_pe(r1, r2, res):
        stats.processed += 1
        if res.maxed and res.sampled:
            # -M: sample one pair from the best stratum
            # (VerboseHitSink::reportMaxed paired, hit.cpp:28-53;
            # sam.cpp:273-298)
            stats.maxed += 1
            stats.aligned += 1
            stats.reported_pairs += 1
            for h in res.hits:
                if args.sam:
                    writer.hit(h, xms=res.nbuffered + 1, mapq=0)
                else:
                    h.oms = res.nbuffered
                    writer.hit(h)
            if max_f:
                max_f.write_pe(r1, r2)
        elif res.maxed:
            # -m exceeded without -M: counted, but NO record is
            # emitted (HitSink::reportMaxed is counter-only,
            # hit.h:494-500; only -M sampling reports)
            stats.maxed += 1
            if max_f:
                max_f.write_pe(r1, r2)
            for sehits in res.se_hits:
                stats.reported += len(sehits)
                for h in sehits:
                    writer.hit(h, xms=len(sehits)) \
                        if args.sam else writer.hit(h)
        elif not res.hits:
            if args.sam and not args.no_unal:
                writer.unaligned(r1, nhits=0, paired=True,
                                 second=False)
                writer.unaligned(r2, nhits=0, paired=True,
                                 second=True)
            if (args.best or args.pev2) and args.reportse:
                # V2 + --reportse: a pair with no paired alignment is
                # finished as TWO separate reads through the SE sinks,
                # so each mate tallies individually in the summary
                # (observed binary behavior: 10 pairs with 2 unpaired
                # -> "# reads processed: 12")
                stats.processed += 1
                nal = sum(1 for s in res.se_hits if s)
                stats.aligned += nal
                stats.failed += 2 - nal
                for sehits in res.se_hits:
                    stats.reported += len(sehits)
                    for h in sehits:
                        writer.hit(h, xms=len(sehits)) \
                            if args.sam else writer.hit(h)
                if not any(res.se_hits) and un_f:
                    un_f.write_pe(r1, r2)
            elif any(res.se_hits):
                stats.aligned += 1
                for sehits in res.se_hits:
                    stats.reported += len(sehits)
                    for h in sehits:
                        writer.hit(h, xms=len(sehits)) \
                            if args.sam else writer.hit(h)
            else:
                stats.failed += 1
                if un_f:
                    un_f.write_pe(r1, r2)
        else:
            stats.aligned += 1
            stats.reported_pairs += len(res.hits) // 2
            xms = len(res.hits) // 2
            for h in res.hits:
                if args.sam:
                    writer.hit(h, xms=xms)
                else:
                    writer.hit(h)
            if al_f:
                al_f.write_pe(r1, r2)

    def emit_se(read, res):
        stats.processed += 1
        if metrics is not None:
            metrics.next_read(read.codes_fw)
            metrics.record_result(res)
        if res.maxed and res.sampled:
            stats.maxed += 1
            stats.aligned += 1
            stats.reported += 1
            h = res.hits[0]
            if args.sam:
                writer.hit(h, xms=res.nbuffered + 1, mapq=0)
            else:
                h.oms = res.nbuffered
                writer.hit(h)
            if max_f:
                max_f.write_se(read)
        elif res.maxed:
            # no SAM record for -m-suppressed reads (see above)
            stats.maxed += 1
            if max_f:
                max_f.write_se(read)
        elif not res.hits:
            stats.failed += 1
            if args.sam and not args.no_unal:
                writer.unaligned(read, nhits=0)
            if un_f:
                un_f.write_se(read)
        else:
            stats.aligned += 1
            stats.reported += len(res.hits)
            xms = len(res.hits)
            for h in res.hits:
                if args.sam:
                    writer.hit(h, xms=xms)
                else:
                    writer.hit(h)
            if al_f:
                al_f.write_se(read)

    if paired:
        # --12 tabbed files may mix paired (5-col) and unpaired (3-col)
        # records; solo reads route to an SE aligner with the same
        # policy (the reference's worker does this per read via
        # GET_READ's bufb-empty check, ebwt_search.cpp:934)
        se_state = [None]

        def align_mixed(batch):
            res = [None] * len(batch)
            pair_i = [i for i, (_a, b) in enumerate(batch)
                      if b is not None]
            solo_i = [i for i, (_a, b) in enumerate(batch) if b is None]
            if pair_i:
                for i, r in zip(pair_i, aligner.align_batch(
                        [batch[i] for i in pair_i])):
                    res[i] = r
            if solo_i:
                if se_state[0] is None:
                    se_state[0] = _build_stateful_se_aligner(
                        args, idx, policy)
                for i, r in zip(solo_i, se_state[0].align_batch(
                        [batch[i][0] for i in solo_i])):
                    res[i] = r
            return res

        for batch, results in pipelined(src.batches(batch_size),
                                        align_mixed):
            for (r1, r2), res in zip(batch, results):
                if r2 is None:
                    emit_se(r1, res)
                else:
                    emit_pe(r1, r2, res)
    else:
        for batch, results in pipelined(src.batches(batch_size),
                                        aligner.align_batch):
            for read, res in zip(batch, results):
                emit_se(read, res)
    args._fallbacks = getattr(aligner, "fallbacks", None)
    return _finish(args, stats, t0, out, un_f, al_f, max_f)


def _finish(args, stats, t0, out, un_f, al_f, max_f) -> int:
    if getattr(args, "_metrics", None) is not None:
        args._metrics.print(fallbacks=getattr(args, "_fallbacks", None))
    if args.time:
        dt = time.time() - t0
        print(f"Time searching: {dt:.2f}s "
              f"({stats.processed/max(dt,1e-9):.0f} reads/s)",
              file=sys.stderr)

    if True:
        # Summary prints even under --quiet: the reference's HitSink
        # quiet_ flag (hit.h:279) is never wired to ARG_QUIET, so the
        # actual binary always emits the end-of-run stats; --quiet
        # only silences other informational messages.
        # HitSink::finish (hit.h:270-346): without -M, maxed reads
        # count toward "at least one alignment"; with -M the sampled
        # read was tallied as aligned already and the maxed line reads
        # "sampled" instead of "suppressed"
        sample = args.sample_mhits is not None
        aligned_disp = stats.aligned + (0 if sample else stats.maxed)
        tot = max(1, stats.processed)
        print(f"# reads processed: {stats.processed}", file=sys.stderr)
        print(f"# reads with at least one alignment: {aligned_disp} "
              f"({100.0*aligned_disp/tot:.2f}%)",
              file=sys.stderr)
        print(f"# reads that failed to align: {stats.failed} "
              f"({100.0*stats.failed/tot:.2f}%)",
              file=sys.stderr)
        if stats.maxed:
            word = ("sampled due to -M" if sample
                    else "suppressed due to -m")
            print(f"# reads with alignments {word}: "
                  f"{stats.maxed} "
                  f"({100.0*stats.maxed/tot:.2f}%)",
                  file=sys.stderr)
        # four-case summary wording (HitSink::finish, hit.h:321-337)
        if stats.reported == 0 and stats.reported_pairs == 0:
            print("No alignments", file=sys.stderr)
        elif stats.reported_pairs > 0 and stats.reported == 0:
            print(f"Reported {stats.reported_pairs} paired-end "
                  f"alignments", file=sys.stderr)
        elif stats.reported > 0 and stats.reported_pairs == 0:
            print(f"Reported {stats.reported} alignments",
                  file=sys.stderr)
        else:
            print(f"Reported {stats.reported_pairs} paired-end "
                  f"alignments and {stats.reported} singleton "
                  f"alignments", file=sys.stderr)
    if getattr(args, "hadoopout", False):
        # Hadoop streaming counters (hit.h:338-344)
        print(f"reporter:counter:Bowtie,Reads with reported alignments,"
              f"{stats.aligned}", file=sys.stderr)
        print(f"reporter:counter:Bowtie,Reads with no alignments,"
              f"{stats.failed}", file=sys.stderr)
        print(f"reporter:counter:Bowtie,Reads exceeding -m limit,"
              f"{stats.maxed}", file=sys.stderr)
        # numReportedPaired counts individual mates (hit.h:343)
        print(f"reporter:counter:Bowtie,Unpaired alignments reported,"
              f"{stats.reported}", file=sys.stderr)
        print(f"reporter:counter:Bowtie,Paired alignments reported,"
              f"{2 * stats.reported_pairs}", file=sys.stderr)

    for f in {id(x): x for x in (un_f, al_f, max_f) if x}.values():
        f.close()
    if args.hits:
        out.close()
    return 0


class _DumpStream:
    """Lazy same-format read dump (--al/--un/--max).

    Mirrors HitSink's dump machinery (hit.h:385-490): files are opened
    on the FIRST dumped read (no file is created otherwise); paired
    reads split into <base>_1/<base>_2 with the suffix inserted before
    the last '.' (openOf, hit.h:629-649) — except when the pair came
    from a single file (--12 tabbed), where the whole raw record rides
    on mate 1.  What's written is the raw input record (readOrigBuf),
    not a re-synthesized one."""

    def __init__(self, base: str, one_pair_file: bool, fmt: str):
        self.base = base
        self.one = one_pair_file
        self.fmt = fmt
        self.f = self.f1 = self.f2 = None

    def _mate_name(self, mate: int) -> str:
        dot = self.base.rfind(".")
        if dot == -1:
            return f"{self.base}_{mate}"
        return f"{self.base[:dot]}_{mate}{self.base[dot:]}"

    def _rec(self, read) -> bytes:
        if read.orig is not None:
            return read.orig
        if self.fmt == "fasta":
            return b">" + read.name + b"\n" + read.seq + b"\n"
        return (b"@" + read.name + b"\n" + read.seq + b"\n+\n" +
                read.qual + b"\n")

    def write_se(self, read):
        if self.f is None:
            self.f = open(self.base, "wb")
        self.f.write(self._rec(read))

    def write_pe(self, r1, r2):
        if self.one:
            self.write_se(r1)      # raw line holds both mates
            return
        if self.f1 is None:
            self.f1 = open(self._mate_name(1), "wb")
            self.f2 = open(self._mate_name(2), "wb")
        self.f1.write(self._rec(r1))
        self.f2.write(self._rec(r2))

    def close(self):
        for f in (self.f, self.f1, self.f2):
            if f:
                f.close()


if __name__ == "__main__":
    sys.exit(main())
