"""Randomized end-to-end parity vs the ACTUAL reference binary.

The port of pillar 2 of the reference's test strategy
(scripts/test/random_bowtie_tests.pl): random references (with N/gap
runs), random read sets (sampled substrings with mutations, plus pure
garbage), and random policies; every case must produce byte-identical
output from `bowtie_tpu.cli.align` and the compiled bowtie 1.3.1
binary on an index built by OUR builder (which is itself byte-compared
against the reference builder in test_build.py).

Skipped when the oracle binary isn't present (build it with
scripts/make_golden.sh).
"""
import os
import subprocess

import numpy as np
import pytest

# seed counts: defaults keep the local/push-gate runtime modest; the
# nightly CI raises them via env (random_tests.yml), matching the
# reference's make random-test sweep scale
N_SE = int(os.environ.get("BOWTIE_TPU_RANDOM_SE_SEEDS", 12))
N_PE = int(os.environ.get("BOWTIE_TPU_RANDOM_PE_SEEDS", 8))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE = os.path.join(REPO, ".oracle", "bowtie-align-s")

pytestmark = pytest.mark.skipif(not os.path.exists(ORACLE),
                                reason="oracle binary not built")

CHARS = np.array(list("ACGT"))
COMP = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}


def _random_genome(rng, tmp):
    """Random multi-fragment reference with N runs (randGap analog,
    random_bowtie_tests.pl:137-150)."""
    path = os.path.join(tmp, "ref.fa")
    with open(path, "w") as f:
        for ri in range(int(rng.integers(1, 4))):
            n = int(rng.integers(300, 3000))
            s = list(CHARS[rng.integers(0, 4, n)])
            for _ in range(int(rng.integers(0, 4))):   # N runs
                p = int(rng.integers(0, n))
                ln = int(rng.integers(1, 12))
                for j in range(p, min(n, p + ln)):
                    s[j] = "N"
            f.write(f">ref{ri}\n")
            seq = "".join(s)
            for i in range(0, n, 60):
                f.write(seq[i:i + 60] + "\n")
    return path


def _random_reads(rng, fasta, tmp, nreads=60):
    seqs = []
    cur = None
    for line in open(fasta):
        if line.startswith(">"):
            cur = []
            seqs.append(cur)
        else:
            cur.extend(line.strip())
    path = os.path.join(tmp, "reads.fq")
    with open(path, "w") as f:
        for i in range(nreads):
            src = seqs[int(rng.integers(0, len(seqs)))]
            rl = int(rng.integers(20, 40))
            if rng.random() < 0.1 or len(src) <= rl:   # garbage read
                r = list(CHARS[rng.integers(0, 4, rl)])
            else:
                p = int(rng.integers(0, len(src) - rl))
                r = list(src[p:p + rl])
                for _ in range(int(rng.integers(0, 4))):
                    r[int(rng.integers(0, rl))] = \
                        str(CHARS[int(rng.integers(0, 4))])
            if rng.random() < 0.5:
                r = [COMP[c] for c in reversed(r)]
            q = "".join(chr(33 + int(rng.integers(0, 41)))
                        for _ in range(rl))
            f.write(f"@rd{i}\n{''.join(r)}\n+\n{q}\n")
    return path


def _random_policy(rng):
    """A random mode + reporting policy (random_bowtie_tests.pl:63-101).
    Byte-verified through the CLI: -v 0..3 and -n 0..3, with and
    without --best/--strata/-M, plus dumps, trims, -o re-thinning,
    --reorder and input-format re-encodings."""
    args = []
    if rng.random() < 0.15:           # SA-sample re-thinning at load
        args += ["-o", str(int(rng.integers(6, 9)))]
    reorder = rng.random() < 0.15     # needs -S (parseOptions check)
    if reorder:
        args += ["--reorder", "-p", str(int(rng.integers(2, 4)))]
    if rng.random() < 0.5:
        args += ["-v", str(int(rng.integers(0, 4)))]
    else:
        args += ["-n", str(int(rng.integers(0, 4)))]
        if rng.random() < 0.5:
            args += ["-l", str(int(rng.integers(5, 32)))]
        if rng.random() < 0.5:
            args += ["-e", str(int(rng.integers(40, 200)))]
        if rng.random() < 0.3:
            args += ["--nomaqround"]
    p = rng.random()
    if p < 0.3:
        args += ["-k", str(int(rng.integers(1, 4)))]
    elif p < 0.5:
        args += ["-a"]
    if rng.random() < 0.3:
        args += ["-m", str(int(rng.integers(1, 5)))]
    if rng.random() < 0.15:
        args += ["--nofw"] if rng.random() < 0.5 else ["--norc"]
    if rng.random() < 0.35:           # stateful best-first engine
        args += ["--best"]
        # --strata requires -m, -a or -k>1 (parseOptions check)
        if rng.random() < 0.4 and ("-a" in args or "-m" in args or
                                   ("-k" in args and
                                    args[args.index("-k") + 1] != "1")):
            args += ["--strata"]
        if rng.random() < 0.3 and "-m" not in args and "-a" not in args:
            args += ["-M", "1"]
    if reorder or rng.random() < 0.3:
        args += ["-S", "--sam-nohead"]
    if rng.random() < 0.25:
        args += ["-5", str(int(rng.integers(1, 4)))]
    if rng.random() < 0.25:
        args += ["-3", str(int(rng.integers(1, 4)))]
    return args


def _dump_flags(rng):
    """Randomly chosen --al/--un/--max dumps — every produced file is
    byte-compared (reconcile_alignments.pl analog)."""
    return [f for f in ("--al", "--un", "--max") if rng.random() < 0.35]


def _dump_args(flags, outdir):
    return [x for f in flags
            for x in (f, os.path.join(outdir, f[2:] + ".fq"))]


def _tree(d):
    out = {}
    for root, _dirs, names in os.walk(d):
        for n in names:
            p = os.path.join(root, n)
            out[os.path.relpath(p, d)] = open(p, "rb").read()
    return out


def _reads_as_format(rng, fq_path, tmp):
    """Randomly re-encode the generated FASTQ as another input format
    (FASTA/raw/--12 tabbed), returning (extra_args, reads_path)."""
    recs = []
    with open(fq_path) as f:
        while True:
            nm = f.readline().strip()
            if not nm:
                break
            sq = f.readline().strip()
            f.readline()
            q = f.readline().strip()
            recs.append((nm[1:], sq, q))
    p = rng.random()
    if p < 0.55:
        return [], fq_path
    if p < 0.70:
        fa = os.path.join(tmp, "reads.fa")
        with open(fa, "w") as f:
            for nm, sq, _q_ in recs:
                f.write(f">{nm}\n{sq}\n")
        return ["-f"], fa
    if p < 0.85:
        raw = os.path.join(tmp, "reads.raw")
        with open(raw, "w") as f:
            for _nm, sq, _q_ in recs:
                f.write(sq + "\n")
        return ["-r"], raw
    tab = os.path.join(tmp, "reads.tab")
    with open(tab, "w") as f:
        for nm, sq, q in recs:
            f.write(f"{nm}\t{sq}\t{q}\n")
    return ["--12", tab], None


@pytest.mark.parametrize("seed", range(N_SE))
def test_random_case_matches_binary(seed, tmp_path):
    rng = np.random.default_rng(1000 + seed)
    tmp = str(tmp_path)
    fasta = _random_genome(rng, tmp)
    reads = _random_reads(rng, fasta, tmp)
    base = os.path.join(tmp, "idx")
    from bowtie_tpu.build.builder import build_from_fasta
    build_from_fasta([fasta], base)
    args = _random_policy(rng)
    if rng.random() < 0.12:
        # -F k,i: k-mer-ize the genome itself (FastaContinuous,
        # pat.h:594); replaces the generated read set
        k = int(rng.integers(8, 30))
        i = int(rng.integers(1, 12))
        args = ["-f", "-F", f"{k},{i}"] + args
        reads = fasta
    else:
        fmt_args, reads = _reads_as_format(rng, reads, tmp)
        args = fmt_args + args
    reads_pos = [reads] if reads is not None else []
    dumps = _dump_flags(rng)
    odir = os.path.join(tmp, "o")
    mdir = os.path.join(tmp, "m")
    os.makedirs(odir)
    os.makedirs(mdir)
    subprocess.run([ORACLE, "--wrapper", "basic-0", *args,
                    *_dump_args(dumps, odir), base, *reads_pos,
                    os.path.join(odir, "out")],
                   check=True, capture_output=True)
    from bowtie_tpu.cli.align import main
    rc = main([*args, *_dump_args(dumps, mdir), base, *reads_pos,
               os.path.join(mdir, "out")])
    assert rc in (0, None)
    want, got = _tree(odir), _tree(mdir)
    assert sorted(want) == sorted(got), \
        f"artifact sets differ for args={args}"
    for name in want:
        assert want[name] == got[name], \
            f"{name} differs for args={args}"


def _random_pairs(rng, fasta, tmp, npairs=40):
    """Mate pairs sampled --fr from the reference (pe analog of
    random_bowtie_tests.pl read generation)."""
    seqs = []
    cur = None
    for line in open(fasta):
        if line.startswith(">"):
            cur = []
            seqs.append(cur)
        else:
            cur.extend(line.strip())
    p1 = os.path.join(tmp, "r_1.fq")
    p2 = os.path.join(tmp, "r_2.fq")
    with open(p1, "w") as f1, open(p2, "w") as f2:
        for i in range(npairs):
            src = seqs[int(rng.integers(0, len(seqs)))]
            rl = 25
            ins = int(rng.integers(60, 220))
            if len(src) < ins + 10 or rng.random() < 0.15:
                m1 = list(CHARS[rng.integers(0, 4, rl)])
                m2 = list(CHARS[rng.integers(0, 4, rl)])
            else:
                p = int(rng.integers(0, len(src) - ins))
                m1 = list(src[p:p + rl])
                m2 = [COMP[c] for c in
                      reversed(src[p + ins - rl:p + ins])]
                for m in (m1, m2):
                    for _ in range(int(rng.integers(0, 3))):
                        m[int(rng.integers(0, rl))] = \
                            str(CHARS[int(rng.integers(0, 4))])
            q = "".join(chr(33 + int(rng.integers(0, 41)))
                        for _ in range(rl))
            f1.write(f"@p{i}/1\n{''.join(m1)}\n+\n{q}\n")
            f2.write(f"@p{i}/2\n{''.join(m2)}\n+\n{q}\n")
    return p1, p2


@pytest.mark.parametrize("seed", range(N_PE))
def test_random_paired_matches_binary(seed, tmp_path):
    rng = np.random.default_rng(9000 + seed)
    tmp = str(tmp_path)
    fasta = _random_genome(rng, tmp)
    m1, m2 = _random_pairs(rng, fasta, tmp)
    base = os.path.join(tmp, "idx")
    from bowtie_tpu.build.builder import build_from_fasta
    build_from_fasta([fasta], base)
    args = []
    if rng.random() < 0.5:
        args += ["-v", str(int(rng.integers(0, 4)))]
    else:
        args += ["-n", str(int(rng.integers(0, 4)))]
    args += ["-I", str(int(rng.integers(0, 60))),
             "-X", str(int(rng.integers(150, 300)))]
    p = rng.random()
    if p < 0.3:
        args += ["-k", str(int(rng.integers(1, 3)))]
    elif p < 0.45:
        args += ["-a"]
    if rng.random() < 0.25:
        args += ["-m", str(int(rng.integers(1, 4)))]
    if rng.random() < 0.3:
        args += ["--best"]
    if rng.random() < 0.25:
        args += ["--pev2"]
    if rng.random() < 0.25:
        args += ["--reportse"]
    if rng.random() < 0.2:
        args += ["--rf"] if rng.random() < 0.5 else ["--ff"]
    if rng.random() < 0.2:
        args += ["-5", str(int(rng.integers(1, 3)))]
    if rng.random() < 0.2:
        args += ["-3", str(int(rng.integers(1, 3)))]
    dumps = _dump_flags(rng)
    # randomly re-encode the pair files as interleaved or --12 tabbed
    p = rng.random()
    if p < 0.6:
        in_args = ["-1", m1, "-2", m2]
    elif p < 0.8:
        il = os.path.join(tmp, "inter.fq")
        with open(il, "w") as f, open(m1) as f1, open(m2) as f2:
            while True:
                r1 = [f1.readline() for _ in range(4)]
                r2 = [f2.readline() for _ in range(4)]
                if not r1[0]:
                    break
                f.writelines(r1 + r2)
        in_args = ["--interleaved", il]
    else:
        tab = os.path.join(tmp, "pairs.tab")
        with open(tab, "w") as f, open(m1) as f1, open(m2) as f2:
            while True:
                r1 = [f1.readline().strip() for _ in range(4)]
                r2 = [f2.readline().strip() for _ in range(4)]
                if not r1[0]:
                    break
                nm = r1[0][1:].rsplit("/", 1)[0]
                f.write(f"{nm}\t{r1[1]}\t{r1[3]}\t{r2[1]}\t{r2[3]}\n")
        in_args = ["--12", tab]
    odir = os.path.join(tmp, "o")
    mdir = os.path.join(tmp, "m")
    os.makedirs(odir)
    os.makedirs(mdir)
    subprocess.run([ORACLE, "--wrapper", "basic-0", *args,
                    *_dump_args(dumps, odir),
                    *in_args, base,
                    os.path.join(odir, "out")],
                   check=True, capture_output=True)
    # half the V1 cases run the DEVICE paired engine (recorded anchor
    # streams + pe_ilv_device interleave machine) instead of the pure
    # host path, so the randomized harness gates it too
    if "--pev2" not in args and "--best" not in args and \
            rng.random() < 0.5:
        os.environ["BOWTIE_TPU_DEVICE_PE"] = "1"
    from bowtie_tpu.cli.align import main
    try:
        rc = main([*args, *_dump_args(dumps, mdir),
                   *in_args, base, os.path.join(mdir, "out")])
    finally:
        os.environ.pop("BOWTIE_TPU_DEVICE_PE", None)
    assert rc in (0, None)
    want, got = _tree(odir), _tree(mdir)
    assert sorted(want) == sorted(got), \
        f"paired artifact sets differ for args={args}"
    for name in want:
        assert want[name] == got[name], \
            f"paired {name} differs for args={args}"
