"""Declarative end-to-end cases vs the reference binary.

The analog of pillar 1 of the reference's test strategy
(scripts/test/simple_tests.pl, 1,724 LoC of inline-genome cases): a
table of targeted CLI/edge-case runs — input formats, quality scales,
trimming x paired-end x dump-file interactions, reporting policies —
each executed through BOTH `bowtie_tpu.cli.align` and the compiled
bowtie 1.3.1 binary on an index built by OUR builder.  Every produced
artifact (hits file AND every --al/--un/--max dump file, including
which files exist at all) must be byte-identical.

The randomized harness (test_random_vs_binary.py) covers the policy
space broadly; this table pins the interactions it can't reach —
e.g. trimming + PE + dumps (dump files must contain the ORIGINAL
untrimmed records), --12 single-file dumps vs _1/_2 splitting,
-F k,i continuous reads, integer/solexa/phred64 qualities.

Skipped when the oracle binary isn't present (build it with
scripts/make_golden.sh).
"""
import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE = os.path.join(REPO, ".oracle", "bowtie-align-s")

pytestmark = pytest.mark.skipif(not os.path.exists(ORACLE),
                                reason="oracle binary not built")

# ---------------------------------------------------------------- genome

_CHARS = np.array(list("ACGT"))
_COMP = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}


def _revcomp(s: str) -> str:
    return "".join(_COMP[c] for c in reversed(s))


def _make_genome():
    """Deterministic 2-fragment genome: an N run in frag1 and a 60-bp
    block repeated 4x (so reads from it have 4 alignments — exercises
    -m/-M/-k/-a) in frag2."""
    rng = np.random.default_rng(77)
    f1 = list(_CHARS[rng.integers(0, 4, 1500)])
    f1[700:708] = ["N"] * 8
    f1 = "".join(f1)
    f2 = list(_CHARS[rng.integers(0, 4, 900)])
    rep = "".join(_CHARS[rng.integers(0, 4, 60)])
    for start in (100, 300, 500, 700):
        f2[start:start + 60] = list(rep)
    f2 = "".join(f2)
    return [("frag1 description text", f1), ("frag2", f2)], rep


GENOME, REPEAT60 = _make_genome()
F1, F2 = GENOME[0][1], GENOME[1][1]


def _plant(frag: str, pos: int, ln: int, mms=(), rc=False) -> str:
    s = list(frag[pos:pos + ln])
    for off, ch in mms:
        s[off] = ch
    s = "".join(s)
    return _revcomp(s) if rc else s


# ------------------------------------------------------------- read sets

# (name, seq, qual) with varied quality strings; qual=None -> all 'I'
def _q(seq, lo=35, hi=70, seed=5):
    rng = np.random.default_rng(seed + len(seq))
    return "".join(chr(33 + int(rng.integers(lo - 33, hi - 33)))
                   for _ in seq)


SE_READS = [
    ("ex_fw",   _plant(F1, 50, 36), None),
    ("ex_rc",   _plant(F1, 200, 36, rc=True), None),
    ("mm1",     _plant(F1, 400, 36, mms=[(18, "A" if F1[418] != "A"
                                          else "C")]), "varied"),
    ("mm2",     _plant(F2, 20, 36, mms=[(5, "T" if F2[25] != "T" else "G"),
                                        (30, "A" if F2[50] != "A"
                                         else "C")]), "varied"),
    ("garbage", "ACGT" * 9, None),
    ("has_n",   _plant(F1, 900, 30)[:15] + "N" +
                _plant(F1, 900, 30)[16:], None),
    ("short8",  _plant(F1, 1200, 8), None),
    ("long45",  _plant(F2, 820, 45), "varied"),
    ("rep4x",   REPEAT60[10:46], None),           # 4 alignments in frag2
    ("rep4x_rc", _revcomp(REPEAT60[5:41]), None),
    ("spans_n", _plant(F1, 690, 30), None),       # crosses the N run
    ("ex_fw2",  _plant(F2, 600, 28, rc=True), "varied"),
    ("all_n",   "N" * 25, None),
]


def _fq_text(reads, plus_name=False, qshift=0):
    out = []
    for i, (nm, seq, q) in enumerate(reads):
        q = _q(seq) if q == "varied" else "I" * len(seq)
        if qshift:
            q = "".join(chr(ord(c) + qshift) for c in q)
        plus = "+" + nm if plus_name and i % 2 == 0 else "+"
        out.append(f"@{nm}\n{seq}\n{plus}\n{q}\n")
    return "".join(out)


def _fa_text(reads, width=30):
    out = []
    for nm, seq, _q_ in reads:
        lines = "\n".join(seq[i:i + width] for i in range(0, len(seq),
                                                          width))
        out.append(f">{nm} extra descr\n{lines}\n")
    return "".join(out)


def _raw_text(reads):
    return "".join(seq + "\n" for _nm, seq, _q_ in reads)


def _int_qual_fq_text(reads):
    out = []
    for nm, seq, q in reads:
        q = _q(seq) if q == "varied" else "I" * len(seq)
        ints = " ".join(str(ord(c) - 33) for c in q)
        out.append(f"@{nm}\n{seq}\n+\n{ints}\n")
    return "".join(out)


# paired sets: FR-oriented planted pairs + edge cases
LONG_READS = [
    ("lg_ex",  _plant(F1, 100, 250), None),
    ("lg_mm2", _plant(F1, 800, 300,
                      mms=[(50, "A" if F1[850] != "A" else "C"),
                           (200, "G" if F1[1000] != "G" else "T")]),
     "varied"),
    ("lg_rc",  _plant(F2, 300, 280, rc=True), None),
    ("lg_bad", "ACGT" * 70, None),
]


def _pe_reads():
    pairs = []
    for i, (frag, pos, ins) in enumerate(
            [(F1, 40, 120), (F1, 500, 90), (F2, 30, 180), (F1, 1000, 200),
             (F2, 400, 150), (F1, 760, 100)]):
        ln = 30
        m1 = frag[pos:pos + ln]
        m2 = _revcomp(frag[pos + ins - ln:pos + ins])
        pairs.append((f"pr{i}", m1, m2))
    # one mate has 1mm
    m1 = list(F1[300:330])
    m1[7] = "A" if m1[7] != "A" else "C"
    pairs.append(("pr_mm", "".join(m1), _revcomp(F1[390:420])))
    # garbage pair
    pairs.append(("pr_bad", "AC" * 15, "GT" * 15))
    # insert size too large for -X 250 (still fine for default)
    pairs.append(("pr_far", F1[100:130], _revcomp(F1[560:590])))
    # repeat-block pair (multiple concordant placements)
    pairs.append(("pr_rep", REPEAT60[0:30],
                  _revcomp(F2[100 + 90:100 + 120])))
    return pairs


PE = _pe_reads()


def _pe_fq(which):
    reads = [(f"{nm}/{which}", m1 if which == 1 else m2, "varied")
             for nm, m1, m2 in PE]
    return _fq_text(reads)


def _tabbed_text():
    out = []
    for nm, m1, m2 in PE:
        out.append(f"{nm}\t{m1}\t{_q(m1)}\t{m2}\t{_q(m2)}\n")
    return "".join(out)


def _tabbed_mixed_text():
    """Paired 5-col lines interleaved with unpaired 3-col lines."""
    out = []
    for i, (nm, m1, m2) in enumerate(PE):
        out.append(f"{nm}\t{m1}\t{_q(m1)}\t{m2}\t{_q(m2)}\n")
        if i < len(SE_READS):
            snm, sseq, sq = SE_READS[i]
            q = _q(sseq) if sq == "varied" else "I" * len(sseq)
            out.append(f"solo_{snm}\t{sseq}\t{q}\n")
    return "".join(out)


def _interleaved_text():
    out = []
    for nm, m1, m2 in PE:
        out.append(f"@{nm}/1\n{m1}\n+\n{_q(m1)}\n")
        out.append(f"@{nm}/2\n{m2}\n+\n{_q(m2)}\n")
    return "".join(out)


# ------------------------------------------------------------ case table

# Each case: id, input spec, argument list.  Tokens AL/UN/MAX expand to
# dump paths inside the per-run output directory; READS/M1/M2/GENOME
# expand to input files.  Everything under the output directory is
# byte-compared (existence + contents) between oracle and ours.
CASES = [
    # --- input formats x basic modes
    ("fq_v0_k2",       "fq",   ["-v", "0", "-k", "2"]),
    ("fq_n1_all",      "fq",   ["-n", "1", "-a"]),
    ("fa_v1",          "fa",   ["-f", "-v", "1"]),
    ("raw_v0",         "raw",  ["-r", "-v", "0"]),
    ("cmdline_v1",     "c",    ["-c", "-v", "1", "-a"]),
    ("fcont_v0",       "F",    ["-f", "-F", "25,7", "-v", "0"]),
    ("fq_plusname_n2", "fq+",  ["-n", "2"]),
    # --- quality scales
    ("phred64_n2",     "fq64", ["--phred64-quals", "-n", "2", "-e",
                                "120"]),
    ("solexa_n2",      "fq64", ["--solexa1.3-quals", "-n", "2"]),
    ("intq_n2",        "fqint", ["--integer-quals", "-n", "2"]),
    # --- trimming
    # (trim depths keep the 8-bp read >= 2 chars — deeper trims make
    # the reference abort the whole run: "Reads must be at least 2
    # characters long in 1-mismatch mode")
    ("trim_v1",        "fq",   ["-5", "3", "-3", "3", "-v", "1"]),
    ("trim_n2_e",      "fq",   ["-5", "2", "-3", "2", "-n", "2", "-e",
                                "90"]),
    # --- reporting policies on the repeat block
    ("rep_m2",         "fq",   ["-v", "0", "-m", "2"]),
    ("rep_M1",         "fq",   ["-v", "0", "-M", "1", "--best"]),
    ("rep_k3_strata",  "fq",   ["-v", "1", "-k", "3", "--best",
                                "--strata"]),
    ("rep_a_best",     "fq",   ["-v", "2", "-a", "--best"]),
    # --- output shaping
    ("suppress_cost",  "fq",   ["-v", "1", "--suppress", "6,7",
                                "--cost"]),
    ("partition",      "fq",   ["-v", "0", "--partition", "400"]),
    ("refidx_B1",      "fq",   ["-v", "0", "--refidx", "-B", "1"]),
    ("sam_mapq_rg",    "fq",   ["-v", "1", "-S", "--mapq", "30",
                                "--sam-RG", "ID:x", "--sam-RG",
                                "SM:y"]),
    ("sam_fullref",    "fq",   ["-v", "0", "-S", "--fullref",
                                "--sam-nohead"]),
    # --- skip/limit
    ("skip_upto",      "fq",   ["-v", "0", "-s", "3", "-u", "5"]),
    # --- strand filters
    ("nofw",           "fq",   ["-v", "1", "--nofw"]),
    ("norc_n0",        "fq",   ["-n", "0", "--norc"]),
    # --- dumps (SE): al/un/max + original-record fidelity
    ("se_dumps",       "fq+",  ["-v", "0", "-m", "2", "--al", "AL",
                                "--un", "UN", "--max", "MAX"]),
    ("se_dump_un_only", "fq",  ["-v", "0", "-m", "2", "--un", "UN"]),
    ("se_dumps_trim",  "fq",   ["-5", "2", "-3", "3", "-n", "2",
                                "--al", "AL", "--un", "UN"]),
    ("se_dumps_fa",    "fa",   ["-f", "-v", "1", "--al", "AL",
                                "--un", "UN"]),
    ("se_dumps_raw",   "raw",  ["-r", "-v", "0", "--un", "UN"]),
    # --- paired-end
    ("pe_n2",          "pe",   ["-n", "2"]),
    ("pe_v1_I_X",      "pe",   ["-v", "1", "-I", "60", "-X", "160"]),
    ("pe_ff",          "pe",   ["--ff", "-v", "0"]),
    ("pe_rf",          "pe",   ["--rf", "-v", "0"]),
    ("pe_k2_m3",       "pe",   ["-v", "1", "-k", "2", "-m", "3"]),
    ("pe_sam",         "pe",   ["-n", "1", "-S"]),
    ("pe_nofw",        "pe",   ["-n", "0", "--nofw"]),
    # --- paired-end dumps: _1/_2 splitting, trimming interaction
    ("pe_dumps",       "pe",   ["-n", "2", "--al", "AL", "--un", "UN",
                                "--max", "MAX", "-m", "2"]),
    ("pe_dumps_trim",  "pe",   ["-5", "2", "-v", "1", "--al", "AL",
                                "--un", "UN"]),
    # trimming shrinks the effective -I/-X window (the raw-read insert
    # constraint, aligner.h:983-999): pairs right at the -X edge must
    # be rejected identically
    ("pe_trim_insert", "pe",   ["-5", "1", "-3", "1", "-v", "2",
                                "--best", "-I", "85", "-X", "121"]),
    ("pe_trim_insert_v1", "pe", ["-5", "2", "-n", "1", "-X", "122"]),
    # the backtrack ceiling is ONE budget for the whole pair, shared
    # by all four (mate,strand) driver groups (aligner_seed_mm.h:665)
    ("pe_maxbts",      "pe",   ["-n", "2", "--maxbts", "2"]),
    ("pe_maxbts_best", "pe",   ["-n", "2", "--best", "--maxbts", "2"]),
    ("se_maxbts",      "fq",   ["-n", "3", "--maxbts", "1"]),
    ("pe_dumps_nodot", "pe",   ["-v", "1", "--al", "ALNODOT",
                                "--un", "UNNODOT"]),
    # --- --12 tabbed: one-pair-file dumps stay single files
    ("tab_n2",         "tab",  ["-n", "2"]),
    ("tab_dumps",      "tab",  ["-v", "1", "--al", "AL", "--un", "UN"]),
    # --- --12 mixing paired (5-col) and unpaired (3-col) records
    ("tabmix_n2",      "tabmix", ["-n", "2"]),
    ("tabmix_v1_best", "tabmix", ["-v", "1", "--best", "-k", "2"]),
    ("tabmix_dumps",   "tabmix", ["-v", "0", "-m", "3", "--al", "AL",
                                  "--un", "UN", "--max", "MAX"]),
    # --- interleaved: splits like two-file input
    ("il_v1",          "il",   ["-v", "1"]),
    ("il_dumps",       "il",   ["-v", "1", "--al", "AL", "--un", "UN"]),
    # --- misc interactions
    ("tryhard_n3",     "fq",   ["-y", "-n", "3", "-l", "20"]),
    ("maxbts_n2",      "fq",   ["--maxbts", "1", "-n", "2"]),
    ("upto_dumps",     "fq",   ["-v", "0", "-u", "6", "--un", "UN",
                                "--al", "AL"]),
    ("seed_M",         "fq",   ["-v", "1", "-M", "1", "--best",
                                "--seed", "77"]),
    # --- long reads (long_read.pl analog; reference caps at 1023 bp)
    ("long_v2",        "fqlong", ["-v", "2"]),
    ("long_n2",        "fqlong", ["-n", "2", "-e", "300"]),
    # --- CRLF line endings
    ("crlf_v1",        "fqcrlf", ["-v", "1"]),
    # --- multi-file inputs (comma-separated lists)
    ("multifile_se",   "fq2",   ["-v", "1"]),
    ("multifile_pe",   "pe2",   ["-n", "1"]),
    # --- gzipped inputs
    ("gz_se",          "fqgz",  ["-n", "2"]),
    ("gz_pe",          "pegz",  ["-v", "1"]),
    # --- SAM shaping
    ("sam_unal_pe",    "pe",    ["-v", "0", "-S", "--sam-nohead"]),
    ("sam_refidx",     "fq",    ["-v", "1", "-S", "--refidx"]),
    # --- policy knobs
    ("e_tight",        "fq",    ["-n", "2", "-e", "40"]),
    ("l_short_seed",   "fq",    ["-n", "2", "-l", "15"]),
    ("nomaqround",     "fq",    ["-n", "2", "--nomaqround"]),
    ("norc_all",       "fq",    ["-v", "1", "--norc", "-a"]),
    ("skip_pe",        "pe",    ["-v", "0", "-s", "2", "-u", "4"]),
    ("best_k2_v3",     "fq",    ["-v", "3", "-k", "2", "--best"]),
    # --- round-4 breadth additions (simple_tests.pl covers several
    # hundred cases; these extend toward that surface)
    # -v/-n x -k/-a/-m sweep on the repeat block
    ("v0_all",         "fq",    ["-v", "0", "-a"]),
    ("v2_k4",          "fq",    ["-v", "2", "-k", "4"]),
    ("v3_a",           "fq",    ["-v", "3", "-a"]),
    ("n0_k2",          "fq",    ["-n", "0", "-k", "2"]),
    ("n3_e200",        "fq",    ["-n", "3", "-e", "200"]),
    ("n3_l18_best",    "fq",    ["-n", "3", "-l", "18", "--best"]),
    ("a_m2",           "fq",    ["-v", "1", "-a", "-m", "2"]),
    ("k_huge",         "fq",    ["-v", "1", "-k", "9"]),
    ("m1_only",        "fq",    ["-v", "0", "-m", "1"]),
    # --best/--strata/-M interactions
    ("strata_m1",      "fq",    ["-v", "2", "--best", "--strata",
                                 "-m", "1"]),
    ("strata_a_n1",    "fq",    ["-n", "1", "--best", "--strata",
                                 "-a"]),
    ("M2_n1",          "fq",    ["-n", "1", "-M", "2", "--best"]),
    ("M1_seeded",      "fq",    ["-n", "2", "-M", "1", "--best",
                                 "--seed", "31"]),
    ("best_nostrata_a", "fq",   ["-v", "2", "-a", "--best"]),
    ("chunkmbs_best",  "fq",    ["--chunkmbs", "16", "-v", "2",
                                 "--best"]),
    # SA-sample re-thinning at load (-o >= index offrate)
    ("offrate6_v1",    "fq",    ["-o", "6", "-v", "1"]),
    ("offrate7_n2",    "fq",    ["-o", "7", "-n", "2"]),
    ("offrate6_pe",    "pe",    ["-o", "6", "-n", "1"]),
    # --reorder needs -S; deterministic with -p > 1
    ("reorder_p2_S",   "fq",    ["--reorder", "-p", "2", "-S",
                                 "-v", "1"]),
    # PE strand filters + policy
    ("pe_norc_v1",     "pe",    ["-v", "1", "--norc"]),
    ("pe_nofw_n2",     "pe",    ["-n", "2", "--nofw"]),
    ("pe_a_v1",        "pe",    ["-v", "1", "-a"]),
    ("pe_m1",          "pe",    ["-n", "1", "-m", "1"]),
    ("pe_M1_best",     "pe",    ["-n", "1", "-M", "1", "--best"]),
    ("pe_X_wide",      "pe",    ["-X", "600", "-n", "1"]),
    ("pe_I_eq_X",      "pe",    ["-I", "120", "-X", "120", "-v",
                                 "0"]),
    ("pe_pairtries",   "pe",    ["-n", "2", "--pairtries", "1"]),
    # --pev2 / --reportse (PairedBWAlignerV2 surface)
    ("pev2_v1",        "pe",    ["--pev2", "-v", "1"]),
    ("pev2_IX",        "pe",    ["--pev2", "-v", "1", "-I", "70",
                                 "-X", "150"]),
    ("pev2_reportse",  "pe",    ["--pev2", "--reportse", "-n", "1"]),
    ("pe_best_strata", "pe",    ["-n", "2", "--best", "--strata",
                                 "-m", "2"]),
    # dumps x mixed --12 / interleaved / strand filters
    ("tabmix_un_only", "tabmix", ["-n", "1", "--un", "UN"]),
    ("tabmix_max_m1",  "tabmix", ["-v", "0", "-m", "1", "--max",
                                  "MAX"]),
    ("il_max_m1",      "il",    ["-v", "1", "-m", "1", "--max",
                                 "MAX"]),
    ("pe_norc_dumps",  "pe",    ["-v", "1", "--norc", "--un", "UN"]),
    ("fa_max_only",    "fa",    ["-f", "-v", "0", "-m", "1",
                                 "--max", "MAX"]),
    ("raw_trim_v1",    "raw",   ["-r", "-5", "1", "-v", "1"]),
    # -F k,i continuous-FASTA edges
    ("F_small_ki",     "F",     ["-f", "-F", "8,1", "-v", "0"]),
    ("F_big_i",        "F",     ["-f", "-F", "30,29", "-n", "1"]),
    ("F_dumps",        "F",     ["-f", "-F", "20,11", "-v", "0",
                                 "--un", "UN"]),
    # skip/limit edges
    ("skip_past_eof",  "fq",    ["-s", "100", "-v", "0"]),
    ("upto_one",       "fq",    ["-v", "0", "-u", "1"]),
    ("skip_pe_dumps",  "pe",    ["-s", "1", "-u", "3", "-v", "1",
                                 "--un", "UN"]),
    # seed-length / quality-budget edges
    ("l_max_seed",     "fq",    ["-n", "2", "-l", "36"]),
    ("l_gt_read",      "fq",    ["-n", "1", "-l", "50"]),
    ("e_huge",         "fq",    ["-n", "3", "-e", "500"]),
    ("intq_e60",       "fqint", ["--integer-quals", "-n", "2",
                                 "-e", "60"]),
    ("phred64_v2",     "fq64",  ["--phred64-quals", "-v", "2"]),
    # SAM shaping
    ("sam_nosq",       "fq",    ["-S", "--sam-noSQ", "-v", "1"]),
    ("sam_pe_mapq",    "pe",    ["-n", "1", "-S", "--mapq", "7"]),
    ("sam_long",       "fqlong", ["-v", "2", "-S"]),
    # verbose-output shaping
    ("fullref_verbose", "fq",   ["--fullref", "-v", "0"]),
    ("suppress_1_5",   "fq",    ["-v", "1", "--suppress", "1,5"]),
    ("showseed",       "fq",    ["-v", "1", "--showseed",
                                 "--seed", "5"]),
    ("quiet_v0",       "fq",    ["--quiet", "-v", "0"]),
    # long reads (>255 bp) x modes
    ("long_best",      "fqlong", ["-v", "2", "--best", "-k", "2"]),
    ("long_n1_l30",    "fqlong", ["-n", "1", "-l", "30", "-e",
                                  "400"]),
    ("long_trim",      "fqlong", ["-5", "10", "-3", "10", "-v",
                                  "2"]),
    ("long_dumps",     "fqlong", ["-v", "2", "--al", "AL", "--un",
                                  "UN"]),
    # --- round-5 breadth additions (simple_tests.pl coverage push)
    # --chunkmbs edges: a tiny pool forces the reference's chunk-pool
    # exhaustion handling (ChunkPool, aligner.h:70-140); behavior must
    # match under heavy -n 3 backtracking and under --best PE
    ("chunkmbs_tiny",  "fq",    ["--chunkmbs", "1", "-n", "3", "-e",
                                 "300"]),
    ("chunkmbs_pe",    "pe",    ["--chunkmbs", "4", "-n", "2",
                                 "--best"]),
    # -F k,i continuous-FASTA x deeper modes
    ("F_v2_k3",        "F",     ["-f", "-F", "28,13", "-v", "2",
                                 "-k", "3"]),
    ("F_n2_dumps",     "F",     ["-f", "-F", "22,9", "-n", "2",
                                 "--al", "AL", "--un", "UN"]),
    # --pairtries exhaustion under --best
    ("pe_pairtries_best", "pe", ["-n", "2", "--best", "--pairtries",
                                 "1"]),
    # --pev2 x dumps / reporting policies
    ("pev2_dumps",     "pe",    ["--pev2", "-v", "1", "--al", "AL",
                                 "--un", "UN"]),
    ("pev2_m2",        "pe",    ["--pev2", "-n", "1", "-m", "2"]),
    ("pev2_strata",    "pe",    ["--pev2", "-n", "2", "--best",
                                 "--strata", "-k", "2"]),
    ("pev2_k2",        "pe",    ["--pev2", "-v", "1", "-k", "2"]),
    # tryhard under -v mode
    ("y_v2_k2",        "fq",    ["-y", "-v", "2", "-k", "2"]),
    # -M sampling x SAM output (XM/XA fields + per-read seed)
    ("sam_M_sampling", "fq",    ["-v", "1", "-M", "1", "--best", "-S",
                                 "--seed", "9"]),
    ("M3_v2",          "fq",    ["-v", "2", "-M", "3", "--best"]),
    # quality scales x deeper modes
    ("phred64_best",   "fq64",  ["--phred64-quals", "-n", "2",
                                 "--best"]),
    ("solexa_quals_old", "fq64", ["--solexa-quals", "-n", "2"]),
    ("intq_v1",        "fqint", ["--integer-quals", "-v", "1"]),
    # format x mode crosses
    ("raw_n2",         "raw",   ["-r", "-n", "2"]),
    ("fa_n1",          "fa",    ["-f", "-n", "1"]),
    ("tab_best_m2",    "tab",   ["-n", "2", "--best", "-m", "2"]),
    ("il_sam",         "il",    ["-v", "1", "-S"]),
    # maxed->--un fallthrough WITHOUT --max (hit.h:1734-1750)
    ("pe_un_fallthrough", "pe", ["-n", "1", "-m", "1", "--un", "UN"]),
    # trimming: 3' only
    ("trim3_only",     "fq",    ["-3", "4", "-v", "0"]),
    # PE orientation x --best
    ("pe_ff_best",     "pe",    ["--ff", "-n", "2", "--best"]),
    ("pe_rf_v2_best",  "pe",    ["--rf", "-v", "2", "--best"]),
    # seed-length floor (-l 5 is the reference minimum)
    ("l_floor",        "fq",    ["-n", "1", "-l", "5", "-e", "200"]),
    # both strand filters: nothing can align, summary must match
    ("nofw_norc",      "fq",    ["-v", "1", "--nofw", "--norc"]),
    # SAM PE shaping
    ("sam_pe_fullref", "pe",    ["-n", "1", "-S", "--fullref"]),
    # --seed determinism with -M under seeded mode
    ("M1_seed123",     "fq",    ["-n", "2", "-M", "1", "--best",
                                 "--seed", "123"]),
    # multi-file PE + dumps (per-file dump splitting)
    ("multifile_pe_dumps", "pe2", ["-n", "1", "--un", "UN"]),
]


# ------------------------------------------------------------- fixtures

@pytest.fixture(autouse=True)
def _host_engines(monkeypatch):
    """This table gates the CLI/reporting/dump surface — run it on the
    host engines so it stays in the quick set.  Device-vs-host engine
    equivalence is gated by the test_*_device modules and the
    randomized harness."""
    monkeypatch.setenv("BOWTIE_TPU_HOST_ENGINE", "1")


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    d = tmp_path_factory.mktemp("simple_cases")
    fa = d / "genome.fa"
    with open(fa, "w") as f:
        for nm, seq in GENOME:
            f.write(f">{nm}\n")
            for i in range(0, len(seq), 60):
                f.write(seq[i:i + 60] + "\n")
    base = str(d / "idx")
    from bowtie_tpu.build.builder import build_from_fasta
    build_from_fasta([str(fa)], base)
    inputs = {
        "fq":    ("READS", _fq_text(SE_READS)),
        "fq+":   ("READS", _fq_text(SE_READS, plus_name=True)),
        "fq64":  ("READS", _fq_text(SE_READS, qshift=31)),
        "fqint": ("READS", _int_qual_fq_text(SE_READS)),
        "fa":    ("READS", _fa_text(SE_READS)),
        "fqlong": ("READS", _fq_text(LONG_READS)),
        "fqcrlf": ("READS", _fq_text(SE_READS).replace("\n", "\r\n")),
        "raw":   ("READS", _raw_text(SE_READS)),
        "tab":   ("TAB", _tabbed_text()),
        "tabmix": ("TAB", _tabbed_mixed_text()),
        "il":    ("IL", _interleaved_text()),
    }
    files = {}
    for key, (kind, text) in inputs.items():
        p = d / f"in_{key}.txt"
        with open(p, "w") as f:
            f.write(text)
        files[key] = (kind, str(p))
    for which in (1, 2):
        p = d / f"pe_{which}.fq"
        with open(p, "w") as f:
            f.write(_pe_fq(which))
        files[f"pe{which}"] = ("PE", str(p))
    # gzipped variants
    import gzip
    with gzip.open(d / "in_fq.txt.gz", "wt") as f:
        f.write(_fq_text(SE_READS))
    files["fqgz"] = ("READS", str(d / "in_fq.txt.gz"))
    for which in (1, 2):
        with gzip.open(d / f"pe_{which}.fq.gz", "wt") as f:
            f.write(_pe_fq(which))
        files[f"pe{which}gz"] = ("PE", str(d / f"pe_{which}.fq.gz"))
    # split fixtures for comma-separated multi-file inputs
    se_txt = _fq_text(SE_READS)
    recs = se_txt.splitlines(keepends=True)
    half = (len(recs) // 8 // 2) * 4
    (d / "in_fq_a.txt").write_text("".join(recs[:half]))
    (d / "in_fq_b.txt").write_text("".join(recs[half:]))
    files["fq2"] = ("READS", f"{d}/in_fq_a.txt,{d}/in_fq_b.txt")
    for which in (1, 2):
        txt = _pe_fq(which).splitlines(keepends=True)
        h = (len(txt) // 8 // 2) * 4
        (d / f"pe{which}_a.fq").write_text("".join(txt[:h]))
        (d / f"pe{which}_b.fq").write_text("".join(txt[h:]))
        files[f"pe{which}x2"] = (
            "PE", f"{d}/pe{which}_a.fq,{d}/pe{which}_b.fq")
    return {"base": base, "genome": str(fa), "files": files}


def _expand(case_args, infmt, env, outdir):
    """Expand dump tokens and build (oracle_argv_tail, ours_argv)."""
    args = []
    for a in case_args:
        if a in ("AL", "UN", "MAX"):
            args.append(os.path.join(outdir, a.lower() + ".fq"))
        elif a in ("ALNODOT", "UNNODOT"):
            args.append(os.path.join(outdir, a.lower()))
        else:
            args.append(a)
    base = env["base"]
    out = os.path.join(outdir, "out")
    if infmt == "pe":
        tail = ["-1", env["files"]["pe1"][1], "-2", env["files"]["pe2"][1],
                base, out]
    elif infmt == "pe2":
        tail = ["-1", env["files"]["pe1x2"][1],
                "-2", env["files"]["pe2x2"][1], base, out]
    elif infmt == "pegz":
        tail = ["-1", env["files"]["pe1gz"][1],
                "-2", env["files"]["pe2gz"][1], base, out]
    elif infmt in ("tab", "tabmix"):
        tail = ["--12", env["files"][infmt][1], base, out]
    elif infmt == "il":
        tail = ["--interleaved", env["files"]["il"][1], base, out]
    elif infmt == "c":
        seqs = ",".join(seq for _nm, seq, _q_ in SE_READS[:8])
        tail = [base, seqs, out]
    elif infmt == "F":
        tail = [base, env["genome"], out]
    else:
        tail = [base, env["files"][infmt][1], out]
    return args + tail, out


def _tree(d):
    out = {}
    for root, _dirs, names in os.walk(d):
        for n in names:
            p = os.path.join(root, n)
            out[os.path.relpath(p, d)] = open(p, "rb").read()
    return out


@pytest.mark.parametrize("cid,infmt,case_args",
                         CASES, ids=[c[0] for c in CASES])
def test_simple_case(cid, infmt, case_args, env, tmp_path, capfd):
    odir = str(tmp_path / "oracle")
    mdir = str(tmp_path / "mine")
    os.makedirs(odir)
    os.makedirs(mdir)

    oargs, _ = _expand(case_args, infmt, env, odir)
    r = subprocess.run([ORACLE, "--wrapper", "basic-0", *oargs],
                       capture_output=True)
    assert r.returncode == 0, (
        f"oracle failed: {r.stderr.decode()[:500]}")

    margs, _ = _expand(case_args, infmt, env, mdir)
    capfd.readouterr()
    from bowtie_tpu.cli.align import main
    rc = main(margs)
    my_err = capfd.readouterr().err
    assert rc in (0, None)

    # the end-of-run summary counters on stderr must match too
    # (HitSink::finish, hit.h:270-346); keep only summary lines so
    # runtime noise (XLA cache load warnings, the oracle's positional-
    # arg deprecation notice) doesn't flake the comparison
    def _summary(text):
        keep = ("# ", "Reported ", "No alignments", "reporter:")
        return "\n".join(ln for ln in text.splitlines()
                         if ln.startswith(keep))
    assert _summary(my_err) == _summary(r.stderr.decode()), \
        f"stderr summary differs for case {cid}"

    want, got = _tree(odir), _tree(mdir)
    assert sorted(want) == sorted(got), (
        f"artifact sets differ: oracle={sorted(want)} ours={sorted(got)}")
    for name in want:
        if name == "out" and "-S" in case_args:
            w = b"".join(ln for ln in want[name].splitlines(True)
                         if not ln.startswith(b"@PG"))
            g = b"".join(ln for ln in got[name].splitlines(True)
                         if not ln.startswith(b"@PG"))
        else:
            w, g = want[name], got[name]
        assert w == g, f"{name} differs for case {cid}"


# Invalid invocations must fail on both sides (args.pl analog).
ERROR_CASES = [
    ("v4",        ["-v", "4"]),
    ("n5",        ["-n", "5"]),
    ("strata_nobest", ["--strata", "-a"]),
    ("strata_k1", ["--best", "--strata"]),
]


@pytest.mark.parametrize("cid,case_args", ERROR_CASES,
                         ids=[c[0] for c in ERROR_CASES])
def test_error_case(cid, case_args, env, tmp_path):
    r = subprocess.run(
        [ORACLE, "--wrapper", "basic-0", *case_args, env["base"],
         env["files"]["fq"][1], str(tmp_path / "o.out")],
        capture_output=True)
    assert r.returncode != 0
    from bowtie_tpu.cli.align import main
    rc = main([*case_args, env["base"], env["files"]["fq"][1],
               str(tmp_path / "m.out")])
    assert rc not in (0, None)
