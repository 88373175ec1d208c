"""Paired-end parity: byte-identical output vs reference goldens
(stateful PairedBWAlignerV1 engine) + genome-level validity.

Runs the HOST engine (BOWTIE_TPU_HOST_ENGINE) so the quick gate stays
compile-free; the device PE path is covered by test_pe_device.py."""
import os

import numpy as np
import pytest

from tests.test_parity_v0 import GOLDEN, IDX


@pytest.fixture(autouse=True)
def _host_engine(monkeypatch):
    monkeypatch.setenv("BOWTIE_TPU_HOST_ENGINE", "1")

R1 = "/root/reference/reads/e_coli_1000_1.fq"
R2 = "/root/reference/reads/e_coli_1000_2.fq"

CASES = [
    ("pe_n2_u200", ["-n", "2", "-u", "200"]),
    ("pe_v1_u200", ["-v", "1", "-u", "200"]),
    ("pe_n2_S_u200", ["-n", "2", "-S", "-u", "200"]),
    ("pe_n2_IX_u200", ["-n", "2", "-I", "50", "-X", "170", "-u", "200"]),
    ("pe_n2_a_u200", ["-n", "2", "-a", "-u", "200"]),
    ("pe_ff_n2_u200", ["--ff", "-n", "2", "-u", "200"]),
    ("pe_v0_u200", ["-v", "0", "-u", "200"]),
    # PairedBWAlignerV2 engine (--best PE / --pev2 / --reportse)
    ("pe_best_n2_u200", ["-n", "2", "--best", "-u", "200"]),
    ("pe_pev2_n2_u200", ["--pev2", "-n", "2", "-u", "200"]),
    ("pe_rs_pev2_u200",
     ["--reportse", "--pev2", "-n", "2", "-u", "200"]),
    ("pe_rs_pev2_S_u200",
     ["--reportse", "--pev2", "-n", "2", "-S", "-u", "200"]),
    ("pe_n2_M1_u200", ["-n", "2", "--best", "-M", "1", "-u", "200"]),
    ("pe_best_v1_u200", ["-v", "1", "--best", "-u", "200"]),
]


def run_pe(args, tmp_path):
    from bowtie_tpu.cli import align as cli
    out = tmp_path / "out.txt"
    cli.main(args + ["--quiet", "-1", R1, "-2", R2, IDX, str(out)])
    return b"".join(l for l in out.read_bytes().splitlines(keepends=True)
                    if not l.startswith(b"@PG"))


@pytest.mark.parametrize("key,args", CASES)
def test_pe_parity(key, args, tmp_path):
    golden = open(os.path.join(GOLDEN, f"{key}.out"), "rb").read()
    assert run_pe(args, tmp_path) == golden


def test_pe_ff_with_real_alignments(tmp_path):
    """--ff on FF-oriented synthesized mates (tests/golden/pe_ff_*.fq):
    unlike pe_ff_n2_u200 (FR reads, both sides empty), this case has
    200 aligning pairs, so the --ff orientation/window logic is
    actually exercised."""
    from bowtie_tpu.cli import align as cli
    golden = open(os.path.join(GOLDEN, "pe_ff_real.out"), "rb").read()
    assert len(golden) > 0
    out = tmp_path / "out.txt"
    cli.main(["--ff", "-n", "2", "-I", "60", "-X", "300", "--quiet",
              "-1", os.path.join(GOLDEN, "pe_ff_1.fq"),
              "-2", os.path.join(GOLDEN, "pe_ff_2.fq"),
              IDX, str(out)])
    mine = b"".join(l for l in out.read_bytes().splitlines(keepends=True)
                    if not l.startswith(b"@PG"))
    assert mine == golden


def test_pe_hits_valid_against_genome(tmp_path, ecoli_ref):
    """Every reported mate must match the genome at its position with
    the declared mismatches, and the pair must obey -I/-X."""
    from bowtie_tpu.utils.alphabet import seq_to_codes
    lines = run_pe(["-n", "2", "-u", "150"], tmp_path).splitlines()
    by_pair = {}
    for ln in lines:
        f = ln.split(b"\t")
        name, strand, off, seq = f[0], f[1], int(f[3]), f[4]
        mmstr = f[7] if len(f) > 7 else b""
        codes = seq_to_codes(seq)
        seg = ecoli_ref[off:off + len(codes)]
        nmm = int((seg != codes).sum())
        declared = 0 if not mmstr else mmstr.count(b">")
        assert nmm == declared, (name, nmm, declared)
        by_pair.setdefault(name.rsplit(b"/", 1)[0], []).append(
            (off, len(codes), strand))
    for name, mates in by_pair.items():
        assert len(mates) == 2
        lo = min(m[0] for m in mates)
        hi = max(m[0] + m[1] for m in mates)
        assert hi - lo <= 250, name  # default -X 250
