"""Output parity vs bowtie-1.3.1 golden files (generated from the
reference binary; see tests/golden/README)."""
import io
import os
import sys

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
IDX = "/root/reference/indexes/e_coli"
READS = "/root/reference/reads/e_coli_1000.fq"

CASES = [
    ("v0", ["-v", "0"]),
    ("v0_S", ["-v", "0", "-S"]),
    ("v0_a", ["-v", "0", "-a"]),
    ("v0_k3", ["-v", "0", "-k", "3"]),
    ("v0_m1", ["-v", "0", "-m", "1"]),
    ("v0_am2", ["-v", "0", "-a", "-m", "2"]),
    ("v0_nofw", ["-v", "0", "--nofw"]),
    ("v0_norc", ["-v", "0", "--norc"]),
    ("v0_SM1", ["-v", "0", "-S", "-M", "1"]),
    ("v0_M1", ["-v", "0", "-M", "1"]),
    ("v0_m2_S", ["-v", "0", "-m", "2", "-S"]),
]


def run_cli(args, tmp_path):
    from bowtie_tpu.cli import align as cli
    out = tmp_path / "out.txt"
    cli.main(args + ["--quiet", IDX, READS, str(out)])
    # strip @PG (contains the command line)
    lines = [l for l in out.read_bytes().splitlines(keepends=True)
             if not l.startswith(b"@PG")]
    return b"".join(lines)


@pytest.mark.parametrize("key,args", CASES)
def test_parity(key, args, tmp_path):
    golden = open(os.path.join(GOLDEN, f"{key}.out"), "rb").read()
    mine = run_cli(args, tmp_path)
    assert mine == golden
