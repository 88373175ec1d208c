"""bowtie-inspect parity vs the compiled reference binary: default
FASTA reconstruction, -e (BWT restore), -n, -s and -s --extra must be
byte-identical on normal and degenerate genomes (trailing gaps, all-N
sequences, empty records).

Skipped when the inspect oracle isn't present (scripts/make_golden.sh
builds it as .oracle/bowtie-inspect-s)."""
import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE = os.path.join(REPO, ".oracle", "bowtie-inspect-s")

pytestmark = pytest.mark.skipif(not os.path.exists(ORACLE),
                                reason="inspect oracle not built")

GENOMES = {
    "plain": ">a desc\nACGTTGCAACGTGGGCCCTA\n>b\nTTGGCCAAGGTTCCAAGGTT\n",
    "trailing_n": ">a\nACGTACGTACGTACGTACGTNNNNN\n"
                  ">b\nNNNNACGTACGTACGTACGTACGTGGGG\n",
    "all_n_seq": ">x\nACGTACGTACGTACGTACGT\n>allN\nNNNNNNNN\n"
                 ">y\nTTTTGGGGCCCCAAAATTTT\n",
    "empty_seq": ">e\n\n>x\nACGTACGTACGTACGTACGT\n",
    "inner_gaps": ">g\nACGTNNNACGTACGTNNACGTACGTACGTNNNNACGT\n",
}

MODES = ["", "-e", "-n", "-s", "-s --extra", "-a 17"]


@pytest.fixture(scope="module", params=sorted(GENOMES))
def built(request, tmp_path_factory):
    d = tmp_path_factory.mktemp("inspect_" + request.param)
    fa = d / "g.fa"
    fa.write_text(GENOMES[request.param])
    base = str(d / "idx")
    from bowtie_tpu.build.builder import build_from_fasta
    build_from_fasta([str(fa)], base)
    return base


@pytest.mark.parametrize("mode", MODES)
def test_inspect_matches_binary(built, mode, capfd):
    r = subprocess.run([ORACLE, *mode.split(), built],
                       capture_output=True)
    assert r.returncode == 0
    from bowtie_tpu.cli.inspect import main
    rc = main([*mode.split(), built])
    assert rc in (0, None)
    out, _err = capfd.readouterr()
    assert out.encode() == r.stdout, f"inspect {mode} differs"
