"""Launcher-level behaviors: -A argfile batch mode, bz2 input,
BOWTIE_INDEXES resolution (the reference wrapper's jobs,
bowtie_main.cpp:31-58 + the `bowtie` python script)."""
import bz2
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE = os.path.join(REPO, ".oracle", "bowtie-align-s")
IDX = "/root/reference/indexes/e_coli"
RD = "/root/reference/reads/e_coli_1000.fq"
RD1 = "/root/reference/reads/e_coli_1000_1.fq"
RD2 = "/root/reference/reads/e_coli_1000_2.fq"


@pytest.fixture(autouse=True)
def _host_engines(monkeypatch):
    monkeypatch.setenv("BOWTIE_TPU_HOST_ENGINE", "1")


@pytest.mark.skipif(not os.path.exists(ORACLE),
                    reason="oracle binary not built")
def test_argfile_matches_binary(tmp_path):
    """-A <file>: each line is a complete argument set; -A must be the
    first option (bowtie_main.cpp:32)."""
    argfile = tmp_path / "jobs.txt"
    argfile.write_text(
        f"-v 0 -u 40 {IDX} {RD} {tmp_path}/a.out\n"
        "\n"
        f"-n 1 -u 25 -k 2 {IDX} {RD} {tmp_path}/b.out\n")
    r = subprocess.run([ORACLE, "-A", str(argfile)],
                       capture_output=True)
    assert r.returncode == 0
    ref_a = open(tmp_path / "a.out", "rb").read()
    ref_b = open(tmp_path / "b.out", "rb").read()
    # rerun through our launcher (fresh output paths)
    argfile2 = tmp_path / "jobs2.txt"
    argfile2.write_text(
        f"-v 0 -u 40 {IDX} {RD} {tmp_path}/a2.out\n"
        "\n"
        f"-n 1 -u 25 -k 2 {IDX} {RD} {tmp_path}/b2.out\n")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bin", "bowtie-tpu"),
         "-A", str(argfile2)],
        capture_output=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr.decode()[:400]
    assert open(tmp_path / "a2.out", "rb").read() == ref_a
    assert open(tmp_path / "b2.out", "rb").read() == ref_b


def test_bz2_reads_match_plain(tmp_path):
    """.bz2 reads decompress transparently (the reference wrapper
    pipes bzip2 -dc; our readers open bz2 directly)."""
    plain = open(RD, "rb").read()
    bz = tmp_path / "reads.fq.bz2"
    bz.write_bytes(bz2.compress(plain))
    from bowtie_tpu.cli.align import main
    a = tmp_path / "plain.out"
    b = tmp_path / "bz2.out"
    assert main(["-v", "0", "-u", "30", IDX, RD, str(a)]) in (0, None)
    assert main(["-v", "0", "-u", "30", IDX, str(bz), str(b)]) in (0,
                                                                   None)
    assert open(a, "rb").read() == open(b, "rb").read()


def test_bowtie_indexes_env(tmp_path, monkeypatch):
    """A bare index name resolves through $BOWTIE_INDEXES
    (adjustEbwtBase, ebwt.h:4397)."""
    monkeypatch.setenv("BOWTIE_INDEXES", os.path.dirname(IDX))
    from bowtie_tpu.cli.align import main
    a = tmp_path / "env.out"
    b = tmp_path / "direct.out"
    assert main(["-v", "0", "-u", "20", "e_coli", RD,
                 str(a)]) in (0, None)
    assert main(["-v", "0", "-u", "20", IDX, RD, str(b)]) in (0, None)
    assert open(a, "rb").read() == open(b, "rb").read()


def test_x_index_option(tmp_path, capsys):
    """-x takes the index and shifts the positionals to
    [query, output]; the positional form warns on stderr
    (ebwt_search.cpp:3358-3368)."""
    from bowtie_tpu.cli.align import main
    a = tmp_path / "xopt.out"
    b = tmp_path / "pos.out"
    assert main(["-v", "0", "-u", "20", "-x", IDX, RD,
                 str(a)]) in (0, None)
    _ = capsys.readouterr()
    assert main(["-v", "0", "-u", "20", IDX, RD, str(b)]) in (0, None)
    err = capsys.readouterr().err
    assert "deprecated in a future release" in err
    assert open(a, "rb").read() == open(b, "rb").read()
    # -x with paired input: single positional is the output file
    c = tmp_path / "xpe.out"
    assert main(["-v", "0", "-u", "10", "-x", IDX,
                 "-1", RD1, "-2", RD2, str(c)]) in (0, None)
    assert open(c, "rb").read()
