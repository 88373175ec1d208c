"""Multi-host launcher: 2 local jax.distributed processes must produce
a merged output byte-identical to a single-process run."""
import os
import subprocess
import sys

E_COLI = "/root/reference/indexes/e_coli"
READS = "/root/reference/reads/e_coli_1000.fq"

SNIPPET = """
import jax
jax.config.update('jax_platforms', 'cpu')
from bowtie_tpu.parallel.launch import main
raise SystemExit(main({args!r}))
"""


def test_two_host_merge(tmp_path):
    import socket
    with socket.socket() as s:
        s.bind(("", 0))
        port = s.getsockname()[1]
    out = str(tmp_path / "d.out")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    base = ["--coordinator", f"localhost:{port}", "--num-hosts", "2"]
    rest = ["--", "-v", "0", E_COLI, READS, out]
    p1 = subprocess.Popen(
        [sys.executable, "-c",
         SNIPPET.format(args=base + ["--host-id", "1"] + rest)],
        env=env, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    p0 = subprocess.run(
        [sys.executable, "-c",
         SNIPPET.format(args=base + ["--host-id", "0"] + rest)],
        env=env, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    p1.wait(timeout=600)
    assert p0.returncode == 0
    from bowtie_tpu.cli.align import main as align_main
    single = str(tmp_path / "s.out")
    align_main(["-v", "0", E_COLI, READS, single])
    assert open(out, "rb").read() == open(single, "rb").read()


def test_count_reads_formats(tmp_path):
    """Read counting must handle FASTA (multi-line), FASTQ, raw and gz
    — a wrong count would skew per-host slices and read ids."""
    import gzip
    from bowtie_tpu.parallel.launch import _count_reads, _fmt_from_opts
    fa = tmp_path / "x.fa"
    fa.write_text(">a\nACGT\nACGT\n>b\nGGGG\n>c\nTT\nTT\nTT\n")
    fq = tmp_path / "x.fq"
    fq.write_text("@a\nACGT\n+\nIIII\n@b\nGG\n+\nII\n")
    raw = tmp_path / "x.raw"
    raw.write_text("ACGT\nGGGG\n\n")
    fqgz = tmp_path / "x.fq.gz"
    with gzip.open(fqgz, "wt") as f:
        f.write("@a\nACGT\n+\nIIII\n@b\nGG\n+\nII\n@c\nAA\n+\nII\n")
    assert _count_reads(str(fa), "fasta") == 3
    assert _count_reads(str(fq), "fastq") == 2
    assert _count_reads(str(raw), "raw") == 2
    assert _count_reads(str(fqgz), "fastq") == 3
    assert _fmt_from_opts(["-f", "-v", "0"]) == "fasta"
    assert _fmt_from_opts(["--12"]) == "tab"
    assert _fmt_from_opts(["-v", "0"]) == "fastq"
