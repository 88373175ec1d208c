"""bowtie-build parity: our builder's output must be byte-identical to
the reference bowtie-build's (golden small-genome index committed in
tests/golden/small_index, built with `-o 5 -t 7`)."""
import os

import numpy as np
import pytest

HERE = os.path.dirname(__file__)
FASTA = os.path.join(HERE, "golden", "small_genome.fa")
GOLD = os.path.join(HERE, "golden", "small_index", "small_oracle")

EXTS = [".1.ebwt", ".2.ebwt", ".3.ebwt", ".4.ebwt",
        ".rev.1.ebwt", ".rev.2.ebwt"]


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    from bowtie_tpu.build.builder import build_from_fasta
    base = str(tmp_path_factory.mktemp("idx") / "small")
    build_from_fasta([FASTA], base, off_rate=5, ftab_chars=7)
    return base


@pytest.mark.parametrize("ext", EXTS)
def test_build_byte_identical(built, ext):
    mine = open(built + ext, "rb").read()
    gold = open(GOLD + ext, "rb").read()
    assert mine == gold


@pytest.mark.parametrize("ext", EXTS)
def test_build_jax_sa_byte_identical(tmp_path, ext):
    """`--jax-sa` (on-device prefix-doubling SA) must write the exact
    same index bytes as the host SA paths."""
    from bowtie_tpu.build.builder import build_from_fasta
    from bowtie_tpu.build.sa import suffix_array_jax
    base = str(tmp_path / "smallj")
    build_from_fasta([FASTA], base, off_rate=5, ftab_chars=7,
                     sa_fn=suffix_array_jax)
    assert open(base + ext, "rb").read() == open(GOLD + ext, "rb").read()


def test_roundtrip_align_on_built_index(built):
    """Align reads sampled from the small genome against our own index."""
    from bowtie_tpu.index.ebwt_io import read_ebwt
    from bowtie_tpu.align.golden import GoldenFM
    from bowtie_tpu.io.readers import parse_fasta
    from bowtie_tpu.utils.alphabet import seq_to_codes

    idx = read_ebwt(built)
    g = GoldenFM(idx)
    seqs = [seq_to_codes(s) for _, s, _ in parse_fasta(FASTA)]
    rng = np.random.default_rng(3)
    for _ in range(25):
        ridx = int(rng.integers(0, len(seqs)))
        s = seqs[ridx]
        pos = int(rng.integers(0, len(s) - 30))
        q = s[pos:pos + 30]
        if (q > 3).any():
            continue
        top, bot = g.exact_range(q)
        assert bot > top
        found = False
        for r in range(top, bot):
            res = g.joined_to_text_off(30, g.resolve_row(r))
            if res and res[0] == ridx and res[1] == pos:
                found = True
        assert found


def test_inspect_roundtrip(built):
    """build -> inspect -> same FASTA records (incl. N runs)."""
    import io
    from bowtie_tpu.build.inspect import inspect
    from bowtie_tpu.io.readers import parse_fasta

    out = io.StringIO()
    inspect(built, out=out)
    got = out.getvalue().encode()
    want_records = list(parse_fasta(FASTA))
    # reparse inspect output
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".fa", delete=False) as f:
        f.write(got)
        path = f.name
    got_records = list(parse_fasta(path))
    assert len(got_records) == len(want_records)
    for (gn, gs, _), (wn, ws, _) in zip(got_records, want_records):
        assert gn == wn
        assert gs.upper() == ws.upper()


def test_inspect_lf_restore_matches(built):
    """-e path: text reconstructed purely from the BWT equals .3/.4."""
    import io
    from bowtie_tpu.build.inspect import inspect

    a, b = io.StringIO(), io.StringIO()
    inspect(built, out=a)
    inspect(built, use_ebwt=True, out=b)
    assert a.getvalue() == b.getvalue()


GOLD_L = os.path.join(HERE, "golden", "small_index_l", "small_oracle")
EXTS_L = [".1.ebwtl", ".2.ebwtl", ".3.ebwtl", ".4.ebwtl",
          ".rev.1.ebwtl", ".rev.2.ebwtl"]


@pytest.fixture(scope="module")
def built_large(tmp_path_factory):
    from bowtie_tpu.build.builder import build_from_fasta
    base = str(tmp_path_factory.mktemp("idxl") / "small")
    build_from_fasta([FASTA], base, off_rate=5, ftab_chars=7, large=True)
    return base


@pytest.mark.parametrize("ext", EXTS_L)
def test_large_index_byte_identical(built_large, ext):
    """.ebwtl (64-bit, lineRate=7 sides) matches bowtie-build -l."""
    assert open(built_large + ext, "rb").read() == \
           open(GOLD_L + ext, "rb").read()


def test_large_index_reader_and_search(built_large):
    import numpy as np
    from bowtie_tpu.index.ebwt_io import read_ebwt
    from bowtie_tpu.align.golden import GoldenFM
    from bowtie_tpu.io.readers import parse_fasta
    from bowtie_tpu.utils.alphabet import seq_to_codes
    idx = read_ebwt(built_large)
    assert idx.off_size == 8
    g = GoldenFM(idx)
    seqs = [seq_to_codes(s) for _, s, _ in parse_fasta(FASTA)]
    q = seqs[0][200:232]
    t, b = g.exact_range(q)
    assert b > t
    offs = [g.joined_to_text_off(32, g.resolve_row(r))
            for r in range(t, b)]
    assert (0, 200, len(seqs[0])) in offs


# --- builder flag parity vs the compiled reference builder ---
ORACLE_BUILD = os.path.join(os.path.dirname(HERE), ".oracle",
                            "bowtie-build-s")


@pytest.mark.skipif(not os.path.exists(ORACLE_BUILD),
                    reason="oracle builder not built")
@pytest.mark.parametrize("flags,exts", [
    (["--ntoa"], EXTS),
    (["-3"], [".3.ebwt", ".4.ebwt"]),
    (["--big"], EXTS),
    (["-r"], [".1.ebwt", ".2.ebwt", ".rev.1.ebwt", ".rev.2.ebwt"]),
])
def test_build_flag_parity(tmp_path, flags, exts):
    """--ntoa / -3 / --big / -r output must byte-match the reference
    builder (incl. --big's quirk: only `.3` honors the endianness flag,
    ebwt_build.cpp:379-383 vs ebwt.h:361)."""
    import subprocess
    from bowtie_tpu.cli.build import main as build_main
    ref_base = str(tmp_path / "ref")
    my_base = str(tmp_path / "mine")
    subprocess.run([ORACLE_BUILD, *flags, "-o", "5", "-t", "7",
                    FASTA, ref_base], check=True, capture_output=True)
    assert build_main([*flags, "-o", "5", "-t", "7", "-q",
                       FASTA, my_base]) == 0
    for ext in exts:
        assert (open(my_base + ext, "rb").read() ==
                open(ref_base + ext, "rb").read()), ext
    if "-3" in flags or "-r" in flags:
        skipped = set(EXTS) - set(exts)
        for ext in skipped:
            assert not os.path.exists(my_base + ext), ext


EDGE_GENOMES = {
    # trailing Ns become a zero-length trailing RefRecord in `.3`
    "trailing_n": ">a\nACGTACGTACGTACGTACGTNNNNN\n"
                  ">b\nNNNNACGTACGTACGTACGTACGTGGGG\n",
    # an all-N sequence is demoted to a bare gap record: no name, no
    # plen entry, first=0 (ebwt.h:3900 normalization)
    "all_n_seq": ">x\nACGTACGTACGTACGTACGT\n>allN\nNNNNNNNN\n"
                 ">y\nTTTTGGGGCCCCAAAATTTT\n",
    # a zero-length record's name concatenates onto the next
    # sequence's name (fastaRefReadAppend quirk)
    "empty_seq": ">e\n\n>x\nACGTACGTACGTACGTACGT\n",
    "leading_all_n": ">nstart\nNNNN\n>x\nACGTACGTACGTACGTACGT\n",
}


@pytest.mark.skipif(not os.path.exists(ORACLE_BUILD),
                    reason="oracle builder not built")
@pytest.mark.parametrize("name", sorted(EDGE_GENOMES))
def test_build_edge_genomes(tmp_path, name):
    """Degenerate reference inputs must build byte-identically."""
    import subprocess
    from bowtie_tpu.cli.build import main as build_main
    fa = tmp_path / "g.fa"
    fa.write_text(EDGE_GENOMES[name])
    ref_base = str(tmp_path / "ref")
    my_base = str(tmp_path / "mine")
    subprocess.run([ORACLE_BUILD, str(fa), ref_base],
                   check=True, capture_output=True)
    assert build_main(["-q", str(fa), my_base]) == 0
    for ext in EXTS:
        assert (open(my_base + ext, "rb").read() ==
                open(ref_base + ext, "rb").read()), ext


@pytest.mark.skipif(not os.path.exists(ORACLE_BUILD),
                    reason="oracle builder not built")
@pytest.mark.parametrize("genome", ["plain", "all_n_seq"])
def test_build_new_reverse(tmp_path, genome):
    """--new-reverse (REF_READ_REVERSE): the mirror index over the
    entire reversed text — reversed records, inverted rstarts, the
    EBWT_ENTIRE_REV flag, and even the reference's release-mode
    unsigned-wraparound fwoff quirk on demoted all-N gaps — must be
    byte-identical; and ALIGNING against that index must match too."""
    import subprocess
    from bowtie_tpu.cli.build import main as build_main
    texts = {
        "plain": ">a\n" + "ACGTTTGACAGGCCTTAAGC" * 10 + "\n"
                 ">b\n" + "TTGACCGGTTAACCGGTACG" * 8 + "\n",
        "all_n_seq": ">x\nACGTACGTACGTACGTACGT\n>allN\nNNNNNNNN\n"
                     ">y\nTTTTGGGGCCCCAAAATTTT\n",
    }
    fa = tmp_path / "g.fa"
    fa.write_text(texts[genome])
    ref_base = str(tmp_path / "ref")
    my_base = str(tmp_path / "mine")
    subprocess.run([ORACLE_BUILD, "--new-reverse", str(fa), ref_base],
                   check=True, capture_output=True)
    assert build_main(["--new-reverse", "-q", str(fa), my_base]) == 0
    for ext in EXTS:
        assert (open(my_base + ext, "rb").read() ==
                open(ref_base + ext, "rb").read()), ext
    # align a planted read against the new-reverse index with the host
    # engine: offsets must come out in fw coordinates
    seq = texts[genome].splitlines()[1][40:70] or "ACGTACGTACGTACGTACGT"
    reads = tmp_path / "r.fq"
    reads.write_text(f"@q\n{seq}\n+\n{'I' * len(seq)}\n")
    oracle_align = os.path.join(os.path.dirname(HERE), ".oracle",
                                "bowtie-align-s")
    if os.path.exists(oracle_align):
        r = subprocess.run([oracle_align, "--wrapper", "basic-0",
                            "-n", "1", my_base, str(reads),
                            str(tmp_path / "o.out")],
                           capture_output=True)
        assert r.returncode == 0
        from bowtie_tpu.cli.align import main as align_main
        os.environ["BOWTIE_TPU_HOST_ENGINE"] = "1"
        try:
            assert align_main(["-n", "1", my_base, str(reads),
                               str(tmp_path / "m.out")]) in (0, None)
        finally:
            os.environ.pop("BOWTIE_TPU_HOST_ENGINE", None)
        assert (open(tmp_path / "m.out", "rb").read() ==
                open(tmp_path / "o.out", "rb").read())
