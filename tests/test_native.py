"""Native C++ I/O runtime: parse parity with the Python readers."""
import os

import numpy as np
import pytest

from tests.conftest import READS_DIR


def test_native_fastq_matches_python():
    from bowtie_tpu.native.build import build_native
    if build_native() is None:
        pytest.skip("no C++ toolchain")
    from bowtie_tpu.native.fastq_native import parse_fastq_bytes
    from bowtie_tpu.io.readers import parse_fastq
    from bowtie_tpu.utils.alphabet import seq_to_codes

    path = os.path.join(READS_DIR, "e_coli_1000.fq")
    buf = open(path, "rb").read()
    names, seqs, quals, codes, lens = parse_fastq_bytes(buf)
    py = list(parse_fastq(path, use_native=False))
    assert len(py) == len(names) == 1000
    for i in (0, 1, 500, 999):
        assert names[i] == py[i][0]
        assert seqs[i] == py[i][1]
        assert quals[i] == py[i][2]
        np.testing.assert_array_equal(codes[i][:lens[i]],
                                      seq_to_codes(py[i][1]))


def test_native_sam_format():
    import ctypes
    from bowtie_tpu.native.build import load_native
    lib = load_native()
    if lib is None:
        pytest.skip("no C++ toolchain")
    out = ctypes.create_string_buffer(512)
    n = lib.format_sam_hit(
        b"r1", 2, 16, b"chr1", 4, ctypes.c_int64(100), 255, 35,
        b"*", 1, ctypes.c_int64(0), ctypes.c_int64(0),
        b"ACGT", 4, b"IIII", 4, 0, b"35", 2, 0, 1,
        out, ctypes.c_int64(512))
    line = out.raw[:n]
    assert line == b"r1\t16\tchr1\t100\t255\t35M\t*\t0\t0\tACGT\tIIII" \
                   b"\tXA:i:0\tMD:Z:35\tNM:i:0\tXM:i:1\n"
