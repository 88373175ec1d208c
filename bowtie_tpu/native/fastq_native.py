"""ctypes front-end for the native FASTQ parser with a numpy interface.

Usage: parse_fastq_bytes(buf) -> (names, seqs, quals, codes_matrix).
Falls back to None when the native lib is unavailable (callers use the
pure-Python readers then).
"""
from __future__ import annotations

import ctypes

import numpy as np

from .build import load_native


def parse_fastq_bytes(buf: bytes, max_read_len: int = 1024,
                      batch: int = 1 << 20):
    """Parse all FASTQ records from `buf` with the native parser.

    Returns (names: list[bytes], seq_spans, qual_spans, codes, lens)
    where codes is a uint8 [n, max_read_len] matrix (pad 0 beyond len)
    — or None if the native library is unavailable.
    """
    lib = load_native()
    if lib is None:
        return None
    i64 = ctypes.c_int64
    n_cap = batch
    name_off = np.zeros(n_cap, np.int64)
    name_len = np.zeros(n_cap, np.int32)
    seq_off = np.zeros(n_cap, np.int64)
    seq_len = np.zeros(n_cap, np.int32)
    qual_off = np.zeros(n_cap, np.int64)
    codes = np.zeros((n_cap, max_read_len), np.uint8)
    consumed = i64(0)
    total = []
    view = buf
    out = dict(names=[], seq=[], qual=[], codes=[], lens=[])
    while view:
        n = lib.parse_fastq(
            view, len(view), n_cap, max_read_len,
            name_off.ctypes.data_as(ctypes.POINTER(i64)),
            name_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            seq_off.ctypes.data_as(ctypes.POINTER(i64)),
            seq_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            qual_off.ctypes.data_as(ctypes.POINTER(i64)),
            codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(consumed))
        if n <= 0:
            break
        for i in range(n):
            no, nl = int(name_off[i]), int(name_len[i])
            so, sl = int(seq_off[i]), int(seq_len[i])
            qo = int(qual_off[i])
            out["names"].append(view[no:no + nl])
            out["seq"].append(view[so:so + sl])
            out["qual"].append(view[qo:qo + sl])
            out["lens"].append(sl)
        out["codes"].append(codes[:n].copy())
        total.append(n)
        view = view[int(consumed.value):]
        if int(consumed.value) == 0:
            break
    if view.strip():
        # the native parser stopped before consuming the whole file
        # (malformed record, qual layout it doesn't understand, ...):
        # return None so the caller re-parses everything in pure
        # Python — NEVER silently truncate the read stream
        return None
    if not total:
        return ([], [], [], np.zeros((0, max_read_len), np.uint8), [])
    allcodes = np.concatenate(out["codes"], axis=0)
    return (out["names"], out["seq"], out["qual"], allcodes, out["lens"])
