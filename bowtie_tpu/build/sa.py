"""Suffix-array construction.

The reference builds its SA with a blockwise Kärkkäinen scheme
(blockwise_sa.h:183: difference-cover sample + multikey quicksort per
bucket) so the whole SA never resides in memory — a cache/memory
optimization for 2005-era hosts.  On TPU the natural formulation is
prefix-doubling over device-wide sorts (the role Larsson-Sadakane plays
for the reference's DC sample, ls.h:43, applied to the whole text):
O(log n) rounds of a radix sort that XLA maps to its highly tuned
on-device sort. A vectorized host (numpy) variant is provided for CPU
builds; both produce the identical SA.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_SAIS = None


def _load_sais():
    """Native SA-IS library (native/sais.cpp), compiled on demand."""
    global _SAIS
    if _SAIS is not None:
        return _SAIS or None
    here = os.path.join(os.path.dirname(__file__), "..", "native")
    lib_path = os.path.join(here, "libbtsais.so")
    src_path = os.path.join(here, "sais.cpp")
    try:
        if (not os.path.exists(lib_path) or
                os.path.getmtime(lib_path) < os.path.getmtime(src_path)):
            import subprocess
            subprocess.run(["g++", "-O3", "-march=native", "-shared",
                            "-fPIC", "-o", lib_path, src_path],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(lib_path)
        lib.sais_bowtie.restype = ctypes.c_int
        lib.sais_bowtie32.restype = ctypes.c_int
        _SAIS = lib
        return lib
    except Exception:
        _SAIS = False
        return None


def suffix_array(codes: np.ndarray) -> np.ndarray:
    """Bowtie-order SA (empty suffix last).  Uses the native linear-time
    SA-IS when available; falls back to vectorized prefix doubling."""
    lib = _load_sais()
    n = len(codes)
    if lib is not None:
        c = np.ascontiguousarray(codes, dtype=np.uint8)
        if n < 2**31 - 2:
            sa = np.empty(n + 1, dtype=np.int32)
            rc = lib.sais_bowtie32(
                c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.c_int32(n),
                sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        else:
            sa = np.empty(n + 1, dtype=np.int64)
            rc = lib.sais_bowtie(
                c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.c_int64(n),
                sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        if rc == 0:
            return sa.astype(np.int64)
    return _suffix_array_doubling(codes)


def _suffix_array_doubling(codes: np.ndarray) -> np.ndarray:
    """SA of `codes` + implicit terminal sentinel, with bowtie's
    ordering convention: the sentinel is LARGER than every character,
    i.e. a suffix that is a proper prefix of another sorts AFTER it
    (the empty suffix is the final SA row — see Ebwt::restore,
    ebwt.h:2767, which starts from row len).

    Returns int64 array of length n+1; element n of the array is the
    empty-suffix entry (value n) at the LAST row.  Prefix doubling
    with numpy lexsort.
    """
    n = len(codes)
    # sentinel rank must exceed every char rank (codes+1 <= 4), even
    # for tiny texts where n+2 < 6
    BIG = np.int64(max(n + 2, 6))
    # rank[i] of suffix i under first-char ordering; sentinel sorts last
    r = np.zeros(n + 1, dtype=np.int64)
    r[:n] = codes.astype(np.int64) + 1
    r[n] = BIG
    k = 1
    sa = np.empty(n + 1, dtype=np.int64)
    while True:
        # extension key: rank of suffix i+k, or BIG when the suffix is
        # shorter than k (short suffixes sort after their extensions)
        r2 = np.full(n + 1, BIG, dtype=np.int64)
        if k <= n:
            r2[: n + 1 - k] = r[k:]
        order = np.lexsort((r2, r))
        # new ranks: same (r, r2) pair -> same rank
        key_r = r[order]
        key_r2 = r2[order]
        new_group = np.empty(n + 1, dtype=np.int64)
        new_group[0] = 0
        new_group[1:] = ((key_r[1:] != key_r[:-1]) |
                         (key_r2[1:] != key_r2[:-1])).cumsum()
        nr = np.empty(n + 1, dtype=np.int64)
        nr[order] = new_group
        r = nr
        if new_group[-1] == n:
            sa = order
            break
        k *= 2
    return sa


def suffix_array_jax(codes: np.ndarray) -> np.ndarray:
    """Same SA computed on-device (TPU): prefix doubling where each
    round is one stable two-key `lax.sort`.

    Matches `_suffix_array_doubling`'s bowtie ordering exactly: the
    sentinel rank and the missing-extension rank are both BIG
    (empty-suffix-LAST, the convention of Ebwt::restore ebwt.h:2767).
    Two-operand `lax.sort` avoids packing ranks into one integer, so
    plain int32 is safe for any n < 2**31 (no x64 requirement).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    n = len(codes)
    if n >= 2**31 - 2:
        raise ValueError("suffix_array_jax supports n < 2**31-2")
    BIG = np.int32(max(n + 2, 6))

    @jax.jit
    def round_fn(r, k):
        idx = jnp.arange(n + 1, dtype=jnp.int32)
        # rank of suffix i+k; BIG when suffix i is shorter than k
        r2 = jnp.where(idx + k <= n, jnp.roll(r, -k), BIG)
        # stable two-key sort: primary r, secondary r2, payload idx
        sk1, sk2, order = lax.sort((r, r2, idx), num_keys=2,
                                   is_stable=True)
        grp = jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             jnp.cumsum(((sk1[1:] != sk1[:-1]) |
                         (sk2[1:] != sk2[:-1])).astype(jnp.int32))])
        nr = jnp.zeros(n + 1, jnp.int32).at[order].set(grp)
        return nr, order, grp[-1]

    r0 = np.full(n + 1, BIG, dtype=np.int32)
    r0[:n] = codes.astype(np.int32) + 1
    r = jnp.asarray(r0)
    k = 1
    while True:
        r, order, maxg = round_fn(r, np.int32(min(k, n + 1)))
        if int(maxg) == n:
            return np.asarray(order).astype(np.int64)
        k *= 2
