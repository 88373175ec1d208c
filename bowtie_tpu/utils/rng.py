"""Bowtie's pseudo-random generator and per-read seeds, vectorized.

Bit-exact re-implementation of:
- RandomSource (random_source.h:15-55): LCG a=1664525 c=1013904223;
  nextU32 = step, take high 16 as low bits... precisely:
      last = a*last + c ; ret = last >> 16
      last = a*last + c ; ret ^= last
- genRandSeed (pat.cpp:21-56): per-read seed from sequence codes,
  quality chars, name chars and the global --seed.

Reproducing these exactly is required for output parity: they decide
which row of a BWT range gets reported under -k 1, random tie-breaks in
backtracking, and -M sampling (sam.cpp:270-312).
"""
from __future__ import annotations

import numpy as np

_A = np.uint32(1664525)
_C = np.uint32(1013904223)
_M32 = np.uint64(0xFFFFFFFF)


def next_u32(state: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One RandomSource::nextU32 step.  state: uint32 array (or scalar).
    Returns (new_state, value)."""
    with np.errstate(over="ignore"):
        s1 = (_A * state + _C).astype(np.uint32)
        ret = s1 >> np.uint32(16)
        s2 = (_A * s1 + _C).astype(np.uint32)
        return s2, (ret ^ s2).astype(np.uint32)


class BtRandom:
    """Scalar convenience wrapper matching RandomSource usage."""

    def __init__(self, seed: int):
        self.state = np.uint32(seed)

    def next_u32(self) -> int:
        self.state, v = next_u32(self.state)
        return int(v)


def gen_rand_seed(seq_codes: np.ndarray, qual: bytes | np.ndarray,
                  name: bytes | np.ndarray, seed: int) -> np.uint32:
    """Per-read seed (genRandSeed, pat.cpp:21).

    seq_codes: uint8 codes (0..4) of the *forward* read.
    qual/name: ASCII bytes.
    """
    with np.errstate(over="ignore"):
        rseed = np.uint32(np.uint64((seed + 101)) *
                          np.uint64(59 * 61 * 67 * 71 * 73 * 79 * 83) & _M32)
        sc = np.asarray(seq_codes, dtype=np.uint32)
        i = np.arange(len(sc), dtype=np.uint32)
        rseed ^= np.bitwise_xor.reduce(sc << ((i & 15) << 1)) if len(sc) else 0
        q = np.frombuffer(bytes(qual), dtype=np.uint8).astype(np.uint32) \
            if not isinstance(qual, np.ndarray) else qual.astype(np.uint32)
        i = np.arange(len(q), dtype=np.uint32)
        rseed ^= np.bitwise_xor.reduce(q << ((i & 3) << 3)) if len(q) else 0
        nm = np.frombuffer(bytes(name), dtype=np.uint8).astype(np.uint32) \
            if not isinstance(name, np.ndarray) else name.astype(np.uint32)
        i = np.arange(len(nm), dtype=np.uint32)
        rseed ^= np.bitwise_xor.reduce(nm << ((i & 3) << 3)) if len(nm) else 0
        return np.uint32(rseed)
