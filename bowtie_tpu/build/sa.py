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

import numpy as np


def suffix_array(codes: np.ndarray) -> np.ndarray:
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
    BIG = np.int64(n + 2)
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
    """Same SA computed on-device (TPU): each doubling round is one
    64-bit key sort (rank*base + shifted-rank packed into one int64)."""
    import jax
    import jax.numpy as jnp

    n = len(codes)
    base = n + 2

    @jax.jit
    def round_fn(r, k):
        r2 = jnp.where(jnp.arange(n + 1) + k <= n,
                       jnp.roll(r, -k).at[-1].set(0), 0)
        # guard: roll wraps, mask anything past the end
        idx = jnp.arange(n + 1)
        r2 = jnp.where(idx + k <= n, r2, 0)
        key = r * base + r2
        order = jnp.argsort(key)
        sk = key[order]
        grp = jnp.concatenate([jnp.zeros(1, jnp.int64),
                               jnp.cumsum((sk[1:] != sk[:-1])
                                          .astype(jnp.int64))])
        nr = jnp.zeros(n + 1, jnp.int64).at[order].set(grp)
        return nr, order, grp[-1]

    r = np.zeros(n + 1, dtype=np.int64)
    r[:n] = codes.astype(np.int64) + 1
    r = __import__("jax.numpy", fromlist=["asarray"]).asarray(r)
    k = 1
    while True:
        r, order, maxg = round_fn(r, k)
        if int(maxg) == n:
            return np.asarray(order)
        k *= 2
