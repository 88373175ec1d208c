#!/usr/bin/env python
"""Microbenchmark the primitive ops the lockstep machines are built
from, on the real TPU: dynamic gathers/scatters (sparse core) vs
one-hot masked sweeps (VPU), at engine-realistic shapes.

Each case is timed as a jitted loop of ITER chained applications (data
dependency prevents elision), so per-op cost = wall / ITER.

Usage: python scripts/microbench_ops.py [B] [ITER]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from functools import partial

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
ITER = int(sys.argv[2]) if len(sys.argv) > 2 else 300
L = 40
S = 6
W = 353
TBL = 4_641_654


def timed(name, fn, *args):
    fn_j = jax.jit(fn)
    r = fn_j(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    r = fn_j(*args)
    jax.block_until_ready(r)
    dt = time.time() - t0
    print(f"{name:55s} {dt / ITER * 1e6:9.1f} us/op", flush=True)


def loop(body):
    def fn(x, *args):
        def it(i, x):
            return body(x, *args, i)
        return jax.lax.fori_loop(0, ITER, it, x)
    return fn


key = jax.random.PRNGKey(0)
tbl = jnp.arange(TBL, dtype=jnp.int32)
tbl4 = jnp.tile(jnp.arange(TBL, dtype=jnp.int32)[:, None], (1, 4))
idx = jax.random.randint(key, (B,), 0, TBL, jnp.int32)
stk = jnp.zeros((B * S, W), jnp.int32)
rows = jnp.zeros((B, W), jnp.int32)
sd = jax.random.randint(key, (B,), 0, S, jnp.int32)
arr_l = jnp.zeros((B, L), jnp.int32)
arr_l8 = jnp.zeros((B, L * 8), jnp.int32)
d = jax.random.randint(key, (B,), 0, L, jnp.int32)
vec = jnp.zeros((B,), jnp.int32)

# 1. 1-D table gather (rank/SA/ftab lookups), via reshape(-1,1) trick
timed("g1: [B] gather from [4.6M] (reshape -1,1)",
      loop(lambda x, t, i, _i=None: x + t.reshape(-1, 1)
           [(idx + x[0]) % TBL][..., 0]), vec, tbl)

# 2. row gather [B, 4] from [4.6M, 4] (dense occ quartet)
timed("occ: [B,4] row gather from [4.6M,4]",
      loop(lambda x, t, i: x + t[(idx + x[0]) % TBL].sum(1)), vec, tbl4)

# 3. stack push: scatter [B] rows of W=353 into [B*S, W]
brow = jnp.arange(B, dtype=jnp.int32) * S


def push(x, i):
    tgt = brow + (sd + x[0, 0]) % S
    return x.at[tgt].set(x[:B] + 1, mode="drop", unique_indices=True)


timed("push: scatter [B] rows W=353 into [B*6,353]",
      loop(lambda x, i: push(x, i)), stk)

# 4. stack pop: gather [B] rows of W=353
timed("pop: gather [B] rows W=353 from [B*6,353]",
      loop(lambda x, s, i: x + s[brow + (sd + x[0]) % S].sum(1)
           .astype(jnp.int32)), vec, stk)

# 5. one-hot sweep write [B, L]
timed("sweep-write [B,40] one-hot",
      loop(lambda x, i: jnp.where(
          jax.lax.broadcasted_iota(jnp.int32, (1, L), 1) ==
          ((d + x[0, 0]) % L)[:, None], x + 1, x)), arr_l)

# 6. one-hot sweep write [B, L*8]
timed("sweep-write [B,320] one-hot (pairs row)",
      loop(lambda x, i: jnp.where(
          jax.lax.broadcasted_iota(jnp.int32, (1, L * 8), 1) ==
          (((d + x[0, 0]) % L) * 8)[:, None], x + 1, x)), arr_l8)

# 7. one-hot sweep read (sel_col) [B, L]
timed("sel_col [B] from [B,40] one-hot read",
      loop(lambda x, a, i: x + jnp.sum(jnp.where(
          jax.lax.broadcasted_iota(jnp.int32, (B, L), 1) ==
          ((d + x[0]) % L)[:, None], a, 0), axis=1)), vec, arr_l)

# 8. index-arithmetic gather [B, 8] from [B, 320] (p8 pattern)
timed("p8: [B,8] idx-arith gather from [B,320]",
      loop(lambda x, a, i: x + a[jnp.arange(B)[:, None],
                                 (((d + x[0]) % L) * 8)[:, None] +
                                 jnp.arange(8, dtype=jnp.int32)]
           .sum(1)), vec, arr_l8)

# 9. element scatter [B] into [B, 40]
timed("scatter-write [B] elems into [B,40]",
      loop(lambda x, i: x.at[jnp.arange(B, dtype=jnp.int32),
                             (d + x[0, 0]) % L].set(
          x[:, 0] + 1, mode="drop", unique_indices=True)), arr_l)

# 10. full sweep write stk-sized (one-hot over S slots)
def sweep_stk(x, i):
    slot = (sd + x[0, 0]) % S
    m = (jax.lax.broadcasted_iota(jnp.int32, (B, S), 1) ==
         slot[:, None])
    mf = jnp.repeat(m.reshape(B * S, 1), 1, axis=1)
    return jnp.where(mf, x + 1, x)


timed("sweep-write [B*6,353] one-hot (stk as sweep)",
      loop(sweep_stk), stk)

# 11. compact rank: checkpoint row + 8-word popcount
wpb = 8
NW = ((TBL // 16) // wpb + 1) * wpb
bwt = jnp.zeros(NW, jnp.uint32)
ck = jnp.zeros((TBL // 128 + 1, 4), jnp.int32)
pats = jnp.array([0, 0x55555555, 0xAAAAAAAA, 0xFFFFFFFF], jnp.uint32)


def rank4c(x, i):
    ii = (idx + x[0]) % TBL
    blk = ii // 128
    base = ck[blk]
    words = bwt.reshape(-1, wpb)[blk]
    rem = ii - blk * 128
    nl = jnp.clip(rem[:, None] - 16 * jnp.arange(wpb), 0, 16)
    keep = jnp.where(nl <= 0, jnp.uint32(0),
                     jnp.uint32(0xFFFFFFFF) >>
                     (32 - 2 * jnp.clip(nl, 1, 16)).astype(jnp.uint32))
    s = 0
    for c in range(4):
        xw = ~(words ^ pats[c])
        hits = xw & (xw >> 1) & jnp.uint32(0x55555555)
        s = s + jax.lax.population_count(hits & keep).astype(jnp.int32) \
            .sum(-1)
    return x + base.sum(1) + s


timed("rank4 compact: ck row + [B,8]word popcounts",
      loop(rank4c), vec)


# 12. fused [2B,4] row gather (one op for top+bot quartets)
idx2 = jnp.concatenate([idx, (idx * 7) % TBL])
timed("occ2: [2B,4] fused row gather",
      loop(lambda x, t, i: x + t[(idx2 + x[0]) % TBL].sum(1)[:B]),
      vec, tbl4)

# 13. cond-gated sweep, predicate false (overhead of the gate)
pred_false = jnp.zeros((B,), jnp.int32)


def gated(x, i):
    return jax.lax.cond(jnp.any(pred_false + x[0, 0] > ITER * 2),
                        lambda a: a + 1, lambda a: a, x)


timed("cond(any=False) gating a [B,40] op", loop(gated), arr_l)


def gated_true(x, i):
    return jax.lax.cond(jnp.any(x >= 0),
                        lambda a: jnp.where(
                            jax.lax.broadcasted_iota(
                                jnp.int32, (1, L), 1) ==
                            ((d + a[0, 0]) % L)[:, None], a + 1, a),
                        lambda a: a, x)


timed("cond(any=True) around [B,40] sweep", loop(gated_true), arr_l)
print("done", flush=True)
