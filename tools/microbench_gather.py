#!/usr/bin/env python3
"""Measure TPU gather strategies with loop-VARYING indices (so nothing can
be hoisted out of the while_loop).  Each variant runs N_IT iterations of a
while_loop whose body gathers [B, W] int32 values from a [B, K] table at
indices that depend on the carry.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

N_IT = 200


def bench(name, make_fn, *args):
    fn = jax.jit(make_fn)
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    dt = time.perf_counter() - t0
    per = dt / N_IT
    print(f"{name:45s} {per*1e6:9.1f} us/iter")
    return out


def main():
    print("devices:", jax.devices())
    for B, W, K in ((8, 512, 2048), (8, 4096, 8192), (32, 512, 2048),
                    (64, 2048, 8192)):
        print(f"--- B={B} W={W} K={K}")
        key = jax.random.PRNGKey(0)
        table = jax.random.randint(key, (B, K), 0, 1 << 20, jnp.int32)
        idx0 = jax.random.randint(key, (B, W), 0, K, jnp.int32)

        def loop(body):
            def f(table, idx0):
                def b(c):
                    t, acc, idx = c
                    g = body(table, idx)
                    acc = acc + g
                    idx = jnp.bitwise_and(idx + g, K - 1)  # carry-dependent
                    return t + 1, acc, idx
                return lax.while_loop(lambda c: c[0] < N_IT, b,
                                      (jnp.int32(0), jnp.zeros((B, W), jnp.int32), idx0))
            return f

        def g_taa(table, idx):
            return jnp.take_along_axis(table, idx, axis=1)

        def g_flat(table, idx):
            ar = jnp.arange(B, dtype=jnp.int32)[:, None]
            flat = (ar * K + idx).reshape(1, B * W)
            return jnp.take_along_axis(table.reshape(1, B * K), flat,
                                       axis=1).reshape(B, W)

        def g_onehot(table, idx):
            # gather via fp32 one-hot matmul on the MXU; values < 2^20 exact
            oh = (idx[:, :, None] == jnp.arange(K, dtype=jnp.int32)[None, None, :])
            g = jnp.einsum("bwk,bk->bw", oh.astype(jnp.float32),
                           table.astype(jnp.float32))
            return g.astype(jnp.int32)

        bench("take_along_axis [B,W]", loop(g_taa), table, idx0)
        bench("flattened 1-row gather", loop(g_flat), table, idx0)
        if W * K <= 1 << 24:
            bench("one-hot fp32 matmul", loop(g_onehot), table, idx0)


if __name__ == "__main__":
    main()
