#!/usr/bin/env python3
"""Clean device-rate measurement: N_IT large enough that per-call host
overhead (axon tunnel, up to ~100ms) is noise."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B, W, K = 8, 512, 2080
N_IT = 20000


def bench(name, fn, *args):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(*args))
    dt = time.perf_counter() - t0
    print(f"{name:58s} {dt/N_IT*1e6:8.2f} us/iter  ({dt*1e3:.1f} ms/call)")


def main():
    print(jax.__version__, jax.devices())
    key = jax.random.PRNGKey(0)
    table = jax.random.randint(key, (B, K), 0, 1 << 20, jnp.int32)
    rnd = jax.random.randint(jax.random.PRNGKey(1), (B, W), 0, K, jnp.int32)
    arW = jnp.arange(W, dtype=jnp.int32)

    def loop(idx_fn):
        def f(table):
            def b(c):
                t, acc = c
                idx = idx_fn(t, acc)
                g = jnp.take_along_axis(table, jnp.clip(idx, 0, K - 1), axis=1)
                return t + 1, acc + g
            return lax.while_loop(lambda c: c[0] < N_IT, b,
                                  (jnp.int32(0), jnp.zeros((B, W), jnp.int32)))
        return f

    bench("distinct iota idx", loop(lambda t, a: (arW[None, :] + t) % K), table)
    bench("all-equal idx", loop(lambda t, a: jnp.full((B, W), 7, jnp.int32)
                                 + t % 64), table)
    bench("random-ish feedback idx", loop(lambda t, a: (rnd + a) % K), table)
    bench("runs-of-16 dup idx", loop(lambda t, a: ((arW[None, :] // 16) + t) % K),
          table)
    # no gather baseline
    def nog(table):
        def b(c):
            t, acc = c
            return t + 1, acc + t
        return lax.while_loop(lambda c: c[0] < N_IT, b,
                              (jnp.int32(0), jnp.zeros((B, W), jnp.int32)))
    bench("no gather baseline", nog, table)


if __name__ == "__main__":
    main()
