#!/usr/bin/env python3
"""Isolate: same-shape gather inside a fori_loop, with real data dependence."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 200
REPS = 5


def bench(R, M, axis, iters=ITERS, show_err=False):
    lim = M if axis == 1 else R

    def kern(t_ref, i_ref, o_ref):
        def body(n, idx):
            g = jnp.take_along_axis(t_ref[:], idx, axis=axis)
            return jnp.remainder(g, lim)  # dependence: next idx = f(gather)
        o_ref[:] = jax.lax.fori_loop(0, iters, body, i_ref[:])

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, M), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tab = jax.random.randint(k1, (R, M), 0, 1 << 20, jnp.int32)
    idx = jax.random.randint(k2, (R, M), 0, lim, jnp.int32)
    try:
        out = jax.block_until_ready(run(tab, idx))
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = jax.block_until_ready(run(tab, idx))
        dt = (time.perf_counter() - t0) / REPS / iters
        # verify one chain step on host
        ref = np.remainder(np.take_along_axis(np.asarray(tab), np.asarray(idx), axis), lim)
        for _ in range(iters - 1):
            ref = np.remainder(np.take_along_axis(np.asarray(tab), ref, axis), lim)
        ok = np.array_equal(ref, np.asarray(out))
        print(f"gather ax{axis} [{R},{M}] loop: {dt*1e6:8.2f} us/op ({dt*1e9/(R*M):.3f} ns/el) correct={ok}")
    except Exception as e:
        print(f"gather ax{axis} [{R},{M}] loop: FAIL {type(e).__name__}: {str(e).splitlines()[0][:100]}")
        if show_err:
            import traceback
            traceback.print_exc()


if __name__ == "__main__":
    if len(sys.argv) > 1:
        R, M, axis = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
        bench(R, M, axis, show_err=True)
    else:
        bench(8, 2048, 1)
        bench(8, 2048, 0)
