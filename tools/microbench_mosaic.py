#!/usr/bin/env python3
"""Measure Mosaic primitives that gate the fused-cycle kernel design:

a) same-shape ax1 gather [R, M] timing vs (R, M)
b) per-element variable shifts on uint32
c) population_count
d) while/fori loop inside kernel with scalar carry
e) async VMEM->HBM row write at dynamic offset

Timing: each kernel runs the op ITERS times in a fori_loop; wall time over
REPS calls / (ITERS*REPS) = per-op cost (launch overhead amortized).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 1000
REPS = 5


def timeit(fn, *args):
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / REPS / ITERS
    return dt, out


def bench_gather(R, M):
    def kern(t_ref, i_ref, o_ref):
        def body(n, acc):
            g = jnp.take_along_axis(t_ref[:], i_ref[:] + (acc[0, 0] & 0), axis=1)
            return g
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, i_ref[:])

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, M), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    key = jax.random.PRNGKey(0)
    tab = jax.random.randint(key, (R, M), 0, 1 << 20, jnp.int32)
    idx = jax.random.randint(key, (R, M), 0, M, jnp.int32)
    try:
        dt, _ = timeit(run, tab, idx)
        print(f"gather ax1 [{R},{M}]: {dt*1e6:8.2f} us/op  ({dt*1e9/(R*M):.3f} ns/el)")
    except Exception as e:
        print(f"gather ax1 [{R},{M}]: FAIL {type(e).__name__}: {str(e).splitlines()[0][:90]}")


def bench_gather_ax0(R, M):
    def kern(t_ref, i_ref, o_ref):
        def body(n, acc):
            return jnp.take_along_axis(t_ref[:], i_ref[:] + (acc[0, 0] & 0), axis=0)
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, i_ref[:])

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, M), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    key = jax.random.PRNGKey(0)
    tab = jax.random.randint(key, (R, M), 0, 1 << 20, jnp.int32)
    idx = jax.random.randint(key, (R, M), 0, R, jnp.int32)
    try:
        dt, _ = timeit(run, tab, idx)
        print(f"gather ax0 [{R},{M}]: {dt*1e6:8.2f} us/op  ({dt*1e9/(R*M):.3f} ns/el)")
    except Exception as e:
        print(f"gather ax0 [{R},{M}]: FAIL {type(e).__name__}: {str(e).splitlines()[0][:90]}")


def bench_varshift(R, M):
    def kern(x_ref, s_ref, o_ref):
        def body(n, acc):
            return jnp.right_shift(acc, s_ref[:].astype(jnp.uint32)) | jnp.uint32(1)
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:].astype(jnp.uint32)).astype(jnp.int32)

    @jax.jit
    def run(x, s):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, M), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, s)

    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (R, M), 0, 1 << 20, jnp.int32)
    s = jax.random.randint(key, (R, M), 0, 31, jnp.int32)
    try:
        dt, _ = timeit(run, x, s)
        print(f"varshift   [{R},{M}]: {dt*1e6:8.2f} us/op")
    except Exception as e:
        print(f"varshift   [{R},{M}]: FAIL {type(e).__name__}: {str(e).splitlines()[0][:90]}")


def bench_popcount(R, M):
    def kern(x_ref, o_ref):
        def body(n, acc):
            return jax.lax.population_count(acc) + jnp.int32(7)
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, M), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (R, M), 0, 1 << 20, jnp.int32)
    try:
        dt, _ = timeit(run, x)
        print(f"popcount   [{R},{M}]: {dt*1e6:8.2f} us/op")
    except Exception as e:
        print(f"popcount   [{R},{M}]: FAIL {type(e).__name__}: {str(e).splitlines()[0][:90]}")


def bench_hbm_row_write(S, W):
    """Write one [W] uint8 row per loop iter into an HBM [S, W] output at a
    dynamic row index (the tb_bits pattern)."""
    def kern(x_ref, o_hbm, vrow, sem):
        def body(t, acc):
            vrow[:] = (x_ref[:] + t).astype(jnp.uint8).reshape(1, W)
            cp = pltpu.make_async_copy(vrow, o_hbm.at[pl.ds(t % S, 1)], sem)
            cp.start()
            cp.wait()
            return acc
        jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((S, W), jnp.uint8),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.VMEM((1, W), jnp.uint8),
                            pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(x)

    x = jnp.zeros((W,), jnp.int32).reshape(1, W)
    x = jnp.broadcast_to(x, (1, W)).astype(jnp.int32)
    try:
        dt, _ = timeit(run, jnp.zeros((1, W), jnp.int32))
        print(f"hbm row wr [{S},{W}]: {dt*1e6:8.2f} us/row")
    except Exception as e:
        print(f"hbm row wr [{S},{W}]: FAIL {type(e).__name__}: {str(e).splitlines()[0][:90]}")


def bench_while_scalar(M):
    """while_loop with scalar carry + vector state in VMEM scratch."""
    def kern(x_ref, o_ref, acc_ref):
        acc_ref[:] = x_ref[:]

        def cond(c):
            return c < ITERS

        def body(c):
            acc_ref[:] = acc_ref[:] + 1
            return c + 1

        jax.lax.while_loop(cond, body, jnp.int32(0))
        o_ref[:] = acc_ref[:]

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, M), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((8, M), jnp.int32)],
        )(x)

    try:
        dt, out = timeit(run, jnp.zeros((8, M), jnp.int32))
        ok = bool((np.asarray(out) == ITERS).all())
        print(f"while+vmem [8,{M}]: {dt*1e6:8.2f} us/iter correct={ok}")
    except Exception as e:
        print(f"while+vmem [8,{M}]: FAIL {type(e).__name__}: {str(e).splitlines()[0][:90]}")


def main():
    print(jax.__version__, jax.devices())
    for R, M in [(8, 512), (8, 2048), (8, 8192), (8, 16384), (32, 2048), (128, 1024)]:
        bench_gather(R, M)
    for R, M in [(8, 2048), (64, 2048), (512, 128)]:
        bench_gather_ax0(R, M)
    bench_varshift(8, 2048)
    bench_varshift(128, 1024)
    bench_popcount(8, 2048)
    bench_popcount(128, 1024)
    bench_while_scalar(2048)
    bench_hbm_row_write(1024, 2048)


if __name__ == "__main__":
    main()
