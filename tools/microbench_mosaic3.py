#!/usr/bin/env python3
"""Primitives for the fused-cycle kernel, round 2:

1) ax1 same-shape gather with gather dim = 128 lanes (1 vreg), many sublane rows
2) pltpu.roll with traced (dynamic) shift
3) dynamic lane slice  ref[0, pl.ds(b, 128)]  with unaligned traced b
4) dynamic sublane slice ref[pl.ds(r, 2), :] traced r
5) SMEM scalar scratch: write vector-derived scalars, loop over them
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 200
REPS = 5


def run_case(name, kern, out_shape, inputs, scratch=(), check=None, iters=ITERS):
    @jax.jit
    def run(*args):
        return pl.pallas_call(
            kern,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=list(scratch),
        )(*args)

    try:
        out = jax.block_until_ready(run(*inputs))
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = jax.block_until_ready(run(*inputs))
        dt = (time.perf_counter() - t0) / REPS / iters
        ok = "" if check is None else f" correct={check(np.asarray(out))}"
        print(f"{name:46s} {dt*1e6:8.2f} us/op{ok}")
    except Exception as e:
        lines = [l for l in str(e).splitlines() if "Not implemented" in l or "error:" in l.lower()]
        detail = lines[0][:110] if lines else str(e).splitlines()[0][:110]
        print(f"{name:46s} FAIL {type(e).__name__}: {detail}")


def main():
    print(jax.__version__, jax.devices())
    key = jax.random.PRNGKey(0)

    # 1) ax1 gather [WR,128] in loop, WR = 32 and 128
    for WR in (32, 128):
        tab = jax.random.randint(key, (WR, 128), 0, 1 << 20, jnp.int32)
        idx = jax.random.randint(key, (WR, 128), 0, 128, jnp.int32)

        def kern(t_ref, i_ref, o_ref):
            def body(n, ix):
                g = jnp.take_along_axis(t_ref[:], ix, axis=1)
                return jnp.remainder(g, 128)
            o_ref[:] = jax.lax.fori_loop(0, ITERS, body, i_ref[:])

        def chk(out, tab=tab, idx=idx):
            ref = np.asarray(idx)
            t = np.asarray(tab)
            for _ in range(ITERS):
                ref = np.remainder(np.take_along_axis(t, ref, axis=1), 128)
            return bool(np.array_equal(ref, out))

        run_case(f"ax1 gather [{WR},128] loop", kern,
                 jax.ShapeDtypeStruct((WR, 128), jnp.int32), (tab, idx), check=chk)

    # 2) dynamic roll along lanes
    x = jax.random.randint(key, (8, 256), 0, 1 << 20, jnp.int32)

    def kern_roll(x_ref, o_ref):
        def body(n, acc):
            sh = acc[0, 0] & 0xFF
            return pltpu.roll(acc, sh, 1) + 1
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])

    run_case("dynamic roll lanes [8,256]", kern_roll,
             jax.ShapeDtypeStruct((8, 256), jnp.int32), (x,))

    # 3) dynamic lane slice (unaligned traced start) from a [1, NW] vmem ref
    NW = 8192
    tab1 = jax.random.randint(key, (1, NW), 0, 1 << 20, jnp.int32)
    starts = jax.random.randint(key, (1, ITERS), 0, NW - 128, jnp.int32)

    def kern_ls(t_ref, s_ref, o_ref):
        def body(n, acc):
            b = s_ref[0, n]
            w = t_ref[0, pl.ds(b, 128)]
            return acc + w.reshape(1, 128)
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((1, 128), jnp.int32))

    def chk_ls(out):
        t = np.asarray(tab1)[0]
        s = np.asarray(starts)[0]
        ref = np.zeros(128, np.int64)
        for n in range(ITERS):
            ref += t[s[n]:s[n] + 128]
        return bool(np.array_equal(ref.astype(np.int32), out[0]))

    run_case("dyn lane slice [1,8192]->128", kern_ls,
             jax.ShapeDtypeStruct((1, 128), jnp.int32), (tab1, starts), check=chk_ls)

    # 4) dynamic sublane slice (traced row) from [NR, 128]
    NR = 512
    tab2 = jax.random.randint(key, (NR, 128), 0, 1 << 20, jnp.int32)
    rows = jax.random.randint(key, (1, ITERS), 0, NR - 2, jnp.int32)

    def kern_ss(t_ref, r_ref, o_ref):
        def body(n, acc):
            r = r_ref[0, n]
            w = t_ref[pl.ds(r, 2), :]
            return acc + w
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((2, 128), jnp.int32))

    def chk_ss(out):
        t = np.asarray(tab2)
        r = np.asarray(rows)[0]
        ref = np.zeros((2, 128), np.int64)
        for n in range(ITERS):
            ref += t[r[n]:r[n] + 2]
        return bool(np.array_equal(ref.astype(np.int32), out))

    run_case("dyn sublane slice [512,128]->2 rows", kern_ss,
             jax.ShapeDtypeStruct((2, 128), jnp.int32), (tab2, rows), check=chk_ss)

    # 5) SMEM scratch: vector -> smem scalars -> scalar loop of dyn slices
    WR = 32
    tabw = jax.random.randint(key, (1, NW), 0, 1 << 20, jnp.int32)
    bases = jax.random.randint(key, (WR, 1), 0, NW - 128, jnp.int32)

    def kern_refill(t_ref, b_ref, o_ref, smem):
        # move per-row bases into smem via scalar reads of a vmem ref
        def body(r, _):
            smem[r] = b_ref[r, 0]
            return 0
        jax.lax.fori_loop(0, WR, body, 0)

        def body2(r, _):
            b = smem[r]
            o_ref[pl.ds(r, 1), :] = t_ref[0, pl.ds(b, 128)].reshape(1, 128)
            return 0
        jax.lax.fori_loop(0, WR, body2, 0)

    def chk_rf(out):
        t = np.asarray(tabw)[0]
        b = np.asarray(bases)[:, 0]
        ref = np.stack([t[x:x + 128] for x in b])
        return bool(np.array_equal(ref, out))

    run_case(f"refill {WR} rows via smem scalars", kern_refill,
             jax.ShapeDtypeStruct((WR, 128), jnp.int32), (tabw, bases),
             scratch=(pltpu.SMEM((WR,), jnp.int32),), check=chk_rf, iters=WR)


if __name__ == "__main__":
    main()
