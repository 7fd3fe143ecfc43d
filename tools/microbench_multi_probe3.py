#!/usr/bin/env python3
"""Round 3 probes: scalar extraction from [G,1,1], per-g slice stacking,
[G,1,1] while-loop carries, per-g dynamic subwindow slices."""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G, R, L, SR = 4, 64, 128, 8


def red3(x, op):  # two-step per-lane reduction -> [G,1,1]
    return op(op(x, axis=2, keepdims=True), axis=1, keepdims=True)


def probe(name, fn, *args, interpret=False):
    try:
        out = jax.jit(functools.partial(fn, interpret=interpret))(*args)
        out = [np.asarray(o) for o in jax.tree_util.tree_leaves(out)]
        print(f"OK   {name}: {[o.shape for o in out]} "
              f"sum={sum(int(o.sum()) for o in out)}")
        return out
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return None


# A: scalar extraction from two-step reduction -> SMEM + fori bound
def k_a(x_ref, o_ref, s_ref):
    red = red3(x_ref[:], jnp.max)           # [G,1,1]
    o_ref[:] = x_ref[:]
    for g in range(G):
        s_ref[g] = red[g, 0, 0]
    lo = jnp.min(red)                        # full-scalar reduce of [G,1,1]
    s_ref[G] = lo


def f_a(x, interpret=False):
    return pl.pallas_call(
        k_a,
        out_shape=[jax.ShapeDtypeStruct((G, R, L), jnp.int32),
                   jax.ShapeDtypeStruct((G + 1,), jnp.int32)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        interpret=interpret)(x)


# B: per-g dynamic-offset SR-row slices stacked to [G,SR,L], then write
def k_b(x_ref, o_ref):
    offs = red3(x_ref[:], jnp.min)           # [G,1,1] data-dependent
    o_ref[:] = x_ref[:]
    parts = []
    for g in range(G):
        a = jnp.clip(offs[g, 0, 0] % (R - SR), 0, R - SR)
        parts.append(x_ref[g, pl.ds(a, SR), :][None])
    sub = jnp.concatenate(parts, 0)          # [G,SR,L]
    sub = sub * 2
    for g in range(G):
        a = jnp.clip(offs[g, 0, 0] % (R - SR), 0, R - SR)
        o_ref[g, pl.ds(a, SR), :] = sub[g]


def f_b(x, interpret=False):
    return pl.pallas_call(
        k_b, out_shape=jax.ShapeDtypeStruct((G, R, L), jnp.int32),
        interpret=interpret)(x)


# C: while_loop with [G,1,1] carries + 3D body ops + t scalar
def k_c(x_ref, o_ref):
    def cond(c):
        t, done, _ = c
        return (t < 16) & (jnp.min(done) == 0)

    def body(c):
        t, done, acc = c
        m = (x_ref[:] + t) % 7 == 0
        cnt = red3(jnp.where(m, 1, 0), jnp.sum)
        acc = acc + cnt
        done = jnp.where(acc > 300, 1, done)
        return t + 1, done, acc

    z = jnp.zeros((G, 1, 1), jnp.int32)
    t, done, acc = lax.while_loop(cond, body, (jnp.int32(0), z, z))
    o_ref[:] = x_ref[:] * 0 + acc


def f_c(x, interpret=False):
    return pl.pallas_call(
        k_c, out_shape=jax.ShapeDtypeStruct((G, R, L), jnp.int32),
        interpret=interpret)(x)


# D: build [G,1,1] from G traced scalars (scal prefetch pattern)
def k_d(s_ref, x_ref, o_ref):
    vals = [jnp.full((1, 1, 1), s_ref[g], jnp.int32) for g in range(G)]
    v = jnp.concatenate(vals, 0)
    o_ref[:] = x_ref[:] + v


def f_d(s, x, interpret=False):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    return pl.pallas_call(
        k_d, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((G, R, L), jnp.int32),
        interpret=interpret)(s, x)


# E: [8,128] bound-plane write from [G,1,1] + dynamic-slot VMEM registry
def k_e(x_ref, o_ref, reg):
    lo = red3(x_ref[:], jnp.min)             # [G,1,1]
    row = jnp.concatenate(
        [jnp.broadcast_to(lo.reshape(G, 1), (G, L)),
         jnp.zeros((8 - G, L), jnp.int32)], 0)

    def body(j, _):
        reg[j % 3] = row + j
        return 0
    lax.fori_loop(0, 5, body, 0)
    got = reg[1, 0:G, 0:1].reshape(G, 1, 1)
    o_ref[:] = x_ref[:] + got


def f_e(x, interpret=False):
    return pl.pallas_call(
        k_e, out_shape=jax.ShapeDtypeStruct((G, R, L), jnp.int32),
        scratch_shapes=[pltpu.VMEM((3, 8, L), jnp.int32)],
        interpret=interpret)(x)


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 100, (G, R, L), dtype=np.int32))
    s = jnp.asarray(rng.integers(0, 9, (G,), dtype=np.int32))
    print("backend:", jax.default_backend())
    for name, fn, args in [("A scalar-extract", f_a, (x,)),
                           ("B per-g-stack", f_b, (x,)),
                           ("C while-G11", f_c, (x,)),
                           ("D build-G11", f_d, (s, x)),
                           ("E bnd-registry", f_e, (x,))]:
        ri = probe(name + " (interp)", fn, *args, interpret=True)
        rr = probe(name, fn, *args)
        if ri is not None and rr is not None:
            print(f"     parity: "
                  f"{all(np.array_equal(a, b) for a, b in zip(ri, rr))}")
