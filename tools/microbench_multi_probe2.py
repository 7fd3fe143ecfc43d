#!/usr/bin/env python3
"""Round 2 probes: isolate the lane_mask SIGABRT and fix ring4 indexing."""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G, R, L = 4, 64, 128


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


# A: keepdims 3D reduction only
def k_a(x_ref, o_ref):
    lo = jnp.min(x_ref[:], axis=(1, 2), keepdims=True)   # [G,1,1]
    o_ref[:] = jnp.where(x_ref[:] >= lo + 5, x_ref[:], -1)


def f_a(x, interpret=False):
    return pl.pallas_call(k_a, out_shape=jax.ShapeDtypeStruct(
        (G, R, L), jnp.int32), interpret=interpret)(x)


# B: per-lane scalar extraction to SMEM via [G,1,1] indexing
def k_b(x_ref, o_ref, s_ref):
    red = jnp.max(x_ref[:], axis=(1, 2), keepdims=True)  # [G,1,1]
    o_ref[:] = x_ref[:]
    for g in range(G):
        s_ref[g] = red[g, 0, 0]


def f_b(x, interpret=False):
    return pl.pallas_call(
        k_b,
        out_shape=[jax.ShapeDtypeStruct((G, R, L), jnp.int32),
                   jax.ShapeDtypeStruct((G,), jnp.int32)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        interpret=interpret)(x)


# C: two-step reduction (axis 2 then 1)
def k_c(x_ref, o_ref):
    lo = jnp.min(jnp.min(x_ref[:], axis=2, keepdims=True),
                 axis=1, keepdims=True)
    o_ref[:] = jnp.where(x_ref[:] >= lo + 5, x_ref[:], -1)


def f_c(x, interpret=False):
    return pl.pallas_call(k_c, out_shape=jax.ShapeDtypeStruct(
        (G, R, L), jnp.int32), interpret=interpret)(x)


# D: fixed ring4 — 4D scratch, dynamic leading index, ds middle dim
def k_d(x_ref, o_ref, ring):
    def body(j, _):
        ring[j % 3] = x_ref[:] + j
        return 0
    lax.fori_loop(0, 5, body, 0)
    o_ref[:] = ring[1, :, pl.ds(8, R), :]


def f_d(x, interpret=False):
    return pl.pallas_call(
        k_d, out_shape=jax.ShapeDtypeStruct((G, R, L), jnp.int32),
        scratch_shapes=[pltpu.VMEM((3, G, R + 8, L), jnp.int32)],
        interpret=interpret)(jnp.pad(x, ((0, 0), (0, 8), (0, 0))))


# E: dynamic leading index by traced slot + write [G,CR,128] into
#    ring[slot, :, ds(ro, CR), :]
def k_e(x_ref, o_ref, ring):
    def body(j, _):
        slot = j % 3
        ring[slot, :, pl.ds(8, R), :] = x_ref[:, 0:R, :] + j
        return 0
    lax.fori_loop(0, 5, body, 0)
    o_ref[:] = ring[1, :, pl.ds(8, R), :]


def f_e(x, interpret=False):
    return pl.pallas_call(
        k_e, out_shape=jax.ShapeDtypeStruct((G, R, L), jnp.int32),
        scratch_shapes=[pltpu.VMEM((3, G, R + 8, L), jnp.int32)],
        interpret=interpret)(jnp.pad(x, ((0, 0), (0, 8), (0, 0))))


# F: boolean any() over 3D to [G,1,1] + scalar loop-carried use
def k_f(x_ref, o_ref):
    m = x_ref[:] > 50
    anyg = jnp.max(jnp.where(m, 1, 0), axis=(1, 2), keepdims=True)
    o_ref[:] = jnp.where(anyg > 0, x_ref[:], 0)


def f_f(x, interpret=False):
    return pl.pallas_call(k_f, out_shape=jax.ShapeDtypeStruct(
        (G, R, L), jnp.int32), interpret=interpret)(x)


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 100, (G, R, L), dtype=np.int32))
    print("backend:", jax.default_backend())
    for name, fn, args in [("A keepdims-red", f_a, (x,)),
                           ("B smem-extract", f_b, (x,)),
                           ("C two-step-red", f_c, (x,)),
                           ("D ring4-read", f_d, (x,)),
                           ("E ring4-write", f_e, (x,)),
                           ("F any3d", f_f, (x,))]:
        ri = probe(name + " (interp)", fn, *args, interpret=True)
        rr = probe(name, fn, *args)
        if ri is not None and rr is not None:
            print(f"     parity: "
                  f"{all(np.array_equal(a, b) for a, b in zip(ri, rr))}")
