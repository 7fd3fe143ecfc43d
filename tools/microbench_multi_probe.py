#!/usr/bin/env python3
"""Probe Mosaic support for the ops the multi-lane (G-stacked) kernel
needs: 3D same-shape take_along_axis on the last axis, value reshapes
[G,R,128]<->[G*R,128], [G,1]->[G,1,1] band-bound broadcasts, 3D
concatenate shifts, and 4D scratch dynamic slicing.  Run on TPU."""
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
        print(f"OK   {name}: {[o.shape for o in out]} sum={sum(o.sum() for o in out)}")
        return out
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return None


# 1. 3D take_along_axis along last axis
def k_gather3(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=2)


def gather3(x, i, interpret=False):
    return pl.pallas_call(
        k_gather3,
        out_shape=jax.ShapeDtypeStruct((G, R, L), jnp.int32),
        interpret=interpret)(x, i)


# 2. value reshape [G,R,128] -> [G*R,128], gather 2D, reshape back
def k_gather_flat(x_ref, i_ref, o_ref):
    xf = x_ref[:].reshape(G * R, L)
    i2 = i_ref[:].reshape(G * R, L)
    o_ref[:] = jnp.take_along_axis(xf, i2, axis=1).reshape(G, R, L)


def gather_flat(x, i, interpret=False):
    return pl.pallas_call(
        k_gather_flat,
        out_shape=jax.ShapeDtypeStruct((G, R, L), jnp.int32),
        interpret=interpret)(x, i)


# 3. [G,1,1] per-lane scalar broadcast masks + per-lane reductions
def k_lane_mask(x_ref, o_ref, s_ref):
    lo = jnp.min(x_ref[:], axis=(1, 2), keepdims=True)   # [G,1,1]
    m = x_ref[:] >= lo + 5
    o_ref[:] = jnp.where(m, x_ref[:], -1)
    red = jnp.max(jnp.where(m, x_ref[:], -(1 << 30)), axis=(1, 2))  # [G]
    for g in range(G):
        s_ref[g] = red[g]


def lane_mask(x, interpret=False):
    return pl.pallas_call(
        k_lane_mask,
        out_shape=[jax.ShapeDtypeStruct((G, R, L), jnp.int32),
                   jax.ShapeDtypeStruct((G,), jnp.int32)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        interpret=interpret)(x)


# 4. 3D shm/shp shifts with per-lane carry columns
def k_shift3(x_ref, o_ref):
    a = x_ref[:]
    left = jnp.concatenate(
        [jnp.full((G, R, 1), -7, a.dtype), a[:, :, :-1]], 2)
    carry = jnp.concatenate(
        [jnp.full((G, 1, L), -9, a.dtype), a[:, :-1, :]], 1)[:, :, L - 1:L]
    ii = lax.broadcasted_iota(jnp.int32, (G, R, L), 2)
    o_ref[:] = jnp.where(ii == 0, carry, left)


def shift3(x, interpret=False):
    return pl.pallas_call(
        k_shift3,
        out_shape=jax.ShapeDtypeStruct((G, R, L), jnp.int32),
        interpret=interpret)(x)


# 5. 4D VMEM scratch ring: dynamic leading index + middle-dim ds slice
def k_ring4(x_ref, o_ref, ring):
    def body(j, _):
        ring[j % 3] = x_ref[:] + j
        return 0
    lax.fori_loop(0, 5, body, 0)
    o_ref[:] = ring[1][:, pl.ds(8, R), :]


def ring4(x, interpret=False):
    return pl.pallas_call(
        k_ring4,
        out_shape=jax.ShapeDtypeStruct((G, R, L), jnp.int32),
        scratch_shapes=[pltpu.VMEM((3, G, R + 8, L), jnp.int32)],
        interpret=interpret)(jnp.pad(x, ((0, 0), (0, 8), (0, 0))))


# 6. [8,128] bound plane -> [G,1,1] reshape broadcast
def k_bnd(x_ref, b_ref, o_ref):
    bl = b_ref[0:G, 0:1]                  # [G,1]
    blv = bl.reshape(G, 1, 1)
    o_ref[:] = jnp.where(x_ref[:] >= blv, x_ref[:], -3)


def bnd(x, b, interpret=False):
    return pl.pallas_call(
        k_bnd,
        out_shape=jax.ShapeDtypeStruct((G, R, L), jnp.int32),
        interpret=interpret)(x, b)


# 7. dynamic ds on the G*CR-stacked sub-window (straggler round shape)
def k_sub(x_ref, o_ref):
    s = x_ref[:, pl.ds(16, 8), :]         # [G,8,128]
    o_ref[:, 0:8, :] = s * 2
    o_ref[:, 8:R, :] = x_ref[:, 8:R, :]


def sub(x, interpret=False):
    return pl.pallas_call(
        k_sub, out_shape=jax.ShapeDtypeStruct((G, R, L), jnp.int32),
        interpret=interpret)(x)


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 100, (G, R, L), dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, L, (G, R, L), dtype=np.int32))
    b = jnp.asarray(rng.integers(0, 50, (8, L), dtype=np.int32))
    print("backend:", jax.default_backend())
    ref = {}
    for name, fn, args in [
            ("gather3", gather3, (x, idx)),
            ("gather_flat", gather_flat, (x, idx)),
            ("lane_mask", lane_mask, (x,)),
            ("shift3", shift3, (x,)),
            ("ring4", ring4, (x,)),
            ("bnd", bnd, (x, b)),
            ("sub", sub, (x,))]:
        ref[name] = probe(name + " (interp)", fn, *args, interpret=True)
    for name, fn, args in [
            ("gather3", gather3, (x, idx)),
            ("gather_flat", gather_flat, (x, idx)),
            ("lane_mask", lane_mask, (x,)),
            ("shift3", shift3, (x,)),
            ("ring4", ring4, (x,)),
            ("bnd", bnd, (x, b)),
            ("sub", sub, (x,))]:
        out = probe(name, fn, *args)
        if out is not None and ref[name] is not None:
            same = all(np.array_equal(a, c) for a, c in zip(out, ref[name]))
            print(f"     {name} parity vs interpret: {same}")
