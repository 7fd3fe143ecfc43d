#!/usr/bin/env python3
"""Which gather forms lower in Mosaic on this jax version?"""
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_case(name, shape_tab, shape_idx, axis, full_tb=False):
    key = jax.random.PRNGKey(0)
    tab = jax.random.randint(key, shape_tab, 0, 1 << 20, jnp.int32)
    idx = jax.random.randint(key, shape_idx, 0, shape_tab[axis], jnp.int32)

    def kern(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=axis)

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(shape_idx, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    try:
        out = jax.block_until_ready(run(tab, idx))
        ok = np.array_equal(np.asarray(out),
                            np.take_along_axis(np.asarray(tab), np.asarray(idx), axis))
        print(f"{name:50s} OK correct={ok}")
    except Exception as e:
        msg = str(e).splitlines()[0][:120] if str(e) else type(e).__name__
        print(f"{name:50s} FAIL {type(e).__name__}: {msg}")
        if full_tb:
            traceback.print_exc()


def main():
    print(jax.__version__, jax.devices())
    try_case("2d same-shape lanes [8,2048]<-[8,2048] ax1", (8, 2048), (8, 2048), 1)
    try_case("2d narrower idx [8,2048]<-[8,512] ax1", (8, 2048), (8, 512), 1, full_tb=True)
    try_case("2d wider idx [8,512]<-[8,2048] ax1", (8, 512), (8, 2048), 1)
    try_case("2d sublane axis [64,512]<-[8,512] ax0", (64, 512), (8, 512), 0)
    try_case("2d sublane same [8,512]<-[8,512] ax0", (8, 512), (8, 512), 0)
    try_case("3d minor [8,4,512]<-[8,4,512] ax2", (8, 4, 512), (8, 4, 512), 2)


if __name__ == "__main__":
    main()
