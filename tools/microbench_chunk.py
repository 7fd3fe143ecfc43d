#!/usr/bin/env python3
"""Microbench: band-proportional chunked cycle patterns for kernel v3.

Validates + times the Mosaic building blocks the chunked rewrite needs:
  1. lax.fori_loop with TRACED bounds inside the kernel's while_loop
  2. dynamic-offset sublane loads/stores (ref[pl.ds(ro, CR)]) incl. +8 pad
  3. sublane-fold tb byte packing ([CR,128] i32 -> [CR//4,128] 4x8bit)
  4. per-chunk DMA to a dynamically-offset HBM slice, deferred wait

Compares a full-window sweep (WR rows/cycle) against a chunked sweep
(NR live rows/cycle) doing the same per-row work: 7 plane loads, a
transition-sized ALU block, 5 stores, vb update, packed tb DMA.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -0x40000000


def build(WR, CR, T, NR, chunked, n_dma_slots=4):
    WRP = WR + 8          # pad rows so CR+8 loads never go OOB
    CRB = CR + 8
    WR4 = WR // 4

    def kernel(out_ref, tb_ref, rA, rB, rC, rD, rE, rF, rG,
               tA, tB, tC, tD, tE, vb, tbrow, *sems):
        for r in (rA, rB, rC, rD, rE, rF, rG):
            r[:] = jnp.full((WRP, 128), 3, jnp.int32)
        for r in (tA, tB, tC, tD, tE, vb):
            r[:] = jnp.full((WRP, 128), 1, jnp.int32)
        tbrow[:] = jnp.zeros(tbrow.shape, jnp.int32)

        def alu(blks, c):
            a, b_, c_, d, e, f, g = blks
            e1 = jnp.maximum(a, b_) + c
            e2 = jnp.maximum(c_, d) + 1
            f1 = jnp.maximum(e, f) + 1
            f2 = jnp.maximum(g, a) + 1
            z = jnp.where(e1 >= e2, 1, 3)
            h = jnp.maximum(jnp.maximum(e1, e2), jnp.maximum(f1, f2))
            z = jnp.where(a + 1 >= h, 0, z)
            bits = (e1 < e2).astype(jnp.int32) << 3 | z
            return h, e1, f1, e2, f2, bits

        def cycle(t, _):
            if chunked:
                nc = (NR + CR - 1) // CR + (t & 1)  # traced bound

                def chunk(ci, carry):
                    ro = ci * CR
                    blks = [r[pl.ds(ro, CRB)][:CR] for r in
                            (rA, rB, rC, rD, rE, rF, rG)]
                    h, e1, f1, e2, f2, bits = alu(blks, t)
                    tA[pl.ds(ro, CR)] = h
                    tB[pl.ds(ro, CR)] = e1
                    tC[pl.ds(ro, CR)] = f1
                    tD[pl.ds(ro, CR)] = e2
                    tE[pl.ds(ro, CR)] = f2
                    vb[pl.ds(ro, CR)] = (vb[pl.ds(ro, CR)] << 1) & 0xFFFF
                    # pack 4 sublane rows into one int32 row
                    p = bits.reshape(CR // 4, 4, 128)
                    packed = (p[:, 0] | (p[:, 1] << 8) | (p[:, 2] << 16)
                              | (p[:, 3] << 24))
                    slot = lax.rem(ci, n_dma_slots)
                    sem = sems[0].at[slot]
                    tbrow[pl.ds(slot, 1)] = packed[None]
                    cp = pltpu.make_async_copy(
                        tbrow.at[slot],
                        tb_ref.at[t % 64, pl.ds(ro // 4, CR // 4)], sem)
                    cp.start()
                    cp.wait()   # TODO deferred wait variant
                    return carry + jnp.max(h)

                acc = lax.fori_loop(0, nc, chunk, jnp.int32(0))
            else:
                blks = [r[:] [:WR] for r in (rA, rB, rC, rD, rE, rF, rG)]
                h, e1, f1, e2, f2, bits = alu(blks, t)
                tA[0:WR], tB[0:WR], tC[0:WR] = h, e1, f1
                tD[0:WR], tE[0:WR] = e2, f2
                vb[0:WR] = (vb[0:WR] << 1) & 0xFFFF
                p = bits.reshape(WR // 4, 4, 128)
                packed = (p[:, 0] | (p[:, 1] << 8) | (p[:, 2] << 16)
                          | (p[:, 3] << 24))
                sem = sems[0].at[0]
                cp = pltpu.make_async_copy(
                    tbrow.at[0], tb_ref.at[t % 64], sem)
                tbrow[0, 0:WR4] = packed
                cp.start()
                cp.wait()
                acc = jnp.max(h)
            return acc

        acc = lax.fori_loop(0, T, cycle, jnp.int32(0))
        out_ref[0, 0] = acc

    tb_rows = (max(CR // 4, 1)) if chunked else WR4
    scratch = [
        *[pltpu.VMEM((WRP, 128), jnp.int32) for _ in range(7)],   # rings
        *[pltpu.VMEM((WRP, 128), jnp.int32) for _ in range(6)],   # tops+vb
        pltpu.VMEM((n_dma_slots, tb_rows, 128), jnp.int32),       # tbrow
        pltpu.SemaphoreType.DMA((n_dma_slots,)),
    ]
    fn = pl.pallas_call(
        kernel,
        grid=(1,),
        out_shape=(jax.ShapeDtypeStruct((1, 1), jnp.int32),
                   jax.ShapeDtypeStruct((64, WR4, 128), jnp.int32)),
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    return jax.jit(lambda: fn())


def run(WR, CR, T, NR, chunked):
    fn = build(WR, CR, T, NR, chunked)
    r = jax.block_until_ready(fn())     # compile+warm
    t0 = time.perf_counter()
    for _ in range(3):
        r = jax.block_until_ready(fn())
    dt = (time.perf_counter() - t0) / 3
    rows = NR if chunked else WR
    print(f"WR={WR} CR={CR} NR={NR} chunked={int(chunked)}: "
          f"{dt/T*1e6:8.2f} us/cycle  ({dt/T/max(rows,1)*1e9:6.1f} ns/row)",
          flush=True)
    return dt / T


if __name__ == "__main__":
    T = 20000
    WR = 184
    run(WR, 0, T, WR, False)
    for CR in (8, 16, 32):
        for NR in (16, 48, 80, 184):
            run(WR, CR, T, NR, True)
