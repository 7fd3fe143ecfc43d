#!/usr/bin/env python3
"""Isolate per-cycle cost of the wavefront loop on the real chip.

Times the jitted aligner at several (B, W, S_CAP) points with synthetic
pairs whose alignment terminates late (forcing ~S_CAP cycles), to separate
fixed call overhead from per-cycle cost.
"""
import time

import numpy as np
import jax

from miniwfa_tpu.ops import pack
from miniwfa_tpu.ops.wavefront import MODE_SCORE, MODE_TB, WfSpec, get_aligner


def mk_inputs(spec, n, div, seed=0):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    ts, qs = [], []
    for _ in range(spec.B):
        t = bases[rng.integers(0, 4, size=n)]
        q = t.copy()
        m = rng.random(n) < div
        q[m] = bases[rng.integers(0, 4, size=int(m.sum()))]
        ts.append(t.tobytes())
        qs.append(q.tobytes())
    tw = pack.pack_ways(ts, spec.LT, spec.cpw)
    qw = pack.pack_ways(qs, spec.LQ, spec.cpw)
    tl = np.full((spec.B,), n, np.int32)
    ql = np.full((spec.B,), n, np.int32)
    seg_s = np.full((spec.B, spec.seg_cap), -9, np.int32)
    seg_d = np.zeros((spec.B, spec.seg_cap), np.int32)
    n_seg = np.zeros((spec.B,), np.int32)
    return (tw, qw, tl, ql, seg_s, seg_d, n_seg)


def run(tag, B, W, S_CAP, n, div, mode=MODE_SCORE, reps=3):
    import os
    spec = WfSpec(B=B, W=W, S_CAP=S_CAP, LT=max(128, 1 << (n - 1).bit_length()),
                  LQ=max(128, 1 << (n - 1).bit_length()),
                  x=4, o1=4, e1=2, o2=15, e2=1, mode=mode,
                  kw=int(os.environ.get("MWF_KW", "4")),
                  a_active=int(os.environ.get("MWF_A", "64")))
    fn = get_aligner(spec)
    args = mk_inputs(spec, n, div)
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    s = np.asarray(out["final_s"])
    cells = (np.asarray(out["n_iter_hi"], np.int64) << 30) | np.asarray(out["n_iter_lo"])
    cyc = int(s.max()) if s.max() > 0 else S_CAP
    print(f"{tag:28s} B={B:3d} W={W:5d} S={S_CAP:5d} n={n:6d} "
          f"wall={dt*1e3:8.2f}ms cyc={cyc:6d} per_cyc={dt/cyc*1e6:8.1f}us "
          f"cells/s={cells.sum()/dt:12.3e} ovf={int(np.asarray(out['overflow']).sum())}")


def main():
    print("devices:", jax.devices())
    run("tiny trivial", 8, 512, 256, 200, 0.02)
    run("2k score", 8, 512, 512, 2000, 0.02)
    run("2k score B=64", 64, 512, 512, 2000, 0.02)
    run("2k score W=1024", 8, 1024, 512, 2000, 0.02)
    run("8k score", 8, 1024, 2048, 8000, 0.02)
    run("8k score B=32", 32, 1024, 2048, 8000, 0.02)
    run("2k tb", 8, 512, 512, 2000, 0.02, mode=MODE_TB)


if __name__ == "__main__":
    main()
