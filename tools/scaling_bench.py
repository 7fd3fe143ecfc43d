#!/usr/bin/env python3
"""Data-parallel scaling-efficiency benchmark.

Measures cells/s of the sharded aligner at mesh sizes 1, 2, 4, ... over the
available devices and reports efficiency vs linear scaling.  On a CPU host
it fabricates an 8-device virtual mesh (the multi-host stand-in per
SURVEY.md §4); on real pods run under jax.distributed
(miniwfa_tpu.parallel.distributed.init) with one process per host.

Usage: python tools/scaling_bench.py [pair_bp] [pairs_per_device]
"""
import os
import sys
import time

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()

import jax

if not os.environ.get("MWF_SCALING_REAL"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from miniwfa_tpu import Options
from miniwfa_tpu.parallel.batch import align_batch_sharded
from miniwfa_tpu.parallel.mesh import make_mesh
from miniwfa_tpu.utils.cache import enable_compile_cache


def mk_pairs(n_pairs, n, div=0.02, seed=0):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    pairs = []
    for _ in range(n_pairs):
        t = bases[rng.integers(0, 4, n)]
        q = t.copy()
        m = rng.random(n) < div
        q[m] = bases[rng.integers(0, 4, int(m.sum()))]
        pairs.append((t.tobytes(), q.tobytes()))
    return pairs


def main():
    enable_compile_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    per_dev = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    devs = jax.devices()
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= len(devs)]
    opt = Options()
    base = None
    print(f"devices: {len(devs)} x {devs[0].platform}")
    for nd in sizes:
        mesh = make_mesh(devs[:nd])
        pairs = mk_pairs(per_dev * nd, n)
        align_batch_sharded(pairs, opt, mesh)  # warm / compile
        t0 = time.perf_counter()
        res = align_batch_sharded(pairs, opt, mesh)
        dt = time.perf_counter() - t0
        cells = sum(r.n_iter for r in res)
        cps = cells / dt
        if base is None:
            base = cps
        eff = cps / (base * nd) * 100
        print(f"mesh={nd:2d}  pairs={len(pairs):3d}  wall={dt:7.3f}s  "
              f"cells/s={cps:12.3e}  scaling_eff={eff:6.1f}%")


if __name__ == "__main__":
    main()
