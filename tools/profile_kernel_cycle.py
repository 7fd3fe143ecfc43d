#!/usr/bin/env python3
"""Attribute the VMEM kernel's ~13us fixed per-cycle cost.

Runs the fused kernel directly (SCORE mode, fixed max_s so every
variant executes the same cycle count) under the build-time knobs:
  full        — production kernel
  ext1        — extension capped at 1 probe round (no refill loops)
  noext       — extension skipped entirely (no probes, no refills)
Differences isolate (refill rounds), (first probe round), (everything
else: transition sweep + DMAs + loop scaffolding).

Each variant needs a fresh process (kernel builds cache per process):
  python tools/profile_kernel_cycle.py          # orchestrates all
  python tools/profile_kernel_cycle.py one full # one variant
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

N = int(os.environ.get("PKC_N", 100_000))
MAXS = int(os.environ.get("PKC_MAXS", 4096))
WR = int(os.environ.get("PKC_WR", 512))
CR = int(os.environ.get("PKC_CR", 64))


def one(variant):
    if variant == "ext1":
        os.environ["MWF_KDBG_EXT1"] = "1"
    elif variant == "noext":
        os.environ["MWF_KDBG_NOEXT"] = "1"
    elif variant == "nosweep":
        os.environ["MWF_KDBG_NOEXTSWEEP"] = "1"
    from miniwfa_tpu.ops import wavefront_kernel as wk
    from bench import mutate
    import random

    rng = random.Random(7)
    t = "".join(rng.choice("ACGT") for _ in range(N))
    q = mutate(rng, t, sub=0.02, ind=0.002)
    ts, qs = t.encode(), q.encode()
    spec = wk.KSpec(B=1, WR=WR, S_CAP=MAXS + 128, x=4, o1=4, e1=2,
                    o2=15, e2=1, mode=wk.MODE_SCORE, cpw=16,
                    cr=CR,
                    nseg=wk.nseg_for(max(len(ts), len(qs)), 16))
    scal = np.zeros((1, wk.SC_SEG + 2), np.int32)
    scal[0, wk.SC_MS] = MAXS
    scal[0, wk.SC_TL] = len(ts)
    scal[0, wk.SC_QL] = len(qs)
    scal[0, wk.SC_ANC] = (len(qs) - len(ts)) // 2 - spec.W // 2
    twt = wk.pack_table([ts], 16, spec.nseg)
    twq = wk.pack_table([qs], 16, spec.nseg)
    fn = wk.get_kernel(spec)
    out = {k: np.asarray(v) for k, v in fn(scal, twt, twq).items()}
    t0 = time.perf_counter()
    out = {k: np.asarray(v) for k, v in fn(scal, twt, twq).items()}
    dt = time.perf_counter() - t0
    ni = (int(out["n_iter_hi"][0]) << 30) | int(out["n_iter_lo"][0])
    cyc = MAXS  # stopped at max_s (all variants)
    print(f"{variant:6s} wall={dt*1e3:7.1f}ms cycles={cyc} "
          f"us/cycle={dt/cyc*1e6:6.2f} cells={ni} "
          f"({ni/dt/1e6:.0f}M c/s)", flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        one(sys.argv[2])
        return
    for v in ("full", "ext1", "noext", "nosweep"):
        subprocess.run([sys.executable, __file__, "one", v], check=True)


if __name__ == "__main__":
    main()
