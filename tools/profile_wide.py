#!/usr/bin/env python3
"""Wide-engine cost curve on TPU: cells/s vs live-band width.

Runs SCORE mode on synthetic pairs whose divergence sets the terminal
band (band ~ 2s), across window sizes, printing per-config cells/s and
the implied per-cycle cost — the numbers that decide where the next
optimization goes (DMA overlap vs compute vs fixed per-cycle cost).

Usage: profile_wide.py [n_bp=200000] [divs=0.002,0.01,0.02]
"""
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    from miniwfa_tpu.ops import wavefront_kernel as wk
    from miniwfa_tpu.ops import wavefront_wide as ww
    from bench import mutate

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    divs = [float(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2
                               else ["0.002", "0.01", "0.02"])]
    print(f"backend: {jax.default_backend()}  n={n}", flush=True)
    rng = random.Random(11)
    t = "".join(rng.choice("ACGT") for _ in range(n))
    for dv in divs:
        q = mutate(rng, t, sub=dv, ind=dv / 10)
        ts, qs = t.encode(), q.encode()
        # s ~ x*sub*n + gaps; band ~ 2s; round W up in 16384 steps
        s_est = int(4 * dv * n * 1.4) + 2000
        W = max(16384, -(-(2 * s_est + 256) // 16384) * 16384)
        spec = ww.WSpec(B=1, WR=W // 128, S_CAP=max(2048, s_est + 2048),
                        x=4, o1=4, e1=2, o2=15, e2=1,
                        mode=wk.MODE_SCORE, cpw=16,
                        nseg=wk.nseg_for(max(len(ts), len(qs)), 16))
        scal = np.zeros((1, wk.SC_ANC + 1), np.int32)
        scal[0, :3] = [len(ts), len(qs),
                       (len(qs) - len(ts)) // 2 - spec.W // 2]
        twt = wk.pack_table([ts], 16, spec.nseg)
        twq = wk.pack_table([qs], 16, spec.nseg)
        fn = ww.get_kernel_wide(spec)
        t0 = time.perf_counter()
        out = {k: np.asarray(v) for k, v in fn(scal, twt, twq).items()}
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = {k: np.asarray(v) for k, v in fn(scal, twt, twq).items()}
        warm = time.perf_counter() - t0
        s = int(out["final_s"][0])
        ni = (int(out["n_iter_hi"][0]) << 30) | int(out["n_iter_lo"][0])
        cps = ni / warm
        print(f"div={dv:5.3f} W={spec.W:7d} s={s:7d} cells={ni:.3e} "
              f"done={bool(out['done'][0])} ovf={bool(out['overflow'][0])} "
              f"warm={warm:6.2f}s cold={cold:5.1f}s "
              f"{cps/1e6:7.1f}M cells/s {warm/max(s,1)*1e6:6.1f} us/cycle",
              flush=True)


if __name__ == "__main__":
    main()
