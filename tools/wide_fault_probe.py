#!/usr/bin/env python3
"""Bisect the wide-engine TPU fault seen on the div5m score workload.

Each probe is one direct wide-kernel dispatch with a controlled spec;
run ONE probe per process (a kernel fault kills the TPU worker, so the
driver shell re-runs this script per probe and waits for recovery).

Usage: wide_fault_probe.py <probe-name>
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def pair_div(n, div, seed=1):
    rng = np.random.default_rng(seed)
    t = rng.integers(0, 4, n, dtype=np.int8)
    q = t.copy()
    pos = rng.random(n) < div
    q[pos] = (q[pos] + rng.integers(1, 4, pos.sum())) % 4
    conv = np.frombuffer(b"ACGT", np.uint8)
    return conv[t].tobytes(), conv[q].tobytes()


def run(WR, S_CAP, max_s, n, div, seed=1, B=1, cr=128):
    import jax
    from miniwfa_tpu.ops import wavefront_kernel as wk
    from miniwfa_tpu.ops import wavefront_wide as ww
    from miniwfa_tpu.ops import pack

    ts, qs = pair_div(n, div, seed)
    cpw = 16 if pack.can_pack2([ts, qs]) else 4
    spec = ww.WSpec(B=B, WR=WR, S_CAP=S_CAP, mode=wk.MODE_SCORE,
                    cpw=cpw, x=4, o1=4, e1=2, o2=15, e2=1,
                    nseg=wk.nseg_for(max(len(ts), len(qs)), cpw), cr=cr)
    scal = np.zeros((B, ww.scal_width(spec)), np.int32)
    scal[:, :3] = [len(ts), len(qs), (len(qs) - len(ts)) // 2 - spec.W // 2]
    scal[:, ww.RS_LIM] = spec.S_CAP
    scal[:, ww.RS_MS] = max_s
    fn = ww.get_kernel_wide(spec)
    t0 = time.perf_counter()
    out = {k: np.asarray(v) for k, v in
           fn(scal, wk.pack_table([ts] * B, cpw, spec.nseg),
              wk.pack_table([qs] * B, cpw, spec.nseg)).items()}
    dt = time.perf_counter() - t0
    ni = (int(out["n_iter_hi"][0]) << 30) | int(out["n_iter_lo"][0])
    print(f"PROBE OK W={WR*128} S_CAP={S_CAP} max_s={max_s} n={n} "
          f"s={int(out['final_s'][0])} stop={int(out['stopped'][0]) if 'stopped' in out else '?'} "
          f"n_iter={ni} [{dt:.1f}s {ni/max(dt,1e-9)/1e6:.0f}M c/s]",
          flush=True)


PROBES = {
    # big allocation, small live band (early stop)
    "a": dict(WR=2048, S_CAP=8192, max_s=4000, n=5_000_000, div=0.012),
    "b": dict(WR=8192, S_CAP=8192, max_s=4000, n=5_000_000, div=0.012),
    # live band grows past the VMEM cap region: 1 Mb pair, s ~ 106k
    "c": dict(WR=2048, S_CAP=131072, max_s=0, n=1_000_000, div=0.012),
    # live band ~ 2*s ~ 240k > 2^17: 2 Mb pair
    "d": dict(WR=4096, S_CAP=262144, max_s=0, n=2_000_000, div=0.012),
    # the full thing
    "e": dict(WR=8192, S_CAP=327680, max_s=0, n=5_000_000, div=0.012),
    # intermediate max_s runs on the 5 Mb pair itself
    "e50k": dict(WR=8192, S_CAP=65536, max_s=50_000, n=5_000_000, div=0.012),
    "e150k": dict(WR=8192, S_CAP=163840, max_s=150_000, n=5_000_000,
                  div=0.012),
    "e200k": dict(WR=8192, S_CAP=217088, max_s=200_000, n=5_000_000,
                  div=0.012),
    "e250k": dict(WR=8192, S_CAP=266240, max_s=250_000, n=5_000_000,
                  div=0.012),
    "e270k": dict(WR=8192, S_CAP=286720, max_s=270_000, n=5_000_000,
                  div=0.012),
    # S_CAP sizing vs runtime-s isolation: big S_CAP, small max_s
    "scap": dict(WR=8192, S_CAP=327680, max_s=150_000, n=5_000_000,
                 div=0.012),
    # watchdog test: small shapes, ~100s of device time in ONE call
    # (probe c ran 2.3e9 cells at 46M c/s in ~50s; 1.4 Mb is ~2x that)
    "longrun": dict(WR=2048, S_CAP=131072, max_s=0, n=1_400_000,
                    div=0.012),
    # watchdog test 2: FOUR sequential lanes of the passing e150k probe
    # in one call (~4x its single-call device time, same per-lane work)
    "b4x150k": dict(WR=8192, S_CAP=163840, max_s=150_000, n=5_000_000,
                    div=0.012, B=4),
    # staging-chunk A/B on the 2 Mb full run
    "d256": dict(WR=4096, S_CAP=262144, max_s=0, n=2_000_000, div=0.012,
                 cr=256),
    "d512": dict(WR=4096, S_CAP=262144, max_s=0, n=2_000_000, div=0.012,
                 cr=512),
}


if __name__ == "__main__":
    name = sys.argv[1]
    run(**PROBES[name])
