#!/usr/bin/env python3
"""Smoke test of the wide-band (HBM-ring) kernel vs golden scores.

Usage: test_wide_smoke.py [--interpret] [--p1] [--wr N]
Score mode checks s/n_iter against goldens; --p1 additionally decodes
the snapshot checkpoints and re-runs pass 2 on the lax engine to check
the low-mem CIGAR against the golden.
"""
import json
import os
import sys
import time

if "--interpret" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

if "--interpret" in sys.argv:
    # the axon sitecustomize registers the TPU plugin and can hang on a
    # dead tunnel; force the CPU backend for interpret-mode runs
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")
from miniwfa_tpu.ops import wavefront_kernel as wk
from miniwfa_tpu.ops import wavefront_wide as ww
from miniwfa_tpu.ops import pack

INTERPRET = "--interpret" in sys.argv
P1 = "--p1" in sys.argv
WR = 256
if "--wr" in sys.argv:
    WR = int(sys.argv[sys.argv.index("--wr") + 1])
STEP = 16


def run_cases(names=("t3", "homopoly", "med2k", "med3k_bigdel", "gap300")):
    g = json.load(open("/root/repo/tests/data/goldens.json"))
    cases = {c["name"]: c for c in g["cases"]}
    pen = g["penalties"]
    for name in names:
        c = cases[name]
        want = g["niter"].get(name)
        ts, qs = c["t"].encode(), c["q"].encode()
        cpw = 16 if pack.can_pack2([ts, qs]) else 4
        mode = wk.MODE_PASS1 if P1 else wk.MODE_SCORE
        n_snap = (2048 // STEP + 2) if P1 else 0
        spec = ww.WSpec(B=1, WR=WR, S_CAP=2048, mode=mode, cpw=cpw,
                        step=STEP if P1 else 0, n_snap=n_snap, **pen)
        W = spec.W
        tl, ql = len(ts), len(qs)
        d_end = ql - tl
        anc = d_end // 2 - W // 2
        scal = np.zeros((1, ww.SC_ANC + 2), np.int32)
        scal[0, :3] = [tl, ql, anc]
        twt = wk.pack_table([ts], cpw)
        twq = wk.pack_table([qs], cpw)
        fn = ww.get_kernel_wide(spec, interpret=INTERPRET)
        t0 = time.perf_counter()
        out = {k: np.asarray(v) for k, v in fn(scal, twt, twq).items()}
        dt = time.perf_counter() - t0
        s = int(out["final_s"][0])
        n_iter = (int(out["n_iter_hi"][0]) << 30) | int(out["n_iter_lo"][0])
        ok = "?"
        if want:
            ok = "OK" if (s == want["s"] and n_iter == want["n_iter"]) else \
                f"MISMATCH want s={want['s']} n={want['n_iter']}"
        print(f"{name:16s} s={s:6d} n_iter={n_iter:9d} "
              f"done={bool(out['done'][0])} ovf={bool(out['overflow'][0])} "
              f"[{dt:.1f}s] {ok}", flush=True)
        if P1 and want and s == want["s"]:
            from miniwfa_tpu.options import Options
            from miniwfa_tpu.models import traceback as tbk
            from miniwfa_tpu.models import exact as ex
            import os
            cnt = int(out["snap_cnt"][0])
            import numpy as _np
            snap_rows = _np.asarray(out["snap"][0, :max(cnt, 1)])
            snap_rows = snap_rows.reshape(snap_rows.shape[0], -1)
            segs = tbk.decode_checkpoints_kernel(
                snap_rows, anc, cnt,
                int(out["last_ptr"][0]), spec.kspec())
            opt = Options(**pen, cigar=True, step=STEP)
            # the checkpoint list must EQUAL the lax engine's pass-1
            # (same algorithm, same step -> same snapshots)
            os.environ["MWF_ENGINE"] = "lax"
            try:
                bk = ex._buckets_for(opt, [ts], [qs], 1024, 2048)
                segs_lax, _ = ex._run_pass1(opt, bk, [ts], [qs])
                # pass 2 with the WIDE-decoded segs
                res = ex.align_batch([(ts, qs)], opt, w0=1024)
            finally:
                del os.environ["MWF_ENGINE"]
            seg_ok = segs == segs_lax[0]
            cg = res[0].cigar_str
            wantc = g["runs"]["lowmem_p16"][
                [cc["name"] for cc in g["cases"]].index(name)]
            print(f"  segs={len(segs)} vs lax "
                  f"{'OK' if seg_ok else 'MISMATCH: ' + repr((segs[:4], segs_lax[0][:4]))} "
                  f"lowmem cigar {'OK' if cg == wantc.get('cigar') else 'MISMATCH'}",
                  flush=True)


if __name__ == "__main__":
    run_cases()
