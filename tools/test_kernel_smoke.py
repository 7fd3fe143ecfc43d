#!/usr/bin/env python3
"""Smoke test of the fused-cycle kernel vs golden scores/n_iter."""
import json
import sys
import time

import numpy as np
import jax

sys.path.insert(0, "/root/repo")
from miniwfa_tpu.ops import wavefront_kernel as wk
from miniwfa_tpu.ops import pack

INTERPRET = "--interpret" in sys.argv
MODE = wk.MODE_TB if "--tb" in sys.argv else wk.MODE_SCORE


def run_cases(names=("t3", "homopoly", "med2k", "med3k_bigdel", "gap300")):
    g = json.load(open("/root/repo/tests/data/goldens.json"))
    cases = {c["name"]: c for c in g["cases"]}
    pen = g["penalties"]
    for name in names:
        c = cases[name]
        want = g["niter"].get(name)
        ts, qs = c["t"].encode(), c["q"].encode()
        cpw = 16 if pack.can_pack2([ts, qs]) else 4
        WR = 8
        while True:
            spec = wk.KSpec(B=1, WR=WR, S_CAP=2048, mode=MODE, cpw=cpw, **pen)
            W = spec.W
            tl, ql = len(ts), len(qs)
            d_end = ql - tl
            anc = d_end // 2 - W // 2
            nsc = wk.SC_SEG + 2 * spec.seg_cap
            scal = np.zeros((1, nsc), np.int32)
            scal[0, :4] = [tl, ql, anc, 0]
            twt = wk.pack_table([ts], cpw)
            twq = wk.pack_table([qs], cpw)
            fn = wk.get_kernel(spec, interpret=INTERPRET)
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(scal, twt, twq))
            dt = time.perf_counter() - t0
            if not bool(out["ovf_band"][0]) or WR >= 128:
                break
            WR *= 2
        s = int(out["final_s"][0])
        n_iter = (int(out["n_iter_hi"][0]) << 30) | int(out["n_iter_lo"][0])
        ok = "?"
        if want:
            ok = "OK" if (s == want["s"] and n_iter == want["n_iter"]) else \
                f"MISMATCH want s={want['s']} n={want['n_iter']}"
        print(f"{name:16s} s={s:6d} n_iter={n_iter:9d} done={bool(out['done'][0])} "
              f"ovf={bool(out['overflow'][0])} [{dt:.1f}s] {ok}")
        if MODE == wk.MODE_TB and want and s == want["s"]:
            from miniwfa_tpu.options import Options
            from miniwfa_tpu.models import traceback as tbk
            from miniwfa_tpu import cigar as C
            opt = Options(**pen, cigar=True)
            tb = wk.unpack_tb(np.asarray(out["tb_packed"][0, :max(s, 1)]))
            tb_lo = np.full((max(s, 1),), anc, np.int32)
            cig = tbk.traceback_walk(opt, tb, tb_lo, 0, ts, qs, s,
                                     int(out["last_state"][0]))
            got = C.to_string(cig)
            print(f"  cigar {'OK' if got == want['cigar'] else 'MISMATCH: ' + got}")


if __name__ == "__main__":
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    run_cases(tuple(names) if names else
              ("t3", "homopoly", "med2k", "med3k_bigdel", "gap300"))
