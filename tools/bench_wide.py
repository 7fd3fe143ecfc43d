#!/usr/bin/env python3
"""Wide-engine TPU validation + bench ladder, smallest risk first.

Stages (each gated on the previous passing):
  1. compiled wide-engine goldens (score, small W) vs recorded s/n_iter
  2. div100k score on the wide engine (forced) vs scale_goldens + timing
  3. div100k low-mem p5000 end-to-end (wide pass 1 forced) vs goldens
  4. div5m score (wide, auto-dispatched via driver caps)
  5. div5m low-mem p5000 end-to-end — the reference headline workload

Usage: bench_wide.py [--stage N] [--through M]
"""
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def log(msg):
    print(msg, flush=True)


def stage1():
    import jax
    from miniwfa_tpu.ops import wavefront_kernel as wk
    from miniwfa_tpu.ops import wavefront_wide as ww
    from miniwfa_tpu.ops import pack

    g = json.load(open("tests/data/goldens.json"))
    cases = {c["name"]: c for c in g["cases"]}
    pen = g["penalties"]
    ok = True
    for name in ("t3", "med2k", "med3k_bigdel", "gap300"):
        c = cases[name]
        want = g["niter"][name]
        ts, qs = c["t"].encode(), c["q"].encode()
        cpw = 16 if pack.can_pack2([ts, qs]) else 4
        spec = ww.WSpec(B=1, WR=128, S_CAP=2048, mode=wk.MODE_SCORE,
                        cpw=cpw, **pen)
        scal = np.zeros((1, wk.SC_ANC + 1), np.int32)
        scal[0, :3] = [len(ts), len(qs),
                       (len(qs) - len(ts)) // 2 - spec.W // 2]
        fn = ww.get_kernel_wide(spec)
        t0 = time.perf_counter()
        out = {k: np.asarray(v) for k, v in fn(scal,
                                               wk.pack_table([ts], cpw),
                                               wk.pack_table([qs], cpw)).items()}
        dt = time.perf_counter() - t0
        s = int(out["final_s"][0])
        ni = (int(out["n_iter_hi"][0]) << 30) | int(out["n_iter_lo"][0])
        good = s == want["s"] and ni == want["n_iter"]
        ok &= good
        log(f"s1 {name:14s} s={s} n_iter={ni} [{dt:.1f}s] "
            f"{'OK' if good else 'FAIL want ' + str(want)}")
    return ok


def _scale_pair(name):
    from tools.make_scale_goldens import gen_case
    ts, qs = gen_case(name)
    return ts.encode(), qs.encode()


def stage2():
    from miniwfa_tpu.options import Options
    from miniwfa_tpu.models.exact import align_batch

    sg = json.load(open("tests/data/scale_goldens.json"))
    ts, qs = _scale_pair("div100k")
    want = sg["div100k"]["score"]["s"]
    os.environ["MWF_ENGINE"] = "wide"   # force past the VMEM kernel
    try:
        t0 = time.perf_counter()
        r = align_batch([(ts, qs)], Options(), w0=16384, s0=16384)[0]
        dt = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = align_batch([(ts, qs)], Options(), w0=16384, s0=16384)[0]
        dt2 = time.perf_counter() - t0
    finally:
        del os.environ["MWF_ENGINE"]
    cells = r.n_iter / dt2
    log(f"s2 div100k wide score s={r.s} (want {want}) n_iter={r.n_iter} "
        f"warm {dt2:.2f}s = {cells/1e6:.0f}M cells/s (cold {dt:.1f}s)")
    return r.s == want


def stage3():
    from miniwfa_tpu.options import Options
    from miniwfa_tpu.models.exact import align_batch

    sg = json.load(open("tests/data/scale_goldens.json"))
    ts, qs = _scale_pair("div100k")
    want = sg["div100k"]["lowmem_p5000"]
    # normal dispatch: pass 1 fits the VMEM kernel at this scale
    # (W=32768); the wide pass 1 is exercised at 5 Mb in stage 5
    t0 = time.perf_counter()
    r = align_batch([(ts, qs)], Options(cigar=True, step=5000))[0]
    dt = time.perf_counter() - t0
    md5 = hashlib.md5(r.cigar_str.encode()).hexdigest()
    good = r.s == want["s"] and md5 == want["cigar_md5"]
    log(f"s3 div100k lowmem s={r.s} (want {want['s']}) md5ok="
        f"{md5 == want['cigar_md5']} [{dt:.1f}s vs ref {want['ref_wall_s']}s]")
    return good


def stage4():
    from miniwfa_tpu.options import Options
    from miniwfa_tpu.models.exact import align_batch

    ts, qs = _scale_pair("div5m")
    t0 = time.perf_counter()
    r = align_batch([(ts, qs)], Options(), w0=65536, s0=65536)[0]
    dt = time.perf_counter() - t0
    cells = r.n_iter / dt
    log(f"s4 div5m wide score s={r.s} (want 287898) n_iter={r.n_iter} "
        f"[{dt:.1f}s = {cells/1e6:.0f}M cells/s incl. ladder]")
    return r.s == 287898


def stage5():
    from miniwfa_tpu.options import Options
    from miniwfa_tpu.models.exact import align_batch

    sg = json.load(open("tests/data/scale_goldens.json"))
    want = sg["div5m"]["lowmem_p5000"]
    ts, qs = _scale_pair("div5m")
    t0 = time.perf_counter()
    r = align_batch([(ts, qs)], Options(cigar=True, step=5000),
                    w0=65536, s0=65536)[0]
    dt = time.perf_counter() - t0
    md5 = hashlib.md5(r.cigar_str.encode()).hexdigest()
    good = r.s == want["s"] and md5 == want["cigar_md5"]
    log(f"s5 div5m lowmem s={r.s} (want {want['s']}) "
        f"md5ok={md5 == want['cigar_md5']} cigar_len={len(r.cigar_str)//1} "
        f"[{dt:.1f}s vs ref {want['ref_wall_s']}s]")
    return good


def main():
    import jax
    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    first = 1
    last = 5
    if "--stage" in sys.argv:
        first = int(sys.argv[sys.argv.index("--stage") + 1])
    if "--through" in sys.argv:
        last = int(sys.argv[sys.argv.index("--through") + 1])
    stages = {1: stage1, 2: stage2, 3: stage3, 4: stage4, 5: stage5}
    for n in range(first, last + 1):
        t0 = time.perf_counter()
        ok = stages[n]()
        log(f"stage {n}: {'PASS' if ok else 'FAIL'} "
            f"[{time.perf_counter() - t0:.1f}s total]")
        if not ok:
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
