"""Extension-tuning sweep on the bench score row (one config per
subprocess so build-time env knobs take effect cleanly).

Usage: python tools/sweep_ext.py            # run all configs
       python tools/sweep_ext.py --one      # run just the current env
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [
    {},
    {"MWF_EXT_UNROLL": "4"},
    {"MWF_EXT_UNROLL": "5"},
    {"MWF_EXT_SUBPROBES": "6"},
    {"MWF_EXT_SR": "16"},
    {"MWF_EXT_SR": "32"},
    {"MWF_EXT_SR": "16", "MWF_EXT_SUBPROBES": "6"},
]


def run_one():
    import numpy as np  # noqa: F401
    from bench import make_pairs
    from miniwfa_tpu import Options
    from miniwfa_tpu.models.exact import align_batch
    from miniwfa_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    n, b = 100_000, 16
    pairs = make_pairs(n, b)
    opt = Options()
    w0 = s0 = max(1024, n // 4)
    res = align_batch(pairs, opt, w0=w0, s0=s0)   # warm/compile
    gpath = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data", "bench_goldens.json")
    gold = json.load(open(gpath)).get(str(n), [])
    ok = all(r.s == g["s"] for r, g in zip(res, gold)) if gold else None
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        res = align_batch(pairs, opt, w0=w0, s0=s0)
        best = min(best, time.perf_counter() - t0)
    cells = sum(r.n_iter for r in res)
    knobs = {k: v for k, v in os.environ.items() if k.startswith("MWF_EXT")}
    print(f"RESULT {knobs} cells/s={cells / best / 1e6:.0f}M "
          f"wall={best:.3f}s parity={ok}", flush=True)


if __name__ == "__main__":
    if "--one" in sys.argv:
        run_one()
    else:
        here = os.path.dirname(os.path.abspath(__file__))
        for cfg in CONFIGS:
            env = dict(os.environ)
            env.update(cfg)
            subprocess.run(
                [sys.executable, os.path.join(here, "sweep_ext.py"),
                 "--one"], env=env, cwd=os.path.dirname(here))
