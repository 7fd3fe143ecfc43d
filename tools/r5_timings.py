#!/usr/bin/env python3
"""Round-5 warm timing harness for the VERDICT r4 rows.

Runs a named fixture in a named mode twice (cold-ish then warm) on the
real chip and prints both walls + parity vs scale_goldens.json.

Usage: python tools/r5_timings.py <case> <mode> [reps]
  case: del50k div100k sv300k rep200k dissim150k nbear1m div5m
  mode: score cigar lowmem auto chain
"""
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.make_scale_goldens import gen_case  # noqa: E402


def main():
    case, mode = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from miniwfa_tpu.options import Options
    from miniwfa_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax
    print(f"backend: {jax.default_backend()}", flush=True)

    g = json.load(open(os.path.join(os.path.dirname(__file__), "..",
                                    "tests", "data", "scale_goldens.json")))
    want = g[case]
    gkey = {"lowmem": "lowmem_p5000"}.get(mode, mode)

    ts, qs = gen_case(case)
    pair = (ts.encode(), qs.encode())

    opt = Options()
    if mode == "score":
        from miniwfa_tpu.models.exact import align_batch as fn
        opt = opt.replace(cigar=False)
    elif mode == "cigar":
        from miniwfa_tpu.models.exact import align_batch as fn
        opt = opt.replace(cigar=True)
    elif mode == "lowmem":
        from miniwfa_tpu.models.exact import align_batch as fn
        opt = opt.replace(cigar=True, step=5000)
    elif mode == "auto":
        from miniwfa_tpu.models.auto import align_auto_batch as fn
        opt = opt.replace(cigar=True)
    elif mode == "chain":
        from miniwfa_tpu.models.chain import align_chain_batch as fn
        opt = opt.replace(cigar=True)
    else:
        raise SystemExit(f"unknown mode {mode}")

    from miniwfa_tpu import cigar as C
    for r in range(reps):
        t0 = time.perf_counter()
        res = fn([pair], opt)
        dt = time.perf_counter() - t0
        rr = res[0]
        ok = rr.s == want[gkey]["s"]
        md5 = ""
        if rr.cigar is not None and "cigar_md5" in want[gkey]:
            cg = C.to_string(rr.cigar)
            md5 = hashlib.md5(cg.encode()).hexdigest()
            ok = ok and md5 == want[gkey]["cigar_md5"]
        print(f"rep{r}: {dt:.2f}s s={rr.s} (want {want[gkey]['s']}) "
              f"parity={'OK' if ok else 'FAIL ' + md5} "
              f"ref_wall={want[gkey]['ref_wall_s']}s", flush=True)


if __name__ == "__main__":
    main()
