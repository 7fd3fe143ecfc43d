#!/usr/bin/env python3
"""Run the golden corpus through the public API on the real TPU chip.

The CPU test suite (tests/) never touches the TPU; this tool is the TPU
parity gate: every corpus case through align_batch (fused kernel engine
where eligible), in score, cigar, low-mem and penalty-mimic modes,
compared against the reference binary's recorded outputs.

Exit code 0 = all parity checks pass.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    from miniwfa_tpu.options import Options
    from miniwfa_tpu.models.exact import align_batch
    from miniwfa_tpu import cigar as C
    import jax

    print(f"backend: {jax.default_backend()}", flush=True)
    g = json.load(open(os.path.join(os.path.dirname(__file__), "..",
                                    "tests", "data", "goldens.json")))
    pen = g["penalties"]
    cases = g["cases"]
    pairs = [(c["t"].encode(), c["q"].encode()) for c in cases]
    names = [c["name"] for c in cases]
    fails = []

    def check(tag, opt, want_key, subset=None):
        idx = list(range(len(pairs))) if subset is None else subset
        want = g["runs"][want_key]
        t0 = time.perf_counter()
        res = align_batch([pairs[i] for i in idx], opt, w0=1024)
        dt = time.perf_counter() - t0
        bad = 0
        for j, i in enumerate(idx):
            w = want[i]
            r = res[j]
            if r.s != w["s"]:
                fails.append(f"{tag}/{names[i]}: s={r.s} want {w['s']}")
                bad += 1
            elif w.get("cigar") and opt.cigar and r.cigar_str != w["cigar"]:
                fails.append(f"{tag}/{names[i]}: cigar {r.cigar_str[:40]}... "
                             f"want {w['cigar'][:40]}...")
                bad += 1
        print(f"{tag:14s} {len(idx)-bad}/{len(idx)} ok  [{dt:.1f}s]",
              flush=True)

    check("score", Options(**pen), "score")
    check("cigar", Options(**pen, cigar=True), "cigar")
    check("lowmem_p16", Options(**pen, cigar=True, step=16), "lowmem_p16")
    check("lowmem_p100", Options(**pen, cigar=True, step=100), "lowmem_p100")
    ed = dict(x=1, o1=0, e1=1, o2=0, e2=1)
    check("edit", Options(**ed, cigar=True), "edit_cigar")
    af = dict(x=pen["x"], o1=pen["o1"], e1=pen["e1"],
              o2=pen["o1"], e2=pen["e1"])
    check("affine", Options(**af, cigar=True), "affine_cigar")

    # n_iter parity on the instrumented subset
    ni = g["niter"]
    sub = [i for i, nm in enumerate(names) if nm in ni]
    res = align_batch([pairs[i] for i in sub], Options(**pen, cigar=True),
                      w0=1024)
    for j, i in enumerate(sub):
        w = ni[names[i]]
        r = res[j]
        if (r.s, r.n_iter, r.cigar_str) != (w["s"], w["n_iter"], w["cigar"]):
            fails.append(f"niter/{names[i]}: ({r.s},{r.n_iter}) want "
                         f"({w['s']},{w['n_iter']})")
    print(f"{'niter':14s} {len(sub)-sum(1 for f in fails if f.startswith('niter'))}"
          f"/{len(sub)} ok", flush=True)

    if fails:
        print("FAILURES:")
        for f in fails[:20]:
            print(" ", f)
        return 1
    print("ALL TPU PARITY CHECKS PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
