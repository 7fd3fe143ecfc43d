#!/usr/bin/env python3
"""Repro/bisect harness for the (now diagnosed) lax-engine W=16384 TPU
worker kill (PERF_NOTES "Resolved: the lax W=16384 fault"; VERDICT r4
ask #6).

DIAGNOSIS (round 5): not a kernel fault.  The round-1 engine ran the
(B=8, W=16384, S_CAP=4096) dispatch at ~21 ms/cycle, so a full ~3300
cycle alignment needed ~70 s of device time — past the tunnel worker's
~55-60 s per-call watchdog, which kills the call with the generic
"worker crashed / kernel fault" message.  Run against the f0a51b0
tree: max_s=1600/2400 capped runs PASS (33.8 s / 67.2 s wall incl.
compile) while the full run dies at 85.8 s wall; a DIRECT sub-only
dispatch at W=16384 dies too (bench's sub-only pairs "passed" in
round 1 only because their smaller bands never escalated to W=16384).
HEAD's engine runs the same dispatch in ~6 s warm — no fault.

Each probe is ONE lax dispatch with a controlled spec + cut knobs; a
watchdog kill takes the worker down, so run one probe per process and
wait for recovery between probes:

    for p in base sub cap1600 noext ...; do
        timeout 300 python tools/lax_fault_probe.py $p
        python tools/wait_tpu.py
    done

A probe prints `PROBE <name> OK s=[...]` iff the dispatch completed
(scores are meaningless under cut knobs — this is a crash bisect, not
a parity check).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

os.environ["MWF_LAX_W_UNSAFE"] = "1"   # bisection work: bypass the guard


def make_pair(n, sub, ind, seed=7):
    """bench.py-style mutated pair (sub substitutions, ind indels)."""
    import random
    rng = random.Random(seed)
    t = "".join(rng.choice("ACGT") for _ in range(n))
    out = []
    for ch in t:
        r = rng.random()
        if r < sub:
            out.append(rng.choice([c for c in "ACGT" if c != ch]))
        elif r < sub + ind:
            if rng.random() < 0.5:
                out.append(ch + rng.choice("ACGT"))
            # else deletion
        else:
            out.append(ch)
    return t.encode(), "".join(out).encode()


PROBES = {
    # name: (indels?, W, knobs)
    "base":       (True,  16384, {}),                            # reproduce
    "sub":        (False, 16384, {}),                            # control: passes per notes
    "w8k":        (True,  8192,  {}),                            # control: passes per notes
    "noext":      (True,  16384, {"MWF_DBG_NOEXT": "1"}),        # cut the whole extension block
    "noshrink":   (True,  16384, {"MWF_DBG_NOSHRINK": "1"}),     # cut band shrink
    "noreanchor": (True,  16384, {"MWF_DBG_NOREANCHOR": "1"}),   # known: still crashes
    "maxr1":      (True,  16384, {"MWF_MAXR": "1"}),             # 1 miss round per cycle
    "a2small":    (True,  16384, {"MWF_A2": "4", "MWF_KW2": "4"}),
    "b1":         (True,  16384, {}),                            # single lane
    "scap1k":     (True,  16384, {}),                            # short S_CAP
    "cap1600":    (True,  16384, {}),   # cycle-capped: passed on the old engine
    "cap2400":    (True,  16384, {}),   # cycle-capped: passed on the old engine
}


def main():
    name = sys.argv[1]
    indels, W, knobs = PROBES[name]
    os.environ.update(knobs)

    import jax
    from miniwfa_tpu.ops import pack
    from miniwfa_tpu.ops.wavefront import WfSpec, get_aligner

    B = 1 if name == "b1" else 8
    S_CAP = 1024 if name == "scap1k" else 4096
    max_s = {"cap1600": 1600, "cap2400": 2400}.get(name, 0)
    n = 32_000
    pairs = [make_pair(n, 0.02, 0.002 if indels else 0.0, seed=7 + i)
             for i in range(B)]
    ts_list = [t for t, _ in pairs]
    qs_list = [q for _, q in pairs]
    LT, LQ = 32768, 65536
    spec = WfSpec(B=B, W=W, S_CAP=S_CAP, LT=LT, LQ=LQ,
                  x=4, o1=4, e1=2, o2=15, e2=1, cpw=16, max_s=max_s)
    print(f"backend={jax.default_backend()} probe={name} spec={spec}",
          flush=True)
    fn = get_aligner(spec)
    t_pad = pack.pack_ways(ts_list, LT, spec.cpw)
    q_pad = pack.pack_ways(qs_list, LQ, spec.cpw)
    tl = np.array([len(t) for t in ts_list], np.int32)
    ql = np.array([len(q) for q in qs_list], np.int32)
    seg_s = np.full((B, 1), -9, np.int32)
    seg_d = np.zeros((B, 1), np.int32)
    n_seg = np.zeros((B,), np.int32)
    t0 = time.perf_counter()
    out = fn(t_pad, q_pad, tl, ql, seg_s, seg_d, n_seg)
    s = np.asarray(jax.device_get(out["final_s"]))
    print(f"PROBE {name} OK s={s.tolist()} wall={time.perf_counter()-t0:.1f}s",
          flush=True)


if __name__ == "__main__":
    main()
