#!/usr/bin/env python3
"""Capture a jax.profiler trace of the real engine on the TPU and print the
top ops by self time from the trace file."""
import glob
import gzip
import json
import os
import sys
import time

import numpy as np
import jax

from miniwfa_tpu.ops import pack
from miniwfa_tpu.ops.wavefront import MODE_SCORE, WfSpec, get_aligner
from tools.profile_cycle import mk_inputs


def main():
    spec = WfSpec(B=8, W=512, S_CAP=512, LT=2048, LQ=2048,
                  x=4, o1=4, e1=2, o2=15, e2=1, mode=MODE_SCORE)
    fn = get_aligner(spec)
    args = mk_inputs(spec, 2000, 0.02)
    jax.block_until_ready(fn(*args))

    logdir = "/tmp/mwf_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        jax.block_until_ready(fn(*args))

    # find the trace json and aggregate device op durations
    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    print("trace files:", files)
    if not files:
        return
    with gzip.open(files[0], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    agg = {}
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "tpu" not in pname.lower():
            continue
        name = e.get("name", "?")
        agg.setdefault(name, [0.0, 0])
        agg[name][0] += e.get("dur", 0)
        agg[name][1] += 1
    top = sorted(agg.items(), key=lambda kv: -kv[1][0])[:40]
    print(f"{'op':70s} {'total_ms':>10s} {'count':>8s}")
    for name, (dur, cnt) in top:
        print(f"{name[:70]:70s} {dur/1e3:10.2f} {cnt:8d}")


if __name__ == "__main__":
    main()
