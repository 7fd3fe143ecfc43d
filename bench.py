#!/usr/bin/env python3
"""Throughput benchmark: batched exact WFA on synthetic diverged pairs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: wavefront cells/s on one chip (the reference's own throughput unit,
r->n_iter per second — see BASELINE.md: single-core C ≈ 2.3e8 cells/s on a
100 kb 2%-diverged pair).  vs_baseline = value / 2.3e8.

Env knobs: MWF_BENCH_N (pair length), MWF_BENCH_B (batch), MWF_BENCH_REPS.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

import numpy as np

BASELINE_CELLS_PER_S = 2.3e8  # single-core C reference (BASELINE.md)


def mutate(rng: random.Random, seq: str, sub: float, ind: float,
           max_indel: int = 8) -> str:
    out = []
    bases = "ACGT"
    i, n = 0, len(seq)
    while i < n:
        if rng.random() < ind:
            if rng.random() < 0.5:
                i += rng.randint(1, max_indel)
                continue
            out.append("".join(rng.choice(bases) for _ in range(rng.randint(1, max_indel))))
        c = seq[i]
        if rng.random() < sub:
            c = rng.choice([b for b in bases if b != c])
        out.append(c)
        i += 1
    return "".join(out)


def main() -> int:
    # default = the fastest configuration that is reliable on the current
    # device (32 kb pairs hit a device fault at W=16384 with indel-bearing
    # pairs — see PERF_NOTES.md "known issues")
    n = int(os.environ.get("MWF_BENCH_N", 8000))
    b = int(os.environ.get("MWF_BENCH_B", 64))
    reps = int(os.environ.get("MWF_BENCH_REPS", 2))

    rng = random.Random(7)
    pairs = []
    for _ in range(b):
        t = "".join(rng.choice("ACGT") for _ in range(n))
        q = mutate(rng, t, sub=0.02, ind=0.002)
        pairs.append((t, q))

    from miniwfa_tpu import Options
    from miniwfa_tpu.models.exact import align_batch
    from miniwfa_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    opt = Options()  # score-only exact mode: the fundamental hot path
    # start at a bucket sized for the divergence (avoids compiling the
    # whole escalation ladder of intermediate specs)
    w0 = s0 = max(512, n // 8)
    # warmup: compile + first run (also fixes the bucket ladder)
    res = align_batch(pairs, opt, w0=w0, s0=s0)
    cells = sum(r.n_iter for r in res)

    t0 = time.perf_counter()
    for _ in range(reps):
        res = align_batch(pairs, opt, w0=w0, s0=s0)
    dt = (time.perf_counter() - t0) / reps
    total_cells = sum(r.n_iter for r in res)
    cells_per_s = total_cells / dt

    bp = sum(min(len(t), len(q)) for t, q in pairs)
    print(json.dumps({
        "metric": "wavefront_cells_per_s_1chip",
        "value": round(cells_per_s),
        "unit": "cells/s",
        "vs_baseline": round(cells_per_s / BASELINE_CELLS_PER_S, 3),
        "detail": {
            "pairs": b, "pair_bp": n, "reps": reps,
            "batch_wall_s": round(dt, 4),
            "total_cells": total_cells,
            "aligned_bp_per_s": round(bp / dt),
            "scores_ok": all(r.s >= 0 for r in res),
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
