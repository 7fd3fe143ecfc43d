#!/usr/bin/env python3
"""Fused-kernel throughput + live-oracle parity on synthetic diverged pairs.

Generates a pair like bench.py, gets the golden score from the reference
binary (built out-of-tree at /root/refbuild/test-mwf), runs the fused-cycle
kernel, and reports cells/s (the reference's n_iter unit) + parity.

Usage: bench_kernel.py [n] [reps] [--wr N] [--cigar]
"""
import os
import random
import subprocess
import sys
import tempfile
import time

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from miniwfa_tpu.ops import wavefront_kernel as wk

REF = "/root/refbuild/test-mwf"


def mutate(rng, seq, sub, ind, max_indel=8):
    out = []
    bases = "ACGT"
    i, n = 0, len(seq)
    while i < n:
        if rng.random() < ind:
            if rng.random() < 0.5:
                i += rng.randint(1, max_indel)
                continue
            out.append("".join(rng.choice(bases)
                               for _ in range(rng.randint(1, max_indel))))
        c = seq[i]
        if rng.random() < sub:
            c = rng.choice([b for b in bases if b != c])
        out.append(c)
        i += 1
    return "".join(out)


def ref_align(ts, qs, cigar=False):
    """Run the reference binary; returns (s, cigar_str, wall_s)."""
    with tempfile.TemporaryDirectory() as d:
        ft, fq = os.path.join(d, "t.fa"), os.path.join(d, "q.fa")
        open(ft, "w").write(f">t\n{ts}\n")
        open(fq, "w").write(f">q\n{qs}\n")
        args = [REF] + (["-c"] if cigar else []) + [ft, fq]
        t0 = time.perf_counter()
        out = subprocess.run(args, capture_output=True, text=True, check=True)
        dt = time.perf_counter() - t0
        # PAF-like TSV (main.c:73-80): col 10 = score, col 11 = CIGAR (-c)
        fields = out.stdout.strip().splitlines()[0].split("\t")
        s = int(fields[9])
        cg = fields[10] if len(fields) > 10 else None
        return s, cg, dt


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 100_000
    reps = int(args[1]) if len(args) > 1 else 3
    wr = None
    if "--wr" in sys.argv:
        wr = int(sys.argv[sys.argv.index("--wr") + 1])
    cigar = "--cigar" in sys.argv

    rng = random.Random(7)
    ts = "".join(rng.choice("ACGT") for _ in range(n))
    qs = mutate(rng, ts, sub=0.02, ind=0.002)
    print(f"pair: tl={len(ts)} ql={len(qs)}", flush=True)

    s_ref, cg_ref, dt_ref = ref_align(ts, qs, cigar)
    print(f"reference: s={s_ref} wall={dt_ref:.2f}s", flush=True)

    # expected band ~= n_iter/s; start WR at a slack-covering guess
    pen = dict(x=4, o1=4, e1=2, o2=15, e2=1)
    WR = wr or max(8, min(256, -(-(2 * s_ref * 110 // 100) // 128)))
    WR = -(-WR // 8) * 8   # multiple of 8 sublanes
    mode = wk.MODE_TB if cigar else wk.MODE_SCORE
    scap = 1 << (int(np.ceil(np.log2(max(s_ref * 1.05, 256)))))
    while True:
        spec = wk.KSpec(B=1, WR=WR, S_CAP=scap, mode=mode, cpw=16, **pen)
        tl, ql = len(ts), len(qs)
        anc = (ql - tl) // 2 - spec.W // 2
        nsc = wk.SC_SEG + 2 * spec.seg_cap
        scal = np.zeros((1, nsc), np.int32)
        scal[0, :4] = [tl, ql, anc, 0]
        twt = wk.pack_table([ts.encode()], 16)
        twq = wk.pack_table([qs.encode()], 16)
        fn = wk.get_kernel(spec)
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(scal, twt, twq))
        print(f"  WR={WR} first-run {time.perf_counter()-t0:.1f}s "
              f"ovf_band={bool(out['ovf_band'][0])} "
              f"ovf_scap={bool(out['ovf_scap'][0])}", flush=True)
        if bool(out["ovf_band"][0]) and WR < 256:
            WR = min(256, WR * 2)
            continue
        if bool(out["ovf_scap"][0]):
            scap *= 2
            continue
        break

    s = int(out["final_s"][0])
    n_iter = (int(out["n_iter_hi"][0]) << 30) | int(out["n_iter_lo"][0])
    ok = s == s_ref
    print(f"kernel: s={s} n_iter={n_iter} parity={'OK' if ok else 'FAIL'}",
          flush=True)

    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(scal, twt, twq))
    dt = (time.perf_counter() - t0) / reps
    print(f"kernel wall: {dt:.3f}s  cells/s={n_iter/dt:.3e}  "
          f"vs_C_local={n_iter/dt/ (n_iter/dt_ref):.2f}x  "
          f"vs_baseline={n_iter/dt/2.3e8:.2f}x", flush=True)

    if cigar and cg_ref is not None:
        from miniwfa_tpu.options import Options
        from miniwfa_tpu.models import traceback as tbk
        from miniwfa_tpu import cigar as C
        opt = Options(**pen, cigar=True)
        tb = wk.unpack_tb(np.asarray(out["tb_packed"][0, :max(s, 1)]))
        tb_lo = np.full((max(s, 1),), anc, np.int32)
        t0 = time.perf_counter()
        cig = tbk.traceback_walk(opt, tb, tb_lo, 0, ts.encode(), qs.encode(),
                                 s, int(out["last_state"][0]))
        got = C.to_string(cig)
        print(f"cigar {'OK' if got == cg_ref else 'MISMATCH'} "
              f"(walk {time.perf_counter()-t0:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
