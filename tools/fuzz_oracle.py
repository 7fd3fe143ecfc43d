#!/usr/bin/env python3
"""Live reference-comparator fuzz harness (the C26/C27 analog).

Generates random pairs across length/divergence/indel regimes, runs the
reference binary (built on demand from /root/reference into a temp dir)
AND this framework with matching flags, and diffs score + CIGAR.  The
reference is the oracle the golden corpus was built from; running it live
catches regressions the fixed corpus cannot (VERDICT round 1, item 7).

Usage: fuzz_oracle.py [n_pairs] [seed] [--mode exact|cigar|lowmem|chain|auto|all]
"""
import os
import random
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_SRC = "/root/reference"
_REF_BIN = None


def build_reference() -> str:
    """Build test-mwf out-of-tree; cache the binary path."""
    global _REF_BIN
    if _REF_BIN and os.path.exists(_REF_BIN):
        return _REF_BIN
    prebuilt = "/root/refbuild/test-mwf"
    if os.path.exists(prebuilt):
        _REF_BIN = prebuilt
        return prebuilt
    d = tempfile.mkdtemp(prefix="mwfref")
    for f in os.listdir(REF_SRC):
        if f.endswith((".c", ".h")) or f == "Makefile":
            shutil.copy(os.path.join(REF_SRC, f), d)
    subprocess.run(["make", "test-mwf"], cwd=d, check=True,
                   capture_output=True)
    _REF_BIN = os.path.join(d, "test-mwf")
    return _REF_BIN


def ref_align(ts: str, qs: str, flags=()):
    """Run the reference binary; returns (score, cigar_or_None)."""
    binp = build_reference()
    with tempfile.TemporaryDirectory() as d:
        ft, fq = os.path.join(d, "t.fa"), os.path.join(d, "q.fa")
        open(ft, "w").write(f">t\n{ts}\n")
        open(fq, "w").write(f">q\n{qs}\n")
        out = subprocess.run([binp, *flags, ft, fq], capture_output=True,
                             text=True, check=True)
        fields = out.stdout.strip().splitlines()[0].split("\t")
        return int(fields[9]), fields[10] if len(fields) > 10 else None


def gen_pair(rng: random.Random):
    """One random pair from a random regime; returns (ts, qs, regime)."""
    regime = rng.choice([
        "tiny", "small", "medium", "large", "bigdel", "bigins",
        "homopoly", "dissimilar", "lowercase", "multiseg",
    ])
    bases = "ACGT"

    def rand(n):
        return "".join(rng.choice(bases) for _ in range(n))

    def mut(seq, sub, ind, mx):
        out, i, n = [], 0, len(seq)
        while i < n:
            if rng.random() < ind:
                if rng.random() < 0.5:
                    i += rng.randint(1, mx)
                    continue
                out.append(rand(rng.randint(1, mx)))
            c = seq[i]
            if rng.random() < sub:
                c = rng.choice([b for b in bases if b != c])
            out.append(c)
            i += 1
        return "".join(out)

    if regime == "tiny":
        ts = rand(rng.randint(0, 12))
        qs = rand(rng.randint(0, 12)) if rng.random() < 0.5 else \
            mut(ts, 0.2, 0.1, 3)
    elif regime == "small":
        ts = rand(rng.randint(20, 300))
        qs = mut(ts, rng.uniform(0.0, 0.15), rng.uniform(0.0, 0.05), 6)
    elif regime == "medium":
        ts = rand(rng.randint(1000, 4000))
        qs = mut(ts, rng.uniform(0.005, 0.06), rng.uniform(0.0, 0.01), 12)
    elif regime == "large":
        ts = rand(rng.randint(20000, 60000))
        qs = mut(ts, rng.uniform(0.005, 0.03), 0.002, 8)
    elif regime == "bigdel":
        # the dual-affine crossover fixture class (SURVEY.md §7): one
        # multi-kb deletion so the o2+l*e2 piece wins
        n = rng.randint(20000, 50000)
        ts = rand(n)
        cut = rng.randint(1000, 5000)
        at = rng.randint(0, n - cut)
        qs = ts[:at] + ts[at + cut:]
        if rng.random() < 0.5:
            qs = mut(qs, 0.01, 0.0, 1)
    elif regime == "bigins":
        n = rng.randint(5000, 30000)
        ts = rand(n)
        at = rng.randint(0, n)
        qs = ts[:at] + rand(rng.randint(500, 3000)) + ts[at:]
    elif regime == "homopoly":
        ts = "".join(rng.choice(bases) * rng.randint(1, 30)
                     for _ in range(rng.randint(2, 40)))
        qs = mut(ts, 0.05, 0.02, 10)
    elif regime == "multiseg":
        # > 254 kb at cpw=16: the kernels' segmented word tables rotate
        # (nseg > 1) — the regime that catches resident-segment bugs
        # (e.g. the straggler-window livelock, PERF_NOTES round 3)
        ts = rand(rng.randint(270_000, 500_000))
        qs = mut(ts, rng.uniform(0.002, 0.01), 0.001, 8)
    elif regime == "dissimilar":
        ts, qs = rand(rng.randint(50, 2000)), rand(rng.randint(50, 2000))
    else:  # lowercase / non-ACGT bytes (byte-packed path)
        alpha = "ACGTacgtN"
        ts = "".join(rng.choice(alpha) for _ in range(rng.randint(10, 500)))
        qs = "".join(rng.choice(alpha) for _ in range(rng.randint(10, 500)))
    return ts, qs, regime


def check_pair(ts, qs, mode, rng, align_mod):
    """Compare framework vs oracle for one pair in one mode.
    Returns None if ok else a mismatch description."""
    from miniwfa_tpu.options import Options
    from miniwfa_tpu.models.chain import align_chain
    from miniwfa_tpu.models.auto import align_auto

    if mode == "exact":
        s_ref, _ = ref_align(ts, qs)
        r = align_mod.align_batch([(ts, qs)], Options(), w0=1024)[0]
        if r.s != s_ref:
            return f"exact s={r.s} want {s_ref}"
        if max(len(ts), len(qs)) <= 3000:
            # third vote: the independent O(n^2) DP (tools/dp_oracle.py)
            from tools.dp_oracle import dp_score
            s_dp = dp_score(ts, qs)
            if s_dp != s_ref:
                return f"exact DP-oracle s={s_dp} vs reference {s_ref}"
    elif mode == "cigar":
        s_ref, cg = ref_align(ts, qs, ("-c",))
        r = align_mod.align_batch([(ts, qs)], Options(cigar=True),
                                  w0=1024)[0]
        if r.s != s_ref or r.cigar_str != cg:
            return f"cigar s={r.s}/{s_ref} cg={(r.cigar_str or '')[:30]}/{(cg or '')[:30]}"
    elif mode == "lowmem":
        # snapshot memory ~ S_CAP/p rows: tiny steps only for small pairs
        p = rng.choice([1, 3, 16, 100] if len(ts) < 2000 else
                       [100, 1000, 5000])
        s_ref, cg = ref_align(ts, qs, ("-c", f"-p{p}"))
        r = align_mod.align_batch([(ts, qs)],
                                  Options(cigar=True, step=p), w0=1024)[0]
        if r.s != s_ref or r.cigar_str != cg:
            return f"lowmem p={p} s={r.s}/{s_ref}"
    elif mode == "chain":
        s_ref, cg = ref_align(ts, qs, ("-u", "-c"))
        r = align_chain(ts, qs, Options(cigar=True))
        if r.s != s_ref or r.cigar_str != cg:
            return f"chain s={r.s}/{s_ref} cg={(r.cigar_str or '')[:30]}/{(cg or '')[:30]}"
    elif mode == "auto":
        s_ref, cg = ref_align(ts, qs, ("-t", "-c"))
        r = align_auto(ts, qs, Options(cigar=True))
        if r.s != s_ref or r.cigar_str != cg:
            return f"auto s={r.s}/{s_ref}"
    return None


def run_fuzz(n_pairs=50, seed=0, modes=("exact", "cigar", "lowmem",
                                        "chain", "auto"), verbose=True):
    from miniwfa_tpu.models import exact as align_mod
    rng = random.Random(seed)
    fails = []
    t00 = time.time()
    for i in range(n_pairs):
        ts, qs, regime = gen_pair(rng)
        mode = rng.choice(list(modes))
        # chain/auto at big sizes are slow host-side on huge anchor sets;
        # keep their fuzz sizes moderate
        if mode in ("chain", "auto") and len(ts) > 20000:
            mode = "cigar"
        t0 = time.time()
        err = check_pair(ts, qs, mode, rng, align_mod)
        if verbose:
            tag = "FAIL " + err if err else "ok"
            print(f"[{i:3d}] {regime:10s} {mode:6s} tl={len(ts):6d} "
                  f"ql={len(qs):6d} [{time.time()-t0:5.1f}s] {tag}",
                  flush=True)
        if err:
            fails.append((i, regime, mode, len(ts), len(qs), err))
    if verbose:
        print(f"\n{n_pairs - len(fails)}/{n_pairs} ok "
              f"in {time.time()-t00:.0f}s")
        for f in fails:
            print("  FAIL", f)
    return fails


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 50
    seed = int(args[1]) if len(args) > 1 else 0
    modes = ("exact", "cigar", "lowmem", "chain", "auto")
    if "--mode" in sys.argv:
        m = sys.argv[sys.argv.index("--mode") + 1]
        if m != "all":
            modes = (m,)
    sys.exit(1 if run_fuzz(n, seed, modes) else 0)
