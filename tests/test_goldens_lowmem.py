"""Golden parity tests: low-memory stripe mode (two-pass) vs reference.

The low-mem mode must produce bit-identical score AND CIGAR to the
high-mem mode / reference at every step size (README.md:55-64 claim,
verified in SURVEY.md).
"""

import pytest

from miniwfa_tpu import Options
from miniwfa_tpu.models.exact import align_batch


def _check_lowmem(goldens, run_name, step, small_only):
    sel = []
    for i, c in enumerate(goldens["cases"]):
        n = max(len(c["t"]), len(c["q"]))
        if small_only and n > 256:
            continue
        sel.append((i, c))
    opt = Options(cigar=True, step=step)
    res = align_batch([(c["t"], c["q"]) for _, c in sel], opt)
    exp = goldens["runs"][run_name]
    bad = []
    for (i, c), r in zip(sel, res):
        e = exp[i]
        if r.s != e["s"] or (e["cigar"] is not None and r.cigar_str != e["cigar"]):
            bad.append(f"{c['name']}: ({r.s},{r.cigar_str}) != ({e['s']},{e['cigar']})")
    assert not bad, "\n".join(bad)


def test_lowmem_p1_small(goldens):
    _check_lowmem(goldens, "lowmem_p1", 1, small_only=True)


def test_lowmem_p3_small(goldens):
    _check_lowmem(goldens, "lowmem_p3", 3, small_only=True)


def test_lowmem_p16_small(goldens):
    _check_lowmem(goldens, "lowmem_p16", 16, small_only=True)


def test_lowmem_p100_all(goldens):
    _check_lowmem(goldens, "lowmem_p100", 100, small_only=False)


def test_lowmem_huge_step_shortcut(goldens):
    """step above every pair's score upper bound: pass 1 cannot fire a
    snapshot, so the driver's shortcut (models/exact.py) runs the plain
    high-mem path — output (score, CIGAR, n_iter) must equal BOTH the
    high-mem run and the reference's low-mem goldens (lowmem == highmem
    at every step, README.md:55-64)."""
    opt_lm = Options(cigar=True, step=10_000_000)
    opt_hm = Options(cigar=True)
    pairs = [(c["t"], c["q"]) for c in goldens["cases"]]
    lm = align_batch(pairs, opt_lm)
    hm = align_batch(pairs, opt_hm)
    exp = goldens["runs"]["cigar"]
    for c, a, b, e in zip(goldens["cases"], lm, hm, exp):
        assert (a.s, a.cigar_str, a.n_iter) == (b.s, b.cigar_str, b.n_iter), \
            c["name"]
        assert a.s == e["s"] and a.cigar_str == e["cigar"], c["name"]
