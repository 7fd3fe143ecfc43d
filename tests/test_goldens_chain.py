"""Golden parity tests: heuristic chaining mode and auto mode vs the
reference binary (test-mwf -u -c / -t -c).

Chain mode is deterministic given the same anchors + tie-breaks, so exact
score AND CIGAR parity is expected, same as the exact modes."""

import pytest

from miniwfa_tpu import Options, align_auto, align_chain
from miniwfa_tpu import cigar as C


def _check_mode(goldens, run_name, fn, max_n=10**9, min_n=0):
    opt = Options(cigar=True)
    exp = goldens["runs"][run_name]
    bad = []
    for i, c in enumerate(goldens["cases"]):
        n = max(len(c["t"]), len(c["q"]))
        if n > max_n or n < min_n:
            continue
        r = fn(c["t"], c["q"], opt)
        e = exp[i]
        if r.s != e["s"] or (e["cigar"] is not None and r.cigar_str != e["cigar"]):
            bad.append(f"{c['name']}: ({r.s},{r.cigar_str}) != ({e['s']},{e['cigar']})")
    assert not bad, "\n".join(bad)


def test_chain_small(goldens):
    _check_mode(goldens, "chain", align_chain, max_n=256)


def test_chain_medium(goldens):
    # medium cases exercise real anchor chains + gap filling
    _check_mode(goldens, "chain", align_chain, min_n=257)


def test_auto_small(goldens):
    # auto mode is exact-then-fallback; a subset keeps the unbatched
    # per-case runs cheap while covering the named edge cases
    opt = Options(cigar=True)
    exp = goldens["runs"]["auto"]
    bad = []
    for i, c in enumerate(goldens["cases"]):
        if max(len(c["t"]), len(c["q"])) > 256:
            continue
        if not (i % 5 == 0 or not c["name"].startswith(("small", "unrel"))):
            continue
        r = align_auto(c["t"], c["q"], opt)
        e = exp[i]
        if r.s != e["s"] or r.cigar_str != e["cigar"]:
            bad.append(f"{c['name']}: ({r.s},{r.cigar_str}) != ({e['s']},{e['cigar']})")
    assert not bad, "\n".join(bad)


def test_auto_medium(goldens):
    _check_mode(goldens, "auto", align_auto, min_n=257)


def test_chain_score_only(goldens):
    """Score-only chain mode (no CIGAR flag) must give the same score."""
    opt = Options(cigar=False)
    c = next(c for c in goldens["cases"] if c["name"] == "med2k")
    i = goldens["cases"].index(c)
    r = align_chain(c["t"], c["q"], opt)
    assert r.s == goldens["runs"]["chain"][i]["s"]
    assert r.cigar is None
