"""Golden parity tests: exact mode vs the reference binary's outputs.

Fixtures were produced by tools/make_goldens.py running the *reference*
test-mwf (built out-of-tree).  Parity contract: identical score AND
identical CIGAR in every exact mode (SURVEY.md §7).
"""

import pytest

from miniwfa_tpu import Options, cigar as C
from miniwfa_tpu.models.exact import align_batch


def _cases(goldens, small_only=None):
    out = []
    for i, c in enumerate(goldens["cases"]):
        n = max(len(c["t"]), len(c["q"]))
        if small_only is True and n > 256:
            continue
        if small_only is False and n <= 256:
            continue
        out.append((i, c))
    return out


def _check(goldens, run_name, opt, small_only=None):
    sel = _cases(goldens, small_only)
    pairs = [(c["t"], c["q"]) for _, c in sel]
    res = align_batch(pairs, opt)
    exp = goldens["runs"][run_name]
    bad = []
    for (i, c), r in zip(sel, res):
        e = exp[i]
        if r.s != e["s"]:
            bad.append(f"{c['name']}: score {r.s} != {e['s']}")
        elif opt.cigar and e["cigar"] is not None and r.cigar_str != e["cigar"]:
            bad.append(f"{c['name']}: cigar {r.cigar_str} != {e['cigar']}")
        elif opt.cigar and r.cigar is not None:
            try:
                C.assert_cigar(opt, r.cigar, len(c["t"]), len(c["q"]), r.s,
                               ts=c["t"].encode("latin1"), qs=c["q"].encode("latin1"))
            except AssertionError as exc:
                bad.append(f"{c['name']}: self-check {exc}")
    assert not bad, "\n".join(bad)


def test_exact_score_small(goldens):
    _check(goldens, "score", Options(), small_only=True)


def test_exact_score_medium(goldens):
    _check(goldens, "score", Options(), small_only=False)


def test_exact_cigar_small(goldens):
    _check(goldens, "cigar", Options(cigar=True), small_only=True)


def test_exact_cigar_medium(goldens):
    _check(goldens, "cigar", Options(cigar=True), small_only=False)


def test_n_iter_parity(goldens):
    """Band-trajectory parity: total wavefront cells must match the
    reference's r->n_iter exactly (miniwfa.c:421)."""
    opt = Options(cigar=True)
    names = goldens["niter"]
    cases = {c["name"]: c for c in goldens["cases"]}
    pairs = [(cases[n]["t"], cases[n]["q"]) for n in names]
    res = align_batch(pairs, opt)
    for (name, e), r in zip(names.items(), res):
        assert r.s == e["s"], name
        assert r.n_iter == e["n_iter"], f"{name}: n_iter {r.n_iter} != {e['n_iter']}"
        assert r.cigar_str == e["cigar"], name


def test_empty_vs_empty_graceful():
    """The reference segfaults on this (UB at miniwfa.c:407); we don't."""
    r = align_batch([("", "")], Options(cigar=True))[0]
    assert r.s == 0 and r.cigar == []


def test_batch_matches_solo(goldens):
    """Batched results must be bit-identical to solo runs."""
    c = next(c for c in goldens["cases"] if c["name"] == "t3")
    opt = Options(cigar=True)
    solo = align_batch([(c["t"], c["q"])], opt)[0]
    batch = align_batch([(c["t"], c["q"])] * 3 + [("A", "G")], opt)
    for r in batch[:3]:
        assert (r.s, r.cigar_str, r.n_iter) == (solo.s, solo.cigar_str, solo.n_iter)
    assert batch[3].s == 4


def test_early_stop_max_s():
    """max_s bound returns s=-1 (reference miniwfa.c:422-427)."""
    r = align_batch([("ACGTACGTAA", "TGCATGCATT")], Options(max_s=3))[0]
    assert r.s == -1


def test_early_stop_max_iter():
    r = align_batch([("ACGTACGTAA", "TGCATGCATT")], Options(max_iter=5))[0]
    assert r.s == -1
