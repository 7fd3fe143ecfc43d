"""Golden parity under alternative penalty regimes: edit-distance mimic
(-e: x=1,o=0,e=1) and single-affine mimic (-a: o2=o1,e2=e1)
(reference main.c:34-35)."""

import pytest

from miniwfa_tpu import Options
from miniwfa_tpu.models.exact import align_batch


def _check(goldens, run_name, opt, max_n=256):
    sel = [(i, c) for i, c in enumerate(goldens["cases"])
           if max(len(c["t"]), len(c["q"])) <= max_n]
    res = align_batch([(c["t"], c["q"]) for _, c in sel], opt)
    exp = goldens["runs"][run_name]
    bad = []
    for (i, c), r in zip(sel, res):
        e = exp[i]
        if r.s != e["s"] or (e["cigar"] is not None and r.cigar_str != e["cigar"]):
            bad.append(f"{c['name']}: ({r.s},{r.cigar_str}) != ({e['s']},{e['cigar']})")
    assert not bad, "\n".join(bad)


def test_edit_distance_small(goldens):
    _check(goldens, "edit_cigar", Options(cigar=True).as_edit_distance())


def test_single_affine_small(goldens):
    _check(goldens, "affine_cigar", Options(cigar=True).as_single_affine())
