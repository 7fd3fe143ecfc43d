"""Auto mode: try the exact algorithm with a 100M-cell budget; fall back to
the chaining heuristic (reference mwf_wfa_auto, miniwfa.c:898-908)."""

from __future__ import annotations

from ..options import Options
from .chain import align_chain
from .exact import Result, align_exact


def align_auto(ts, qs, opt: Options) -> Result:
    o = opt.replace(step=0, max_iter=100_000_000)
    r = align_exact(ts, qs, o)
    if r.s >= 0:
        return r
    o = opt.replace(step=5000 if opt.cigar else 0, max_iter=0)
    return align_chain(ts, qs, o)
