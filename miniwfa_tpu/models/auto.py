"""Auto mode: try the exact algorithm with a 100M-cell budget; fall back to
the chaining heuristic (reference mwf_wfa_auto, miniwfa.c:898-908)."""

from __future__ import annotations

from typing import List, Sequence, Tuple

from ..options import Options
from .chain import align_chain_batch
from .exact import Result, align_batch, align_exact, as_bytes


def align_auto_batch(pairs: Sequence[Tuple[object, object]],
                     opt: Options) -> List[Result]:
    """Auto policy over a batch: one exact dispatch with the 100M-cell
    budget (per-lane early stop), then one batched chain pass over the
    lanes that gave up."""
    o = opt.replace(step=0, max_iter=100_000_000)
    # huge pairs: start the window near the device cap — the attempt either
    # finishes (small band) or hits the 100M-cell/window limit; climbing
    # the whole bucket ladder would just compile every intermediate spec
    big = max((max(len(as_bytes(t)), len(as_bytes(q))) for t, q in pairs),
              default=0) > 1_000_000
    res = align_batch(pairs, o, band_limit="stop",
                      w0=4096 if big else 512)
    failed = [i for i, r in enumerate(res) if r.s < 0]
    if failed:
        oc = opt.replace(step=5000 if opt.cigar else 0, max_iter=0)
        chained = align_chain_batch([pairs[i] for i in failed], oc)
        for i, r in zip(failed, chained):
            res[i] = r
    return res


def align_auto(ts, qs, opt: Options) -> Result:
    return align_auto_batch([(ts, qs)], opt)[0]
