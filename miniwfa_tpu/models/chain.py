"""Heuristic chaining mode: anchor the pair on low-occurrence k-mers, then
close the inter-anchor gaps exactly (reference mwf_wfa_chain,
miniwfa.c:850-896).

Host plans the segment list (anchors, gap classification via k-mer
similarity), then all exact gap sub-alignments are dispatched to the device
as ONE batch — the TPU-native twist: the reference aligns gaps one at a
time; batching them keeps the chip's lanes full and is the natural
intra-pair parallelism source for huge sequences (SURVEY.md §5).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from .. import cigar as C
from ..options import Options
from ..ops import kmer
from .exact import Result, align_batch, as_bytes


def _plan_segments(ts: bytes, qs: bytes, opt: Options):
    """Walk the filtered anchor chain and classify each region
    (reference miniwfa.c:861-891)."""
    anchors = kmer.chain(ts, qs, opt.kmer, opt.max_occ)
    anchors = kmer.anchor_filter(anchors, len(ts), len(qs), opt.kmer,
                                 opt.min_len)
    segs = []  # (kind, x0, x1, y0, y1); kind: 'eq', 'skip', 'align', 'del', 'ins'
    n_a = anchors.size
    x0 = y0 = 0
    for i in range(n_a + 1):
        if i == n_a:
            x1, y1 = len(ts), len(qs)
        else:
            x1 = int(anchors[i] >> np.uint64(32)) + 1
            y1 = int(anchors[i] & np.uint64(0xFFFFFFFF)) + 1
        if i < n_a and x1 - x0 == y1 - y0 and x1 - x0 <= opt.kmer:
            segs.append(("eq", x0, x1, y0, y1))
        elif x0 < x1 and y0 < y1:
            if (x1 - x0 >= 10000 and y1 - y0 >= 10000
                    and kmer.ksim(ts[x0:x1], qs[y0:y1], opt.kmer) < 0.02):
                # huge dissimilar gap: emit D+I costed 2*o2 + e2*(l1+l2)
                # (miniwfa.c:869-875)
                segs.append(("skip", x0, x1, y0, y1))
            else:
                segs.append(("align", x0, x1, y0, y1))
        elif x0 < x1:
            segs.append(("del", x0, x1, y0, y1))
        elif y0 < y1:
            segs.append(("ins", x0, x1, y0, y1))
        x0, y0 = x1, y1
    return segs


def align_chain(ts, qs, opt: Options) -> Result:
    """Chaining heuristic alignment (reference mwf_wfa_chain).  May miss
    the optimal score; the CIGAR is still self-consistent with s."""
    ts, qs = as_bytes(ts), as_bytes(qs)
    segs = _plan_segments(ts, qs, opt)

    # batch all exact gap fills in one device dispatch
    gap_ix = [i for i, sg in enumerate(segs) if sg[0] == "align"]
    gap_results: List[Result] = []
    if gap_ix:
        pairs = [(ts[segs[i][1] : segs[i][2]], qs[segs[i][3] : segs[i][4]])
                 for i in gap_ix]
        gap_results = align_batch(pairs, opt)
    gap_map = dict(zip(gap_ix, gap_results))

    s = 0
    cig: Optional[List[int]] = [] if opt.cigar else None
    for i, (kind, x0, x1, y0, y1) in enumerate(segs):
        if kind == "eq":
            if cig is not None:
                C.push(cig, C.OP_EQ, x1 - x0)
        elif kind == "skip":
            if cig is not None:
                C.push(cig, C.OP_D, x1 - x0)
                C.push(cig, C.OP_I, y1 - y0)
            s += opt.o2 * 2 + opt.e2 * ((x1 - x0) + (y1 - y0))
        elif kind == "align":
            q = gap_map[i]
            if cig is not None and q.cigar is not None:
                C.extend(cig, q.cigar)
            s += q.s
        elif kind == "del":
            if cig is not None:
                C.push(cig, C.OP_D, x1 - x0)
            s += opt.gap_cost(x1 - x0)
        elif kind == "ins":
            if cig is not None:
                C.push(cig, C.OP_I, y1 - y0)
            s += opt.gap_cost(y1 - y0)
    return Result(s=s, cigar=cig)
