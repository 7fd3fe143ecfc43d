"""Heuristic chaining mode: anchor the pair on low-occurrence k-mers, then
close the inter-anchor gaps exactly (reference mwf_wfa_chain,
miniwfa.c:850-896).

Host plans the segment lists (anchors, gap classification via k-mer
similarity) with vectorized numpy; the exact gap sub-alignments of a WHOLE
BATCH of pairs are dispatched to the device as ONE align_batch call — the
TPU-native twist: the reference aligns gaps one at a time; cross-pair gap
batching keeps the chip's lanes full and is the natural intra-pair
parallelism source for huge sequences (SURVEY.md §5).

``Result.n_iter`` in chain mode is the sum of the gap fills' wavefront
cells (the reference leaves r->n_iter unset here — its gap results are
local, miniwfa.c:877-882 — so this framework defines the unit).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from .. import cigar as C
from ..options import Options
from ..ops import kmer
from .exact import Result, align_batch, as_bytes

# segment kinds (classification of miniwfa.c:861-891)
K_EQ, K_SKIP, K_ALIGN, K_DEL, K_INS, K_NONE = range(6)


def _plan_segments(ts: bytes, qs: bytes, opt: Options):
    """Vectorized anchor-chain walk; returns (kinds, x0, x1, y0, y1)
    int64 arrays over the n_a+1 inter-anchor regions."""
    anchors = kmer.chain(ts, qs, opt.kmer, opt.max_occ)
    anchors = kmer.anchor_filter(anchors, len(ts), len(qs), opt.kmer,
                                 opt.min_len)
    n_a = int(anchors.size)
    x1 = np.empty(n_a + 1, np.int64)
    y1 = np.empty(n_a + 1, np.int64)
    x1[:n_a] = (anchors >> np.uint64(32)).astype(np.int64) + 1
    y1[:n_a] = (anchors & np.uint64(0xFFFFFFFF)).astype(np.int64) + 1
    x1[n_a], y1[n_a] = len(ts), len(qs)
    x0 = np.concatenate([[0], x1[:-1]])
    y0 = np.concatenate([[0], y1[:-1]])
    dx, dy = x1 - x0, y1 - y0
    is_anchor = np.arange(n_a + 1) < n_a
    eq = is_anchor & (dx == dy) & (dx <= opt.kmer)
    both = (~eq) & (dx > 0) & (dy > 0)
    kinds = np.full(n_a + 1, K_NONE, np.int64)
    kinds[eq] = K_EQ
    kinds[both] = K_ALIGN
    kinds[(~eq) & (dx > 0) & (dy == 0)] = K_DEL
    kinds[(~eq) & (dx == 0) & (dy > 0)] = K_INS
    # the >=10kb dissimilar-gap shortcut needs a k-mer similarity pass —
    # rare; loop only over its candidates (miniwfa.c:869-875)
    for i in np.nonzero(both & (dx >= 10000) & (dy >= 10000))[0]:
        if kmer.ksim(ts[x0[i]:x1[i]], qs[y0[i]:y1[i]], opt.kmer) < 0.02:
            kinds[i] = K_SKIP
    return kinds, x0, x1, y0, y1


def align_chain_batch(pairs: Sequence[Tuple[object, object]],
                      opt: Options) -> List[Result]:
    """Chaining heuristic over a batch of pairs: every pair's exact gap
    fills go to the device in ONE batched dispatch."""
    enc = [(as_bytes(t), as_bytes(q)) for t, q in pairs]
    plans = [_plan_segments(t, q, opt) for t, q in enc]

    gap_pairs = []
    gap_of = []           # (pair index, segment index)
    for pi, ((ts, qs), (kinds, x0, x1, y0, y1)) in enumerate(zip(enc, plans)):
        for i in np.nonzero(kinds == K_ALIGN)[0]:
            gap_pairs.append((ts[x0[i]:x1[i]], qs[y0[i]:y1[i]]))
            gap_of.append((pi, int(i)))
    # dispatch in bounded chunks: a Mb-scale pair yields 1e4-1e5 gaps and
    # one giant batch would blow device memory / compile fresh giant specs.
    # Sorting by size keeps each chunk's padding buckets tight.
    CHUNK = 2048
    order = sorted(range(len(gap_pairs)),
                   key=lambda g: max(len(gap_pairs[g][0]),
                                     len(gap_pairs[g][1])))
    gap_results: List[Optional[Result]] = [None] * len(gap_pairs)
    for c0 in range(0, len(order), CHUNK):
        sel = order[c0:c0 + CHUNK]
        # window/score buckets sized to the chunk's largest gap, not the
        # 512 default: most gaps are a few bp and a tight bucket keeps the
        # traceback buffer (and its host fetch) small
        mx = max(max(len(gap_pairs[g][0]), len(gap_pairs[g][1]))
                 for g in sel)
        sub = align_batch([gap_pairs[g] for g in sel], opt,
                          w0=max(64, mx // 2), s0=max(64, mx // 2))
        for g, r in zip(sel, sub):
            gap_results[g] = r
    gap_map = {key: r for key, r in zip(gap_of, gap_results)}

    out: List[Result] = []
    for pi, ((ts, qs), (kinds, x0, x1, y0, y1)) in enumerate(zip(enc, plans)):
        s = 0
        n_iter = 0
        cig: Optional[List[int]] = [] if opt.cigar else None
        for i in range(kinds.size):
            kind = kinds[i]
            dx, dy = int(x1[i] - x0[i]), int(y1[i] - y0[i])
            if kind == K_EQ:
                if cig is not None:
                    C.push(cig, C.OP_EQ, dx)
            elif kind == K_SKIP:
                if cig is not None:
                    C.push(cig, C.OP_D, dx)
                    C.push(cig, C.OP_I, dy)
                s += opt.o2 * 2 + opt.e2 * (dx + dy)
            elif kind == K_ALIGN:
                q = gap_map[(pi, i)]
                if cig is not None and q.cigar is not None:
                    C.extend(cig, q.cigar)
                s += q.s
                n_iter += q.n_iter
            elif kind == K_DEL:
                if cig is not None:
                    C.push(cig, C.OP_D, dx)
                s += opt.gap_cost(dx)
            elif kind == K_INS:
                if cig is not None:
                    C.push(cig, C.OP_I, dy)
                s += opt.gap_cost(dy)
        out.append(Result(s=s, cigar=cig, n_iter=n_iter))
    return out


def align_chain(ts, qs, opt: Options) -> Result:
    """Chaining heuristic alignment (reference mwf_wfa_chain).  May miss
    the optimal score; the CIGAR is still self-consistent with s."""
    return align_chain_batch([(ts, qs)], opt)[0]
