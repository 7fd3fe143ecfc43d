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


def _intra_offsets(sizes: np.ndarray) -> np.ndarray:
    """[0..s0-1, 0..s1-1, ...] for a vector of run sizes."""
    total = int(sizes.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    return np.arange(total, dtype=np.int64) - \
        np.repeat(np.cumsum(sizes) - sizes, sizes)


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
    gap_results: List[Optional[Result]] = [None] * len(gap_pairs)

    # window-sized gaps (the vast majority: 99.98% of a 5 Mb pair's ~43k
    # fills are <=127 bp total) run on the gaps-in-sublanes engine — one
    # sublane row per gap, thousands of gaps per Pallas grid step —
    # instead of ms-per-cycle lockstep dispatches (models/tiny.py)
    from . import tiny as tn
    pending = list(range(len(gap_pairs)))
    tiny_sel = [g for g in pending
                if len(gap_pairs[g][0]) + len(gap_pairs[g][1])
                <= tn.wg.MAX_TOT]
    if tiny_sel and tn.tiny_eligible(opt, max(
            len(gap_pairs[g][0]) + len(gap_pairs[g][1])
            for g in tiny_sel)):
        sub = tn.align_tiny_batch([gap_pairs[g] for g in tiny_sel], opt)
        for g, r in zip(tiny_sel, sub):
            gap_results[g] = r
        pending = [g for g in pending if gap_results[g] is None]

    # dispatch the rest in bounded chunks: a Mb-scale pair yields 1e4-1e5
    # gaps and one giant batch would blow device memory / compile fresh
    # giant specs.  Sorting by size keeps each chunk's padding buckets
    # tight.
    CHUNK = 2048
    order = sorted(pending,
                   key=lambda g: max(len(gap_pairs[g][0]),
                                     len(gap_pairs[g][1])))
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
        out.append(_assemble_pair(opt, pi, kinds, x1 - x0, y1 - y0, gap_map))
    return out


def _assemble_pair(opt: Options, pi: int, kinds, dx, dy, gap_map) -> Result:
    """Vectorized score + CIGAR splice over a pair's segment plan.

    A 5 Mb pair has ~4M segments (mostly same-diagonal '=' runs between
    adjacent anchors), so the reference's per-segment walk
    (miniwfa.c:861-891) must not become a per-segment Python loop here:
    scores reduce with numpy masks, and the CIGAR is built by scattering
    every segment's packed runs at precomputed offsets, then one
    run-merge pass (equal-op grouping == sequential push/extend)."""
    m_eq = kinds == K_EQ
    m_skip = kinds == K_SKIP
    m_del = kinds == K_DEL
    m_ins = kinds == K_INS
    m_al = kinds == K_ALIGN

    def gap_cost(ln):
        return np.minimum(opt.o1 + ln * opt.e1, opt.o2 + ln * opt.e2)

    s = int(opt.o2 * 2 * m_skip.sum()
            + opt.e2 * (dx[m_skip].sum() + dy[m_skip].sum())
            + gap_cost(dx[m_del]).sum() + gap_cost(dy[m_ins]).sum())
    aidx = np.nonzero(m_al)[0]
    ares = [gap_map[(pi, int(i))] for i in aidx]
    s += sum(r.s for r in ares)
    n_iter = sum(r.n_iter for r in ares)
    if not opt.cigar:
        return Result(s=s, cigar=None, n_iter=n_iter)

    # per-segment emitted-run counts: EQ/DEL/INS -> 1, SKIP -> 2 (D then
    # I), ALIGN -> len(sub-cigar), NONE -> 0
    n_seg = kinds.size
    cnt = np.zeros(n_seg, np.int64)
    cnt[m_eq | m_del | m_ins] = 1
    cnt[m_skip] = 2
    acigs = [np.asarray(r.cigar if r.cigar is not None else [], np.int64)
             for r in ares]
    sizes = np.fromiter((a.size for a in acigs), np.int64, len(acigs))
    cnt[aidx] = sizes
    off_all = np.concatenate([[0], np.cumsum(cnt)])
    off = off_all[:-1]                     # start offset per segment
    flat = np.zeros(int(off_all[-1]), np.int64)
    flat[off[m_eq]] = (dx[m_eq] << 4) | C.OP_EQ
    flat[off[m_del]] = (dx[m_del] << 4) | C.OP_D
    flat[off[m_ins]] = (dy[m_ins] << 4) | C.OP_I
    flat[off[m_skip]] = (dx[m_skip] << 4) | C.OP_D
    flat[off[m_skip] + 1] = (dy[m_skip] << 4) | C.OP_I
    if acigs:
        # one vectorized scatter of every sub-CIGAR (a per-gap slice
        # assignment loop costs seconds at 43k gaps)
        dst = np.repeat(off[aidx], sizes) + _intra_offsets(sizes)
        flat[dst] = np.concatenate(acigs) if len(acigs) > 1 else acigs[0]
    flat = flat[(flat >> 4) > 0]           # drop zero-length runs (push)
    if flat.size:
        ops = flat & 0xF
        b = np.nonzero(np.concatenate([[True], ops[1:] != ops[:-1]]))[0]
        lens = np.add.reduceat(flat >> 4, b)
        flat = (lens << 4) | ops[b]
    return Result(s=s, cigar=flat.tolist(), n_iter=n_iter)


def align_chain(ts, qs, opt: Options) -> Result:
    """Chaining heuristic alignment (reference mwf_wfa_chain).  May miss
    the optimal score; the CIGAR is still self-consistent with s."""
    return align_chain_batch([(ts, qs)], opt)[0]
