"""k-mer chaining primitives for the heuristic mode.

Semantics replicate the reference (miniwfa.c:699-848): 2-bit rolling k-mers
over ACGT (anything else resets the window), low-occurrence match pairing
(per-side occurrence ≤ max_occ), LIS co-linear chaining, gapless-run anchor
filtering, and the k-mer multiset similarity estimate.

These run on the host over numpy (vectorized C loops) — anchoring is a
few ms even at Mb scale, far from the hot path.  The LIS inner loop is
sequential O(n log n) — it uses the native C++ kernel when built
(utils/native.py) with this as fallback.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

# A/a→0, C/c→1, G/g→2, T/t/U/u→3, else 4 (reference seq_nt4_table,
# miniwfa.c:699-716)
NT4 = np.full(256, 4, dtype=np.uint8)
for i, ch in enumerate("ACGT"):
    NT4[ord(ch)] = i
    NT4[ord(ch.lower())] = i
NT4[ord("U")] = NT4[ord("u")] = 3


def _native_kmer():
    try:
        from ..utils import native
        if native.has_kmer():
            return native
    except Exception:
        pass
    return None


def kmer_codes(seq: bytes, rid: int, k: int) -> np.ndarray:
    """All valid k-mers as ``(kmer<<1|rid)<<32 | end_pos`` uint64 values
    (reference mg_fc_kmer, miniwfa.c:718-730).  Native C++ when built
    (the numpy k-wide shift loop costs ~10 s per 5 Mb sequence on one
    core — SURVEY C16 is a ⚡ host-hot component at Mb scale)."""
    nat = _native_kmer()
    if nat is not None:
        return nat.kmer_codes(seq, rid, k)
    n = len(seq)
    if n < k:
        return np.zeros(0, dtype=np.uint64)
    codes = NT4[np.frombuffer(seq, dtype=np.uint8)].astype(np.uint64)
    bad = codes >= 4
    # window [i-k+1, i] is valid iff it contains no bad char
    cbad = np.concatenate([[0], np.cumsum(bad)])
    valid = (cbad[k:] - cbad[:-k]) == 0          # at end positions k-1..n-1
    x = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):
        x = (x << np.uint64(2)) | codes[j : j + n - k + 1]
    pos = np.arange(k - 1, n, dtype=np.uint64)
    out = ((x << np.uint64(1)) | np.uint64(rid)) << np.uint64(32) | pos
    return out[valid]


def _group_bounds(keys: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Start indices and counts of equal-key runs in a sorted array."""
    if keys.size == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    change = np.nonzero(np.concatenate([[True], keys[1:] != keys[:-1]]))[0]
    counts = np.diff(np.concatenate([change, [keys.size]]))
    return change, counts


def match_pairs(ts: bytes, qs: bytes, k: int, max_occ: int) -> np.ndarray:
    """Cross-product anchor pairs pos1<<32|pos2 for k-mers occurring in
    both sequences with per-side occurrence ≤ max_occ
    (reference mg_chain first half, miniwfa.c:741-765).  Native C++ when
    built: one linear pass + radix sorts instead of numpy's multi-pass
    group bookkeeping (~25 s -> <1 s on a 5 Mb pair)."""
    nat = _native_kmer()
    if nat is not None:
        return nat.match_pairs_u64(ts, qs, k, max_occ)
    a = np.sort(np.concatenate([kmer_codes(ts, 0, k), kmer_codes(qs, 1, k)]))
    starts, counts = _group_bounds(a >> np.uint64(33))
    rid = ((a >> np.uint64(32)) & np.uint64(1)).astype(np.int64)
    crid = np.concatenate([[0], np.cumsum(rid)])
    ends = starts + counts
    n1 = crid[ends] - crid[starts]               # rid-1 count per group
    n0 = counts - n1
    ok = (n0 >= 1) & (n1 >= 1) & (n0 <= max_occ) & (n1 <= max_occ)
    pos = a & np.uint64(0xFFFFFFFF)
    chunks: List[np.ndarray] = []
    for u in range(max_occ):
        for v in range(max_occ):
            m = ok & (n0 > u) & (n1 > v)
            if not m.any():
                continue
            s_idx = starts[m] + u                # rid-0 entries come first
            t_idx = starts[m] + n0[m] + v        # (sorted: rid bit above pos)
            chunks.append(pos[s_idx] << np.uint64(32) | pos[t_idx])
    if not chunks:
        return np.zeros(0, dtype=np.uint64)
    return np.sort(np.concatenate(chunks))


def lis_indices(a: np.ndarray) -> np.ndarray:
    """Longest strictly-increasing subsequence of uint64 keys; returns the
    selected indices (reference mg_lis_64, miniwfa.c:678-697 — classic
    patience algorithm with binary search)."""
    try:
        from ..utils import native
        if native.available():
            return native.lis_u64(a)
    except Exception:
        pass
    n = a.size
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    M = np.zeros(n + 1, dtype=np.int64)   # M[l] = index of smallest tail of length l
    P = np.zeros(n, dtype=np.int64)       # predecessor
    L = 0
    for i in range(n):
        lo, hi = 1, L
        ai = a[i]
        while lo <= hi:
            mid = (lo + hi + 1) >> 1
            if a[M[mid]] < ai:
                lo = mid + 1
            else:
                hi = mid - 1
        P[i] = M[lo - 1]
        M[lo] = i
        if lo > L:
            L = lo
    out = np.zeros(L, dtype=np.int64)
    kk = M[L]
    for j in range(L - 1, -1, -1):
        out[j] = kk
        kk = P[kk]
    return out


def chain(ts: bytes, qs: bytes, k: int, max_occ: int) -> np.ndarray:
    """Co-linear anchor chain pos1<<32|pos2, ascending
    (reference mg_chain, miniwfa.c:732-784)."""
    if len(ts) < k or len(qs) < k:
        return np.zeros(0, dtype=np.uint64)
    b = match_pairs(ts, qs, k, max_occ)
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    # LIS over coordinate-swapped keys (pos2 major) picks the co-linear set
    swapped = (b >> np.uint64(32)) | (b << np.uint64(32))
    keep = lis_indices(swapped)
    return b[keep]


def anchor_filter(anchors: np.ndarray, tl: int, ql: int, k: int,
                  min_len: int) -> np.ndarray:
    """Drop anchors in gapless (same-diagonal) runs shorter than min_len
    (reference wf_anchor_filter, miniwfa.c:829-848), vectorized.

    Semantics notes carried over exactly: the scan starts from a virtual
    (0,0) element whose run length accumulates *without* the +k base; a
    virtual terminal (tl,ql) element can extend — and thereby always
    preserve — the final run.
    """
    n = anchors.size
    if n == 0:
        return anchors
    # element coordinates: index 0 = virtual origin, 1..n = anchors (+1'd
    # coords as in the reference), n+1 = virtual terminal
    X = np.empty(n + 2, dtype=np.int64)
    Y = np.empty(n + 2, dtype=np.int64)
    X[0], Y[0] = 0, 0
    X[1 : n + 1] = (anchors >> np.uint64(32)).astype(np.int64) + 1
    Y[1 : n + 1] = (anchors & np.uint64(0xFFFFFFFF)).astype(np.int64) + 1
    X[n + 1], Y[n + 1] = tl, ql
    brk = (np.diff(X) != np.diff(Y))                 # [n+1]: break AT element e+1
    starts = np.concatenate([[0], np.nonzero(brk)[0] + 1])  # run start elements
    if starts.size == 1:
        return anchors                               # single unchecked run
    ends = starts[1:]                                # checked runs end at next start
    s = starts[:-1]
    base = np.where(s >= 1, k, 0)
    runlen = base + X[ends - 1] - X[s]
    killed = runlen < min_len
    if not killed.any():
        return anchors
    # kill anchor elements [max(s,1), ends) via a difference array
    dm = np.zeros(n + 2, dtype=np.int64)
    np.add.at(dm, np.maximum(s[killed], 1), 1)
    np.add.at(dm, ends[killed], -1)
    alive = np.cumsum(dm)[1 : n + 1] == 0
    return anchors[alive]


def ksim(ts: bytes, qs: bytes, k: int) -> float:
    """max(shared/n1, shared/n2) over the k-mer multiset intersection
    (reference mwf_ksim, miniwfa.c:786-812)."""
    if len(ts) < k or len(qs) < k:
        return 0.0
    a = np.sort(np.concatenate([kmer_codes(ts, 0, k), kmer_codes(qs, 1, k)]))
    starts, counts = _group_bounds(a >> np.uint64(33))
    rid = ((a >> np.uint64(32)) & np.uint64(1)).astype(np.int64)
    crid = np.concatenate([[0], np.cumsum(rid)])
    m1 = counts - (crid[starts + counts] - crid[starts])
    m2 = counts - m1
    both = (m1 > 0) & (m2 > 0)
    shared = int(np.minimum(m1, m2)[both].sum())
    n1, n2 = int(m1.sum()), int(m2.sum())
    p1 = shared / n1 if n1 > 0 else 0.0
    p2 = shared / n2 if n2 > 0 else 0.0
    return max(p1, p2)
