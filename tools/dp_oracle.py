#!/usr/bin/env python3
"""Independent O(n^2) dual-affine DP scorer — a SECOND implementation of
the objective function, sharing no code or algorithm with the wavefront
engines.

Fills the role of the reference's independent-implementation comparators
(test-wfa / main-wfa.c:21-95 driving WFA2-lib, test-wfalm /
main-wfalm.cpp:10-48 driving wfalm): optimal *scores* must agree with the
WFA engines; CIGARs may differ among co-optimal paths, so only scores are
compared.

Two implementations, cross-checked against each other in
tests/test_dp_oracle.py:

* ``dp_score_naive`` — the textbook 5-matrix DP (H, I1, I2 along the
  query, D1, D2 along the target), pure Python, for tiny pairs.  This is
  the most-obviously-correct form of the objective.
* ``dp_score`` — vectorized numpy row sweep.  The D (within-row gap)
  states are folded into a min-plus closure per row: for a fixed query
  prefix, H[i,k] = min(base[k], min_{j<k} base[j] + gap(k-j)) with
  gap(l) = min(o1+l*e1, o2+l*e2), computable with two
  ``np.minimum.accumulate`` scans (affine cost => prefix-min of
  base[j]-e*j).  Folding is exact because a within-row composite of two
  gap pieces never beats the best single piece:
  o1+e1*a + o2+e2*b >= min(o1+e1*(a+b), o2+e2*(a+b)) for a,b >= 1 and
  o1,o2 >= 0, e1 >= e2 (and symmetrically) — the same maximal-gap-run
  property mwf_cigar2score relies on (mwf-dbg.c:6-22).

Usage: dp_oracle.py <t.fa-ish string> <q string>   (ad-hoc; the real
consumers are tests/test_dp_oracle.py and tools/fuzz_oracle.py --dp)
"""

from __future__ import annotations

import numpy as np

INF = 1 << 29


def _codes(s) -> np.ndarray:
    if isinstance(s, str):
        s = s.encode("latin1")
    return np.frombuffer(bytes(s), np.uint8).astype(np.int64)


def dp_score(ts, qs, x=4, o1=4, e1=2, o2=15, e2=1) -> int:
    """Optimal dual-affine global alignment penalty, vectorized numpy."""
    t = _codes(ts)
    q = _codes(qs)
    tl, ql = len(t), len(q)
    k = np.arange(tl + 1, dtype=np.int64)

    def gap_close(base):
        """min over j<k of base[j] + min(o1+e1*(k-j), o2+e2*(k-j))."""
        out = np.full(tl + 1, INF, np.int64)
        if tl:
            c1 = np.minimum.accumulate(base - e1 * k)
            c2 = np.minimum.accumulate(base - e2 * k)
            out[1:] = np.minimum(o1 + e1 * k[1:] + c1[:-1],
                                 o2 + e2 * k[1:] + c2[:-1])
        return out

    base = np.full(tl + 1, INF, np.int64)
    base[0] = 0
    H = np.minimum(base, gap_close(base))      # row i=0: leading deletions
    I1 = np.full(tl + 1, INF, np.int64)
    I2 = np.full(tl + 1, INF, np.int64)
    for i in range(1, ql + 1):
        I1 = np.minimum(H + o1 + e1, I1 + e1)  # gap in target (consumes q)
        I2 = np.minimum(H + o2 + e2, I2 + e2)
        diag = np.full(tl + 1, INF, np.int64)
        diag[1:] = H[:-1] + np.where(q[i - 1] == t, 0, x)
        base = np.minimum(diag, np.minimum(I1, I2))
        H = np.minimum(base, gap_close(base))
    return int(H[tl])


def dp_score_naive(ts, qs, x=4, o1=4, e1=2, o2=15, e2=1) -> int:
    """Textbook 5-matrix dual-affine DP, pure Python (tiny pairs only)."""
    t = bytes(ts if not isinstance(ts, str) else ts.encode("latin1"))
    q = bytes(qs if not isinstance(qs, str) else qs.encode("latin1"))
    tl, ql = len(t), len(q)
    H = [[INF] * (tl + 1) for _ in range(ql + 1)]
    D1 = [[INF] * (tl + 1) for _ in range(ql + 1)]
    D2 = [[INF] * (tl + 1) for _ in range(ql + 1)]
    I1 = [[INF] * (tl + 1) for _ in range(ql + 1)]
    I2 = [[INF] * (tl + 1) for _ in range(ql + 1)]
    H[0][0] = 0
    for i in range(ql + 1):
        for kk in range(tl + 1):
            if kk:
                D1[i][kk] = min(H[i][kk - 1] + o1 + e1, D1[i][kk - 1] + e1)
                D2[i][kk] = min(H[i][kk - 1] + o2 + e2, D2[i][kk - 1] + e2)
            if i:
                I1[i][kk] = min(H[i - 1][kk] + o1 + e1, I1[i - 1][kk] + e1)
                I2[i][kk] = min(H[i - 1][kk] + o2 + e2, I2[i - 1][kk] + e2)
            best = min(D1[i][kk], D2[i][kk], I1[i][kk], I2[i][kk])
            if i and kk:
                best = min(best, H[i - 1][kk - 1]
                           + (0 if q[i - 1] == t[kk - 1] else x))
            if i or kk:
                H[i][kk] = best
    return H[ql][tl]


if __name__ == "__main__":
    import sys
    ts, qs = sys.argv[1], sys.argv[2]
    print(dp_score(ts, qs))
