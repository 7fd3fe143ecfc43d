"""CIGAR utilities: packing, text conversion, re-scoring, validation.

Packing follows the htslib convention used by the reference
(miniwfa.h:50: ``len<<4 | op``); ops emitted by the aligner are
1='I' (query insertion), 2='D' (target deletion), 7='=' (match),
8='X' (mismatch).  Text rendering uses the op table "MIDNSHP=XBid"
(reference main.c:78).

``cigar_score``/``assert_cigar`` re-derive the alignment score and the
consumed target/query lengths from a CIGAR, mirroring the reference's
debug oracle (mwf-dbg.c:6-31) — every alignment the framework emits is
checked against it in tests and (optionally) at runtime.
"""

from __future__ import annotations

import re
from typing import List, Sequence, Tuple

from .options import Options

OP_M, OP_I, OP_D, OP_EQ, OP_X = 0, 1, 2, 7, 8
OP_CHARS = "MIDNSHP=XBid"
_CHAR2OP = {c: i for i, c in enumerate(OP_CHARS)}


def pack(op: int, length: int) -> int:
    return (length << 4) | op


def unpack(code: int) -> Tuple[int, int]:
    return code & 0xF, code >> 4


def to_string(cigar: Sequence[int]) -> str:
    return "".join(f"{c >> 4}{OP_CHARS[c & 0xF]}" for c in cigar)


def from_string(text: str) -> List[int]:
    out: List[int] = []
    for m in re.finditer(r"(\d+)([MIDNSHP=XBid])", text):
        out.append(pack(_CHAR2OP[m.group(2)], int(m.group(1))))
    return out


def push(cigar: List[int], op: int, length: int) -> None:
    """Append one run, merging with the previous run when ops match
    (reference wf_cigar_push1, miniwfa.c:51-62)."""
    if length <= 0:
        return
    if cigar and (cigar[-1] & 0xF) == op:
        cigar[-1] += length << 4
    else:
        cigar.append(pack(op, length))


def extend(cigar: List[int], other: Sequence[int]) -> None:
    """Splice ``other`` onto ``cigar`` merging the seam
    (reference wf_cigar_push, miniwfa.c:816-827)."""
    if not other:
        return
    push(cigar, other[0] & 0xF, other[0] >> 4)
    cigar.extend(other[1:])


def cigar_score(opt: Options, cigar: Sequence[int]) -> Tuple[int, int, int]:
    """Recompute (score, target_len, query_len) from a CIGAR
    (reference mwf_cigar2score, mwf-dbg.c:6-22)."""
    s = tl = ql = 0
    for c in cigar:
        op, ln = c & 0xF, c >> 4
        if op in (OP_I, OP_D):
            s += min(opt.o1 + ln * opt.e1, opt.o2 + ln * opt.e2)
        elif op == OP_X:
            s += ln * opt.x
        if op in (OP_M, OP_EQ, OP_X):
            tl += ln
            ql += ln
        elif op == OP_I:
            ql += ln
        elif op == OP_D:
            tl += ln
    return s, tl, ql


def assert_cigar(
    opt: Options,
    cigar: Sequence[int],
    tl: int,
    ql: int,
    score: int,
    ts: bytes | None = None,
    qs: bytes | None = None,
) -> None:
    """Validate CIGAR consistency (reference mwf_assert_cigar,
    mwf-dbg.c:24-31) plus, when sequences are given, that '='/'X' runs
    really are matches/mismatches."""
    s, t, q = cigar_score(opt, cigar)
    if t != tl:
        raise AssertionError(f"CIGAR consumes target {t} != {tl}")
    if q != ql:
        raise AssertionError(f"CIGAR consumes query {q} != {ql}")
    if s != score:
        raise AssertionError(f"CIGAR re-scores to {s} != reported {score}")
    if ts is not None and qs is not None:
        i = k = 0  # query / target cursors
        for c in cigar:
            op, ln = c & 0xF, c >> 4
            if op == OP_EQ:
                if qs[i : i + ln] != ts[k : k + ln]:
                    raise AssertionError(f"'=' run at t={k},q={i} mismatches")
                i += ln
                k += ln
            elif op == OP_X:
                for j in range(ln):
                    if qs[i + j] == ts[k + j]:
                        raise AssertionError(f"'X' at t={k+j},q={i+j} matches")
                i += ln
                k += ln
            elif op == OP_I:
                i += ln
            elif op == OP_D:
                k += ln
