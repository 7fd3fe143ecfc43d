"""Unit tests for CIGAR utilities (reference semantics: mwf-dbg.c,
wf_cigar_push1 miniwfa.c:51-62)."""

import pytest

from miniwfa_tpu import cigar as C
from miniwfa_tpu.options import Options


def test_pack_roundtrip():
    code = C.pack(C.OP_EQ, 128)
    assert C.unpack(code) == (C.OP_EQ, 128)
    assert C.to_string([code]) == "128="


def test_string_roundtrip():
    s = "1X16=1X14=128I4=1X24="
    assert C.to_string(C.from_string(s)) == s


def test_push_merges_runs():
    cig = []
    C.push(cig, C.OP_EQ, 4)
    C.push(cig, C.OP_EQ, 3)
    C.push(cig, C.OP_X, 1)
    assert C.to_string(cig) == "7=1X"


def test_extend_merges_seam():
    a = C.from_string("4=2I")
    C.extend(a, C.from_string("3I5="))
    assert C.to_string(a) == "4=5I5="


def test_cigar_score_dual_affine():
    opt = Options()
    # 128I: min(4+2*128, 15+1*128) = 143; 3X: 12
    s, tl, ql = C.cigar_score(opt, C.from_string("10=128I3X"))
    assert (s, tl, ql) == (143 + 12, 13, 141)
    # short gap uses the o1/e1 piece: 4I -> min(4+8, 15+4) = 12
    s, _, _ = C.cigar_score(opt, C.from_string("4I"))
    assert s == 12


def test_assert_cigar_catches_bad_length():
    opt = Options()
    with pytest.raises(AssertionError):
        C.assert_cigar(opt, C.from_string("4="), 5, 4, 0)


def test_assert_cigar_checks_matches():
    opt = Options()
    C.assert_cigar(opt, C.from_string("3="), 3, 3, 0, ts=b"ACG", qs=b"ACG")
    with pytest.raises(AssertionError):
        C.assert_cigar(opt, C.from_string("3="), 3, 3, 0, ts=b"ACG", qs=b"ACT")
