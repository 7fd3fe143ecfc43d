"""FASTA/FASTQ IO, auto mode, and byte-alphabet (non-ACGT) engine tests."""

import gzip
import os
import tempfile

import pytest


def _write(path, data):
    with open(path, "wb") as f:
        f.write(data)


def test_fasta_multiline_and_fastq(tmp_path):
    from miniwfa_tpu.utils.io import read_fastx

    fa = tmp_path / "a.fa"
    _write(fa, b">s1 a comment\nACGT\nACG\n>s2\nTTTT\n")
    recs = list(read_fastx(str(fa)))
    assert [(r.name, r.seq) for r in recs] == [("s1", b"ACGTACG"), ("s2", b"TTTT")]
    assert recs[0].comment == "a comment"

    fq = tmp_path / "a.fq"
    _write(fq, b"@r1\nACGT\n+\nIIII\n@r2\nGG\nTT\n+\nIII\nI\n")
    recs = list(read_fastx(str(fq)))
    assert [(r.name, r.seq, r.qual) for r in recs] == [
        ("r1", b"ACGT", b"IIII"), ("r2", b"GGTT", b"IIII")]


def test_fasta_gzip(tmp_path):
    from miniwfa_tpu.utils.io import read_fastx

    fa = tmp_path / "a.fa.gz"
    with gzip.open(fa, "wb") as f:
        f.write(b">x\nACGTACGT\n")
    recs = list(read_fastx(str(fa)))
    assert recs[0].seq == b"ACGTACGT"


def test_auto_mode_matches_exact(goldens):
    """Auto mode = exact when the cell budget suffices
    (reference mwf_wfa_auto, miniwfa.c:898-908)."""
    from miniwfa_tpu import Options, align_auto

    c = next(c for c in goldens["cases"] if c["name"] == "t3")
    r = align_auto(c["t"], c["q"], Options(cigar=True))
    e = goldens["runs"]["cigar"][[x["name"] for x in goldens["cases"]].index("t3")]
    assert r.s == e["s"] and r.cigar_str == e["cigar"]


def test_byte_alphabet_matches_reference_semantics():
    """Non-ACGT bytes use the 4-chars/word packing; the reference compares
    raw bytes, so N==N is a match and case matters."""
    from miniwfa_tpu import Options
    from miniwfa_tpu.models.exact import align_batch

    opt = Options(cigar=True)
    rs = align_batch(
        [("NNNN", "NNNN"), ("acgt", "acgt"), ("ACGT", "acgt"),
         ("AANA", "AANA"), ("hello world", "hello brave world")], opt)
    assert (rs[0].s, rs[0].cigar_str) == (0, "4=")
    assert (rs[1].s, rs[1].cigar_str) == (0, "4=")
    assert (rs[2].s, rs[2].cigar_str) == (16, "4X")
    assert (rs[3].s, rs[3].cigar_str) == (0, "4=")
    assert rs[4].s == 16 and rs[4].cigar is not None
    from miniwfa_tpu import cigar as C
    C.assert_cigar(opt, rs[4].cigar, 11, 17, rs[4].s,
                   ts=b"hello world", qs=b"hello brave world")


def test_mixed_batch_forces_byte_mode(goldens):
    """One non-ACGT pair in a batch must not change ACGT pairs' results."""
    from miniwfa_tpu import Options
    from miniwfa_tpu.models.exact import align_batch

    c = next(c for c in goldens["cases"] if c["name"] == "t3")
    opt = Options(cigar=True)
    solo = align_batch([(c["t"], c["q"])], opt)[0]
    mixed = align_batch([(c["t"], c["q"]), ("NNN", "NNAN")], opt)
    assert (mixed[0].s, mixed[0].cigar_str) == (solo.s, solo.cigar_str)
    assert mixed[1].s > 0
