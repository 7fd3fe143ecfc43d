"""Unit tests for the all-rotations packed-word sequence form
(ops/pack.py) that backs the extension probes."""

import numpy as np

from miniwfa_tpu.ops.pack import can_pack2, n_words, pack_ways


def _probe(words, pos, cap, cpw):
    nw = n_words(cap, cpw)
    way = pos % cpw
    return np.uint32(words.view(np.uint32)[0, way * nw + pos // cpw])


def _chars_of(word, cpw):
    bits = 2 if cpw == 16 else 8
    return [(int(word) >> (bits * j)) & ((1 << bits) - 1) for j in range(cpw)]


def test_pack2_probe_every_position():
    s = b"ACGTACGTGGTTAACCGGATCTGA"
    lut = {65: 0, 67: 1, 71: 2, 84: 3}
    w = pack_ways([s], 32, 16)
    for pos in range(len(s)):
        got = _chars_of(_probe(w, pos, 32, 16), 16)
        exp = [lut[s[pos + j]] if pos + j < len(s) else 0 for j in range(16)]
        assert got == exp, pos


def test_pack_bytes_probe_every_position():
    s = b"hello world NNNN acgt"
    w = pack_ways([s], 32, 4)
    for pos in range(len(s)):
        got = _chars_of(_probe(w, pos, 32, 4), 4)
        exp = [s[pos + j] if pos + j < len(s) else 0 for j in range(4)]
        assert got == exp, pos


def test_can_pack2():
    assert can_pack2([b"ACGT", b"", b"GGGG"])
    assert not can_pack2([b"ACGTN"])
    assert not can_pack2([b"acgt"])  # case-sensitive like the reference


def test_word_equality_iff_char_equality():
    """Packed-word equality must coincide with byte-run equality (the
    correctness contract of the extension probe)."""
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    t = bases[rng.integers(0, 4, 64)].tobytes()
    q = bytearray(t)
    q[13] = ord("A") if q[13] != ord("A") else ord("C")
    wt = pack_ways([t], 64, 16).view(np.uint32)
    wq = pack_ways([bytes(q)], 64, 16).view(np.uint32)
    nw = n_words(64, 16)
    for pos in range(0, 40):
        xt = wt[0, (pos % 16) * nw + pos // 16]
        xq = wq[0, (pos % 16) * nw + pos // 16]
        runs_equal = all(t[pos + j] == q[pos + j] for j in range(16))
        assert (xt == xq) == runs_equal, pos
