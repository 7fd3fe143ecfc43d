"""Gaps-in-sublanes engine (ops/wavefront_gaps.py) parity in Pallas
interpret mode: score, canonical CIGAR and n_iter must be bit-identical
to the lax lockstep engine (itself golden-pinned to the reference) on
window-sized pairs, including both packing modes, empty sides and the
early-stop path.  Runs on the CPU backend (conftest forces it)."""

import os
import random

import pytest


def _mut(rng, t, sub, ind):
    out = []
    for c in t:
        r = rng.random()
        if r < sub:
            out.append(rng.choice("ACGT"))
        elif r < sub + ind:
            if rng.random() < .5:
                out.append(c + rng.choice("ACGT"))
        else:
            out.append(c)
    return "".join(out)


def _pairs(seed, n_pairs, maxn=60):
    rng = random.Random(seed)
    pairs = []
    for _ in range(n_pairs):
        n = rng.randint(1, maxn)
        t = "".join(rng.choice("ACGT") for _ in range(n))
        q = _mut(rng, t, 0.1, 0.05)
        if len(t) + len(q) > 127:
            q = q[:127 - len(t)]
        pairs.append((t.encode(), q.encode()))
    return pairs


@pytest.fixture()
def gaps_interpret(monkeypatch):
    monkeypatch.setenv("MWF_ENGINE", "gaps-interpret")
    monkeypatch.setenv("MWF_GAPS_R", "64")


def test_gaps_cigar_parity(gaps_interpret):
    from miniwfa_tpu.options import Options
    from miniwfa_tpu.models.exact import align_batch
    from miniwfa_tpu.models.tiny import align_tiny_batch

    pairs = _pairs(7, 24) + [
        (b"ACGT", b"ACGT"), (b"A", b"G"), (b"AAAA", b"AAAAAAAA"),
        (b"AAAA", b"GGGGACGT"), (b"AAAA", b""), (b"", b"ACG"), (b"", b""),
        (b"ACGTNNNA", b"ACGTANNA"),  # non-ACGT -> byte packing (cpw=4)
    ]
    opt = Options(cigar=True)
    os.environ["MWF_ENGINE"] = "lax"
    ref = align_batch(pairs, opt)
    os.environ["MWF_ENGINE"] = "gaps-interpret"
    got = align_tiny_batch(pairs, opt)
    for i, (r, g) in enumerate(zip(ref, got)):
        assert (r.s, r.cigar, r.n_iter) == (g.s, g.cigar, g.n_iter), \
            f"pair {i}: {pairs[i]}"


def test_gaps_score_and_stop_parity(gaps_interpret):
    from miniwfa_tpu.options import Options
    from miniwfa_tpu.models.exact import align_batch
    from miniwfa_tpu.models.tiny import align_tiny_batch

    pairs = _pairs(11, 16, maxn=50)
    for opt in (Options(cigar=False), Options(cigar=True, max_s=5)):
        os.environ["MWF_ENGINE"] = "lax"
        ref = align_batch(pairs, opt)
        os.environ["MWF_ENGINE"] = "gaps-interpret"
        got = align_tiny_batch(pairs, opt)
        for i, (r, g) in enumerate(zip(ref, got)):
            assert (r.s, r.cigar, r.n_iter) == (g.s, g.cigar, g.n_iter), \
                f"pair {i}: {pairs[i]}"


def test_chain_uses_gaps_engine(gaps_interpret, goldens):
    """Chain mode routes window-sized gap fills through the gaps engine;
    goldens must still hold (reference test-mwf -u -c parity)."""
    from miniwfa_tpu import Options, align_chain

    opt = Options(cigar=True)
    exp = goldens["runs"]["chain"]
    for i, c in enumerate(goldens["cases"]):
        if max(len(c["t"]), len(c["q"])) > 160:
            continue
        r = align_chain(c["t"], c["q"], opt)
        e = exp[i]
        assert r.s == e["s"]
        if e["cigar"] is not None:
            assert r.cigar_str == e["cigar"]
