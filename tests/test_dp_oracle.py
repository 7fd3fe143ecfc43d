"""Independent-oracle cross-check (the C26/C27 *independence* role).

Every other correctness signal in this repo traces to one implementation
lineage (the reference binary, recorded or live).  tools/dp_oracle.py is a
second, from-scratch implementation of the dual-affine objective (plain
O(n^2) DP, no wavefronts); here the engine's optimal scores are checked
against it on 200+ fuzz pairs, and the vectorized DP is itself checked
against the textbook 5-matrix DP on tiny pairs.
"""

import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PENS = [
    dict(x=4, o1=4, e1=2, o2=15, e2=1),   # reference defaults
    dict(x=1, o1=0, e1=1, o2=0, e2=1),    # edit-distance mimic (-e)
    dict(x=4, o1=4, e1=2, o2=4, e2=2),    # single-affine mimic (-a)
    dict(x=5, o1=2, e1=3, o2=17, e2=2),   # off-default
]


def _rand_pair(rng, max_len):
    bases = "ACGT"
    n = rng.randint(0, max_len)
    t = "".join(rng.choice(bases) for _ in range(n))
    q = []
    for c in t:
        r = rng.random()
        if r < 0.05:
            continue                          # deletion
        if r < 0.10:
            q.append(rng.choice(bases))       # insertion
        q.append(rng.choice(bases) if rng.random() < 0.08 else c)
    if rng.random() < 0.1 and len(t) > 4:     # occasionally a long indel
        cut = rng.randint(1, len(t) - 1)
        q = q[:cut] + [rng.choice(bases)] * rng.randint(8, 40) + q[cut:]
    return t, "".join(q)


def test_vectorized_dp_matches_naive_dp():
    from tools.dp_oracle import dp_score, dp_score_naive

    rng = random.Random(99)
    for trial in range(60):
        pen = PENS[trial % len(PENS)]
        t, q = _rand_pair(rng, 28)
        got, want = dp_score(t, q, **pen), dp_score_naive(t, q, **pen)
        assert got == want, (t, q, pen, got, want)


def test_engine_scores_match_independent_dp():
    from tools.dp_oracle import dp_score
    from miniwfa_tpu import Options, cigar as C
    from miniwfa_tpu.models.exact import align_batch

    rng = random.Random(4242)
    for pen in PENS:
        pairs = [_rand_pair(rng, 300) for _ in range(52)]
        res = align_batch(pairs, Options(**pen, cigar=True))
        for (t, q), r in zip(pairs, res):
            want = dp_score(t, q, **pen)
            assert r.s == want, (len(t), len(q), pen, r.s, want)
            # the CIGAR must also cost exactly the optimal score
            assert C.cigar_score(Options(**pen), r.cigar)[0] == want


def test_independent_dp_agrees_with_golden_corpus(goldens):
    from tools.dp_oracle import dp_score

    pen = goldens["penalties"]
    for case, want in zip(goldens["cases"], goldens["runs"]["score"]):
        if max(len(case["t"]), len(case["q"])) > 3000:
            continue
        assert dp_score(case["t"], case["q"], **pen) == want["s"], case["name"]
