"""Vectorized chain-mode assembly vs a sequential reference walk.

models/chain.py builds each pair's score and CIGAR by scattering packed
runs at cumsum offsets + one run-merge pass; this must equal the
reference's sequential per-segment walk (miniwfa.c:861-891) — push with
run-merge, extend with seam-merge — on arbitrary segment plans,
including seams where a gap sub-CIGAR starts/ends with the neighbour's
op and zero-op NONE segments.
"""

import random

import numpy as np


def _sequential(opt, pi, kinds, dx, dy, gap_map):
    from miniwfa_tpu import cigar as C
    from miniwfa_tpu.models.chain import K_EQ, K_SKIP, K_ALIGN, K_DEL, K_INS

    s = 0
    n_iter = 0
    cig = []
    for i in range(kinds.size):
        kind = kinds[i]
        if kind == K_EQ:
            C.push(cig, C.OP_EQ, int(dx[i]))
        elif kind == K_SKIP:
            C.push(cig, C.OP_D, int(dx[i]))
            C.push(cig, C.OP_I, int(dy[i]))
            s += opt.o2 * 2 + opt.e2 * int(dx[i] + dy[i])
        elif kind == K_ALIGN:
            q = gap_map[(pi, i)]
            C.extend(cig, q.cigar)
            s += q.s
            n_iter += q.n_iter
        elif kind == K_DEL:
            C.push(cig, C.OP_D, int(dx[i]))
            s += opt.gap_cost(int(dx[i]))
        elif kind == K_INS:
            C.push(cig, C.OP_I, int(dy[i]))
            s += opt.gap_cost(int(dy[i]))
    return s, n_iter, cig


def test_assembly_matches_sequential_walk():
    from miniwfa_tpu import Options
    from miniwfa_tpu import cigar as C
    from miniwfa_tpu.models.chain import (
        K_EQ, K_SKIP, K_ALIGN, K_DEL, K_INS, K_NONE, _assemble_pair)
    from miniwfa_tpu.models.exact import Result

    rng = random.Random(7)
    opt = Options(cigar=True)
    ops_pool = [C.OP_EQ, C.OP_X, C.OP_I, C.OP_D]
    for trial in range(200):
        n = rng.randint(1, 40)
        kinds = np.array([rng.choice([K_EQ, K_SKIP, K_ALIGN, K_DEL,
                                      K_INS, K_NONE]) for _ in range(n)],
                         np.int64)
        dx = np.array([rng.randint(1, 50) for _ in range(n)], np.int64)
        dy = np.array([rng.randint(1, 50) for _ in range(n)], np.int64)
        dx[kinds == K_NONE] = 0
        dy[kinds == K_NONE] = 0
        gap_map = {}
        for i in np.nonzero(kinds == K_ALIGN)[0]:
            m = rng.randint(0, 5)   # sometimes empty sub-CIGARs
            cg = []
            for _ in range(m):
                C.push(cg, rng.choice(ops_pool), rng.randint(1, 9))
            gap_map[(0, int(i))] = Result(
                s=rng.randint(0, 100), cigar=cg, n_iter=rng.randint(0, 999))
        want = _sequential(opt, 0, kinds, dx, dy, gap_map)
        got = _assemble_pair(opt, 0, kinds, dx, dy, gap_map)
        assert got.s == want[0], trial
        assert got.n_iter == want[1], trial
        assert got.cigar == want[2], trial
