"""The fused-cycle Pallas kernel in CI (interpret mode on CPU).

The production TPU engine lives in ops/wavefront_kernel.py; the rest of
the CPU suite pins the lax engine, so a kernel regression would otherwise
sail through.  Here a golden-corpus subset runs through the public driver
with ``MWF_ENGINE=kernel-interpret`` — the same kernel code path
(dispatch, packing, escalation, traceback decode) executed by the Pallas
interpreter — in score, CIGAR and low-mem (pass 1 + pass 2) modes.

Interpret mode replays the whole while-loop per lane in Python, so only
small cases are used (w0=1024 forces the kernel's minimum W bucket).
"""

import os
import random

import pytest


@pytest.fixture
def kernel_engine(monkeypatch):
    monkeypatch.setenv("MWF_ENGINE", "kernel-interpret")


def _subset(goldens, names):
    idx = [i for i, c in enumerate(goldens["cases"]) if c["name"] in names]
    pairs = [(goldens["cases"][i]["t"].encode(),
              goldens["cases"][i]["q"].encode()) for i in idx]
    return idx, pairs


NAMES_SCORE = ["t3", "identity4", "ins4", "mixed", "del4", "empty_t",
               "homopoly", "small0", "small7", "small44", "unrel5", "binary"]
NAMES_CIGAR = ["t3", "ins4", "mixed", "homopoly", "small7", "unrel5"]
NAMES_LOWMEM = ["t3", "small44"]


def test_kernel_interpret_scores(goldens, kernel_engine):
    from miniwfa_tpu import Options
    from miniwfa_tpu.models.exact import align_batch

    idx, pairs = _subset(goldens, NAMES_SCORE)
    res = align_batch(pairs, Options(**goldens["penalties"]), w0=1024)
    for j, i in enumerate(idx):
        want = goldens["runs"]["score"][i]
        name = goldens["cases"][i]["name"]
        assert res[j].s == want["s"], name
        if name in goldens["niter"]:   # exact cell-count parity (n_iter)
            assert res[j].n_iter == goldens["niter"][name]["n_iter"], name


def test_kernel_interpret_cigars(goldens, kernel_engine):
    from miniwfa_tpu import Options
    from miniwfa_tpu.models.exact import align_batch

    idx, pairs = _subset(goldens, NAMES_CIGAR)
    res = align_batch(pairs, Options(**goldens["penalties"], cigar=True),
                      w0=1024)
    for j, i in enumerate(idx):
        want = goldens["runs"]["cigar"][i]
        name = goldens["cases"][i]["name"]
        assert res[j].s == want["s"], name
        assert res[j].cigar_str == want["cigar"], name


def test_kernel_interpret_lowmem(goldens, kernel_engine):
    from miniwfa_tpu import Options
    from miniwfa_tpu.models.exact import align_batch

    idx, pairs = _subset(goldens, NAMES_LOWMEM)
    res = align_batch(
        pairs, Options(**goldens["penalties"], cigar=True, step=16), w0=1024)
    for j, i in enumerate(idx):
        want = goldens["runs"]["lowmem_p16"][i]
        name = goldens["cases"][i]["name"]
        assert res[j].s == want["s"], name
        assert res[j].cigar_str == want["cigar"], name
