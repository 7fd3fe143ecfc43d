"""Chunked-resume parity of the wide engine (interpret mode on CPU).

On the tunnelled TPU no single device call may run longer than ~1 min
(worker watchdog), so ops/wavefront_wide.py is resumable: run_chunked
dispatches the alignment in bounded score chunks, carrying the scalar
machine state through scal/out columns and the HBM DP planes through
input_output_aliased buffers.  A paused-and-resumed run must be
bit-identical to a single call — score, cell count, and (pass 1) the
snapshot serialization the checkpoint decoder walks.  Reference
equivalent: one uninterrupted mwf_wfa_core / mwf_wfa_seg loop
(miniwfa.c:397-426, 569-589); chunking is a TPU-runtime concern the C
never had, so the invariant is purely internal consistency.
"""

import json
import os

import numpy as np
import pytest


@pytest.mark.parametrize("mode_name", ["score", "pass1"])
def test_chunked_resume_matches_single_call(goldens, mode_name):
    from miniwfa_tpu.ops import pack
    from miniwfa_tpu.ops import wavefront_kernel as wk
    from miniwfa_tpu.ops import wavefront_wide as ww

    c = next(x for x in goldens["cases"] if x["name"] == "t3")
    want = goldens["niter"]["t3"]
    ts, qs = c["t"].encode(), c["q"].encode()
    cpw = 16 if pack.can_pack2([ts, qs]) else 4
    kw = {}
    if mode_name == "pass1":
        kw = dict(mode=wk.MODE_PASS1, step=16, n_snap=512 // 16 + 2)
    spec = ww.WSpec(B=1, WR=128, S_CAP=512, cpw=cpw,
                    **goldens["penalties"], **kw)
    scal = np.zeros((1, 3), np.int32)
    scal[0] = [len(ts), len(qs), (len(qs) - len(ts)) // 2 - spec.W // 2]
    twt = wk.pack_table([ts], cpw)
    twq = wk.pack_table([qs], cpw)

    single = ww.get_kernel_wide(spec, interpret=True)(scal, twt, twq)
    # 77-cycle chunks -> 3 calls for t3 (s=155): exercises fresh-start,
    # mid-run resume, and terminating-call paths
    calls = []
    orig = ww._get_call

    def counting(s, interpret=False):
        f = orig(s, interpret)

        def g(*a):
            calls.append(1)
            return f(*a)
        return g

    ww._get_call = counting
    try:
        chunk = ww.run_chunked(spec, scal, twt, twq, interpret=True,
                               budget_cells=1 << 60, budget_cycles=77)
    finally:
        ww._get_call = orig
    assert len(calls) >= 3, "budget did not split the run"

    assert int(chunk["final_s"][0]) == int(single["final_s"][0]) \
        == want["s"]
    ni_1 = (int(single["n_iter_hi"][0]) << 30) | int(single["n_iter_lo"][0])
    ni_c = (int(chunk["n_iter_hi"][0]) << 30) | int(chunk["n_iter_lo"][0])
    assert ni_c == ni_1 == want["n_iter"]
    if mode_name == "pass1":
        assert int(chunk["snap_cnt"][0]) == int(single["snap_cnt"][0])
        assert int(chunk["last_ptr"][0]) == int(single["last_ptr"][0])
        assert np.array_equal(np.asarray(chunk["snap"]),
                              np.asarray(single["snap"]))
