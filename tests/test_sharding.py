"""Multi-chip sharding tests on the 8-virtual-device CPU mesh.

Validates that the sharded data-parallel path produces results
bit-identical to the single-device path (the batched==single and
fake-backend layers of SURVEY.md §4)."""

import numpy as np
import pytest

import jax


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_matches_single(goldens):
    from miniwfa_tpu import Options
    from miniwfa_tpu.models.exact import align_batch
    from miniwfa_tpu.parallel.batch import align_batch_sharded
    from miniwfa_tpu.parallel.mesh import make_mesh

    cases = [c for c in goldens["cases"]
             if max(len(c["t"]), len(c["q"])) <= 256][:24]
    pairs = [(c["t"], c["q"]) for c in cases]
    opt = Options()
    mesh = make_mesh()
    sharded = align_batch_sharded(pairs, opt, mesh)
    single = align_batch(pairs, opt)
    for c, a, b in zip(cases, sharded, single):
        assert a.s == b.s, c["name"]
        assert a.n_iter == b.n_iter, c["name"]


def test_sharded_scores_match_goldens(goldens):
    from miniwfa_tpu import Options
    from miniwfa_tpu.parallel.batch import align_batch_sharded
    from miniwfa_tpu.parallel.mesh import make_mesh

    cases = [(i, c) for i, c in enumerate(goldens["cases"])
             if max(len(c["t"]), len(c["q"])) <= 256]
    res = align_batch_sharded([(c["t"], c["q"]) for _, c in cases],
                              Options(), make_mesh())
    exp = goldens["runs"]["score"]
    for (i, c), r in zip(cases, res):
        assert r.s == exp[i]["s"], c["name"]


def test_sharded_lowmem_matches_goldens(goldens):
    """Low-mem (two-pass) mode through the sharded path: sharded pass 1
    + checkpoint decode + sharded pass 2 must reproduce the reference's
    low-mem score AND CIGAR (SURVEY.md §7 L7; VERDICT r1 item 5a)."""
    from miniwfa_tpu import Options
    from miniwfa_tpu.parallel.batch import align_batch_sharded
    from miniwfa_tpu.parallel.mesh import make_mesh

    cases = [(i, c) for i, c in enumerate(goldens["cases"])
             if max(len(c["t"]), len(c["q"])) <= 256][:16]
    res = align_batch_sharded([(c["t"], c["q"]) for _, c in cases],
                              Options(cigar=True, step=16), make_mesh())
    exp = goldens["runs"]["lowmem_p16"]
    for (i, c), r in zip(cases, res):
        assert r.s == exp[i]["s"], c["name"]
        assert r.cigar_str == exp[i]["cigar"], c["name"]


def test_sharded_cigar_matches_single(goldens):
    """CIGAR mode through the sharded path must equal the single-device
    path byte-for-byte."""
    from miniwfa_tpu import Options
    from miniwfa_tpu.models.exact import align_batch
    from miniwfa_tpu.parallel.batch import align_batch_sharded
    from miniwfa_tpu.parallel.mesh import make_mesh

    cases = [c for c in goldens["cases"]
             if max(len(c["t"]), len(c["q"])) <= 256][:16]
    pairs = [(c["t"], c["q"]) for c in cases]
    opt = Options(cigar=True)
    sharded = align_batch_sharded(pairs, opt, make_mesh())
    single = align_batch(pairs, opt)
    for c, a, b in zip(cases, sharded, single):
        assert a.s == b.s, c["name"]
        assert a.cigar_str == b.cigar_str, c["name"]


def test_sharded_kernel_matches_goldens(goldens, monkeypatch):
    """The fused-cycle Pallas kernel under shard_map (interpret mode on
    the virtual mesh): multi-chip deployments dispatch THIS engine per
    device (parallel/batch.py:_run_sharded_kernel), so its sharded
    results must match goldens in score, CIGAR and low-mem modes just
    like the lax sharded path does."""
    from miniwfa_tpu import Options
    from miniwfa_tpu.parallel.batch import align_batch_sharded
    from miniwfa_tpu.parallel.mesh import make_mesh

    monkeypatch.setenv("MWF_ENGINE", "kernel-interpret")
    names = ["t3", "ins4", "mixed", "homopoly", "small7", "unrel5",
             "identity4", "del4"]
    cases = [(i, c) for i, c in enumerate(goldens["cases"])
             if c["name"] in names]
    pairs = [(c["t"], c["q"]) for _, c in cases]
    mesh = make_mesh()

    res = align_batch_sharded(pairs, Options(cigar=True), mesh, w0=1024)
    exp = goldens["runs"]["cigar"]
    for (i, c), r in zip(cases, res):
        assert r.s == exp[i]["s"], c["name"]
        assert r.cigar_str == exp[i]["cigar"], c["name"]

    sub = [(i, c) for i, c in cases if c["name"] in ("t3", "small7")]
    res = align_batch_sharded([(c["t"], c["q"]) for _, c in sub],
                              Options(cigar=True, step=16), mesh, w0=1024)
    exp = goldens["runs"]["lowmem_p16"]
    for (i, c), r in zip(sub, res):
        assert r.s == exp[i]["s"], c["name"]
        assert r.cigar_str == exp[i]["cigar"], c["name"]


def test_sharded_wide_fallback_matches_goldens(goldens, monkeypatch):
    """Wide-engine territory in the sharded path (VERDICT r3 weak #3):
    forcing MWF_ENGINE=wide-interpret routes the batch through the
    per-local-device fallback (_local_driver_fallback: one thread per
    mesh device, full local driver incl. the wide HBM-ring engine), so
    sharded low-mem/score results must still match goldens exactly."""
    from miniwfa_tpu import Options
    from miniwfa_tpu.parallel.batch import align_batch_sharded
    from miniwfa_tpu.parallel.mesh import make_mesh

    monkeypatch.setenv("MWF_ENGINE", "wide-interpret")
    names = ["t3", "small7", "ins4", "identity4"]
    cases = [(i, c) for i, c in enumerate(goldens["cases"])
             if c["name"] in names]
    pairs = [(c["t"], c["q"]) for _, c in cases]
    mesh = make_mesh()

    res = align_batch_sharded(pairs, Options(), mesh, w0=1024)
    exp = goldens["runs"]["score"]
    for (i, c), r in zip(cases, res):
        assert r.s == exp[i]["s"], c["name"]

    res = align_batch_sharded(pairs, Options(cigar=True, step=16), mesh,
                              w0=1024)
    exp = goldens["runs"]["lowmem_p16"]
    for (i, c), r in zip(cases, res):
        assert r.s == exp[i]["s"], c["name"]
        assert r.cigar_str == exp[i]["cigar"], c["name"]
