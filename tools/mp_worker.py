#!/usr/bin/env python3
"""Worker for the 2-process jax.distributed CPU test.

Usage: mp_worker.py <coordinator addr:port> <num_processes> <process_id>

Each process owns 2 virtual CPU devices (4 global); the worker builds the
global mesh, runs align_batch_sharded in score, cigar and low-mem modes on
a golden subset, and validates: scores/n_iter for EVERY pair on every
process, CIGARs for the pairs whose shard is locally addressable.
Prints MP_OK on success.
"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 2 * nproc, len(jax.devices())

    from jax.sharding import Mesh
    import numpy as np
    from miniwfa_tpu import Options
    from miniwfa_tpu.parallel.batch import align_batch_sharded

    mesh = Mesh(np.array(jax.devices()), ("data",))

    g = json.load(open(os.path.join(os.path.dirname(__file__), "..",
                                    "tests", "data", "goldens.json")))
    pen = g["penalties"]
    cases = [(i, c) for i, c in enumerate(g["cases"])
             if max(len(c["t"]), len(c["q"])) <= 256][:12]
    pairs = [(c["t"], c["q"]) for _, c in cases]

    # score mode: every process must see every score
    res = align_batch_sharded(pairs, Options(**pen), mesh)
    exp = g["runs"]["score"]
    for (i, c), r in zip(cases, res):
        assert r.s == exp[i]["s"], (pid, c["name"], r.s, exp[i]["s"])

    # cigar mode: local lanes carry CIGARs, remote lanes None
    res = align_batch_sharded(pairs, Options(**pen, cigar=True), mesh)
    exp = g["runs"]["cigar"]
    n_local = 0
    for (i, c), r in zip(cases, res):
        assert r.s == exp[i]["s"], (pid, c["name"])
        if r.cigar is not None:
            n_local += 1
            assert r.cigar_str == exp[i]["cigar"], (pid, c["name"])
    assert n_local > 0, "no locally-addressable lanes?"

    # low-mem two-pass: sharded pass1 + seg sync + sharded pass2
    res = align_batch_sharded(pairs, Options(**pen, cigar=True, step=16),
                              mesh)
    exp = g["runs"]["lowmem_p16"]
    for (i, c), r in zip(cases, res):
        assert r.s == exp[i]["s"], (pid, c["name"])
        if r.cigar is not None:
            assert r.cigar_str == exp[i]["cigar"], (pid, c["name"])

    print(f"MP_OK pid={pid} local_cigars={n_local}", flush=True)


if __name__ == "__main__":
    main()
