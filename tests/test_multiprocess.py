"""Real 2-process jax.distributed test on the CPU backend.

Round 1 never ran a multi-*process* job (VERDICT item 5c); this spawns two
coordinated processes (2 virtual CPU devices each, 4 global), runs
align_batch_sharded in score/cigar/low-mem modes over the global mesh, and
checks both workers validate their results (tools/mp_worker.py)."""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "..", "tools",
                      "mp_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed():
    # (no pytest-timeout plugin in this image; communicate(timeout=540)
    # below is the effective guard)
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, coord, "2", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"MP_OK pid={pid}" in out, f"worker {pid}:\n{out[-3000:]}"
