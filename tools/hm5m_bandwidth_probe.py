#!/usr/bin/env python3
"""Measure device->host fetch bandwidth on the tunnelled TPU and decide
the 5 Mb high-mem CIGAR question with arithmetic (VERDICT r4 ask #8).

The reference runs `-c` on its 5 Mb MHC pair in 50.6 GB of HOST RAM
(reference README.md:98): the tb table is 1 B/cell and total cells
= n_iter ~ 8e10 at div5m scale.  A TPU high-mem path at that scale must
stream band-compacted tb rows to host RAM through the resumable wide
protocol; whether that beats the low-mem mode (judge-measured 200.9 s
at 5 Mb) is a pure bandwidth question:

    t_stream ~ tb_bytes / BW   (overlappable with the ~118 s compute)
    feasible iff max(t_compute, t_stream) + t_walk  <  t_lowmem

This probe measures BW on 256 MiB / 1 GiB device_get fetches (plus the
~25 ms/RPC small-fetch floor for calibration) and prints the resulting
arithmetic.  Run on the real chip: `python tools/hm5m_bandwidth_probe.py`.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    print(f"backend: {jax.default_backend()}", flush=True)

    out = {}

    # small-fetch RPC floor
    x = jax.jit(lambda: jnp.int32(7))()
    x.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        jax.device_get(x)
    out["small_fetch_ms"] = (time.perf_counter() - t0) / 10 * 1e3

    # bulk fetch bandwidth
    for mib in (256, 1024):
        n = mib * (1 << 20) // 4
        fill = jax.jit(lambda: jnp.arange(n, dtype=jnp.int32))
        a = fill()
        a.block_until_ready()
        t0 = time.perf_counter()
        h = jax.device_get(a)
        dt = time.perf_counter() - t0
        assert h[-1] == n - 1
        out[f"fetch_{mib}mib_s"] = dt
        out[f"bw_{mib}mib_gbps"] = mib / 1024 / dt
        del a, h

    bw = out["bw_1024mib_gbps"]
    # div5m high-mem arithmetic (band-compacted tb = n_iter bytes)
    tb_gb = 81.0          # ~8.1e10 cells at div5m scale (s=287,898)
    t_compute = 118.0     # wide-engine div5m score wall (PERF_NOTES r3)
    t_lowmem = 201.0      # judge-measured div5m low-mem CIGAR wall (r4)
    t_stream = tb_gb / bw
    out["div5m_tb_gb"] = tb_gb
    out["div5m_stream_s"] = t_stream
    out["div5m_highmem_best_case_s"] = max(t_compute, t_stream)
    out["beats_lowmem"] = out["div5m_highmem_best_case_s"] < t_lowmem
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
