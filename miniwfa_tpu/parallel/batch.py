"""Sharded batch alignment: the pair stream split across a device mesh.

Each device gets B/n lanes of the batch and runs the full wavefront
while-loop on them independently (SPMD data parallelism over ICI; across
hosts the same code runs under jax.distributed with a global mesh).
Results are per-lane, so the host-side traceback/decoding pipeline in
models/exact.py is unchanged — only the device dispatch differs.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..options import Options
from ..ops import pack
from ..ops.wavefront import MODE_SCORE, MODE_TB, WfSpec, get_sharded_aligner
from ..models.exact import Result, _Buckets, _buckets_for, _cpw_for, as_bytes
from ..models import traceback as tbk


def _next_mult(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def align_batch_sharded(pairs: Sequence[Tuple[object, object]], opt: Options,
                        mesh: Mesh, *, w0: int = 512, s0: int = 512,
                        axis: str = "data") -> List[Result]:
    """Batch alignment sharded over a mesh (score or CIGAR mode).

    Lanes shard across the mesh axis; every device runs its own wavefront
    while-loop; per-lane outputs (scores, counters, traceback buffers)
    come back sharded and the host walks CIGARs per pair — the same
    decode pipeline as the single-device path."""
    ts_list = [as_bytes(t) for t, _ in pairs]
    qs_list = [as_bytes(q) for _, q in pairs]
    n = len(pairs)
    if n == 0:
        return []
    ndev = mesh.shape[axis]
    bk = _buckets_for(opt, ts_list, qs_list, w0, s0)
    B = _next_mult(max(bk.B, ndev), ndev)
    results: List[Optional[Result]] = [None] * n
    idx = list(range(n))
    W, S_CAP = bk.W, bk.S_CAP
    while idx:
        spec = WfSpec(
            B=B, W=W, S_CAP=S_CAP, LT=bk.LT, LQ=bk.LQ,
            x=opt.x, o1=opt.o1, e1=opt.e1, o2=opt.o2, e2=opt.e2,
            mode=MODE_TB if opt.cigar else MODE_SCORE,
            cpw=_cpw_for(ts_list, qs_list),
            max_s=opt.max_s, max_iter=opt.max_iter)
        fn = get_sharded_aligner(spec, mesh, axis)
        pad_t = [ts_list[i] for i in idx] + [b""] * (B - len(idx))
        pad_q = [qs_list[i] for i in idx] + [b""] * (B - len(idx))
        shard = NamedSharding(mesh, P(axis))
        args = (
            pack.pack_ways(pad_t, bk.LT, spec.cpw),
            pack.pack_ways(pad_q, bk.LQ, spec.cpw),
            np.array([len(t) for t in pad_t], np.int32),
            np.array([len(q) for q in pad_q], np.int32),
            np.full((B, 1), -9, np.int32), np.zeros((B, 1), np.int32),
            np.zeros((B,), np.int32),
        )
        args = tuple(jax.device_put(a, shard) for a in args)
        out = fn(*args)
        ovf_band = np.asarray(out["ovf_band"])[: len(idx)]
        ovf_scap = np.asarray(out["ovf_scap"])[: len(idx)]
        stopped = np.asarray(out["stopped"])[: len(idx)]
        final_s = np.asarray(out["final_s"])[: len(idx)]
        ni_lo = np.asarray(out["n_iter_lo"])[: len(idx)]
        ni_hi = np.asarray(out["n_iter_hi"])[: len(idx)]
        tb_bits = tb_anc = None
        retry = []
        for j, i in enumerate(idx):
            if ovf_band[j] or ovf_scap[j]:
                retry.append(i)
                continue
            n_iter = (int(ni_hi[j]) << 30) | int(ni_lo[j])
            if stopped[j]:
                results[i] = Result(s=-1, cigar=None, n_iter=n_iter)
                continue
            s_fin = int(final_s[j])
            cig = None
            if opt.cigar:
                if tb_bits is None:
                    smax = max(int(final_s.max()), 0)
                    tb_bits = np.asarray(jax.device_get(out["tb_bits"][:, :smax]))
                    tb_anc = np.asarray(jax.device_get(out["tb_anc"][:, :smax]))
                cig = tbk.traceback_walk(opt, tb_bits[j], tb_anc[j], 0,
                                         ts_list[i], qs_list[i], s_fin,
                                         int(out["last_state"][j]))
            results[i] = Result(s=s_fin, cigar=cig, n_iter=n_iter)
        if retry:
            if ovf_band.any():
                W = min(W * 4, bk.W_full)
            if ovf_scap.any():
                S_CAP = min(S_CAP * 4, bk.S_full)
            B = _next_mult(max(1, len(retry)), ndev)
        idx = retry
    return results  # type: ignore[return-value]
