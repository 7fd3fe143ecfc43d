"""Batch driver for the gaps-in-sublanes engine (ops/wavefront_gaps.py).

Serves the chain mode's exact gap fills (reference mwf_wfa_chain closes
each inter-anchor gap with mwf_wfa_exact, miniwfa.c:877): tens of
thousands of <=127 bp alignments per call, packed one-per-sublane-row so
a whole batch is a handful of Pallas grid steps instead of 40k
sequential kernel lanes or ms-per-cycle lax dispatches.

Same Result contract as models.exact.align_batch (score, canonical
CIGAR, n_iter with the reference's band accounting); pairs the engine
cannot serve (oversize, overflow) fall back to align_batch.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax

from ..options import Options
from ..ops import pack
from ..ops.wavefront import MODE_SCORE, MODE_TB
from ..ops import wavefront_gaps as wg
from .exact import Result, as_bytes

# gap rows per grid step: VMEM holds ~43 [R,128] int32 planes (rings,
# tops, bookkeeping, staging) = ~5.5 MB at R=256 — comfortably inside
# the ~16 MB budget while maximizing per-cycle VPU occupancy
ROWS = int(os.environ.get("MWF_GAPS_R", "256"))
# gaps per device dispatch (bounds the tb buffer + walker fetch)
GMAX = int(os.environ.get("MWF_GAPS_GMAX", "16384"))


def tiny_eligible(opt: Options, pairs_tot_max: int) -> bool:
    """Engine gate: TPU backend (or forced interpret mode), window-sized
    pairs, penalties within the bit-packed viability plane."""
    eng = os.environ.get("MWF_ENGINE", "auto")
    if eng == "gaps-interpret":
        pass                      # interpreter runs on any backend
    elif eng not in ("auto", "gaps", "kernel") \
            or jax.default_backend() != "tpu":
        return False
    if pairs_tot_max > wg.MAX_TOT:
        return False
    return opt.max_pen + 1 <= 31


def _s_bound(opt: Options, tl: int, ql: int) -> int:
    """Upper bound on the optimal score: the trivial alignment costs
    x*min(tl,ql) mismatches plus one |tl-ql| gap."""
    d = abs(tl - ql)
    return opt.x * min(tl, ql) + (opt.gap_cost(d) if d else 0) + 4


def _scap_bucket(s: int) -> int:
    for cap in (32, 64, 128, 256, 512, 1024):
        if s <= cap - 2:          # termination needs S_CAP >= s + 2
            return cap
    raise ValueError(f"score bound {s} exceeds the tiny-gap engine range")


def ladder_specs(opt: Options) -> List["wg.GSpec"]:
    """The gaps-engine specs a chain-mode run over a large pair is
    likely to compile (utils/prewarm.py speculative warm set): the
    full-dispatch NSTEP with the common S_CAP buckets, plus the small
    remainder dispatches at the dominant bucket.  Mirrors
    align_tiny_batch's spec construction."""
    mode = MODE_TB if opt.cigar else MODE_SCORE
    pen = dict(x=opt.x, o1=opt.o1, e1=opt.e1, o2=opt.o2, e2=opt.e2,
               mode=mode, cpw=16, max_s=opt.max_s, max_iter=opt.max_iter)
    full_nstep = 1
    while full_nstep * ROWS < GMAX:
        full_nstep *= 2
    specs = [wg.GSpec(R=ROWS, NSTEP=full_nstep, S_CAP=c, **pen)
             for c in (32, 64, 128)]
    specs += [wg.GSpec(R=ROWS, NSTEP=n, S_CAP=c, **pen)
              for n in (1, 4, 16) for c in (64, 128)]
    return specs


def align_tiny_batch(pairs: Sequence[Tuple[object, object]],
                     opt: Options) -> List[Result]:
    """Exact alignment of a batch of tiny pairs (tl+ql <= 127 each) on
    the gaps-in-sublanes engine.  Bit-identical to align_batch.

    Low-mem note: opt.step is ignored here — a tiny pair's score is far
    below any realistic snapshot period (the auto driver's step=5000,
    miniwfa.c:905), and the stripe mode is defined to produce the same
    score AND CIGAR as high-mem, so the high-mem path is the same
    answer.  (n_iter counts one pass, matching high-mem accounting.)"""
    from . import exact as ex

    ts_list = [as_bytes(t) for t, _ in pairs]
    qs_list = [as_bytes(q) for _, q in pairs]
    n = len(pairs)
    if n == 0:
        return []
    results: List[Optional[Result]] = [None] * n
    cpw = 16 if pack.can_pack2(ts_list) and pack.can_pack2(qs_list) else 4
    interp = os.environ.get("MWF_ENGINE") == "gaps-interpret"
    mode = MODE_TB if opt.cigar else MODE_SCORE
    pens = (opt.x, opt.o1, opt.e1, opt.o2, opt.e2)

    # order by score bound so each dispatch's S_CAP bucket (and its tb
    # buffer) is sized to its own gaps, not the batch's worst case
    sb = [_s_bound(opt, len(t), len(q)) for t, q in zip(ts_list, qs_list)]
    order = sorted(range(n), key=lambda g: sb[g])
    fallback: List[int] = []

    c0 = 0
    while c0 < len(order):
        sel = order[c0:c0 + GMAX]
        c0 += GMAX
        scap = _scap_bucket(max(sb[g] for g in sel))
        g = len(sel)
        nstep = 1
        while nstep * ROWS < g:
            nstep *= 2
        gp = nstep * ROWS
        spec = wg.GSpec(
            R=ROWS, NSTEP=nstep, S_CAP=scap,
            x=opt.x, o1=opt.o1, e1=opt.e1, o2=opt.o2, e2=opt.e2,
            mode=mode, cpw=cpw,
            max_s=opt.max_s, max_iter=opt.max_iter)
        tl = np.zeros(gp, np.int32)
        ql = np.zeros(gp, np.int32)
        for j, gi in enumerate(sel):
            tl[j] = len(ts_list[gi])
            ql[j] = len(qs_list[gi])
        meta = np.broadcast_to(
            (tl | (ql.astype(np.int64) << 16)).astype(np.int32)[:, None],
            (gp, 128)).copy()
        seqt = wg.pack_rows(
            [ts_list[gi] for gi in sel] + [b""] * (gp - g), cpw)
        seqq = wg.pack_rows(
            [qs_list[gi] for gi in sel] + [b""] * (gp - g), cpw)
        fn = wg.get_gaps_kernel(spec, interpret=interp)
        out, tb = fn(meta, seqt, seqq)
        from ..utils import hbm
        hbm.note_arrays(f"gaps mode={mode} G={gp} S_CAP={scap}", out, tb)
        out = np.asarray(out)

        walk_cigs = None
        if mode == MODE_TB:
            from ..ops import traceback_device as tbd
            skip = np.zeros(gp, bool)
            skip[g:] = True
            skip[:g] |= (out[:g, wg.GO_OVF] != 0) \
                | (out[:g, wg.GO_STOP] != 0)
            walk_cigs = tbd.walk_gaps_on_device(
                tb, np.where(skip, 0, tl), np.where(skip, 0, ql),
                seqt, seqq,
                np.where(skip, 0, out[:, wg.GO_S]),
                out[:, wg.GO_LS], cpw, pens)

        for j, gi in enumerate(sel):
            if out[j, wg.GO_OVF]:
                fallback.append(gi)
                continue
            n_iter = int(out[j, wg.GO_NI])
            if out[j, wg.GO_STOP]:
                results[gi] = Result(s=-1, cigar=None, n_iter=n_iter)
                continue
            s = int(out[j, wg.GO_S])
            cig = walk_cigs[j] if walk_cigs is not None else None
            if cig is not None and os.environ.get("MWF_VALIDATE"):
                from .. import cigar as _C
                _C.assert_cigar(opt, cig, int(tl[j]), int(ql[j]), s,
                                ts_list[gi], qs_list[gi])
            results[gi] = Result(s=s, cigar=cig, n_iter=n_iter)

    if fallback:
        sub = ex.align_batch([(ts_list[i], qs_list[i]) for i in fallback],
                             opt)
        for i, r in zip(fallback, sub):
            results[i] = r
    return results  # type: ignore[return-value]
