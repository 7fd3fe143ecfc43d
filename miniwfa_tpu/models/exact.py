"""Exact WFA alignment driver (host orchestration around the device loop).

Implements the reference's ``mwf_wfa_exact`` behavior (miniwfa.c:603-615):
score-only, high-memory CIGAR traceback, and the two-pass low-memory stripe
mode, with identical scores, CIGARs and cell counts.

Host responsibilities (cheap, O(n+s)): sequence encoding, capacity-bucket
selection with escalate-and-retry on overflow, traceback walking, checkpoint
decoding.  Device responsibilities (the O(n·s) work): the whole wavefront
loop, compiled once per capacity bucket.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax

from ..options import Options
from ..ops.wavefront import (
    MODE_PASS1,
    MODE_SCORE,
    MODE_TB,
    WfSpec,
    get_aligner,
)
from . import traceback as tbk


@dataclass
class Result:
    """Alignment result (reference mwf_rst_t, miniwfa.h:46-51)."""

    s: int                       # score; -1 when stopped by max_s/max_iter
    cigar: Optional[List[int]]   # packed len<<4|op, or None in score mode
    n_iter: int = 0              # total wavefront cells (Σ band widths)

    @property
    def cigar_str(self) -> Optional[str]:
        from .. import cigar as C
        return None if self.cigar is None else C.to_string(self.cigar)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def as_bytes(s) -> bytes:
    if isinstance(s, bytes):
        return s
    if isinstance(s, str):
        return s.encode("latin1")
    return bytes(s)


def _encode(seqs: Sequence[bytes], cap: int, sentinel: int) -> np.ndarray:
    out = np.full((len(seqs), cap + 8), sentinel, dtype=np.int32)
    for i, s in enumerate(seqs):
        if len(s):
            out[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
    return out


def _score_upper_bound(opt: Options, tl: int, ql: int) -> int:
    """A cheap worst-case score: mismatch everything + one gap for the
    length difference."""
    b = opt.x * min(tl, ql) + opt.gap_cost(abs(tl - ql)) + 2
    if opt.max_s > 0:
        b = min(b, opt.max_s + 2)
    return max(b, 4)


@dataclass
class _Buckets:
    LT: int
    LQ: int
    W: int
    S_CAP: int
    W_full: int   # band can never exceed this
    S_full: int   # score can never exceed this


def _initial_buckets(opt: Options, tl: int, ql: int,
                     w0: int = 512, s0: int = 512) -> _Buckets:
    ns = opt.max_pen + 1
    w_full = _next_pow2(tl + ql + 1 + 2 * ns + 18)
    s_full = _next_pow2(_score_upper_bound(opt, tl, ql) + 2)
    return _Buckets(
        LT=_next_pow2(max(tl, 16)),
        LQ=_next_pow2(max(ql, 16)),
        W=min(_next_pow2(max(w0, 2 * ns + 20)), w_full),
        S_CAP=min(_next_pow2(s0), s_full),
        W_full=w_full,
        S_full=s_full,
    )


def _run_device(opt: Options, mode: int, bk: _Buckets, ts: bytes, qs: bytes,
                seg: Optional[List[Tuple[int, int]]] = None):
    seg_cap = max(1, len(seg) if seg else 0)
    spec = WfSpec(
        B=1, W=bk.W, S_CAP=bk.S_CAP, LT=bk.LT, LQ=bk.LQ,
        x=opt.x, o1=opt.o1, e1=opt.e1, o2=opt.o2, e2=opt.e2,
        mode=mode,
        step=opt.step if mode == MODE_PASS1 else 0,
        n_snap=(bk.S_CAP // opt.step + 2) if mode == MODE_PASS1 else 0,
        seg_cap=seg_cap, use_seg=bool(seg),
        max_s=opt.max_s if mode != MODE_PASS1 else 0,
        max_iter=opt.max_iter if mode != MODE_PASS1 else 0,
    )
    fn = get_aligner(spec)
    from ..ops.wavefront import Q_SENT, T_SENT
    t_pad = _encode([ts], bk.LT, T_SENT)
    q_pad = _encode([qs], bk.LQ, Q_SENT)
    tl = np.array([len(ts)], np.int32)
    ql = np.array([len(qs)], np.int32)
    if seg:
        seg_s = np.full((1, seg_cap), -9, np.int32)
        seg_d = np.zeros((1, seg_cap), np.int32)
        seg_s[0, : len(seg)] = [s for s, _ in seg]
        seg_d[0, : len(seg)] = [d for _, d in seg]
        n_seg = np.array([len(seg)], np.int32)
    else:
        seg_s = np.full((1, seg_cap), -9, np.int32)
        seg_d = np.zeros((1, seg_cap), np.int32)
        n_seg = np.zeros((1,), np.int32)
    out = fn(t_pad, q_pad, tl, ql, seg_s, seg_d, n_seg)
    return out, spec


def _escalate(bk: _Buckets, ovf_band: bool, ovf_scap: bool) -> _Buckets:
    W, S = bk.W, bk.S_CAP
    if ovf_band:
        W = min(W * 4, bk.W_full)
    if ovf_scap:
        S = min(S * 4, bk.S_full)
    if (W, S) == (bk.W, bk.S_CAP):
        raise RuntimeError("bucket escalation stuck — engine bug")
    return _Buckets(bk.LT, bk.LQ, W, S, bk.W_full, bk.S_full)


def _n_iter_of(out) -> int:
    return (int(out["n_iter_hi"][0]) << 30) | int(out["n_iter_lo"][0])


def align_exact(ts, qs, opt: Options, *, w0: int = 512, s0: int = 512) -> Result:
    """Exact alignment of one pair; mirrors mwf_wfa_exact (miniwfa.c:603)."""
    ts, qs = as_bytes(ts), as_bytes(qs)
    bk = _initial_buckets(opt, len(ts), len(qs), w0, s0)
    ns = opt.max_pen + 1

    seg: Optional[List[Tuple[int, int]]] = None
    if opt.step > 0 and opt.cigar:
        # PASS 1: snapshot stripes + pointer jumping (miniwfa.c:551-601)
        while True:
            out, spec = _run_device(opt, MODE_PASS1, bk, ts, qs)
            if not bool(out["overflow"][0]):
                break
            bk = _escalate(bk, bool(out["ovf_band"][0]), bool(out["ovf_scap"][0]))
        s1 = int(out["final_s"][0])
        seg = tbk.decode_checkpoints(
            np.asarray(out["snap_x"][0]), np.asarray(out["snap_lo"][0]),
            int(out["snap_cnt"][0]), int(out["last_ptr"][0]),
            ns, spec.W, opt.step)
        # pass 2 runs with a collapsed band ≤ 2·step+1 wide and the score
        # known exactly from pass 1
        bk = _Buckets(
            bk.LT, bk.LQ,
            W=min(_next_pow2(2 * opt.step + 2 * ns + 20), bk.W_full),
            S_CAP=min(_next_pow2(s1 + 2), bk.S_full),
            W_full=bk.W_full, S_full=bk.S_full)

    mode = MODE_TB if opt.cigar else MODE_SCORE
    while True:
        out, spec = _run_device(opt, mode, bk, ts, qs, seg)
        if not bool(out["overflow"][0]):
            break
        bk = _escalate(bk, bool(out["ovf_band"][0]), bool(out["ovf_scap"][0]))

    n_iter = _n_iter_of(out)
    if bool(out["stopped"][0]):
        return Result(s=-1, cigar=None, n_iter=n_iter)
    s = int(out["final_s"][0])
    cig = None
    if opt.cigar:
        n_rows = max(s, 0)
        tb_bits = np.asarray(jax.device_get(out["tb_bits"][0, :n_rows]))
        tb_lo = np.asarray(jax.device_get(out["tb_lo"][0, :n_rows]))
        cig = tbk.traceback_walk(opt, tb_bits, tb_lo, ns, ts, qs, s,
                                 int(out["last_state"][0]))
    return Result(s=s, cigar=cig, n_iter=n_iter)
