"""Exact WFA alignment driver (host orchestration around the device loop).

Implements the reference's ``mwf_wfa_exact`` behavior (miniwfa.c:603-615):
score-only, high-memory CIGAR traceback, and the two-pass low-memory stripe
mode, with identical scores, CIGARs and cell counts — batched.

Host responsibilities (cheap, O(n+s) per pair): sequence encoding, capacity
bucket selection with escalate-and-retry on overflow, traceback walking,
checkpoint decoding.  Device responsibilities (the O(n·s) work): the whole
wavefront loop over a batch of pairs, compiled once per capacity bucket.

Batching model: pairs are padded into a lane bucket and advance in lockstep
(one while-loop iteration = one wavefront cycle for every still-running
lane).  Lanes that outgrow the band window (W), score budget (S_CAP) or
snapshot capacity re-run in an escalated bucket; completed lanes' results
are bit-identical to a solo run because every per-lane update is masked.
"""

from __future__ import annotations

import os

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax

from ..options import Options
from ..ops import pack
from ..ops.wavefront import (
    MODE_PASS1,
    MODE_SCORE,
    MODE_TB,
    WfSpec,
    get_aligner,
)
from . import traceback as tbk

Seg = List[Tuple[int, int]]


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


def _prev_pow2(n: int) -> int:
    """Largest power of two <= n (n >= 1).  Lane-budget caps must be
    pow2-floored: dispatch batches are pow2-rounded up (_next_pow2), so a
    non-pow2 cap would let the rounded batch outgrow the HBM budget the
    cap was computed against (e.g. cap=5 -> B=8 -> 1.6x the budget)."""
    p = 1
    while p * 2 <= n:
        p <<= 1
    return p


def as_bytes(s) -> bytes:
    if isinstance(s, bytes):
        return s
    if isinstance(s, str):
        return s.encode("latin1")
    return bytes(s)


def _cpw_for(ts_list: Sequence[bytes], qs_list: Sequence[bytes]) -> int:
    """Packing mode for a batch: 16 chars/word (2-bit) when every byte is
    uppercase ACGT, else 4 chars/word (raw bytes)."""
    return 16 if pack.can_pack2(ts_list) and pack.can_pack2(qs_list) else 4


@dataclass(frozen=True)
class _Buckets:
    B: int
    LT: int
    LQ: int
    W: int
    S_CAP: int
    W_full: int   # band can never exceed this
    S_full: int   # score can never exceed this


def _buckets_for(opt: Options, ts_list, qs_list, w0: int, s0: int) -> _Buckets:
    ns = opt.max_pen + 1
    LT = _next_pow2(max(128, max((len(t) for t in ts_list), default=1)))
    LQ = _next_pow2(max(128, max((len(q) for q in qs_list), default=1)))
    # caps derived from the *buckets* so equal-bucket batches share one jit
    w_full = _next_pow2(LT + LQ + 1 + 2 * ns + 18)
    s_bound = opt.x * min(LT, LQ) + opt.gap_cost(LT + LQ) + 4
    if opt.max_s > 0:
        s_bound = min(s_bound, opt.max_s + 2)
    s_full = _next_pow2(s_bound)
    return _Buckets(
        B=_next_pow2(max(1, len(ts_list))),
        LT=LT, LQ=LQ,
        W=min(_next_pow2(max(w0, 2 * ns + 24)), w_full),
        S_CAP=min(_next_pow2(s0), s_full),
        W_full=w_full, S_full=s_full,
    )


def _escalate(bk: _Buckets, ovf_band: bool, ovf_scap: bool) -> _Buckets:
    W, S = bk.W, bk.S_CAP
    if ovf_band:
        W = min(W * 4, bk.W_full)
    if ovf_scap:
        S = min(S * 4, bk.S_full)
    if (W, S) == (bk.W, bk.S_CAP):
        raise RuntimeError("bucket escalation stuck — engine bug")
    return _Buckets(bk.B, bk.LT, bk.LQ, W, S, bk.W_full, bk.S_full)


def _kernel_eligible(opt: Options, mode: int, bk: _Buckets,
                     ts_list, qs_list, cpw: int) -> bool:
    """The fused-cycle Pallas kernel (ops/wavefront_kernel.py) serves
    SCORE/TB modes on the TPU backend for windows up to W=32768 and
    sequences within its word-table capacity; everything else uses the
    lax-level engine."""
    eng = os.environ.get("MWF_ENGINE", "auto")
    if eng in ("lax", "wide", "wide-interpret"):
        return False
    if eng not in ("kernel", "kernel-interpret", "multi-interpret") and \
            jax.default_backend() != "tpu":
        return False
    if mode not in (MODE_SCORE, MODE_TB, MODE_PASS1):
        return False
    # pass 1 carries shadow pointer rings (~2x ring VMEM): cap its window
    w_max = 32768 if mode == MODE_PASS1 else 65536
    if bk.W < 1024 or bk.W > w_max or bk.W % 1024:
        return False
    if opt.max_pen + 1 > 31:   # bit-packed viability plane holds NS bits
        return False
    # the kernel runs one lane per sequential grid step (~ms fixed cost per
    # lane); a big batch of small alignments (chain-mode gap fills) is
    # faster on the lockstep lax engine, which advances every lane per
    # vectorized cycle
    if eng != "kernel" and len(ts_list) > 64 and bk.W < 8192:
        return False
    from ..ops import wavefront_kernel as wk
    mx = max([len(s) for s in ts_list] + [len(s) for s in qs_list],
             default=0)
    return wk.nseg_for(mx, cpw) <= 64  # segmented HBM word tables


# wide-engine (HBM-ring) band cap: W is bounded by HBM, not VMEM; 2^20
# diagonals covers s ~ 500k (the reference's 5 Mb headline pairs sit at
# s ~ 230-290k, band ~ 2s).  WR must be a multiple of the staging chunk
# (CR=128 rows -> W multiple of 16384); the pow2 bucket ladder satisfies it.
WIDE_W_CAP = 1 << 20
# snapshot HBM budget per wide pass-1 lane ((n_snap+1) ring-layout rows)
# 8 GiB: leaves room for the ring/top/window planes and runtime
# reserves on a 16 GB chip (10 GiB measured RESOURCE_EXHAUSTED at
# W=2^20 with the rest of the working set)
WIDE_SNAP_BUDGET = int(os.environ.get("MWF_WIDE_SNAP_GB", "8")) << 30


def _wide_eligible(opt: Options, mode: int, bk: _Buckets,
                   ts_list, qs_list, cpw: int) -> bool:
    """The wide-band engine (ops/wavefront_wide.py) extends SCORE and
    low-mem PASS1 beyond the VMEM kernel's window caps by keeping the DP
    planes in HBM and streaming 128-row chunks through VMEM."""
    eng = os.environ.get("MWF_ENGINE", "auto")
    if eng == "lax":
        return False
    if eng not in ("kernel", "kernel-interpret", "wide", "wide-interpret") \
            and jax.default_backend() != "tpu":
        return False
    if mode not in (MODE_SCORE, MODE_PASS1):
        return False
    if bk.W % 16384 or bk.W > WIDE_W_CAP:
        return False
    if opt.max_pen + 1 > 31:
        return False
    from ..ops import wavefront_kernel as wk
    mx = max([len(s) for s in ts_list] + [len(s) for s in qs_list],
             default=0)
    return wk.nseg_for(mx, cpw) <= 64


def _run_device_wide(opt: Options, mode: int, bk: _Buckets,
                     ts_list: List[bytes], qs_list: List[bytes], cpw: int):
    """Dispatch a batch to the wide-band HBM-ring kernel; same output
    contract as _run_device_kernel (SCORE/PASS1 subsets)."""
    from ..ops import wavefront_kernel as wk
    from ..ops import wavefront_wide as ww
    n = len(ts_list)
    B = max(1, n)   # grid lanes are sequential; no pow2 padding needed
    is_p1 = mode == MODE_PASS1
    mx = max([len(s) for s in ts_list] + [len(s) for s in qs_list],
             default=0)
    wr = bk.W // 128
    # bigger staging chunks amortize the per-chunk DMA descriptor count
    # (the wide engine's dominant cost); pass 1 keeps 128 — its sf
    # shadow staging buffers would push VMEM near the cap at 256
    cr = int(os.environ.get("MWF_WIDE_CR", 0)) or \
        (256 if not is_p1 and wr % 256 == 0 else 128)
    n_snap_full = (bk.S_CAP // opt.step + 2) if is_p1 else 0
    n_snap0 = n_snap_full
    chunked = jax.default_backend() == "tpu" and os.environ.get(
        "MWF_ENGINE") not in ("kernel-interpret", "wide-interpret")
    if is_p1 and chunked:
        # the no-preflight sizing sets S_CAP from the window bound, not
        # the (unknown) score, so the full row count can exceed the HBM
        # budget: clip to it upfront — run_chunked's on-demand growth is
        # the backstop, and a genuinely over-budget score still raises
        # there with the same message
        from ..ops import wavefront_kernel as wk2
        nring = wk2.snapshot_layout(wk2.KSpec(
            B=1, WR=wr, S_CAP=bk.S_CAP, x=opt.x, o1=opt.o1, e1=opt.e1,
            o2=opt.o2, e2=opt.e2))[5]
        row_bytes = nring * (wr + 8) * 128 * 4
        budget_rows = max(8, WIDE_SNAP_BUDGET // row_bytes - 1)
        n_snap0 = min(n_snap_full, budget_rows)
    spec = ww.WSpec(
        B=B, WR=wr, S_CAP=bk.S_CAP,
        x=opt.x, o1=opt.o1, e1=opt.e1, o2=opt.o2, e2=opt.e2,
        mode=wk.MODE_PASS1 if is_p1 else wk.MODE_SCORE, cpw=cpw,
        step=opt.step if is_p1 else 0,
        n_snap=n_snap0,
        nseg=wk.nseg_for(mx, cpw), cr=cr if wr % cr == 0 else 128)
    if is_p1:
        nring = wk.snapshot_layout(spec.kspec())[5]
        per_lane = (spec.n_snap + 1) * nring * (spec.WR + 8) * 128 * 4
        if per_lane > WIDE_SNAP_BUDGET:
            raise RuntimeError(
                f"low-mem snapshot buffer {per_lane/2**30:.1f} GiB/lane at "
                f"step={opt.step}, W={bk.W}, S_CAP={bk.S_CAP} exceeds the "
                f"{WIDE_SNAP_BUDGET/2**30:.0f} GiB budget — use a larger "
                f"step (reference default 5000) or the chain mode")
    pad_t = ts_list + [b""] * (B - n)
    pad_q = qs_list + [b""] * (B - n)
    scal = np.zeros((B, wk.SC_ANC + 1), np.int32)
    for i, (t, q) in enumerate(zip(pad_t, pad_q)):
        scal[i, wk.SC_TL] = len(t)
        scal[i, wk.SC_QL] = len(q)
        scal[i, wk.SC_ANC] = (len(q) - len(t)) // 2 - spec.W // 2
    twt = wk.pack_table(pad_t, cpw, spec.nseg)
    twq = wk.pack_table(pad_q, cpw, spec.nseg)
    interp = os.environ.get("MWF_ENGINE") in ("kernel-interpret",
                                              "wide-interpret")
    # chunked resumable dispatch: no single device call may outlive the
    # TPU worker's ~1 min execution watchdog (ww.run_chunked notes)
    out = dict(ww.run_chunked(
        spec, scal, twt, twq, interpret=interp,
        max_s=0 if is_p1 else opt.max_s,
        max_iter=0 if is_p1 else opt.max_iter))
    out["kernel_cpw"] = cpw
    out["anc"] = scal[:, wk.SC_ANC]
    # the kspec twin carries every field the checkpoint decoder reads
    return out, spec.kspec()


def _run_device_kernel(opt: Options, mode: int, bk: _Buckets,
                       ts_list: List[bytes], qs_list: List[bytes],
                       segs, cpw: int):
    """Dispatch a batch to the fused-cycle kernel; same output contract
    as the lax engine (get_aligner)."""
    from ..ops import wavefront_kernel as wk
    n = len(ts_list)
    B = _next_pow2(max(1, n))
    use_seg = segs is not None and any(segs)
    seg_cap = max((len(s) for s in segs if s), default=0) + 1 if use_seg else 1
    kmode = {MODE_SCORE: wk.MODE_SCORE, MODE_TB: wk.MODE_TB,
             MODE_PASS1: wk.MODE_PASS1}[mode]
    is_p1 = mode == MODE_PASS1
    if is_p1:
        n_snap = bk.S_CAP // opt.step + 2
        np_planes = wk.snapshot_layout(
            wk.KSpec(B=1, WR=bk.W // 128, S_CAP=bk.S_CAP, x=opt.x,
                     o1=opt.o1, e1=opt.e1, o2=opt.o2, e2=opt.e2))[5]
        per_lane = n_snap * np_planes * (bk.W // 128 + 8) * 128 * 4
        if per_lane > PASS1_SNAP_BUDGET:
            raise RuntimeError(
                f"low-mem snapshot buffer {per_lane/2**30:.1f} GiB/lane at "
                f"step={opt.step}, W={bk.W}, S_CAP={bk.S_CAP} exceeds the "
                f"{PASS1_SNAP_BUDGET/2**30:.0f} GiB budget — use a larger "
                f"step (reference default 5000) or the chain mode")
    spec = wk.KSpec(
        B=B, WR=bk.W // 128, S_CAP=bk.S_CAP,
        x=opt.x, o1=opt.o1, e1=opt.e1, o2=opt.o2, e2=opt.e2,
        mode=kmode, cpw=cpw,
        seg_cap=seg_cap, use_seg=use_seg,
        step=opt.step if is_p1 else 0,
        n_snap=(bk.S_CAP // opt.step + 2) if is_p1 else 0,
        # nseg from the ACTUAL max length (the value _kernel_eligible
        # checked), not the pow2 bucket — segment granularity (~254 kb at
        # cpw=16) is coarse enough that jit sharing is unaffected
        nseg=wk.nseg_for(
            max([len(s) for s in ts_list] + [len(s) for s in qs_list],
                default=0), cpw),
        # sweep-chunk rows: bigger chunks amortize the per-chunk loop +
        # DMA fixed cost (measured +80% score cells/s at W=65536 and
        # +6-9% on tb/pass-1 modes going 8->64; 128 loses to rounding
        # waste).  KSpec.CR clamps to the window for small buckets.
        cr=int(os.environ.get("MWF_KERNEL_CR", "64")))
    pad_t = ts_list + [b""] * (B - n)
    pad_q = qs_list + [b""] * (B - n)
    nsc = wk.SC_SEG + 2 * seg_cap
    scal = np.zeros((B, nsc), np.int32)
    # runtime early-stop bounds (kept out of the compile cache key)
    ms = 0 if is_p1 else opt.max_s
    mi = 0 if is_p1 else opt.max_iter
    scal[:, wk.SC_MS] = ms
    scal[:, wk.SC_MILO] = mi & 0x3FFFFFFF
    scal[:, wk.SC_MIHI] = mi >> 30
    for i, (t, q) in enumerate(zip(pad_t, pad_q)):
        tl, ql = len(t), len(q)
        d_end = ql - tl
        scal[i, wk.SC_TL] = tl
        scal[i, wk.SC_QL] = ql
        # window anchored at the midpoint of start (d=0) and end diagonal
        scal[i, wk.SC_ANC] = d_end // 2 - spec.W // 2
        if use_seg and segs[i]:
            sg = segs[i]
            scal[i, wk.SC_NSEG] = len(sg)
            scal[i, wk.SC_SEG:wk.SC_SEG + len(sg)] = [s for s, _ in sg]
            scal[i, wk.SC_SEG + seg_cap:wk.SC_SEG + seg_cap + len(sg)] = \
                [d for _, d in sg]
    twt = wk.pack_table(pad_t, cpw, spec.nseg)
    twq = wk.pack_table(pad_q, cpw, spec.nseg)

    # --- multi-lane co-residency (VERDICT r4 ask #1): pack G lanes'
    # whole DP states into one grid step so a cycle's serial stage
    # latency advances G alignments at once.  Output contract matches
    # the single-lane kernel exactly (same scal layout, same packed tb
    # buffer), so everything downstream is unchanged.
    eng = os.environ.get("MWF_ENGINE", "auto")
    minterp = eng == "multi-interpret"
    if not is_p1 and n > 1 and \
            (minterp or (eng == "multi"
                         and jax.default_backend() == "tpu")):
        from ..ops import wavefront_multi as wm

        def mk(g):
            return wm.MSpec(
                B=B, G=g, WR=spec.WR, S_CAP=spec.S_CAP, x=opt.x,
                o1=opt.o1, e1=opt.e1, o2=opt.o2, e2=opt.e2, mode=kmode,
                cpw=cpw, seg_cap=seg_cap, use_seg=use_seg,
                nseg=spec.nseg, cr=spec.cr)

        G = min(wm.pick_g(kmode, spec.WR, B, mk), B)
        if G > 1 and B % G == 0:
            mspec = mk(G)
            fn = wm.get_multi_kernel(mspec, interpret=minterp)
            out = dict(fn(scal, twt, twq))
            out["kernel_cpw"] = cpw
            out["anc"] = scal[:, wk.SC_ANC]
            return out, spec

    interp = os.environ.get("MWF_ENGINE") in ("kernel-interpret",
                                              "multi-interpret")
    fn = wk.get_kernel(spec, interpret=interp)
    out = dict(fn(scal, twt, twq))
    out["kernel_cpw"] = cpw   # marker: kernel result (constant tb anchor)
    out["anc"] = scal[:, wk.SC_ANC]
    return out, spec


def _run_device(opt: Options, mode: int, bk: _Buckets,
                ts_list: List[bytes], qs_list: List[bytes],
                segs: Optional[List[Optional[Seg]]] = None):
    from ..utils import hbm
    cpw = _cpw_for(ts_list, qs_list)
    if _kernel_eligible(opt, mode, bk, ts_list, qs_list, cpw):
        out, spec = _run_device_kernel(opt, mode, bk, ts_list, qs_list,
                                       segs, cpw)
        hbm.note_arrays(f"kernel mode={mode} B={spec.B} W={spec.WR * 128} "
                        f"S_CAP={spec.S_CAP}", out)
        return out, spec
    if _wide_eligible(opt, mode, bk, ts_list, qs_list, cpw):
        # the wide engine also notes its resident DP planes internally
        # (run_chunked) — they are freed before this returns
        out, spec = _run_device_wide(opt, mode, bk, ts_list, qs_list, cpw)
        hbm.note_arrays(f"wide-out mode={mode} B={spec.B} "
                        f"W={spec.WR * 128} S_CAP={spec.S_CAP}", out)
        return out, spec
    n = len(ts_list)
    B = bk.B
    use_seg = segs is not None and any(segs)
    seg_cap = max((len(s) for s in segs if s), default=0) + 1 if use_seg else 1
    spec = WfSpec(
        B=B, W=bk.W, S_CAP=bk.S_CAP, LT=bk.LT, LQ=bk.LQ,
        x=opt.x, o1=opt.o1, e1=opt.e1, o2=opt.o2, e2=opt.e2,
        mode=mode, cpw=_cpw_for(ts_list, qs_list),
        step=opt.step if mode == MODE_PASS1 else 0,
        n_snap=(bk.S_CAP // opt.step + 2) if mode == MODE_PASS1 else 0,
        seg_cap=seg_cap, use_seg=use_seg,
        max_s=opt.max_s if mode != MODE_PASS1 else 0,
        max_iter=opt.max_iter if mode != MODE_PASS1 else 0,
    )
    fn = get_aligner(spec)
    pad_t = ts_list + [b""] * (B - n)
    pad_q = qs_list + [b""] * (B - n)
    t_pad = pack.pack_ways(pad_t, bk.LT, spec.cpw)
    q_pad = pack.pack_ways(pad_q, bk.LQ, spec.cpw)
    tl = np.array([len(t) for t in pad_t], np.int32)
    ql = np.array([len(q) for q in pad_q], np.int32)
    seg_s = np.full((B, seg_cap), -9, np.int32)
    seg_d = np.zeros((B, seg_cap), np.int32)
    n_seg = np.zeros((B,), np.int32)
    if use_seg:
        for i, sg in enumerate(segs):
            if sg:
                seg_s[i, : len(sg)] = [s for s, _ in sg]
                seg_d[i, : len(sg)] = [d for _, d in sg]
                n_seg[i] = len(sg)
    out = fn(t_pad, q_pad, tl, ql, seg_s, seg_d, n_seg)
    hbm.note_arrays(f"lax mode={mode} B={B} W={bk.W} S_CAP={bk.S_CAP}",
                    dict(out))
    return out, spec


def _n_iter_of(out, i: int) -> int:
    return (int(out["n_iter_hi"][i]) << 30) | int(out["n_iter_lo"][i])


# snapshot-buffer budget per pass-1 device call; lanes are chunked so that
# B * n_snap * NS*5*W * 4 bytes stays under this (the strided snapshot layout
# trades memory for static shapes — see ops/wavefront.py).  6 GiB default:
# tiny steps (reference -p1) legitimately need GiB-scale stripes — the
# reference simply uses host RAM for them (README.md:60-64) — and the
# VMEM kernel's other buffers are small, so most of HBM is available.
PASS1_SNAP_BUDGET = int(os.environ.get("MWF_SNAP_GB", "6")) << 30
# high-mem traceback buffer budget per device call (align_batch chunks
# the batch lanes so B * S_CAP * W bytes stays under this)
TB_LANE_BUDGET = int(os.environ.get("MWF_TB_GB", "4")) << 30


def _pass1_lane_cap(opt: Options, bk: _Buckets) -> int:
    ns = opt.max_pen + 1
    n_snap = bk.S_CAP // opt.step + 2
    per_lane = n_snap * ns * 5 * bk.W * 4
    return _prev_pow2(max(1, PASS1_SNAP_BUDGET // max(per_lane, 1)))


def _pass1_w_cap(opt: Options, ts_list, qs_list) -> int:
    """Largest pass-1 band window the backend can serve.  On TPU the
    fused VMEM kernel takes PASS1 up to W=32768 (its sf shadow rings
    double the ring VMEM) and the wide HBM-ring engine
    (ops/wavefront_wide.py) carries it to WIDE_W_CAP; sequences beyond
    the segmented word-table capacity (or penalty sets past the packed
    viability plane's 31 states) fall to the lax engine, capped at its
    structural TPU limit (ops.wavefront.LAX_TPU_W_CAP — the W=16384
    fault region is unreachable by construction)."""
    if jax.default_backend() != "tpu":
        return 1 << 30
    from ..ops import wavefront_kernel as wk
    from ..ops.wavefront import LAX_TPU_W_CAP
    if opt.max_pen + 1 > 31:
        return LAX_TPU_W_CAP
    cpw = _cpw_for(ts_list, qs_list)
    mx = max([len(s) for s in ts_list] + [len(s) for s in qs_list],
             default=0)
    return WIDE_W_CAP if wk.nseg_for(mx, cpw) <= 64 else LAX_TPU_W_CAP


def _estimate_s(opt: Options, ts_list, qs_list) -> Tuple[int, int]:
    """Host-side k-mer estimate of the batch's max optimal score, for
    sizing the FIRST device dispatch instead of climbing the 512→full
    escalation ladder (each abandoned rung costs a compile + a partial
    run — dominant in single-pair CLI latency, VERDICT r3 weak #6).

    Uses the chain mode's k-mer similarity (ops.kmer.ksim, the reference
    mwf_ksim, miniwfa.c:786-812): divergence ≈ 1 - sim^(1/k), each
    diverged base costs ≤ x, plus the length-difference gap cost.
    Clustered divergence makes this an underestimate — the escalation
    ladder stays as the backstop, one x4 rung away.

    Returns (s_for_scap, s_for_band): the S_CAP estimate carries a 1.5x
    margin (an undersized S_CAP only re-runs), the band estimate a 1.15x
    margin (an oversized band pushes small pairs past engine window caps
    and inflates tb buffers, which scale with W).  (0, 0) when the
    estimate is unusable (tiny pairs, non-ACGT content, no shared
    k-mers)."""
    from ..ops import kmer as km
    s_cap_e = s_band_e = 0
    for t, q in zip(ts_list, qs_list):
        tl, ql = len(t), len(q)
        if min(tl, ql) < 2048:
            return 0, 0          # ladder rungs are cheap at this size
        sim = km.ksim(t, q, 13)
        if sim <= 0.0:
            return 0, 0          # dissimilar or non-ACGT: keep the ladder
        div = 1.0 - sim ** (1.0 / 13.0)
        s_raw = opt.x * div * min(tl, ql) + \
            (opt.gap_cost(abs(ql - tl)) if tl != ql else 0)
        s_cap_e = max(s_cap_e, int(s_raw * 1.5) + 128)
        s_band_e = max(s_band_e, int(s_raw * 1.15) + 128)
    return s_cap_e, s_band_e


def _run_pass1(opt: Options, bk: _Buckets, ts_list, qs_list
               ) -> Tuple[List[Seg], List[int]]:
    """Low-mem pass 1 for a batch; returns per-pair checkpoint lists
    (reference mwf_wfa_seg, miniwfa.c:551-601) plus each pair's optimal
    score (pass 2 reaches exactly the same score, so its cycle budget
    can be sized precisely instead of laddered)."""
    ns = opt.max_pen + 1
    w_cap = _pass1_w_cap(opt, ts_list, qs_list)
    if bk.W > w_cap:
        bk = _Buckets(bk.B, bk.LT, bk.LQ, w_cap, bk.S_CAP,
                      bk.W_full, bk.S_full)
    if jax.default_backend() == "tpu" and len(ts_list) <= 64 \
            and bk.W_full > 8192:
        # (the w_est <= 32768 check below keeps this to VMEM-kernel
        # territory; wide-territory pairs size in the W > 32768 block)
        # VMEM-kernel pass-1 territory (the wide-territory block below
        # has its own upfront sizing): size the first dispatch from the
        # k-mer divergence estimate instead of laddering W and S_CAP —
        # each abandoned rung re-runs pass-1 cycles AND allocates a
        # fresh snapshot buffer (ladder stays as the backstop)
        s_cap_e, s_band_e = _estimate_s(opt, ts_list, qs_list)
        if s_cap_e:
            d_span = max((abs(len(q) - len(t))
                          for t, q in zip(ts_list, qs_list)), default=0)
            w_est = _next_pow2(2 * s_band_e + d_span + 4 * ns + 64)
            if w_est <= min(32768, w_cap):
                # REPLACE the caller's hints (cf. the TB-mode sizing):
                # an oversized S_CAP inflates the snapshot row count
                s_est = min(_next_pow2(s_cap_e), bk.S_full)
                bk = _Buckets(bk.B, bk.LT, bk.LQ, w_est, s_est,
                              bk.W_full, bk.S_full)
    idx = list(range(len(ts_list)))
    segs: List[Optional[Seg]] = [None] * len(ts_list)
    s_fin: List[int] = [0] * len(ts_list)
    preflighted = False   # guard flag: a preflight score exists to check
    sized = False         # wide-territory window sizing done
    while idx:
        if not sized and bk.W > 32768 and \
                jax.default_backend() == "tpu":
            # Wide-engine pass-1 territory: laddered attempts would drag
            # multi-GB snapshot buffers and re-run up to S_CAP cycles.
            sized = True
            if os.environ.get("MWF_LOWMEM_PREFLIGHT"):
                # optional score-only preflight: sizes the dispatch
                # exactly AND cross-checks pass 1's score against an
                # independent run (the overflow/mismatch guards below)
                preflighted = True
                sopt = opt.replace(cigar=False, step=0, max_s=0,
                                   max_iter=0)
                sres = align_batch(
                    [(ts_list[i], qs_list[i]) for i in idx],
                    sopt, w0=bk.W, s0=bk.S_CAP)
                smax = max(r.s for r in sres)
                for j, i in enumerate(idx):
                    s_fin[i] = sres[j].s
                d_span = max(abs(len(qs_list[i]) - len(ts_list[i]))
                             for i in idx)
                w_need = 2 * smax + d_span + 4 * ns + 64
                s_need = -(-(smax + 8) // 4096) * 4096
                if w_need > w_cap:
                    raise RuntimeError(
                        f"low-mem pass-1 band ({w_need}) exceeds the "
                        f"device limit (cap {w_cap}) — use the chain or "
                        f"auto mode for this pair, or the CPU backend")
                bk = _Buckets(bk.B, bk.LT, bk.LQ,
                              max(-(-w_need // 16384) * 16384, bk.W),
                              min(s_need, bk.S_full), bk.W_full,
                              bk.S_full)
            else:
                # default: size the window at the largest band the pair
                # can ever reach (clipped to [-tl,ql]) — wide-engine
                # cycles sweep only live-band chunks, so oversizing W
                # costs just HBM + one init sweep, and the snapshot
                # buffer starts small and grows on demand between
                # resumable calls (run_chunked).  This removes a whole
                # score-pass of preflight work per low-mem alignment.
                band_max = -(-(bk.LT + bk.LQ + 2 * ns + 64) // 16384) \
                    * 16384
                w_need = min(band_max, w_cap)
                # band overflow at ~W/2 bounds the reachable score
                s_need = -(-(w_need // 2 + 4 * ns + 64) // 4096) * 4096
                bk = _Buckets(bk.B, bk.LT, bk.LQ, max(w_need, bk.W),
                              min(s_need, bk.S_full), bk.W_full,
                              bk.S_full)
        cap = _pass1_lane_cap(opt, bk)
        chunk, idx_rest = idx[:cap], idx[cap:]
        bk = _Buckets(_next_pow2(max(1, len(chunk))), bk.LT, bk.LQ, bk.W,
                      bk.S_CAP, bk.W_full, bk.S_full)
        idx = chunk
        prof = os.environ.get("MWF_PROF")
        if prof:
            import time as _time
            _t0 = _time.perf_counter()
        out, spec = _run_device(opt, MODE_PASS1, bk,
                                [ts_list[i] for i in idx],
                                [qs_list[i] for i in idx])
        fetched = jax.device_get(
            {k: out[k] for k in ("overflow", "snap_cnt", "last_ptr",
                                 "final_s", "ovf_band", "ovf_scap")})
        if prof:
            print(f"[prof] pass1 B={len(idx)} W={bk.W} S_CAP={bk.S_CAP} "
                  f"dispatch={_time.perf_counter() - _t0:.3f}s", flush=True)
        ovf = fetched["overflow"][: len(idx)]
        snap_cnt = fetched["snap_cnt"]
        last_ptr = fetched["last_ptr"]
        fs = fetched["final_s"]
        anc_np = np.asarray(out["anc"]) if "kernel_cpw" in out else None
        ptr_fin = ptr_recs = None
        if "kernel_cpw" in out:
            # pointer-jump the snapshot chains ON DEVICE and fetch only
            # the per-snapshot pointers (a few ints/lane) — the rows
            # themselves are multi-MB each at 100 kb-5 Mb scale
            from ..ops import traceback_device as tbd
            nb = int(out["snap"].shape[0])
            live = np.zeros(nb, bool)
            live[: len(idx)] = ~ovf
            cnts = np.where(live, snap_cnt[:nb], 0)
            l0 = np.where(live, last_ptr[:nb], -1)
            ptr_fin, ptr_recs = tbd.chain_ptrs_on_device(
                out["snap"], l0, cnts)
        snap_x = None
        retry = []
        for j, i in enumerate(idx):
            if ovf[j]:
                if preflighted:
                    # the dispatch was sized exactly from a score-only
                    # preflight: an overflow here means the two runs
                    # disagreed — an engine fault, not a capacity issue
                    raise RuntimeError(
                        f"low-mem pass 1 overflowed a window sized from "
                        f"its own score preflight (lane {i}, "
                        f"s_preflight={s_fin[i]}, W={bk.W}, "
                        f"S_CAP={bk.S_CAP}) — engine inconsistency; "
                        f"re-run (transient device faults have shown up "
                        f"as missed terminations, PERF_NOTES.md)")
                retry.append(i)
                continue
            if preflighted and int(fs[j]) != s_fin[i]:
                raise RuntimeError(
                    f"low-mem pass 1 score {int(fs[j])} != preflight "
                    f"score {s_fin[i]} (lane {i}) — engine inconsistency")
            s_fin[i] = int(fs[j])
            if "kernel_cpw" in out:
                segs[i] = tbk.decode_checkpoints_ptrs(
                    ptr_recs[:, j], int(ptr_fin[j]), int(anc_np[j]),
                    int(snap_cnt[j]), spec)
                continue
            if snap_x is None:
                snap_x = np.asarray(jax.device_get(out["snap_x"]))
                snap_anc = np.asarray(jax.device_get(out["snap_anc"]))
            segs[i] = tbk.decode_checkpoints(
                snap_x[j], snap_anc[j], int(snap_cnt[j]),
                int(last_ptr[j]), ns, spec.W, opt.step)
        if retry:
            need_band = bool(fetched["ovf_band"][: len(idx)].any())
            if need_band and bk.W >= min(bk.W_full, w_cap):
                raise RuntimeError(
                    f"low-mem pass-1 band exceeded the device limit "
                    f"(W={bk.W}, cap {w_cap}) — use the chain or auto "
                    f"mode for this pair, or the CPU backend")
            bk = _escalate(bk, need_band,
                           bool(fetched["ovf_scap"][: len(idx)].any()))
            bk = _Buckets(_next_pow2(max(1, len(retry))), bk.LT, bk.LQ,
                          min(bk.W, w_cap), bk.S_CAP, bk.W_full, bk.S_full)
        # free the snapshot buffer (multi-GB at 5 Mb scale) BEFORE the
        # next dispatch — pass 2's tb buffer must not coexist with it
        out = ptr_recs = ptr_fin = snap_x = None
        idx = retry + idx_rest
    return segs, s_fin  # type: ignore[return-value]


def _device_w_cap(opt: Options, mode, bk, ts_list, qs_list) -> int:
    """Largest band window the current backend can serve for this batch.
    On TPU: score-only batches escalate through the fused VMEM kernel
    (W<=65536) into the wide HBM-ring engine (W<=WIDE_W_CAP); CIGAR
    (MODE_TB) stays on the VMEM kernel — high-mem tb at wider bands
    exceeds HBM exactly as it exceeds RAM for the reference
    (README.md:98); use the low-mem mode there.  Sequences beyond the
    segmented word-table capacity (or penalty sets past the packed
    viability plane) fall to the lax engine, capped at its structural
    TPU limit (ops.wavefront.LAX_TPU_W_CAP); on CPU there is no cap."""
    if jax.default_backend() != "tpu":
        return 1 << 30
    from ..ops import wavefront_kernel as wk
    from ..ops.wavefront import LAX_TPU_W_CAP
    if opt.max_pen + 1 > 31:
        return LAX_TPU_W_CAP
    cpw = _cpw_for(ts_list, qs_list)
    mx = max([len(s) for s in ts_list] + [len(s) for s in qs_list],
             default=0)
    if wk.nseg_for(mx, cpw) > 64:
        return LAX_TPU_W_CAP
    return 65536 if mode == MODE_TB else WIDE_W_CAP


def _band_limit_error(opt: Options, mode: int, W: int,
                      w_cap: int) -> RuntimeError:
    """The band outgrew the largest device-servable window.

    For high-mem CIGAR mode this is a DOCUMENTED capability boundary,
    not a failure to route around: the 1 B/cell traceback table at
    multi-Mb scale is tens-to-hundreds of GB (the reference itself
    needs 50.6 GB of host RAM for its 5 Mb pair, README.md:98) — far
    past a 16 GB-HBM chip, and past streaming over a ~25 ms/RPC device
    tunnel.  The supported routes are the ones the reference documents
    for the same wall: the low-mem stripe mode (bit-identical score AND
    CIGAR, 'use -p') or the chain/auto heuristics."""
    if mode == MODE_TB and opt.step <= 0 and opt.cigar:
        return RuntimeError(
            f"high-mem CIGAR traceback exceeds device memory at this "
            f"scale (band W={W} > device cap {w_cap}; the tb table is "
            f"1 byte/cell — the reference needs 50.6 GB host RAM for "
            f"its 5 Mb pair).  Use the low-mem stripe mode (-p / "
            f"Options(step=5000): bit-identical score and CIGAR) or "
            f"the chain/auto mode (-u / -t).")
    return RuntimeError(
        f"band window exceeded the device limit (W={W}, cap {w_cap}) "
        f"— use the chain or auto mode for this pair, or the CPU "
        f"backend")


def align_batch(pairs: Sequence[Tuple[object, object]], opt: Options,
                *, w0: int = 512, s0: int = 512,
                band_limit: str = "raise") -> List[Result]:
    """Exact alignment of a batch of (target, query) pairs.

    ``band_limit`` controls what happens when a pair's band outgrows the
    largest window the backend can serve: "raise" (default) raises a
    RuntimeError; "stop" returns s=-1 for those pairs like a max_iter
    stop (the auto driver's policy — it falls back to chaining,
    mirroring mwf_wfa_auto's treatment of failure, miniwfa.c:903-907)."""
    ts_list = [as_bytes(t) for t, _ in pairs]
    qs_list = [as_bytes(q) for _, q in pairs]
    n = len(pairs)
    results: List[Optional[Result]] = [None] * n
    if n == 0:
        return []
    bk = _buckets_for(opt, ts_list, qs_list, w0, s0)
    ns = opt.max_pen + 1
    mode = MODE_TB if opt.cigar else MODE_SCORE
    if mode == MODE_SCORE:
        # score mode: NO buffer scales with S_CAP on any engine (tb and
        # snapshot buffers exist only in TB/PASS1 modes), so use the
        # full score bound upfront — the escalation ladder then only
        # ever re-runs for the band window, never for the cycle budget
        bk = _Buckets(bk.B, bk.LT, bk.LQ, bk.W, bk.S_full,
                      bk.W_full, bk.S_full)
    w_cap = _device_w_cap(opt, mode, bk, ts_list, qs_list)
    if bk.W > w_cap:
        bk = _Buckets(bk.B, bk.LT, bk.LQ, w_cap, bk.S_CAP,
                      bk.W_full, bk.S_full)

    # --- upfront dispatch sizing (replaces most ladder rungs on TPU) ---
    # w_cap > 8192 means the kernel/wide engines serve this batch; the
    # lax fallback's cycles are W-proportional, so never pre-jump it
    if jax.default_backend() == "tpu" and n <= 64 and w_cap > 8192:
        if mode == MODE_SCORE:
            # the VMEM kernel's cycles sweep only live-band chunks
            # (band-proportional), so oversizing W costs one O(W) init
            # sweep and nothing per cycle — and score mode allocates no
            # W-scaled tb/snapshot buffer.  Jump straight to the largest
            # window the kernel serves: zero ladder rungs, and ONE warm
            # spec serves every same-bucket score dispatch.
            bk = _Buckets(bk.B, bk.LT, bk.LQ,
                          max(bk.W, min(bk.W_full, w_cap, 65536)),
                          bk.S_CAP, bk.W_full, bk.S_full)
        elif mode == MODE_TB and opt.step <= 0:
            # high-mem CIGAR: the tb buffer is S_CAP*W bytes/lane, so W
            # must stay near the real band — size both from the k-mer
            # divergence estimate, REPLACING the caller's w0/s0 hints (a
            # generous hint would inflate the tb buffer and split the
            # batch into more lane-budget chunks; the escalation ladder
            # backstops an underestimate either way)
            s_cap_e, s_band_e = _estimate_s(opt, ts_list, qs_list)
            if s_cap_e:
                d_span = max((abs(len(q) - len(t))
                              for t, q in zip(ts_list, qs_list)), default=0)
                w_est = min(_next_pow2(2 * s_band_e + d_span + 2 * ns + 24),
                            bk.W_full, w_cap)
                s_est = min(_next_pow2(s_cap_e), bk.S_full)
                if s_est * w_est <= TB_LANE_BUDGET:
                    bk = _Buckets(bk.B, bk.LT, bk.LQ, w_est, s_est,
                                  bk.W_full, bk.S_full)

    segs: Optional[List[Optional[Seg]]] = None
    run_pass1 = opt.step > 0 and opt.cigar
    if run_pass1:
        # stripe-mode shortcut: when every pair's score UPPER BOUND (the
        # trivial alignment: min(tl,ql) mismatches + one |tl-ql| gap) is
        # below the snapshot period, pass 1 cannot fire a single
        # snapshot ((t+1) % step == 0 needs t+1 >= step > s), so there
        # are no checkpoints and pass 2 IS the plain high-mem run —
        # provably identical output (incl. n_iter: the reference counts
        # pass-2 cells only, mwf_wfa_core miniwfa.c:421).  This is the
        # chain driver's common case (gap fills inherit step=5000,
        # miniwfa.c:905, with gap scores far below it) and skips a
        # whole PASS1 spec compile + dispatch per fill batch.
        s_ub = max(opt.x * min(len(t), len(q))
                   + (opt.gap_cost(abs(len(t) - len(q)))
                      if len(t) != len(q) else 0)
                   for t, q in zip(ts_list, qs_list))
        if s_ub < opt.step:
            run_pass1 = False
    if run_pass1:
        segs, s_p1 = _run_pass1(opt, bk, ts_list, qs_list)
        # pass 2 runs with the band collapsed to ≤ 2·step+1 at
        # checkpoints, and reaches exactly pass 1's optimal score — size
        # its cycle budget from that instead of the pow2 ladder (at 5 Mb
        # scale a pow2 jump would double a multi-GB tb buffer).  The
        # band window takes the TIGHTER of the collapse bound and the
        # uncollapsed 2s bound: when step > s no checkpoint ever fires
        # and sizing from step alone would allocate a tb buffer for a
        # band the run cannot reach (B=256 lanes at step=5000 with
        # s~850 meant a 17 GB buffer — observed OOM)
        s_cap2 = -(-(max(s_p1) + 4) // 4096) * 4096
        d_span = max((abs(len(q) - len(t))
                      for t, q in zip(ts_list, qs_list)), default=0)
        w2 = min(_next_pow2(2 * opt.step + 2 * ns + 24),
                 _next_pow2(2 * max(s_p1) + d_span + 2 * ns + 24))
        bk = _Buckets(bk.B, bk.LT, bk.LQ,
                      W=min(w2, bk.W_full),
                      S_CAP=min(s_cap2, bk.S_full),
                      W_full=bk.W_full, S_full=bk.S_full)

    idx = list(range(n))
    cur_bk = bk
    while idx:
        if mode == MODE_TB and jax.default_backend() == "tpu":
            # high-mem traceback lane cap: the tb buffer is
            # B * S_CAP * W bytes (1 B/cell on every engine); chunk the
            # batch so one dispatch never outgrows HBM (the reference's
            # high-mem mode has the same footprint in host RAM,
            # README.md:98 — batching multiplies it by the lanes)
            per_lane = max(1, cur_bk.S_CAP * cur_bk.W)
            cap = _prev_pow2(max(1, TB_LANE_BUDGET // per_lane))
        else:
            cap = len(idx)
        chunk, idx_rest = idx[:cap], idx[cap:]
        idx = chunk
        cur_bk = _Buckets(_next_pow2(max(1, len(idx))), cur_bk.LT,
                          cur_bk.LQ, cur_bk.W, cur_bk.S_CAP,
                          cur_bk.W_full, cur_bk.S_full)
        sub_segs = [segs[i] for i in idx] if segs is not None else None
        prof = os.environ.get("MWF_PROF")
        if prof:
            import time as _time
            _t0 = _time.perf_counter()
        out, spec = _run_device(opt, mode, cur_bk,
                                [ts_list[i] for i in idx],
                                [qs_list[i] for i in idx], sub_segs)
        # fetch ALL small per-lane outputs in one overlapped device_get:
        # each separate device->host read is a ~25 ms RPC on the
        # tunnelled TPU (kernel outputs are already host numpy)
        fetched = jax.device_get(
            {k: out[k] for k in ("overflow", "stopped", "final_s",
                                 "n_iter_lo", "n_iter_hi", "last_state",
                                 "ovf_band", "ovf_scap")})
        if prof:
            _td = _time.perf_counter()
        ovf = fetched["overflow"][: len(idx)]
        stopped = fetched["stopped"][: len(idx)]
        final_s = fetched["final_s"][: len(idx)]
        ni_lo = fetched["n_iter_lo"]
        ni_hi = fetched["n_iter_hi"]
        last_state = fetched["last_state"]
        is_kernel = "kernel_cpw" in out
        anc_np = np.asarray(out["anc"]) if is_kernel else None
        tb_bits = tb_lo = None
        walk_cigs = None
        if opt.cigar and is_kernel and \
                not os.environ.get("MWF_NO_DEVICE_WALK"):
            # kernel results have a constant window anchor: walk the
            # HBM-resident packed tb buffers on-device — ALL lanes in
            # one vmapped call — and fetch only the runs (the buffers
            # are ~GBs at 100kb-5Mb scale; B sequential walks would pay
            # B tunnel round-trips)
            from ..ops import traceback_device as tbd
            nb = int(out["tb_packed"].shape[0])
            fsb = np.asarray(out["final_s"])[:nb]
            skip = [j >= len(idx) or bool(ovf[j]) or bool(stopped[j])
                    for j in range(nb)]
            walk_cigs = tbd.walk_batch_on_device(
                out["tb_packed"], anc_np[:nb],
                [ts_list[idx[j]] if j < len(idx) else b""
                 for j in range(nb)],
                [qs_list[idx[j]] if j < len(idx) else b""
                 for j in range(nb)],
                np.where(skip, 0, fsb), last_state[:nb],
                out["kernel_cpw"],
                (opt.x, opt.o1, opt.e1, opt.o2, opt.e2), skip=skip)
        if prof:
            _t1 = _time.perf_counter()
            print(f"[prof] mode={mode} B={len(idx)} W={cur_bk.W} "
                  f"S_CAP={cur_bk.S_CAP} dispatch={_td - _t0:.3f}s "
                  f"walk={_t1 - _td:.3f}s", flush=True)
        retry = []
        for j, i in enumerate(idx):
            if ovf[j]:
                retry.append(i)
                continue
            n_iter = (int(ni_hi[j]) << 30) | int(ni_lo[j])
            if stopped[j]:
                results[i] = Result(s=-1, cigar=None, n_iter=n_iter)
                continue
            s = int(final_s[j])
            cig = None
            if walk_cigs is not None:
                cig = walk_cigs[j]
            elif opt.cigar and is_kernel:
                # host walk over the unpacked rows (debug/fallback path)
                from ..ops import wavefront_kernel as wk
                pk_rows = np.asarray(
                    jax.device_get(out["tb_packed"][j, :max(s, 1)]))
                tbl = wk.unpack_tb(pk_rows)
                lo_rows = np.full((max(s, 1),), int(anc_np[j]), np.int32)
                cig = tbk.traceback_walk(opt, tbl, lo_rows, 0,
                                         ts_list[i], qs_list[i], s,
                                         int(last_state[j]))
            elif opt.cigar:
                if tb_bits is None:
                    smax = int(final_s.max())
                    tb_bits = np.asarray(jax.device_get(out["tb_bits"][:, :max(smax, 0)]))
                    tb_lo = np.asarray(jax.device_get(out["tb_anc"][:, :max(smax, 0)]))
                # rows are anchored at the window anchor: col = d - anc,
                # i.e. the walker's (tb_lo, m1) with m1 = 0
                cig = tbk.traceback_walk(opt, tb_bits[j], tb_lo[j], 0,
                                         ts_list[i], qs_list[i], s,
                                         int(last_state[j]))
            if cig is not None and os.environ.get("MWF_VALIDATE"):
                # runtime self-validation on every alignment (the
                # reference's per-pair oracle, main.c:72 / mwf-dbg.c):
                # CIGAR must consume exactly (tl, ql), re-score to s,
                # and '='/'X' runs must match the actual bases
                from .. import cigar as _C
                _C.assert_cigar(opt, cig, len(ts_list[i]), len(qs_list[i]),
                                s, ts_list[i], qs_list[i])
            results[i] = Result(s=s, cigar=cig, n_iter=n_iter)
        if retry:
            ovf_b = fetched["ovf_band"][: len(idx)]
            need_band = bool(ovf_b.any())
            need_scap = bool(fetched["ovf_scap"][: len(idx)].any())
            if need_band and cur_bk.W >= min(cur_bk.W_full, w_cap):
                # the band outgrew the largest device-servable window
                if band_limit != "stop":
                    raise _band_limit_error(opt, mode, cur_bk.W, w_cap)
                kept = []
                for j, i in enumerate(idx):
                    if ovf_b[j]:
                        n_iter = (int(ni_hi[j]) << 30) | int(ni_lo[j])
                        results[i] = Result(s=-1, cigar=None, n_iter=n_iter)
                    elif i in retry:
                        kept.append(i)
                retry = kept
                need_band = False
            if retry:
                cur_bk = _escalate(cur_bk, need_band, need_scap)
                new_w = min(cur_bk.W, w_cap)
                if need_band and new_w > 65536 and mode == MODE_SCORE:
                    # beyond the VMEM kernel the wide engine's cycles
                    # are band-proportional, so oversizing W costs only
                    # HBM + one init sweep: jump straight to the largest
                    # band this pair can ever need (clipped to [-tl,ql])
                    # instead of re-running t~W/2 cycles per x4 rung
                    band_max = -(-(cur_bk.LT + cur_bk.LQ + 2 * ns + 64)
                                 // 16384) * 16384
                    new_w = min(max(new_w, band_max), cur_bk.W_full, w_cap)
                    new_w -= new_w % 16384   # wide engine row-chunk grain
                cur_bk = _Buckets(_next_pow2(max(1, len(retry))),
                                  cur_bk.LT, cur_bk.LQ,
                                  new_w, cur_bk.S_CAP,
                                  cur_bk.W_full, cur_bk.S_full)
        idx = retry + idx_rest
    return results  # type: ignore[return-value]


def align_exact(ts, qs, opt: Options, *, w0: int = 512, s0: int = 512) -> Result:
    """Exact alignment of one pair; mirrors mwf_wfa_exact (miniwfa.c:603)."""
    return align_batch([(ts, qs)], opt, w0=w0, s0=s0)[0]
