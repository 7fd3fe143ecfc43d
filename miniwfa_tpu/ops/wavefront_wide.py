"""Wide-band fused-cycle WFA engine: HBM rings, VMEM chunk staging.

The VMEM-ring engine (ops/wavefront_kernel.py) holds the whole band
window's DP state resident in VMEM, which caps the window at W=65536
diagonals (32768 in pass-1 mode, whose sf shadow rings double the VMEM).
The reference's 5 Mb workloads need far more: the WFA band grows ~2
diagonals per cycle and the periodic shrink only prunes diagonals that
fall off the sequence ends (good_diag, miniwfa.c:139-171), so at
s ~ 270k the live band is ~540k diagonals wide (the reference's own
high-mem tb is Sum(band) ~ 50 GB for the same reason, README.md:98).

This engine keeps every DP plane in HBM and streams the live band
through VMEM in fixed CR-row chunks (WSpec.cr: 256 rows = 32768
diagonals in score mode, 128 in pass 1 whose sf shadows sit near the
VMEM cap), giving W up to 2^20 diagonals bounded by HBM instead of
VMEM:

* **HBM workspaces** (extra pallas outputs in ANY memory, per lane):
  ring planes [NRING, WRT, 128] laid out exactly like the snapshot
  serialization (snapshot_layout); the 5 (10 in pass 1) top registers;
  the 6 extension-window planes; the 2 shrink-viability planes.
* **Chunk staging**: each per-cycle sweep walks only the CR-row chunks
  intersecting the live band.  Whole plane-groups move as single
  multi-plane DMAs; ring history moves SLOT-WISE — only the <=7 source
  slots the recurrence actually reads (ages {x, o1+e1, o2+e2, e1, e2})
  are staged in, and only the 5 retired score-t slots are written back,
  so the untouched ring slots never cross the bus.
* **Slot-collision freedom**: retire writes slot t mod depth and the
  recurrence reads ages >= 2 at slots t+1-age mod depth; they collide
  only when age == 1, which statically bypasses to the top registers —
  so one staged copy per chunk is sound for any penalty setting.
* **Pass-1 snapshots are zero-copy**: the sf pointer rings live
  directly in snapshot row ``snc`` of the [n_snap+1, NRING, WRT, 128]
  buffer.  At a snapshot boundary (miniwfa.c:585-586) the current row
  is frozen in place (it already IS the serialization, holding pointers
  into row snc-1) and row snc+1 is seeded with fresh flat indices
  ``plane*WRT*128 + w`` over each slice's recorded band — the per-
  snapshot copy the reference performs (wf_snapshot, miniwfa.c:451-474)
  becomes a row bump.

Sweep structure per cycle mirrors the VMEM engine: score mode and
non-snapshot pass-1 cycles run ONE fused retire+transition sweep;
snapshot-boundary cycles (1 in `step`) split retire / snapshot /
transition because the serialization must land between them
(miniwfa.c:585-587).

The whole machine is RESUMABLE (run_chunked): scalar state crosses the
call boundary through scal/out-row columns (RS_*/OW_* below) and the
HBM planes through input_output_aliased buffers, because the tunnelled
TPU worker kills any device call past ~1 minute; pass-1 snapshot
buffers grow on demand between calls.

Modes: SCORE and PASS1.  Pass 2 runs with the band collapsed to
~2*step+1 (miniwfa.c:413-416) and high-mem CIGAR tb at this scale
exceeds HBM just as it exceeds RAM for the reference — both stay on the
VMEM engine.  Sequence capacity matches the segmented word tables
(nseg <= 64, ~16 Mb at cpw=16).
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wavefront_kernel import (
    MODE_SCORE, MODE_PASS1, WF_NEG_INF, NTAB, SEGSTRIDE, MAXR_SAFETY,
    SC_TL, SC_QL, SC_ANC,
    O_S, O_DONE, O_STOP, O_OVFB, O_OVFS, O_LS, O_NLO, O_NHI,
    O_LP, O_SNC, O_N,
    KSpec, snapshot_layout, transition_values, _ages,
)

CR_GRAIN = 128    # minimum staging chunk rows (== NTAB, the refill
                  # gather width); WSpec.cr may raise it in multiples

# ---- resumable-call protocol (run_chunked) ------------------------------
# The axon-tunnelled TPU worker kills any single device call that runs
# longer than ~1 minute (measured: every wide-kernel call under ~55 s of
# device time completes; 4 sequential lanes of a passing 27 s workload in
# one call reproducibly kill the worker).  A 5 Mb alignment is minutes of
# device time, so the kernel is resumable: all DP planes already live in
# HBM output buffers, which run_chunked feeds back as aliased inputs, and
# the scalar machine state crosses the boundary through extra scal
# columns (in) and out-row columns (out).  Each call executes cycles
# t in [RS_T, RS_LIM) and pauses at a clean cycle boundary.
RS_FLAG = 3       # 0 = fresh lane (init sweep), 1 = resume saved state
RS_LIM = 4        # run while t < RS_LIM (this call's cycle budget)
RS_T = 5
RS_WLO, RS_WHI, RS_TLO, RS_THI = 6, 7, 8, 9
RS_NLO, RS_NHI, RS_LP, RS_SNC = 10, 11, 12, 13
RS_MS, RS_MILO, RS_MIHI = 14, 15, 16  # runtime max_s / max_iter bounds
                  # (kept out of WSpec so e.g. the auto probe's
                  # max_iter=1e8 reuses the plain score compile)
RS_BND = 17       # band registry: bnd_lo[DH] then bnd_hi[DH]

OW_T, OW_WLO, OW_WHI, OW_TLO, OW_THI, OW_PAUSE = (
    O_N, O_N + 1, O_N + 2, O_N + 3, O_N + 4, O_N + 5)
OW_BND = O_N + 6


def _ring_dh(spec) -> int:
    ages = _ages(spec)
    return max(ages["x"], ages["o1"], ages["o2"])


def scal_width(spec) -> int:
    return RS_BND + 2 * _ring_dh(spec)


def out_width(spec) -> int:
    return OW_BND + 2 * _ring_dh(spec)


@dataclass(frozen=True)
class WSpec:
    """Static configuration of the wide-band kernel."""

    B: int
    WR: int          # band rows; W = WR * 128 diagonals, WR multiple of CR
    S_CAP: int
    x: int
    o1: int
    e1: int
    o2: int
    e2: int
    mode: int = MODE_SCORE
    cpw: int = 16
    step: int = 0
    n_snap: int = 0
    nseg: int = 1
    cr: int = 128    # staging chunk rows (multiple of CR_GRAIN, divides WR)

    @property
    def W(self) -> int:
        return self.WR * 128

    @property
    def NS(self) -> int:
        return max(self.x, self.o1 + self.e1, self.o2 + self.e2) + 1

    def kspec(self) -> KSpec:
        """KSpec twin for the shared layout helpers (snapshot decode)."""
        return KSpec(B=self.B, WR=self.WR, S_CAP=self.S_CAP, x=self.x,
                     o1=self.o1, e1=self.e1, o2=self.o2, e2=self.e2,
                     mode=self.mode, cpw=self.cpw, step=self.step,
                     n_snap=self.n_snap, nseg=self.nseg)


def build_kernel_wide(spec: WSpec):
    CR = spec.cr
    CRB = CR + 8
    if CR % CR_GRAIN or spec.WR % CR:
        raise ValueError(
            f"WSpec.cr={CR} must be a multiple of {CR_GRAIN} and divide "
            f"WR={spec.WR}")
    if spec.mode not in (MODE_SCORE, MODE_PASS1):
        raise ValueError("wide engine serves MODE_SCORE and MODE_PASS1 only")
    WR, W = spec.WR, spec.W
    WRT = WR + 8             # padded rows so CRB loads at the top edge fit
    WPT = WRT * 128          # flat-pointer stride of snapshot planes
    NCH = WR // CR
    CPW = spec.cpw
    BITS = 32 // CPW
    LOGC = {16: 4, 4: 2}[CPW]
    LOGB = {16: 1, 4: 3}[CPW]
    NEG = WF_NEG_INF
    BIG = 0x3FFFFFFF
    is_p1 = spec.mode == MODE_PASS1
    ages = _ages(spec)
    DH = max(ages["x"], ages["o1"], ages["o2"])
    DE1 = max(ages["e1"], 1)
    DE2 = max(ages["e2"], 1)
    NS = spec.NS
    P_H, P_E1, P_F1, P_E2, P_F2, NRING = snapshot_layout(spec.kspec())
    NTOP = 10 if is_p1 else 5
    T_H, T_E1, T_F1, T_E2, T_F2 = range(5)
    S_H, S_E1, S_F1, S_E2, S_F2 = range(5, 10)
    E_WTA, E_WTB, E_WQA, E_WQB, E_BAT, E_BAQ = range(6)
    NSEGB = (spec.nseg - 1) * SEGSTRIDE + NTAB

    # ring sources the recurrence reads: (name, ring base, depth, top
    # plane, age).  age == 1 statically bypasses to the top registers.
    SRC = [
        ("Hx", P_H, DH, T_H, ages["x"]),
        ("Ho1", P_H, DH, T_H, ages["o1"]),
        ("Ho2", P_H, DH, T_H, ages["o2"]),
        ("E1", P_E1, DE1, T_E1, ages["e1"]),
        ("F1", P_F1, DE1, T_F1, ages["e1"]),
        ("E2", P_E2, DE2, T_E2, ages["e2"]),
        ("F2", P_F2, DE2, T_F2, ages["e2"]),
    ]
    STAGED = [i for i, s in enumerate(SRC) if s[4] > 1]  # ring-staged idx
    # retired slots: (value plane order H,E1,F1,E2,F2) -> ring base, depth
    RET = [(P_H, DH), (P_E1, DE1), (P_F1, DE1), (P_E2, DE2), (P_F2, DE2)]

    # drain-group bit ids (pend bitmask; semo slot == bit id)
    G_ES, G_VA, G_TOP, G_TH, G_SH = range(5)
    G_R0 = 5                    # 5 ring-slot writebacks: bits 5..9
    G_S0 = 10                   # 5 sf-slot writebacks: bits 10..14
    NSEM = 20

    def iota2(n, axis):
        return lax.broadcasted_iota(jnp.int32, (n, 128), axis)

    def ctz_chars(x):
        u = x.astype(jnp.uint32)
        ctz = lax.population_count(
            jnp.bitwise_and(~u, u - jnp.uint32(1)).astype(jnp.int32))
        return jnp.right_shift(ctz, LOGB)

    def shm(a, prev):
        left = jnp.concatenate(
            [jnp.full((CR, 1), NEG, a.dtype), a[:, :-1]], 1)
        carry = jnp.concatenate([prev, a[:-1, :]], 0)[:, 127:128]
        return jnp.where(iota2(CR, 1) == 0, carry, left)

    def shp(a, nxt):
        right = jnp.concatenate(
            [a[:, 1:], jnp.full((CR, 1), NEG, a.dtype)], 1)
        carry = jnp.concatenate([a[1:, :], nxt], 0)[:, 0:1]
        return jnp.where(iota2(CR, 1) == 127, carry, right)

    def kernel(scal_ref, twt_ref, twq_ref, *refs):
        # the first 4 (5 in pass 1) refs are the aliased state inputs —
        # same memory as the corresponding outputs, so all reads/writes
        # go through the output refs and these are never touched
        refs = refs[5 if is_p1 else 4:]
        out_ref, rng_ref, top_ref, es_ref, va_ref = refs[:5]
        refs = refs[5:]
        if is_p1:
            snap_ref = refs[0]
            refs = refs[1:]
        (sTOP, sRS, sRT, sSS, sST, sES, sVA, sFR,
         twtv, twqv, wtmp,
         semi, semo, pend, cs, bnd_lo, bnd_hi) = refs

        b = pl.program_id(0)
        tl = scal_ref[b, SC_TL]
        ql = scal_ref[b, SC_QL]
        anc = scal_ref[b, SC_ANC]
        max_s = scal_ref[b, RS_MS]     # runtime early-stop bounds
        mi_lo = scal_ref[b, RS_MILO]
        mi_hi_b = scal_ref[b, RS_MIHI]
        d_end = ql - tl

        # ---- per-lane init, or resume-state restore (run_chunked)
        resume = scal_ref[b, RS_FLAG]
        t_lim = scal_ref[b, RS_LIM]
        for j in range(DH):
            bnd_lo[j] = jnp.where(resume != 0, scal_ref[b, RS_BND + j],
                                  jnp.int32(1))
            bnd_hi[j] = jnp.where(resume != 0,
                                  scal_ref[b, RS_BND + DH + j],
                                  jnp.int32(0))
        pend[0] = 0
        pend[1] = 0
        cp0 = pltpu.make_async_copy(twt_ref.at[b, 0], twtv, semi.at[0, 0])
        cp0.start()
        cp0.wait()
        cp1 = pltpu.make_async_copy(twq_ref.at[b, 0], twqv, semi.at[0, 0])
        cp1.start()
        cp1.wait()
        cs[0] = 0
        cs[1] = 0

        # ES/VA/TOP planes must be defined over every row the band can
        # ever touch (garbage probe bases would fake in-window hits;
        # garbage viability corrupts the shrink) — one streaming init
        # sweep.  Ring/snapshot planes need no init: every read is
        # masked by the per-score band registry.
        DDW = anc + iota2(CR, 0) * 128 + iota2(CR, 1)

        def init_chunk(ci, _):
            ro = ci * CR
            DDc = DDW + ro * 128
            for p in (E_WTA, E_WTB, E_WQA, E_WQB):
                sES[0, p] = jnp.zeros((CR, 128), jnp.int32)
            sES[0, E_BAT] = jnp.full((CR, 128), BIG, jnp.int32)
            sES[0, E_BAQ] = jnp.full((CR, 128), BIG, jnp.int32)
            sVA[0, 0] = jnp.zeros((CR, 128), jnp.int32)
            sVA[0, 1] = jnp.zeros((CR, 128), jnp.int32)
            top0 = jnp.where(DDc == 0, -1, NEG)
            negb = jnp.full((CR, 128), NEG, jnp.int32)
            for p in range(NTOP):
                sTOP[0, p, pl.ds(0, CR)] = \
                    top0 if p in (T_H, S_H) else negb
            cpe = pltpu.make_async_copy(
                sES.at[0], es_ref.at[b, :, pl.ds(ro, CR)], semo.at[0, 0])
            cpv = pltpu.make_async_copy(
                sVA.at[0], va_ref.at[b, :, pl.ds(ro, CR)], semo.at[0, 1])
            cpt = pltpu.make_async_copy(
                sTOP.at[0, :, pl.ds(0, CR)],
                top_ref.at[b, :, pl.ds(ro, CR)], semo.at[0, 2])
            cpe.start()
            cpv.start()
            cpt.start()
            cpe.wait()
            cpv.wait()
            cpt.wait()
            return 0

        @pl.when(resume == 0)
        def _():
            lax.fori_loop(0, NCH, init_chunk, 0)

        # ---- staging plumbing.  Sweeps walk chunks low->high; chunk
        # i's writebacks cover rows [ro, ro+CR) and chunk i+1 stages
        # [ro+CR, ro+CR+CRB) — disjoint, so in-DMAs may start while the
        # previous chunk's out-DMAs fly.  The same VMEM parity buffer
        # returns every 2 chunks: drain its outstanding out-DMAs (by
        # matching-shape descriptors; waits count bytes, not offsets)
        # before overwriting.
        def out_desc(g, pb, ro, snc):
            if g == G_ES:
                return pltpu.make_async_copy(
                    sES.at[pb], es_ref.at[b, :, pl.ds(ro, CR)],
                    semo.at[pb, g])
            if g == G_VA:
                return pltpu.make_async_copy(
                    sVA.at[pb], va_ref.at[b, :, pl.ds(ro, CR)],
                    semo.at[pb, g])
            if g == G_TOP:
                return pltpu.make_async_copy(
                    sTOP.at[pb, :, pl.ds(0, CR)],
                    top_ref.at[b, :, pl.ds(ro, CR)], semo.at[pb, g])
            if g == G_TH:
                return pltpu.make_async_copy(
                    sTOP.at[pb, T_H, pl.ds(0, CR)],
                    top_ref.at[b, T_H, pl.ds(ro, CR)], semo.at[pb, g])
            if G_R0 <= g < G_R0 + 5:
                k = g - G_R0
                p0, dp = RET[k]
                return pltpu.make_async_copy(
                    sRT.at[pb, k],
                    rng_ref.at[b, p0 + t_reg[0] % dp, pl.ds(ro, CR)],
                    semo.at[pb, g])
            k = g - G_S0
            p0, dp = RET[k]
            return pltpu.make_async_copy(
                sST.at[pb, k],
                snap_ref.at[b, snc, p0 + t_reg[0] % dp, pl.ds(ro, CR)],
                semo.at[pb, g])

        def start_out(g, pb, ro, snc):
            out_desc(g, pb, ro, snc).start()
            pend[pb] = pend[pb] | (1 << g)

        def drain(pb, snc):
            for g in range(NSEM):
                # G_SH is in-only; sf groups exist only in pass 1
                if g >= G_S0 + 5 or g == G_SH or \
                        (not is_p1 and G_S0 <= g < G_S0 + 5):
                    continue

                @pl.when(((pend[pb] >> g) & 1) == 1)
                def _():
                    out_desc(g, pb, 0, snc).wait()
            pend[pb] = 0

        def chunk_range(d0, d1, empty):
            c0 = jnp.clip((d0 - anc) >> 7, 0, WR - 1) // CR
            c1 = jnp.clip((d1 - anc) >> 7, 0, WR - 1) // CR + 1
            return c0, jnp.where(empty, c0, c1)

        # ---- extension machinery (staged twin of the VMEM engine's
        # refill/probe/extend, wavefront_kernel.py:316-485; reference
        # wf_extend1_padded, miniwfa.c:212-226)
        def refill(pb, needy, jT, jQ):
            has = jnp.any(needy, axis=1, keepdims=True)
            jTn = jnp.where(needy, jT, BIG)
            jminT = jnp.min(jTn, axis=1, keepdims=True)
            elect = needy & (jTn == jminT)
            jminQ = jnp.min(jnp.where(elect, jQ, BIG), axis=1,
                            keepdims=True)
            baTc = sES[pb, E_BAT]
            baQc = sES[pb, E_BAQ]

            def pick(basec, jmin):
                a_new = jnp.clip(jmin >> 7, 0, NSEGB - 1)
                a_cur = jnp.clip(basec[:, 0:1] >> 7, 0, NSEGB - 1)
                return jnp.where(has, a_new, a_cur)

            aT = pick(baTc, jminT)
            aQ = pick(baQc, jminQ)
            if spec.nseg > 1:
                any_has = jnp.any(has)
                gT = jnp.min(jnp.where(has, aT, NSEGB))
                sel_rows = has & (aT == gT)
                gQ = jnp.min(jnp.where(sel_rows, aQ, NSEGB))
                segT = jnp.clip(gT // SEGSTRIDE, 0, spec.nseg - 1)
                segQ = jnp.clip(gQ // SEGSTRIDE, 0, spec.nseg - 1)

                @pl.when(any_has & (segT != cs[0]))
                def _():
                    cp = pltpu.make_async_copy(twt_ref.at[b, segT], twtv,
                                               semi.at[0, 19])
                    cp.start()
                    cp.wait()
                    cs[0] = segT

                @pl.when(any_has & (segQ != cs[1]))
                def _():
                    cp = pltpu.make_async_copy(twq_ref.at[b, segQ], twqv,
                                               semi.at[0, 19])
                    cp.start()
                    cp.wait()
                    cs[1] = segQ

                cst, csq = cs[0], cs[1]
            else:
                cst = csq = 0
            resT = (jnp.clip(aT // SEGSTRIDE, 0, spec.nseg - 1) == cst)
            resQ = (jnp.clip(aQ // SEGSTRIDE, 0, spec.nseg - 1) == csq)
            mf = has & resT & resQ
            sES[pb, E_BAT] = jnp.broadcast_to(
                jnp.where(mf, aT * 128, baTc[:, 0:1]), (CR, 128))
            sES[pb, E_BAQ] = jnp.broadcast_to(
                jnp.where(mf, aQ * 128, baQc[:, 0:1]), (CR, 128))
            mrow = jnp.broadcast_to(mf, (CR, 128))
            aTloc = jnp.clip(aT - cst * SEGSTRIDE, 0, NTAB - 1)
            aQloc = jnp.clip(aQ - csq * SEGSTRIDE, 0, NTAB - 1)
            twt = twtv[:]
            twq = twqv[:]

            # the gather trick packs NTAB row-windows per [NTAB, NTAB]
            # take; CR > NTAB chunks fill in NTAB-row sub-blocks
            for h in range(CR // NTAB):
                sl = pl.ds(h * NTAB, NTAB)
                aTh = aTloc[h * NTAB:(h + 1) * NTAB]
                aQh = aQloc[h * NTAB:(h + 1) * NTAB]
                mrh = mrow[h * NTAB:(h + 1) * NTAB]
                idxT = jnp.broadcast_to(aTh.T, (NTAB, NTAB))
                idxQ = jnp.broadcast_to(aQh.T, (NTAB, NTAB))
                idxT1 = jnp.broadcast_to(
                    jnp.minimum(aTh + 1, NTAB - 1).T, (NTAB, NTAB))
                idxQ1 = jnp.broadcast_to(
                    jnp.minimum(aQh + 1, NTAB - 1).T, (NTAB, NTAB))

                def fill(p, tw, idx):
                    g0 = jnp.take_along_axis(tw[0:64], idx[0:64], axis=1)
                    g1 = jnp.take_along_axis(tw[64:128], idx[64:128],
                                             axis=1)
                    wtmp[:] = jnp.concatenate([g0, g1], 0).T
                    sES[pb, p, sl] = jnp.where(mrh, wtmp[0:NTAB],
                                               sES[pb, p, sl])

                fill(E_WTA, twt, idxT)
                fill(E_WTB, twt, idxT1)
                fill(E_WQA, twq, idxQ)
                fill(E_WQB, twq, idxQ1)

        def probe_side(pb, r_loc, R, pa, pb_, pbase, pos):
            j = jnp.right_shift(pos, LOGC)
            c = j - sES[pb, pbase, pl.ds(r_loc, R)]
            in_win = (c >= 0) & (c < 2 * NTAB)
            cc = jnp.clip(c, 0, 2 * NTAB - 1)
            ca = jnp.minimum(cc, NTAB - 1)
            cb = jnp.clip(cc - NTAB, 0, NTAB - 1)
            ga = jnp.take_along_axis(sES[pb, pa, pl.ds(r_loc, R)], ca,
                                     axis=1)
            gb = jnp.take_along_axis(sES[pb, pb_, pl.ds(r_loc, R)], cb,
                                     axis=1)
            w0 = jnp.where(cc < NTAB, ga, gb)
            off = jnp.bitwise_and(pos, CPW - 1)
            chars = jnp.right_shift(w0.astype(jnp.uint32),
                                    (off * BITS).astype(jnp.uint32))
            return chars, CPW - off, in_win, j

        def probe_once(pb, r_loc, R, DDw, k, un):
            pos_t = k + 1
            pos_q = DDw + k + 1
            cht, nvt, inwt, jT = probe_side(
                pb, r_loc, R, E_WTA, E_WTB, E_BAT, pos_t)
            chq, nvq, inwq, jQ = probe_side(
                pb, r_loc, R, E_WQA, E_WQB, E_BAQ, pos_q)
            inw = inwt & inwq
            nv = jnp.minimum(nvt, nvq)
            x = jnp.bitwise_xor(cht, chq).astype(jnp.int32)
            shv = (nv * BITS).astype(jnp.uint32)
            tail = jnp.where(nv >= CPW, jnp.uint32(0),
                             jnp.left_shift(jnp.uint32(0xFFFFFFFF), shv))
            xf = x | tail.astype(jnp.int32)
            run = jnp.where(xf == 0, nv, ctz_chars(xf))
            cap = jnp.minimum(tl - 1 - k, ql - 1 - (DDw + k))
            cap = jnp.maximum(cap, 0)
            adv = jnp.minimum(run, cap)
            act = un & inw
            k = jnp.where(act, k + adv, k)
            resolved = act & ((run < nv) | (adv >= cap))
            return k, un & ~resolved

        def extend(pb, ro, DDc, k, elig):
            """Chunk LCP extension (value-carried k, full-chunk rounds).
            The VMEM engine's straggler sub-window loop is NOT used
            here: wide-engine cycles are DMA-staging-dominated, and the
            ported sub-window loop deterministically livelocked on real
            hardware at the first word-table segment rotation (interpret
            mode passes — undiagnosed Mosaic lowering difference; see
            PERF_NOTES).  This is the original proven loop."""
            def cond(c):
                return jnp.any(c[1] != 0) & (c[2] < MAXR_SAFETY)

            def body(c):
                k, un_i, rnd = c
                un = un_i != 0
                k, un = probe_once(pb, 0, CR, DDc, k, un)
                jT2 = jnp.right_shift(k + 1, LOGC)
                jQ2 = jnp.right_shift(DDc + k + 1, LOGC)
                cT = jT2 - sES[pb, E_BAT]
                cQ = jQ2 - sES[pb, E_BAQ]
                inw2 = (cT >= 0) & (cT < 2 * NTAB) \
                    & (cQ >= 0) & (cQ < 2 * NTAB)
                needy = un & ~inw2

                @pl.when(jnp.any(needy))
                def _():
                    refill(pb, needy, jT2, jQ2)
                return k, un.astype(jnp.int32), rnd + 1

            k, un_i, rnd = lax.while_loop(
                cond, body, (k, elig.astype(jnp.int32), jnp.int32(0)))
            return k, rnd >= MAXR_SAFETY

        def good_diag(v, DDc):
            return (v >= -1) & (v < tl) & (DDc + v >= -1) & (DDc + v < ql)

        # the out_desc closures need the current cycle's t for the
        # retire-slot indices; sweeps set it before issuing ring outs
        t_reg = [jnp.int32(0)]

        def cycle(carry):
            (t, wf_lo, wf_hi, t_lo, t_hi, done_i, stopped_i, ovf_i,
             final_s, n_lo, n_hi, lp, snc) = carry
            done, stopped, ovf = done_i != 0, stopped_i != 0, ovf_i != 0
            t_reg[0] = t
            bnd_lo[t % DH] = t_lo
            bnd_hi[t % DH] = t_hi

            # --- 1. extension sweep (miniwfa.c:400-411) + termination
            e0, e1_ = chunk_range(t_lo, t_hi, False)

            def ext_in_descs(pb, ro):
                cps = [pltpu.make_async_copy(
                    top_ref.at[b, T_H, pl.ds(ro, CR)],
                    sTOP.at[pb, T_H, pl.ds(0, CR)], semi.at[pb, G_TH]),
                    pltpu.make_async_copy(
                    es_ref.at[b, :, pl.ds(ro, CR)], sES.at[pb],
                    semi.at[pb, G_ES])]
                if is_p1:
                    cps.append(pltpu.make_async_copy(
                        top_ref.at[b, S_H, pl.ds(ro, CR)],
                        sTOP.at[pb, S_H, pl.ds(0, CR)], semi.at[pb, G_SH]))
                return cps

            @pl.when(e0 < e1_)
            def _():
                drain(e0 & 1, snc)
                for cp in ext_in_descs(e0 & 1, e0 * CR):
                    cp.start()

            def ext_chunk(ci, car):
                term_a, zero_a, ptr_a, stuck_a = car
                pb = ci & 1
                ro = ci * CR
                for cp in ext_in_descs(pb, ro):
                    cp.wait()
                nxt = ci + 1

                @pl.when(nxt < e1_)
                def _():
                    drain(nxt & 1, snc)
                    for cp in ext_in_descs(nxt & 1, nxt * CR):
                        cp.start()

                DDc = DDW + ro * 128
                k_old = sTOP[pb, T_H, pl.ds(0, CR)]
                in_top = (DDc >= t_lo) & (DDc <= t_hi)
                elig = in_top & (k_old >= -1) & (DDc + k_old >= -1) \
                    & (k_old < tl) & (DDc + k_old < ql)
                k_new, stuck = extend(pb, ro, DDc, k_old, elig)
                k_new = jnp.where(elig, k_new, k_old)
                sTOP[pb, T_H, pl.ds(0, CR)] = k_new
                at_end = elig & (DDc == d_end)
                term_c = jnp.any(at_end & (k_new == tl - 1))
                zero_c = jnp.any(at_end & (k_new == k_old)
                                 & (k_new == tl - 1))
                if is_p1:
                    ptr_a = jnp.maximum(ptr_a, jnp.max(jnp.where(
                        at_end, sTOP[pb, S_H, pl.ds(0, CR)], NEG)))
                start_out(G_TH, pb, ro, snc)
                start_out(G_ES, pb, ro, snc)
                return (term_a | term_c.astype(jnp.int32),
                        zero_a | zero_c.astype(jnp.int32),
                        ptr_a, stuck_a | stuck.astype(jnp.int32))

            z32 = jnp.int32(0)
            term_i, zero_i, ptr, stuck_i = lax.fori_loop(
                e0, e1_, ext_chunk, (z32, z32, jnp.int32(NEG), z32))
            # drain BOTH parities before the next sweep: its staged TOP
            # reads carry an 8-row halo into the neighbouring chunk, so a
            # still-flying G_TH writeback on the other parity could race
            # the read (DMAs on different channels have no issue-order
            # guarantee).  Within a sweep the halo is safe — chunk i+1's
            # rows haven't been written yet — the hazard is only across
            # sweep boundaries.
            drain(0, snc)
            drain(1, snc)
            term = term_i != 0
            ovf = ovf | (stuck_i != 0)

            # --- 2. termination bookkeeping (miniwfa.c:405-408, 577)
            if is_p1:
                lp = jnp.where(term, ptr, lp)
            done = done | term
            final_s = jnp.where(term, t, final_s)

            # --- 3. band growth + window overflow (miniwfa.c:417-418)
            lo = jnp.maximum(wf_lo - 1, -tl)
            hi = jnp.minimum(wf_hi + 1, ql)
            width = hi - lo + 1
            ovf_now = ~term & ((lo < anc) | (hi > anc + W - 1))
            ovf = ovf | ovf_now
            act = ~term & ~ovf_now

            # --- 3b. snapshot bookkeeping (miniwfa.c:585-586)
            if is_p1:
                snap_due = act & (jnp.mod(t + 1, spec.step) == 0)
                snap_ok = snc < spec.n_snap
                ovf = ovf | (snap_due & ~snap_ok)
                act = act & ~(snap_due & ~snap_ok)
                snap_now = snap_due & snap_ok
            else:
                snap_now = jnp.zeros((), bool)
            snc2 = jnp.where(snap_now, snc + 1, snc) if is_p1 else snc

            u_lo = jnp.minimum(t_lo, lo)
            u_hi = jnp.maximum(t_hi, hi)
            s0c, s1c = chunk_range(u_lo, u_hi, ~act)

            def retire_block(pb, ro, in_top, DDc):
                """Score-t tops -> ring slot t mod depth (+ viability;
                + sf tops -> snapshot row snc in pass 1); returns the
                list of out-groups to start."""
                tops = [sTOP[pb, p, pl.ds(0, CR)] for p in range(5)]
                for k in range(5):
                    sRT[pb, k] = jnp.where(in_top, tops[k], NEG)
                viab = jnp.zeros((CR, 128), bool)
                for v in tops:
                    viab |= good_diag(v, DDc)
                delta = jnp.clip(t - sVA[pb, 1], 0, NS)
                vbc = jnp.where(delta >= NS, 0,
                                jnp.left_shift(sVA[pb, 0], delta))
                sVA[pb, 0] = (vbc | (viab & in_top).astype(jnp.int32)) \
                    & ((1 << NS) - 1)
                sVA[pb, 1] = jnp.zeros((CR, 128), jnp.int32) + t
                outs = [G_R0 + k for k in range(5)] + [G_VA]
                if is_p1:
                    for k, p in enumerate(range(5, 10)):
                        sST[pb, k] = jnp.where(
                            in_top, sTOP[pb, p, pl.ds(0, CR)], NEG)
                    outs += [G_S0 + k for k in range(5)]
                return outs

            def trans_in_descs(pb, ro, snc_r):
                """Descriptors of the in-copies the transition needs
                (start and wait are the caller's: waits may reconstruct
                the same-shape descriptor, they count semaphore bytes)."""
                cps = [pltpu.make_async_copy(
                    top_ref.at[b, :, pl.ds(ro, CRB)], sTOP.at[pb],
                    semi.at[pb, G_TOP])]
                for i in STAGED:
                    _, p0, dp, _, age = SRC[i]
                    psel = p0 + jnp.mod(t + 1 - age, dp)
                    cps.append(pltpu.make_async_copy(
                        rng_ref.at[b, psel, pl.ds(ro, CRB)],
                        sRS.at[pb, i], semi.at[pb, 6 + i]))
                    if is_p1:
                        cps.append(pltpu.make_async_copy(
                            snap_ref.at[b, snc_r, psel, pl.ds(ro, CRB)],
                            sSS.at[pb, i], semi.at[pb, 13 + i]))
                cps.append(pltpu.make_async_copy(
                    va_ref.at[b, :, pl.ds(ro, CR)], sVA.at[pb],
                    semi.at[pb, G_VA]))
                return cps

            def stage_trans_start(pb, ro, snc_r):
                for cp in trans_in_descs(pb, ro, snc_r):
                    cp.start()

            def stage_trans_wait(pb, ro, snc_r):
                for cp in trans_in_descs(pb, ro, snc_r):
                    cp.wait()

            def prefetch_next(ci, hi_c, snc_r):
                """Software pipeline: drain the other parity and start
                chunk ci+1's in-copies while chunk ci computes.  Safe:
                ci+1's reads ([ro+CR, ro+CR+CRB)) are disjoint from
                ci's writebacks ([ro, ro+CR)) and ci-1's ([ro-CR, ro));
                the staged ring slots (ages>=2) are never the slot
                retire writes (slot collision freedom, header)."""
                nxt = ci + 1

                @pl.when(nxt < hi_c)
                def _():
                    drain(nxt & 1, snc_r)
                    stage_trans_start(nxt & 1, nxt * CR, snc_r)

            def lb(kind, i, pb, DDb):
                """Masked [CRB,128] source block for SRC[i]."""
                _, p0, dp, top_plane, age = SRC[i]
                s_src = t + 1 - age
                if age == 1:
                    blk = sTOP[pb, top_plane]
                    blo, bhi = t_lo, t_hi
                else:
                    blk = (sSS if kind else sRS)[pb, i]
                    blo = bnd_lo[jnp.mod(s_src, DH)]
                    bhi = bnd_hi[jnp.mod(s_src, DH)]
                if kind and age == 1:
                    blk = sTOP[pb, top_plane + 5]
                return jnp.where((DDb >= blo) & (DDb <= bhi), blk, NEG)

            def trans_block(pb, ro, car):
                """The 5-state transition into score t+1 (+ sf pointer
                propagation in pass 1); returns updated carries."""
                (loq, hiq, cho1, cho2, ce1x, ce2x,
                 csh1, csh2, cse1, cse2) = car
                DDc = DDW + ro * 128
                DDb = anc + ro * 128 + iota2(CRB, 0) * 128 + iota2(CRB, 1)
                ho1b = lb(0, 1, pb, DDb)
                ho2b = lb(0, 2, pb, DDb)
                e1b = lb(0, 3, pb, DDb)
                f1b = lb(0, 4, pb, DDb)
                e2b = lb(0, 5, pb, DDb)
                f2b = lb(0, 6, pb, DDb)
                hxb = lb(0, 0, pb, DDb)
                ho1, ho2 = ho1b[0:CR], ho2b[0:CR]
                src = dict(
                    Hx=hxb[0:CR],
                    Ho1m=shm(ho1, cho1), Ho1p=shp(ho1, ho1b[CR:CR + 1]),
                    Ho2m=shm(ho2, cho2), Ho2p=shp(ho2, ho2b[CR:CR + 1]),
                    E1m=shm(e1b[0:CR], ce1x),
                    F1p=shp(f1b[0:CR], f1b[CR:CR + 1]),
                    E2m=shm(e2b[0:CR], ce2x),
                    F2p=shp(f2b[0:CR], f2b[CR:CR + 1]))
                Hn, E1n, F1n, E2n, F2n, bits = transition_values(src)
                in_new = (DDc >= lo) & (DDc <= hi)
                wH = jnp.where(in_new, Hn, NEG)
                wE1 = jnp.where(in_new, E1n, NEG)
                wF1 = jnp.where(in_new, F1n, NEG)
                wE2 = jnp.where(in_new, E2n, NEG)
                wF2 = jnp.where(in_new, F2n, NEG)
                if is_p1:
                    h1b = lb(1, 1, pb, DDb)
                    h2b = lb(1, 2, pb, DDb)
                    se1b = lb(1, 3, pb, DDb)
                    sf1b = lb(1, 4, pb, DDb)
                    se2b = lb(1, 5, pb, DDb)
                    sf2b = lb(1, 6, pb, DDb)
                    hxs = lb(1, 0, pb, DDb)[0:CR]
                    h1, h2 = h1b[0:CR], h2b[0:CR]
                    e1p = jnp.where(bits & 0x08 != 0,
                                    shm(se1b[0:CR], cse1), shm(h1, csh1))
                    f1p = jnp.where(bits & 0x10 != 0,
                                    shp(sf1b[0:CR], sf1b[CR:CR + 1]),
                                    shp(h1, h1b[CR:CR + 1]))
                    e2p = jnp.where(bits & 0x20 != 0,
                                    shm(se2b[0:CR], cse2), shm(h2, csh2))
                    f2p = jnp.where(bits & 0x40 != 0,
                                    shp(sf2b[0:CR], sf2b[CR:CR + 1]),
                                    shp(h2, h2b[CR:CR + 1]))
                    zsel = bits & 7
                    hp = hxs
                    hp = jnp.where(zsel == 1, e1p, hp)
                    hp = jnp.where(zsel == 2, f1p, hp)
                    hp = jnp.where(zsel == 3, e2p, hp)
                    hp = jnp.where(zsel == 4, f2p, hp)
                    sTOP[pb, S_H, pl.ds(0, CR)] = jnp.where(in_new, hp, NEG)
                    sTOP[pb, S_E1, pl.ds(0, CR)] = \
                        jnp.where(in_new, e1p, NEG)
                    sTOP[pb, S_F1, pl.ds(0, CR)] = \
                        jnp.where(in_new, f1p, NEG)
                    sTOP[pb, S_E2, pl.ds(0, CR)] = \
                        jnp.where(in_new, e2p, NEG)
                    sTOP[pb, S_F2, pl.ds(0, CR)] = \
                        jnp.where(in_new, f2p, NEG)
                    csh1, csh2 = h1b[CR - 1:CR], h2b[CR - 1:CR]
                    cse1, cse2 = se1b[CR - 1:CR], se2b[CR - 1:CR]
                sTOP[pb, T_H, pl.ds(0, CR)] = wH
                sTOP[pb, T_E1, pl.ds(0, CR)] = wE1
                sTOP[pb, T_F1, pl.ds(0, CR)] = wF1
                sTOP[pb, T_E2, pl.ds(0, CR)] = wE2
                sTOP[pb, T_F2, pl.ds(0, CR)] = wF2
                viable = jnp.zeros((CR, 128), bool)
                for v in (wH, wE1, wF1, wE2, wF2):
                    viable |= v >= -1
                loq = loq | jnp.any(viable & (DDc == lo)).astype(jnp.int32)
                hiq = hiq | jnp.any(viable & (DDc == hi)).astype(jnp.int32)
                return (loq, hiq,
                        ho1b[CR - 1:CR], ho2b[CR - 1:CR],
                        e1b[CR - 1:CR], e2b[CR - 1:CR],
                        csh1, csh2, cse1, cse2)

            neg_row = jnp.full((1, 128), NEG, jnp.int32)
            car0 = (z32, z32, neg_row, neg_row, neg_row, neg_row,
                    neg_row, neg_row, neg_row, neg_row)

            # --- fused retire + transition sweep (score mode and
            # non-snapshot pass-1 cycles), software-pipelined: chunk
            # ci+1's in-DMAs fly while chunk ci computes
            def fused_chunk(ci, car):
                pb = ci & 1
                ro = ci * CR
                stage_trans_wait(pb, ro, snc)
                prefetch_next(ci, s1c, snc)
                DDc = DDW + ro * 128
                in_top = (DDc >= t_lo) & (DDc <= t_hi)
                outs = retire_block(pb, ro, in_top, DDc)
                car = trans_block(pb, ro, car)
                for g in outs + [G_TOP]:
                    start_out(g, pb, ro, snc)
                return car

            def run_fused():
                @pl.when(s0c < s1c)
                def _():
                    drain(s0c & 1, snc)
                    stage_trans_start(s0c & 1, s0c * CR, snc)

                return lax.fori_loop(s0c, s1c, fused_chunk, car0)

            if not is_p1:
                car = run_fused()
                loqv, hiqv = car[0], car[1]
            else:
                # --- pass 1: snapshot cycles serialize the sf rings
                # between retire and transition (miniwfa.c:585-587) and
                # run split retire | snapshot | transition sweeps; every
                # other cycle (step-1 of every step) uses the SAME fused
                # sweep as score mode — retire writes ring/snapshot slot
                # t mod depth, which the transition never reads (ages
                # >= 2 map to other slots; age 1 bypasses to the tops)
                @pl.when(~snap_now)
                def _():
                    carf = run_fused()
                    cs[2] = carf[0]
                    cs[3] = carf[1]

                def ret_in_descs(pb, ro):
                    return [pltpu.make_async_copy(
                        top_ref.at[b, :, pl.ds(ro, CRB)], sTOP.at[pb],
                        semi.at[pb, G_TOP]),
                        pltpu.make_async_copy(
                        va_ref.at[b, :, pl.ds(ro, CR)], sVA.at[pb],
                        semi.at[pb, G_VA])]

                @pl.when(snap_now)
                def _():
                    @pl.when(s0c < s1c)
                    def _():
                        drain(s0c & 1, snc)
                        for cp in ret_in_descs(s0c & 1, s0c * CR):
                            cp.start()

                    def ret_chunk(ci, car_):
                        pb = ci & 1
                        ro = ci * CR
                        for cp in ret_in_descs(pb, ro):
                            cp.wait()
                        nxt = ci + 1

                        @pl.when(nxt < s1c)
                        def _():
                            drain(nxt & 1, snc)
                            for cp in ret_in_descs(nxt & 1, nxt * CR):
                                cp.start()

                        DDc = DDW + ro * 128
                        in_top = (DDc >= t_lo) & (DDc <= t_hi)
                        outs = retire_block(pb, ro, in_top, DDc)
                        for g in outs:
                            start_out(g, pb, ro, snc)
                        return car_

                    lax.fori_loop(s0c, s1c, ret_chunk, 0)
                    drain(0, snc)
                    drain(1, snc)

                    # snapshot boundary: row snc is frozen in place (it IS
                    # the serialization); seed row snc+1 with fresh flat
                    # indices over every ring slot's slice band, and reset
                    # the sf TOP registers to the frozen row's score-t slot
                    # indices (the v3 kernel's ring-reset + top-refresh,
                    # wavefront_kernel.py snapshot block) — rare: one sweep
                    # per `step` cycles
                    @pl.when(snap_now)
                    def _():
                        def mm(j, c):
                            mn, mx = c
                            ok = bnd_lo[j] <= bnd_hi[j]
                            mn = jnp.where(ok, jnp.minimum(mn, bnd_lo[j]), mn)
                            mx = jnp.where(ok, jnp.maximum(mx, bnd_hi[j]), mx)
                            return mn, mx

                        mn, mx = lax.fori_loop(0, DH, mm, (t_lo, t_hi))
                        f0, f1 = chunk_range(mn, mx, False)

                        def fresh_chunk(ci, _):
                            ro = ci * CR
                            DDc = DDW + ro * 128
                            w_idx = (ro + iota2(CR, 0)) * 128 + iota2(CR, 1)
                            for p0, dp in RET:
                                for j in range(dp):
                                    s_j = t - jnp.mod(t - j, dp)
                                    in_b = (s_j >= 0) \
                                        & (DDc >= bnd_lo[jnp.mod(s_j, DH)]) \
                                        & (DDc <= bnd_hi[jnp.mod(s_j, DH)])
                                    sFR[p0 + j] = jnp.where(
                                        in_b, (p0 + j) * WPT + w_idx, NEG)
                            in_t = (DDc >= t_lo) & (DDc <= t_hi)
                            for k, (p0, dp) in enumerate(RET):
                                sST[0, k] = jnp.where(
                                    in_t, (p0 + t % dp) * WPT + w_idx, NEG)
                            cpf = pltpu.make_async_copy(
                                sFR, snap_ref.at[b, snc + 1, :,
                                                 pl.ds(ro, CR)],
                                semo.at[0, 16])
                            cpt_ = pltpu.make_async_copy(
                                sST.at[0], top_ref.at[b, 5:10, pl.ds(ro, CR)],
                                semo.at[0, 17])
                            cpf.start()
                            cpt_.start()
                            cpf.wait()
                            cpt_.wait()
                            return 0

                        lax.fori_loop(f0, f1, fresh_chunk, 0)

                    @pl.when(s0c < s1c)
                    def _():
                        drain(s0c & 1, snc2)
                        stage_trans_start(s0c & 1, s0c * CR, snc2)

                    def trans_chunk(ci, car):
                        pb = ci & 1
                        ro = ci * CR
                        stage_trans_wait(pb, ro, snc2)
                        prefetch_next(ci, s1c, snc2)
                        car = trans_block(pb, ro, car)
                        start_out(G_TOP, pb, ro, snc2)
                        return car

                    carf = lax.fori_loop(s0c, s1c, trans_chunk, car0)
                    cs[2] = carf[0]
                    cs[3] = carf[1]

                loqv, hiqv = cs[2], cs[3]
            drain(0, snc2)
            drain(1, snc2)
            lo_ok, hi_ok = loqv != 0, hiqv != 0

            wf_lo = jnp.where(act & lo_ok, lo, wf_lo)
            wf_hi = jnp.where(act & hi_ok, hi, wf_hi)
            t_lo = jnp.where(act, lo, t_lo)
            t_hi = jnp.where(act, hi, t_hi)

            # --- 6. periodic shrink every 256 cycles (miniwfa.c:420)
            sh_due = act & (((t + 1) & 0xFF) == 0)
            g0c, g1c = chunk_range(wf_lo, wf_hi, ~sh_due)

            def shr_chunk(ci, car_):
                has_a, mn_a, mx_a = car_
                pb = ci & 1
                ro = ci * CR
                drain(pb, snc2)
                cpt = pltpu.make_async_copy(
                    top_ref.at[b, :, pl.ds(ro, CRB)], sTOP.at[pb],
                    semi.at[pb, G_TOP])
                cpv = pltpu.make_async_copy(
                    va_ref.at[b, :, pl.ds(ro, CR)], sVA.at[pb],
                    semi.at[pb, G_VA])
                cpt.start()
                cpv.start()
                cpt.wait()
                cpv.wait()
                DDc = DDW + ro * 128
                viable = jnp.zeros((CR, 128), bool)
                for p in range(5):
                    viable |= sTOP[pb, p, pl.ds(0, CR)] >= -1
                good = viable & (DDc >= t_lo) & (DDc <= t_hi)
                good |= (sVA[pb, 0] & ((1 << (NS - 1)) - 1)) != 0
                good &= (DDc >= wf_lo) & (DDc <= wf_hi)
                has_a = has_a | jnp.any(good).astype(jnp.int32)
                mn_a = jnp.minimum(mn_a, jnp.min(jnp.where(good, DDc, BIG)))
                mx_a = jnp.maximum(mx_a, jnp.max(jnp.where(good, DDc, -BIG)))
                return has_a, mn_a, mx_a

            has_i, new_lo, new_hi = lax.fori_loop(
                g0c, g1c, shr_chunk, (z32, jnp.int32(BIG), jnp.int32(-BIG)))
            shrink = sh_due & (has_i != 0)
            wf_lo = jnp.where(shrink, new_lo, wf_lo)
            wf_hi = jnp.where(shrink, new_hi, wf_hi)

            # --- 7. accounting + early stop (miniwfa.c:421-425)
            n_lo = n_lo + jnp.where(act, width, 0)
            n_hi = n_hi + (n_lo >> 30)
            n_lo = n_lo & 0x3FFFFFFF
            # runtime early-stop bounds (miniwfa.c:422-425); 0 = unbounded
            stop = ((mi_lo | mi_hi_b) > 0) \
                & ((n_hi > mi_hi_b) | ((n_hi == mi_hi_b) & (n_lo > mi_lo)))
            stop |= (max_s > 0) & (t + 1 > max_s)
            stopped = stopped | (act & stop)
            return (t + 1, wf_lo, wf_hi, t_lo, t_hi,
                    done.astype(jnp.int32), stopped.astype(jnp.int32),
                    ovf.astype(jnp.int32), final_s, n_lo, n_hi, lp, snc2)

        def cond(carry):
            t, done, stopped, ovf = carry[0], carry[5], carry[6], carry[7]
            return (done + stopped + ovf == 0) & (t < spec.S_CAP - 1) \
                & (t < t_lim)

        def rcol(col, dflt):
            return jnp.where(resume != 0, scal_ref[b, col],
                             jnp.int32(dflt))

        z = jnp.int32(0)
        carry = (rcol(RS_T, 0), rcol(RS_WLO, 0), rcol(RS_WHI, 0),
                 rcol(RS_TLO, 0), rcol(RS_THI, 0), z, z, z,
                 jnp.int32(-1), rcol(RS_NLO, 0), rcol(RS_NHI, 0),
                 rcol(RS_LP, WF_NEG_INF), rcol(RS_SNC, 0))
        carry = lax.while_loop(cond, cycle, carry)
        (t, wf_lo, wf_hi, t_lo, t_hi, done_i, stopped_i, ovf_i,
         final_s, n_lo, n_hi, lp, snc) = carry
        done, stopped, ovf = done_i != 0, stopped_i != 0, ovf_i != 0
        alive = ~(done | stopped | ovf)
        out_ref[b, O_S] = final_s
        out_ref[b, O_DONE] = done.astype(jnp.int32)
        out_ref[b, O_STOP] = stopped.astype(jnp.int32)
        out_ref[b, O_OVFB] = ovf.astype(jnp.int32)
        # S_CAP genuinely exhausted vs paused on this call's budget
        out_ref[b, O_OVFS] = \
            (alive & (t >= spec.S_CAP - 1)).astype(jnp.int32)
        out_ref[b, O_LS] = 0
        out_ref[b, O_NLO] = n_lo
        out_ref[b, O_NHI] = n_hi
        out_ref[b, O_LP] = lp
        out_ref[b, O_SNC] = snc
        out_ref[b, OW_T] = t
        out_ref[b, OW_WLO] = wf_lo
        out_ref[b, OW_WHI] = wf_hi
        out_ref[b, OW_TLO] = t_lo
        out_ref[b, OW_THI] = t_hi
        out_ref[b, OW_PAUSE] = \
            (alive & (t < spec.S_CAP - 1)).astype(jnp.int32)
        for j in range(DH):
            out_ref[b, OW_BND + j] = bnd_lo[j]
            out_ref[b, OW_BND + DH + j] = bnd_hi[j]

    # ---- pallas_call plumbing.  State buffers (ring/top/es/va[/snap])
    # are inputs ALIASED to the corresponding outputs: a resumed call
    # continues in the previous call's HBM planes in place.
    out_shapes = [
        jax.ShapeDtypeStruct((spec.B, out_width(spec)), jnp.int32),
        jax.ShapeDtypeStruct((spec.B, NRING, WRT, 128), jnp.int32),
        jax.ShapeDtypeStruct((spec.B, NTOP, WRT, 128), jnp.int32),
        jax.ShapeDtypeStruct((spec.B, 6, WRT, 128), jnp.int32),
        jax.ShapeDtypeStruct((spec.B, 2, WRT, 128), jnp.int32),
    ]
    out_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + \
        [pl.BlockSpec(memory_space=pl.ANY)] * 4
    if is_p1:
        out_shapes.append(jax.ShapeDtypeStruct(
            (spec.B, spec.n_snap + 1, NRING, WRT, 128), jnp.int32))
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    n_state = 5 if is_p1 else 4

    scratch = [
        pltpu.VMEM((2, NTOP, CRB, 128), jnp.int32),    # sTOP
        pltpu.VMEM((2, 7, CRB, 128), jnp.int32),       # sRS (ring sources)
        pltpu.VMEM((2, 5, CR, 128), jnp.int32),        # sRT (ring retire)
        pltpu.VMEM((2, 7, CRB, 128), jnp.int32)
        if is_p1 else pltpu.VMEM((1, 1, 8, 128), jnp.int32),   # sSS
        pltpu.VMEM((2, 5, CR, 128), jnp.int32)
        if is_p1 else pltpu.VMEM((1, 1, 8, 128), jnp.int32),   # sST
        pltpu.VMEM((2, 6, CR, 128), jnp.int32),        # sES
        pltpu.VMEM((2, 2, CR, 128), jnp.int32),        # sVA
        pltpu.VMEM((NRING, CR, 128), jnp.int32)
        if is_p1 else pltpu.VMEM((1, 8, 128), jnp.int32),      # sFR
        pltpu.VMEM((NTAB, NTAB), jnp.int32),           # twtv
        pltpu.VMEM((NTAB, NTAB), jnp.int32),           # twqv
        pltpu.VMEM((NTAB, NTAB), jnp.int32),           # wtmp
        pltpu.SemaphoreType.DMA((2, NSEM)),            # semi
        pltpu.SemaphoreType.DMA((2, NSEM)),            # semo
        pltpu.SMEM((2,), jnp.int32),                   # pend
        pltpu.SMEM((4,), jnp.int32),                   # cs (+ p1 loq/hiq carry)
        pltpu.SMEM((DH,), jnp.int32),                  # bnd_lo
        pltpu.SMEM((DH,), jnp.int32),                  # bnd_hi
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(spec.B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (2 + n_state),
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )
    # flat input order: scal(0), twt(1), twq(2), state(3..); state input
    # i aliases output 1+i (output 0 is the SMEM scalar row)
    aliases = {3 + i: 1 + i for i in range(n_state)}

    def call(scal, twt, twq, *state, interpret=False):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=tuple(out_shapes),
            input_output_aliases=aliases,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(scal, twt, twq, *state)

    return call


@functools.lru_cache(maxsize=16)
def _get_call(spec: WSpec, interpret: bool = False):
    """Raw resumable call: (scal, twt, twq, *state) -> (out, *state').
    State buffers are donated (they alias the outputs in-kernel)."""
    call = build_kernel_wide(spec)
    n_state = 5 if spec.mode == MODE_PASS1 else 4

    def f(scal, twt, twq, *state):
        return call(scal, twt, twq, *state, interpret=interpret)

    if interpret:
        return f
    return jax.jit(f, donate_argnums=tuple(range(3, 3 + n_state)))


def _zero_state(spec: WSpec):
    NRING = snapshot_layout(spec.kspec())[5]
    WRT = spec.WR + 8
    NTOP = 10 if spec.mode == MODE_PASS1 else 5
    st = [jnp.zeros((spec.B, NRING, WRT, 128), jnp.int32),
          jnp.zeros((spec.B, NTOP, WRT, 128), jnp.int32),
          jnp.zeros((spec.B, 6, WRT, 128), jnp.int32),
          jnp.zeros((spec.B, 2, WRT, 128), jnp.int32)]
    if spec.mode == MODE_PASS1:
        st.append(jnp.zeros(
            (spec.B, spec.n_snap + 1, NRING, WRT, 128), jnp.int32))
    return st


def _pad_scal(spec: WSpec, scal) -> np.ndarray:
    """Widen a (B, >=3) tl/ql/anc scal to the full resume-column layout
    with fresh-run defaults (RS_FLAG=0, RS_LIM=S_CAP)."""
    scal = np.asarray(scal, np.int32)
    if scal.shape[1] >= scal_width(spec):
        return scal
    full = np.zeros((spec.B, scal_width(spec)), np.int32)
    full[:, :scal.shape[1]] = scal
    full[:, RS_LIM] = spec.S_CAP
    return full


def _res_dict(spec: WSpec, o: np.ndarray, snap) -> dict:
    res = dict(
        final_s=o[:, O_S], done=o[:, O_DONE] != 0,
        stopped=o[:, O_STOP] != 0, ovf_band=o[:, O_OVFB] != 0,
        ovf_scap=o[:, O_OVFS] != 0,
        overflow=(o[:, O_OVFB] != 0) | (o[:, O_OVFS] != 0),
        last_state=o[:, O_LS], n_iter_lo=o[:, O_NLO],
        n_iter_hi=o[:, O_NHI])
    if spec.mode == MODE_PASS1:
        # NO host-level reshape: at 5 Mb scale the snapshot buffer is
        # ~8 GB and an eager reshape materializes a second copy (OOM);
        # consumers flatten the trailing dims inside their own jit
        # (free bitcast) or in numpy after fetching a row
        res["snap"] = snap
        res["snap_cnt"] = o[:, O_SNC]
        res["last_ptr"] = o[:, O_LP]
    return res


def get_kernel_wide(spec: WSpec, interpret: bool = False):
    """Single-call wide-band aligner (fresh run, full cycle budget);
    same output contract as the VMEM engine's SCORE/PASS1 modes.  On the
    tunnelled TPU prefer run_chunked — one call over ~1 min of device
    time trips the worker watchdog."""
    call = _get_call(spec, interpret)

    def run(scal, twt, twq):
        outs = call(jnp.asarray(_pad_scal(spec, scal)), twt, twq,
                    *_zero_state(spec))
        o = np.asarray(outs[0])
        return _res_dict(spec, o, outs[5] if spec.mode == MODE_PASS1
                         else None)

    return run


def run_chunked(spec: WSpec, scal, twt, twq, interpret: bool = False,
                budget_cells: float = 0.0, budget_cycles: int = 0,
                max_s: int = 0, max_iter: int = 0) -> dict:
    """Resumable host loop: dispatch the alignment in bounded score
    chunks so no single device call outlives the worker watchdog (see
    the RS_* protocol notes above).  Per-call budgets are split across
    the lanes still live (grid lanes run sequentially); the cycle limit
    for a lane at score t with cell budget c is sqrt(t^2 + c) — the band
    grows ~2 diagonals/cycle, so cells(t0->t1) ~ t1^2 - t0^2."""
    no_watchdog = interpret or jax.default_backend() != "tpu"
    # pass 1 moves ~2x the bytes per cell (sf shadow staging + split
    # retire/transition sweeps): halve its per-call cell budget
    dflt_cells = 5.0e9 if spec.mode == MODE_PASS1 else 1.0e10
    budget_cells = budget_cells or (
        (1 << 60) if no_watchdog else float(
            os.environ.get("MWF_WIDE_CELLS_PER_CALL", dflt_cells)))
    budget_cycles = budget_cycles or (
        (1 << 60) if no_watchdog else int(
            os.environ.get("MWF_WIDE_CYCLES_PER_CALL", 49152)))
    fn = _get_call(spec, interpret)
    DH = _ring_dh(spec)
    full = _pad_scal(spec, scal)
    if max_s or max_iter:
        # runtime early-stop bounds (not WSpec fields — compile sharing)
        full[:, RS_MS] = max_s
        full[:, RS_MILO] = max_iter & 0x3FFFFFFF
        full[:, RS_MIHI] = max_iter >> 30
    state = _zero_state(spec)
    live = np.ones(spec.B, bool)
    final = np.zeros((spec.B, out_width(spec)), np.int32)
    snap_budget = int(os.environ.get("MWF_WIDE_SNAP_GB", "8")) << 30
    while True:
        n_act = max(1, int(live.sum()))
        cyc = max(1, int(budget_cycles) // n_act)
        cells = budget_cells / n_act
        t_now = full[:, RS_T].astype(np.int64)
        t_lim = t_now + np.maximum(
            1, np.minimum(cyc, (np.sqrt(t_now.astype(np.float64) ** 2
                                        + cells) - t_now) + 1
                          ).astype(np.int64))
        full[:, RS_LIM] = np.where(
            live, np.minimum(t_lim, spec.S_CAP), 0).astype(np.int32)
        if spec.mode == MODE_PASS1 and not no_watchdog and spec.step:
            # grow the snapshot buffer ahead of need (pause boundaries
            # let the buffer start small — ~60 rows covers the 5 Mb
            # headline — instead of allocating S_CAP/step rows upfront)
            per_call = int((np.where(live, t_lim, t_now) - t_now).max())
            need = int(full[live, RS_SNC].max(initial=0)) \
                + per_call // spec.step + 3
            if need > spec.n_snap:
                import dataclasses
                NRING = snapshot_layout(spec.kspec())[5]
                WRT = spec.WR + 8
                row_b = NRING * WRT * 128 * 4
                # the grow step concatenates, transiently holding BOTH
                # the old (n_snap+1 rows) and new (n2+1 rows) buffers per
                # lane — budget the transient peak, not just the new size
                n_max = snap_budget // (spec.B * row_b) - spec.n_snap - 2
                n2 = min(max(need, spec.n_snap * 3 // 2), max(n_max, 0))
                if n2 < need:
                    raise RuntimeError(
                        f"low-mem snapshot buffer grow to "
                        f"{(need + 1) * row_b / 2**30:.1f} GiB/lane "
                        f"(transient peak {(need + 2 + spec.n_snap) * spec.B * row_b / 2**30:.1f} GiB) at "
                        f"step={spec.step}, W={spec.W} exceeds the "
                        f"{snap_budget/2**30:.0f} GiB budget — use a "
                        f"larger step or the chain mode")
                pad = jnp.zeros((spec.B, n2 - spec.n_snap, NRING, WRT,
                                 128), jnp.int32)
                state[4] = jnp.concatenate([state[4], pad], axis=1)
                spec = dataclasses.replace(spec, n_snap=n2)
                fn = _get_call(spec, interpret)
        from ..utils import hbm
        hbm.note_arrays(
            f"wide-planes mode={spec.mode} B={spec.B} W={spec.W} "
            f"n_snap={spec.n_snap}", state, twt, twq)
        outs = fn(jnp.asarray(full), twt, twq, *state)
        o = np.asarray(outs[0])
        state = list(outs[1:])
        if os.environ.get("MWF_WIDE_DEBUG"):
            for b2 in np.nonzero(live)[0]:
                print(f"[wide b{b2}] t={o[b2, OW_T]} lim={full[b2, RS_LIM]} "
                      f"done={o[b2, O_DONE]} pause={o[b2, OW_PAUSE]} "
                      f"ovfb={o[b2, O_OVFB]} ovfs={o[b2, O_OVFS]} "
                      f"s={o[b2, O_S]} wf=[{o[b2, OW_WLO]},{o[b2, OW_WHI]}] "
                      f"snc={o[b2, O_SNC]}", flush=True)
        final[live] = o[live]
        live = live & (o[:, OW_PAUSE] != 0)
        if not live.any():
            break
        full[:, RS_FLAG] = 1
        for col_in, col_out in ((RS_T, OW_T), (RS_WLO, OW_WLO),
                                (RS_WHI, OW_WHI), (RS_TLO, OW_TLO),
                                (RS_THI, OW_THI), (RS_NLO, O_NLO),
                                (RS_NHI, O_NHI), (RS_LP, O_LP),
                                (RS_SNC, O_SNC)):
            full[:, col_in] = o[:, col_out]
        full[:, RS_BND:RS_BND + 2 * DH] = o[:, OW_BND:OW_BND + 2 * DH]
    snap = state[4] if spec.mode == MODE_PASS1 else None
    del state, outs   # free the ring/top/window planes before decode
    return _res_dict(spec, final, snap)
