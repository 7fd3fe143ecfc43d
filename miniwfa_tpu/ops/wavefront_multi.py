"""Multi-lane co-resident fused-cycle WFA engine: G alignments per grid
step.

The single-lane fused kernel (ops/wavefront_kernel.py) is latency-bound:
a wavefront cycle costs ~6-9 us of serial stage latency (band sweep ->
probe -> straggler rounds -> retire -> transition) regardless of how few
cells the band holds, and grid lanes run SEQUENTIALLY, so a 16-pair
batch pays 16x the per-cycle latency (ROOFLINE.md §5 conceded this
axis).  This engine packs G lanes' whole DP states into one grid step —
every VMEM plane gains a leading G dimension ([G, WR+8, 128] windows,
[depth, G, WR+8, 128] rings) — so ONE pass through the cycle's serial
stages advances G alignments: the dense phases widen (VPU throughput is
~1% utilized, ROOFLINE.md §1 — free), the probe gathers run on
flattened [G*R, 128] blocks, and the straggler while-rounds are SHARED
(the round count becomes the max over lanes instead of the sum).

Semantics are identical to the single-lane kernel (reference
mwf_wfa_core, miniwfa.c:380-435, every '>=' tie-break of wf_next_tb,
miniwfa.c:287-307): per-lane band registers, termination, n_iter,
shrink, escalation flags are G-tuples of TRACED SCALARS in the
while-loop carry — exactly the single-lane design, replicated per lane.
Lanes terminate independently (a finished lane freezes: its effective
bands go empty so every vector mask excludes it, while the shared cycle
loop runs on for the others); the driver buckets similar pairs per
group.

Modes: SCORE and TB (with pass-2 checkpoint collapse).  PASS1 stays on
the single-lane kernel — its sf shadow rings double the VMEM and
co-residency cannot fit.

Mosaic lowering rules this file is built around (probed on v5e,
tools/microbench_multi_probe*.py; violations die with
"Not implemented: Lane broadcast" or compiler aborts):
  * PER-LANE CONTROL FLOW MUST BE SCALARS.  [G,1,1]-shaped selects with
    scalar branches, bool [G,1,1].astype, and scalar-bool & vector-mask
    broadcasts all fail to lower.  Band registers, done flags, n_iter,
    checkpoint ids etc. are G-tuples of traced scalars; per-lane gating
    reaches the vector world only by EMPTYING that lane's effective
    band (lo=BIG, hi=-BIG) so plain range masks exclude it.
  * [G,1,1] vectors are built from scalars via an [8,128] VMEM registry
    plane (write row g, read [0:G,0:1].reshape(G,1,1)) — never
    jnp.full/concat of traced scalars.
  * int arithmetic/compare of [G,1,1] against [G,R,128] broadcasts
    fine; materialized-vector selects (b2i) lower fine; scalar
    extraction v[g,0,0] of int vectors works (bools don't).
  * gathers are 2D-only: [G,R,128] blocks flatten to [G*R,128] for
    take_along_axis, then reshape back (free relayout);
  * axis=(1,2) reductions SIGABRT the compiler: every per-lane
    reduction is two-step (axis=2 then axis=1, keepdims);
  * 4D ring scratch with a dynamic leading index and a pl.ds middle-dim
    slice reads/writes cleanly.
"""

from __future__ import annotations

import functools
import os as _os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wavefront_kernel import (
    WF_NEG_INF, MODE_SCORE, MODE_TB, NTAB, SEGSTRIDE, NSLOT, MAXR_SAFETY,
    SC_TL, SC_QL, SC_ANC, SC_NSEG, SC_MS, SC_MILO, SC_MIHI, SC_SEG,
    O_S, O_DONE, O_STOP, O_OVFB, O_OVFS, O_LS, O_NLO, O_NHI, O_LP, O_SNC,
    O_N, _env_subprobes)


@dataclass(frozen=True)
class MSpec:
    """Static configuration of the multi-lane fused kernel."""

    B: int           # total lanes (multiple of G; grid = B // G steps)
    G: int           # co-resident lanes per grid step
    WR: int          # band rows PER LANE; W = WR * 128 diagonals
    S_CAP: int
    x: int
    o1: int
    e1: int
    o2: int
    e2: int
    mode: int = MODE_SCORE
    cpw: int = 16
    seg_cap: int = 1
    use_seg: bool = False
    nseg: int = 1
    cr: int = 8
    subprobes: int = field(default_factory=_env_subprobes)

    @property
    def W(self) -> int:
        return self.WR * 128

    @property
    def NS(self) -> int:
        return max(self.x, self.o1 + self.e1, self.o2 + self.e2) + 1

    @property
    def CR(self) -> int:
        c = min(self.cr, self.WR, NTAB)
        if c % 4 or self.WR % c:
            c = 8
        return c


def _ages(spec):
    return dict(x=spec.x, o1=spec.o1 + spec.e1, o2=spec.o2 + spec.e2,
                e1=spec.e1, e2=spec.e2)


def vmem_bytes(spec: MSpec) -> int:
    """Estimated VMEM scratch footprint (driver uses this to pick G)."""
    ages = _ages(spec)
    DH = max(ages["x"], ages["o1"], ages["o2"])
    DE1 = max(ages["e1"], 1)
    DE2 = max(ages["e2"], 1)
    G, WRP, WR, CR = spec.G, spec.WR + 8, spec.WR, spec.CR
    pl_b = 128 * 4
    n = (DH + 2 * DE1 + 2 * DE2) * G * WRP          # rings
    n += 5 * G * WRP                                 # tops
    n += 2 * G * WRP                                 # vb, lastt
    n += 4 * G * WR                                  # probe windows
    n += 2 * G * WR                                  # baT, baQ
    if spec.mode == MODE_TB:
        n += G * WR                                  # pbits
        n += NSLOT * G * (CR // 4)                   # tb DMA slots
    n += 2 * G * NTAB                                # resident segments
    n += NTAB                                        # wtmp
    n += G * CR                                      # sun
    n += 2 * DH * 8 + 8                              # bnd planes, registry
    return n * pl_b


def build_kernel(spec: MSpec):
    """Build the pallas_call wrapper: fn(scal, twt, twq) ->
    (out_scal [B, O_N], tb [B, S_CAP, WR//4, 128] int32 if TB mode) —
    the same input/output contract as the single-lane kernel, so the
    driver, escalation ladder and traceback walker are untouched."""
    G, WR, W = spec.G, spec.WR, spec.W
    WRP = WR + 8
    CR = spec.CR
    CRB = CR + 8
    CR4 = CR // 4
    EXTB = 2
    WR4 = WR // 4
    CPW = spec.cpw
    BITS = 32 // CPW
    LOGC = {16: 4, 4: 2}[CPW]
    LOGB = {16: 1, 4: 3}[CPW]
    NEG = WF_NEG_INF
    BIG = 0x3FFFFFFF
    is_tb = spec.mode == MODE_TB
    ages = _ages(spec)
    DH = max(ages["x"], ages["o1"], ages["o2"])
    DE1 = max(ages["e1"], 1)
    DE2 = max(ages["e2"], 1)
    NS = spec.NS
    nsc = SC_SEG + 2 * spec.seg_cap
    NSEGB = (spec.nseg - 1) * SEGSTRIDE + NTAB
    NCH = WR // CR   # chunks in the window

    _CUT = set(filter(None, _os.environ.get("MWF_MDBG_CUT", "").split(",")))

    def iota3(n, axis):
        return lax.broadcasted_iota(jnp.int32, (G, n, 128), axis)

    def iota2(n, axis):
        return lax.broadcasted_iota(jnp.int32, (n, 128), axis)

    def rmin(a):  # per-lane min -> [G,1,1] (two-step: fused (1,2) aborts)
        return jnp.min(jnp.min(a, axis=2, keepdims=True), axis=1,
                       keepdims=True)

    def rmax(a):
        return jnp.max(jnp.max(a, axis=2, keepdims=True), axis=1,
                       keepdims=True)

    def b2i(b):
        # bool->int32 on [.,.,1]-shaped masks: astype AND a where with
        # two SCALAR branches both lower as an unimplemented "Lane
        # broadcast"; a select between materialized vector constants
        # lowers fine
        return jnp.where(b, jnp.ones(b.shape, jnp.int32),
                         jnp.zeros(b.shape, jnp.int32))

    def rany_i(a):  # bool [G,R,128] -> int32 [G,1,1] (1 if any)
        return rmax(b2i(a))

    def ctz_chars(x):
        u = x.astype(jnp.uint32)
        ctz = lax.population_count(
            jnp.bitwise_and(~u, u - jnp.uint32(1)).astype(jnp.int32))
        return jnp.right_shift(ctz, LOGB)

    def shm(a, prev):
        """Slot w-1 over [G,CR,128]; prev = per-lane previous row
        [G,1,128] (the m-side carry from the preceding chunk)."""
        left = jnp.concatenate(
            [jnp.full((G, CR, 1), NEG, a.dtype), a[:, :, :-1]], 2)
        carry = jnp.concatenate([prev, a[:, :-1, :]], 1)[:, :, 127:128]
        return jnp.where(iota3(CR, 2) == 0, carry, left)

    def shp(a, nxt):
        """Slot w+1; nxt = per-lane following row [G,1,128]."""
        right = jnp.concatenate(
            [a[:, :, 1:], jnp.full((G, CR, 1), NEG, a.dtype)], 2)
        carry = jnp.concatenate([a[:, 1:, :], nxt], 1)[:, :, 0:1]
        return jnp.where(iota3(CR, 2) == 127, carry, right)

    def transition_values(src):
        """5-state dual-affine recurrence + 7-bit tb byte with the exact
        reference tie-breaks (wf_next_tb, miniwfa.c:287-307)."""
        bit08 = src["Ho1m"] < src["E1m"]
        e1 = jnp.maximum(src["Ho1m"], src["E1m"])
        bit20 = src["Ho2m"] < src["E2m"]
        e2 = jnp.maximum(src["Ho2m"], src["E2m"])
        ze = jnp.where(e1 >= e2, 1, 3)
        e = jnp.maximum(e1, e2)
        bit10 = src["Ho1p"] < src["F1p"]
        f1 = jnp.maximum(src["Ho1p"], src["F1p"]) + 1
        bit40 = src["Ho2p"] < src["F2p"]
        f2 = jnp.maximum(src["Ho2p"], src["F2p"]) + 1
        zf = jnp.where(f1 >= f2, 2, 4)
        f = jnp.maximum(f1, f2)
        z = jnp.where(e >= f, ze, zf)
        h = jnp.maximum(e, f)
        hx = src["Hx"] + 1
        z = jnp.where(hx >= h, 0, z)
        H = jnp.maximum(hx, h)
        bits = (bit08.astype(jnp.int32) << 3) | (bit10.astype(jnp.int32) << 4) \
            | (bit20.astype(jnp.int32) << 5) | (bit40.astype(jnp.int32) << 6) | z
        return H, e1, f1, e2, f2, bits

    def kernel(scal_ref,            # SMEM [B, nsc]
               twt_ref, twq_ref,    # HBM [B, nseg, 128, 128]
               out_ref,             # SMEM [B, O_N]
               *refs):
        if is_tb:
            tb_ref = refs[0]
            refs = refs[1:]
        (rH, rE1, rF1, rE2, rF2, vb, lastt,
         tH, tE1, tF1, tE2, tF2,
         wta, wtb, wqa, wqb, baT, baQ,
         pbits, tbrow, sem_tb, dm,
         twtv, twqv, cs, sem2, wtmp, bndlo_v, bndhi_v,
         sun, laneq) = refs[:31]

        gi = pl.program_id(0)
        b0 = gi * G

        # ---- per-lane scalar loads
        tl_s = [scal_ref[b0 + g, SC_TL] for g in range(G)]
        ql_s = [scal_ref[b0 + g, SC_QL] for g in range(G)]
        anc_s = [scal_ref[b0 + g, SC_ANC] for g in range(G)]
        nseg_s = [scal_ref[b0 + g, SC_NSEG] for g in range(G)]
        ms_s = [scal_ref[b0 + g, SC_MS] for g in range(G)]
        milo_s = [scal_ref[b0 + g, SC_MILO] for g in range(G)]
        mihi_s = [scal_ref[b0 + g, SC_MIHI] for g in range(G)]

        def lane_vec(vals):
            """[G,1,1] int vector from G traced scalars, via the registry
            plane (direct full/concat of tiny shapes aborts Mosaic)."""
            for g in range(G):
                laneq[g, :] = jnp.zeros((128,), jnp.int32) + vals[g]
            return laneq[0:G, 0:1].reshape(G, 1, 1)

        tlv = lane_vec(tl_s)
        qlv = lane_vec(ql_s)
        ancv = lane_vec(anc_s)
        d_endv = qlv - tlv
        DDP = ancv + iota3(WRP, 1) * 128 + iota3(WRP, 2)

        # ---- init (scratch persists across grid steps: reset everything)
        for ring, depth in ((rH, DH), (rE1, DE1), (rF1, DE1),
                            (rE2, DE2), (rF2, DE2)):
            for j in range(depth):
                ring[j] = jnp.full((G, WRP, 128), NEG, jnp.int32)
        vb[:] = jnp.zeros((G, WRP, 128), jnp.int32)
        lastt[:] = jnp.zeros((G, WRP, 128), jnp.int32)
        tH[:] = jnp.where(DDP == 0, -1, NEG)   # H[d=0]=-1 (miniwfa.c:119)
        for r in (tE1, tF1, tE2, tF2):
            r[:] = jnp.full((G, WRP, 128), NEG, jnp.int32)
        for r in (wta, wtb, wqa, wqb):
            r[:] = jnp.zeros(r.shape, jnp.int32)
        baT[:] = jnp.full((G, WR, 128), BIG, jnp.int32)
        baQ[:] = jnp.full((G, WR, 128), BIG, jnp.int32)
        pbits[:] = jnp.zeros((G, WR, 128), jnp.int32)
        for j in range(DH):
            for g in range(G):
                bndlo_v[j, g] = jnp.ones((128,), jnp.int32)   # empty band
                bndhi_v[j, g] = jnp.zeros((128,), jnp.int32)
        dm[0] = 0
        dm[1] = 0
        for g in range(G):
            cp0 = pltpu.make_async_copy(twt_ref.at[b0 + g, 0],
                                        twtv.at[g], sem2)
            cp0.start()
            cp0.wait()
            cp1 = pltpu.make_async_copy(twq_ref.at[b0 + g, 0],
                                        twqv.at[g], sem2)
            cp1.start()
            cp1.wait()
            cs[2 * g] = 0
            cs[2 * g + 1] = 0

        def refill(ro, needy, jT, jQ):
            """Re-window rows with out-of-window probes (the single-lane
            kernel's election + segment-rotation rules, per lane)."""
            has = jnp.any(needy, axis=2, keepdims=True)        # [G,CR,1]
            jTn = jnp.where(needy, jT, BIG)
            jminT = jnp.min(jTn, axis=2, keepdims=True)
            elect = needy & (jTn == jminT)
            jminQ = jnp.min(jnp.where(elect, jQ, BIG), axis=2,
                            keepdims=True)
            baTc = baT[:, pl.ds(ro, CR)]
            baQc = baQ[:, pl.ds(ro, CR)]

            def pick(basec, jmin):
                a_new = jnp.clip(jmin >> 7, 0, NSEGB - 1)
                a_cur = jnp.clip(basec[:, :, 0:1] >> 7, 0, NSEGB - 1)
                return jnp.where(has, a_new, a_cur)            # [G,CR,1]

            aT = pick(baTc, jminT)
            aQ = pick(baQc, jminQ)
            if spec.nseg > 1:
                # per-lane global election: BOTH resident segments follow
                # one elected row (cross-side livelock rule).
                # (scalar predicates extract as int32: Mosaic cannot
                # squeeze bool elements to scalars)
                hasl = rany_i(has)                             # [G,1,1]
                gT = rmin(jnp.where(has, aT, NSEGB))
                sel_rows = has & (aT == gT)
                gQ = rmin(jnp.where(sel_rows, aQ, NSEGB))
                segT = jnp.clip(gT // SEGSTRIDE, 0, spec.nseg - 1)
                segQ = jnp.clip(gQ // SEGSTRIDE, 0, spec.nseg - 1)
                for g in range(G):
                    sTg = segT[g, 0, 0]
                    sQg = segQ[g, 0, 0]
                    hg = hasl[g, 0, 0] != 0

                    @pl.when(hg & (sTg != cs[2 * g]))
                    def _(g=g, sTg=sTg):
                        cp = pltpu.make_async_copy(
                            twt_ref.at[b0 + g, sTg], twtv.at[g], sem2)
                        cp.start()
                        cp.wait()
                        cs[2 * g] = sTg

                    @pl.when(hg & (sQg != cs[2 * g + 1]))
                    def _(g=g, sQg=sQg):
                        cp = pltpu.make_async_copy(
                            twq_ref.at[b0 + g, sQg], twqv.at[g], sem2)
                        cp.start()
                        cp.wait()
                        cs[2 * g + 1] = sQg
                cstv = lane_vec([cs[2 * g] for g in range(G)])
                csqv = lane_vec([cs[2 * g + 1] for g in range(G)])
            else:
                cstv = csqv = jnp.zeros((G, 1, 1), jnp.int32)
            resT = (jnp.clip(aT // SEGSTRIDE, 0, spec.nseg - 1) == cstv)
            resQ = (jnp.clip(aQ // SEGSTRIDE, 0, spec.nseg - 1) == csqv)
            mf = has & resT & resQ
            baT[:, pl.ds(ro, CR)] = jnp.broadcast_to(
                jnp.where(mf, aT * 128, baTc[:, :, 0:1]), (G, CR, 128))
            baQ[:, pl.ds(ro, CR)] = jnp.broadcast_to(
                jnp.where(mf, aQ * 128, baQc[:, :, 0:1]), (G, CR, 128))
            aTloc = jnp.clip(aT - cstv * SEGSTRIDE, 0, NTAB - 1)
            aQloc = jnp.clip(aQ - csqv * SEGSTRIDE, 0, NTAB - 1)
            anyg = rany_i(has)

            def lanes(a):   # [CR,1] block ids -> [NTAB,1] padded
                if CR == NTAB:
                    return a
                return jnp.concatenate(
                    [a, jnp.zeros((NTAB - CR, 1), jnp.int32)], 0)

            for g in range(G):
                @pl.when(anyg[g, 0, 0] != 0)
                def _(g=g):
                    # per-lane 2D fill, identical to the single-lane
                    # kernel (transpose/gather rules are 2D-only)
                    mrow = jnp.broadcast_to(mf[g], (CR, 128))
                    aTl, aQl = lanes(aTloc[g]), lanes(aQloc[g])
                    idxT = jnp.broadcast_to(aTl.T, (NTAB, NTAB))
                    idxQ = jnp.broadcast_to(aQl.T, (NTAB, NTAB))
                    idxT1 = jnp.broadcast_to(
                        jnp.minimum(aTl + 1, NTAB - 1).T, (NTAB, NTAB))
                    idxQ1 = jnp.broadcast_to(
                        jnp.minimum(aQl + 1, NTAB - 1).T, (NTAB, NTAB))
                    twt = twtv[g]
                    twq = twqv[g]

                    def fill(win_ref, tw, idx):
                        g0 = jnp.take_along_axis(tw[0:64], idx[0:64],
                                                 axis=1)
                        g1 = jnp.take_along_axis(tw[64:128], idx[64:128],
                                                 axis=1)
                        wtmp[:] = jnp.concatenate([g0, g1], 0).T
                        win_ref[g, pl.ds(ro, CR)] = jnp.where(
                            mrow, wtmp[0:CR], win_ref[g, pl.ds(ro, CR)])

                    fill(wta, twt, idxT)
                    fill(wqa, twq, idxQ)
                    fill(wtb, twt, idxT1)
                    fill(wqb, twq, idxQ1)

        def gather_lanewise(blk, idx):
            """take_along_axis along the last axis of [G,R,128] values
            via the 2D flatten (Mosaic gathers are 2D-only)."""
            R = blk.shape[1]
            g2 = jnp.take_along_axis(blk.reshape(G * R, 128),
                                     idx.reshape(G * R, 128), axis=1)
            return g2.reshape(G, R, 128)

        def probe_side(wa, wb, base, pos):
            """Probe word at char ``pos`` from loaded window VALUES
            (wa/wb/base/pos all [G,R,128])."""
            j = jnp.right_shift(pos, LOGC)
            c = j - base
            in_win = (c >= 0) & (c < EXTB * NTAB)
            cc = jnp.clip(c, 0, 2 * NTAB - 1)
            ca = jnp.minimum(cc, NTAB - 1)
            cb = jnp.clip(cc - NTAB, 0, NTAB - 1)
            ga = gather_lanewise(wa, ca)
            gb = gather_lanewise(wb, cb)
            w0 = jnp.where(cc < NTAB, ga, gb)
            off = jnp.bitwise_and(pos, CPW - 1)
            chars = jnp.right_shift(w0.astype(jnp.uint32),
                                    (off * BITS).astype(jnp.uint32))
            return chars, CPW - off, in_win, j

        def probe_once(wins, DDw, k, un):
            """One probe over loaded windows; wins = (wtaV, wtbV, wqaV,
            wqbV, baTV, baQV) values of matching [G,R,128] shape."""
            wtaV, wtbV, wqaV, wqbV, baTV, baQV = wins
            pos_t = k + 1
            pos_q = DDw + k + 1
            cht, nvt, inwt, jT = probe_side(wtaV, wtbV, baTV, pos_t)
            chq, nvq, inwq, jQ = probe_side(wqaV, wqbV, baQV, pos_q)
            inw = inwt & inwq
            nv = jnp.minimum(nvt, nvq)
            x = jnp.bitwise_xor(cht, chq).astype(jnp.int32)
            shv = (nv * BITS).astype(jnp.uint32)
            tail = jnp.where(nv >= CPW, jnp.uint32(0),
                             jnp.left_shift(jnp.uint32(0xFFFFFFFF), shv))
            xf = x | tail.astype(jnp.int32)
            run = jnp.where(xf == 0, nv, ctz_chars(xf))
            cap = jnp.minimum(tlv - 1 - k, qlv - 1 - (DDw + k))
            cap = jnp.maximum(cap, 0)
            adv = jnp.minimum(run, cap)
            act = un & inw
            k = jnp.where(act, k + adv, k)
            resolved = act & ((run < nv) | (adv >= cap))
            return k, un & ~resolved

        SR = 8   # straggler sub-window rows

        # length-derived straggler round cap (scalar max over lanes)
        maxtl = tl_s[0]
        for g in range(1, G):
            maxtl = jnp.maximum(maxtl, tl_s[g])
        maxr = jnp.minimum(jnp.int32(MAXR_SAFETY), maxtl // 4 + 8192)

        def extend(ro, DDc, k, elig):
            """Chunk LCP extension over [G,CR,128] (miniwfa.c:212-226
            semantics); two phases like the single-lane kernel, with the
            straggler while-rounds SHARED across lanes (each round probes
            one SR-row sub-window PER LANE; the round count is the max
            over lanes, not the sum).  Returns (k, stuck [G,1,1] int)."""
            if _os.environ.get("MWF_KDBG_NOEXT"):
                return k, jnp.zeros((G, 1, 1), jnp.int32)
            unroll = int(_os.environ.get("MWF_EXT_UNROLL", "3"))

            wins = (wta[:, pl.ds(ro, CR)], wtb[:, pl.ds(ro, CR)],
                    wqa[:, pl.ds(ro, CR)], wqb[:, pl.ds(ro, CR)],
                    baT[:, pl.ds(ro, CR)], baQ[:, pl.ds(ro, CR)])
            un = elig
            for _ in range(unroll):
                k, un = probe_once(wins, DDc, k, un)
            tH[:, pl.ds(ro, CR)] = k
            sun[:] = un.astype(jnp.int32)

            def chunk_refill():
                kf = tH[:, pl.ds(ro, CR)]
                unf = sun[:] != 0
                jT2 = jnp.right_shift(kf + 1, LOGC)
                jQ2 = jnp.right_shift(DDc + kf + 1, LOGC)
                cT = jT2 - baT[:, pl.ds(ro, CR)]
                cQ = jQ2 - baQ[:, pl.ds(ro, CR)]
                inw2 = (cT >= 0) & (cT < EXTB * NTAB) \
                    & (cQ >= 0) & (cQ < EXTB * NTAB)
                needy = unf & ~inw2

                @pl.when(jnp.max(needy.astype(jnp.int32)) != 0)
                def _():
                    refill(ro, needy, jT2, jQ2)
                return jnp.max(unf.astype(jnp.int32)) != 0

            any_un = chunk_refill()

            if _os.environ.get("MWF_KDBG_EXT1"):
                return tH[:, pl.ds(ro, CR)], jnp.zeros((G, 1, 1), jnp.int32)

            def cond(c):
                return (c[0] != 0) & (c[1] < maxr)

            def body(c):
                _, rnd = c
                un_f = sun[:] != 0
                # per-lane: lowest unresolved row that can PROGRESS (the
                # in-window rule that prevents the nseg>1 livelock)
                kf = tH[:, pl.ds(ro, CR)]
                cTf = jnp.right_shift(kf + 1, LOGC) - baT[:, pl.ds(ro, CR)]
                cQf = jnp.right_shift(DDc + kf + 1, LOGC) \
                    - baQ[:, pl.ds(ro, CR)]
                inw_f = (cTf >= 0) & (cTf < EXTB * NTAB) \
                    & (cQf >= 0) & (cQf < EXTB * NTAB)
                prog = un_f & inw_f
                r_locv = jnp.clip(
                    (rmin(jnp.where(prog, iota3(CR, 1), CR)) // SR) * SR,
                    0, CR - SR)                                 # [G,1,1]
                # per-lane SR-row stacks at per-lane offsets
                k8p, un8p, DD8p = [], [], []
                w8 = [[] for _ in range(6)]
                r_abs = []
                for g in range(G):
                    rg = r_locv[g, 0, 0]
                    ra = ro + rg
                    r_abs.append((rg, ra))
                    k8p.append(tH[g, pl.ds(ra, SR), :][None])
                    un8p.append(sun[g, pl.ds(rg, SR), :][None])
                    DD8p.append((anc_s[g] + ra * 128 + iota2(SR, 0) * 128
                                 + iota2(SR, 1))[None])
                    for wi, ref in enumerate((wta, wtb, wqa, wqb,
                                              baT, baQ)):
                        w8[wi].append(ref[g, pl.ds(ra, SR), :][None])
                k8 = jnp.concatenate(k8p, 0)
                un8 = jnp.concatenate(un8p, 0) != 0
                DD8 = jnp.concatenate(DD8p, 0)
                wins8 = tuple(jnp.concatenate(w, 0) for w in w8)
                for _ in range(spec.subprobes):
                    k8, un8 = probe_once(wins8, DD8, k8, un8)
                un8i = un8.astype(jnp.int32)
                for g in range(G):
                    rg, ra = r_abs[g]
                    tH[g, pl.ds(ra, SR), :] = k8[g]
                    sun[g, pl.ds(rg, SR), :] = un8i[g]
                alive = chunk_refill()
                return jnp.where(alive, 1, 0), rnd + 1

            any_i, rnd = lax.while_loop(
                cond, body, (jnp.where(any_un, 1, 0), jnp.int32(0)))
            # stuck per lane: still-unresolved rows when the cap tripped.
            # traced-scalar x [G,1,1]-int multiply lowers fine (the
            # scalar-bool & mask broadcast does NOT)
            rnd_ge = jnp.where(rnd >= maxr, 1, 0)
            stuck = rany_i(sun[:] != 0) * rnd_ge
            return tH[:, pl.ds(ro, CR)], stuck

        def good_diag(v, DDc):
            return (v >= -1) & (v < tlv) & (DDc + v >= -1) & (DDc + v < qlv)

        def chunk_range_s(d0s, d1s, empty_s):
            """Union fori bounds over lanes of the CR-chunks covering
            per-lane diagonal ranges [d0s[g], d1s[g]] — ALL SCALARS.
            empty_s[g] is a traced scalar bool removing that lane."""
            e0 = e1 = None
            for g in range(G):
                c0 = jnp.clip((d0s[g] - anc_s[g]) >> 7, 0, WR - 1) // CR
                c1 = jnp.clip((d1s[g] - anc_s[g]) >> 7, 0, WR - 1) // CR + 1
                c0 = jnp.where(empty_s[g], NCH, c0)
                c1 = jnp.where(empty_s[g], 0, c1)
                e0 = c0 if e0 is None else jnp.minimum(e0, c0)
                e1 = c1 if e1 is None else jnp.maximum(e1, c1)
            return e0, jnp.maximum(e1, e0)

        def cycle(carry):
            (t, wf_lo, wf_hi, t_lo, t_hi, done, stopped, ovf,
             final_s, last_state, n_lo, n_hi, sid) = carry
            wf_lo, wf_hi = list(wf_lo), list(wf_hi)
            t_lo, t_hi = list(t_lo), list(t_hi)
            done, stopped, ovf = list(done), list(stopped), list(ovf)
            final_s, last_state = list(final_s), list(last_state)
            n_lo, n_hi, sid = list(n_lo), list(n_hi), list(sid)
            alive = [done[g] + stopped[g] + ovf[g] == 0 for g in range(G)]
            # record score-t bands for masked ring reads in later cycles
            slot_t = t % DH
            for g in range(G):
                bndlo_v[slot_t, g] = jnp.zeros((128,), jnp.int32) + t_lo[g]
                bndhi_v[slot_t, g] = jnp.zeros((128,), jnp.int32) + t_hi[g]

            # effective top band: empty for frozen lanes so every vector
            # mask excludes them (per-lane gating without [G,1,1] selects)
            tlox = [jnp.where(alive[g], t_lo[g], BIG) for g in range(G)]
            thix = [jnp.where(alive[g], t_hi[g], -BIG) for g in range(G)]
            t_lov = lane_vec(tlox)
            t_hiv = lane_vec(thix)

            # --- 1. extension sweep (miniwfa.c:400-411) + termination
            e0, e1_ = chunk_range_s(tlox, thix,
                                    [~a for a in alive])
            zg = jnp.zeros((G, 1, 1), jnp.int32)

            def ext_chunk(ci, car):
                term_a, zero_a, bits_a, stuck_a = car
                ro = ci * CR
                DDc = ancv + ro * 128 + iota3(CR, 1) * 128 + iota3(CR, 2)
                k_old = tH[:, pl.ds(ro, CR)]
                in_top = (DDc >= t_lov) & (DDc <= t_hiv)
                elig = in_top & (k_old >= -1) & (DDc + k_old >= -1) \
                    & (k_old < tlv) & (DDc + k_old < qlv)
                k_new, stuck = extend(ro, DDc, k_old, elig)
                k_new = jnp.where(elig, k_new, k_old)
                if "xwrite" not in _CUT:
                    tH[:, pl.ds(ro, CR)] = k_new
                if "xterm" in _CUT:
                    term_c = zero_c = zg
                else:
                    at_end = elig & (DDc == d_endv)
                    term_c = rany_i(at_end & (k_new == tlv - 1))
                    if "xzero" in _CUT:
                        zero_c = zg
                    else:
                        zero_c = rany_i(at_end & (k_new == k_old)
                                        & (k_new == tlv - 1))
                if is_tb:
                    bits_a = jnp.maximum(bits_a, rmax(
                        jnp.where(DDc == d_endv,
                                  pbits[:, pl.ds(ro, CR)], 0)))
                return (term_a | term_c, zero_a | zero_c,
                        bits_a, stuck_a | stuck)

            if _os.environ.get("MWF_KDBG_NOEXTSWEEP"):
                term_i, zero_i, bits_at, stuck_i = zg, zg, zg, zg
            else:
                term_i, zero_i, bits_at, stuck_i = lax.fori_loop(
                    e0, e1_, ext_chunk, (zg, zg, zg, zg))

            # --- 2. termination bookkeeping (miniwfa.c:405-408) —
            # per-lane SCALARS extracted from the sweep reductions
            act = []
            lo_s, hi_s, width_s = [], [], []
            for g in range(G):
                term_g = alive[g] & (term_i[g, 0, 0] != 0)
                zero_g = term_g & (t > 0) & (zero_i[g, 0, 0] != 0)
                if is_tb:
                    last_state[g] = jnp.where(zero_g,
                                              bits_at[g, 0, 0] & 7,
                                              last_state[g])
                ovf[g] = jnp.where(alive[g] & (stuck_i[g, 0, 0] != 0),
                                   1, ovf[g])  # never in correct operation
                done[g] = jnp.where(term_g, 1, done[g])
                final_s[g] = jnp.where(term_g, t, final_s[g])

                # --- 3. pass-2 checkpoint collapse (miniwfa.c:413-416)
                if spec.use_seg:
                    cid = jnp.clip(sid[g], 0, spec.seg_cap - 1)
                    cur_s = scal_ref[b0 + g, SC_SEG + cid]
                    cur_d = scal_ref[b0 + g, SC_SEG + spec.seg_cap + cid]
                    hit = alive[g] & ~term_g & (sid[g] < nseg_s[g]) \
                        & (cur_s == t)
                    wf_lo[g] = jnp.where(hit, cur_d, wf_lo[g])
                    wf_hi[g] = jnp.where(hit, cur_d, wf_hi[g])
                    sid[g] = jnp.where(hit, sid[g] + 1, sid[g])

                # --- 4. band growth + window-overflow (miniwfa.c:417)
                lo_g = jnp.maximum(wf_lo[g] - 1, -tl_s[g])
                hi_g = jnp.minimum(wf_hi[g] + 1, ql_s[g])
                if "p4" in _CUT:
                    ovf_now = term_g & ~term_g
                else:
                    ovf_now = alive[g] & ~term_g \
                        & ((lo_g < anc_s[g]) | (hi_g > anc_s[g] + W - 1))
                ovf[g] = jnp.where(ovf_now, 1, ovf[g])
                act.append(alive[g] & ~term_g & ~ovf_now)
                lo_s.append(lo_g)
                hi_s.append(hi_g)
                width_s.append(hi_g - lo_g + 1)

            # act-effective bands for the transition masks
            loa = [jnp.where(act[g], lo_s[g], BIG) for g in range(G)]
            hia = [jnp.where(act[g], hi_s[g], -BIG) for g in range(G)]
            lov = lane_vec(loa)
            hiv = lane_vec(hia)
            # act-effective TOP band for retire (terminated lanes don't
            # retire: single-lane sweeps nothing once act is false)
            tloa = [jnp.where(act[g], t_lo[g], BIG) for g in range(G)]
            thia = [jnp.where(act[g], t_hi[g], -BIG) for g in range(G)]
            t_loav = lane_vec(tloa)
            t_hiav = lane_vec(thia)

            # --- 5+6. retire + transition sweep over the grown band
            u_lo = [jnp.minimum(t_lo[g], lo_s[g]) for g in range(G)]
            u_hi = [jnp.maximum(t_hi[g], hi_s[g]) for g in range(G)]
            s0c, s1c = chunk_range_s(u_lo, u_hi, [~a for a in act])

            def lb(ring, depth, top_ref, age, ro):
                s_src = t + 1 - age
                if age == 1:
                    blk = top_ref[:, pl.ds(ro, CRB)]
                    blo, bhi = t_loav, t_hiav
                else:
                    blk = ring[jnp.mod(s_src, depth), :, pl.ds(ro, CRB)]
                    sl = jnp.mod(s_src, DH)
                    blo = bndlo_v[sl, 0:G, 0:1].reshape(G, 1, 1)
                    bhi = bndhi_v[sl, 0:G, 0:1].reshape(G, 1, 1)
                DDb = ancv + ro * 128 + iota3(CRB, 1) * 128 + iota3(CRB, 2)
                return jnp.where((DDb >= blo) & (DDb <= bhi), blk, NEG)

            def sweep(ci, car):
                (loq, hiq, cho1, cho2, ce1x, ce2x) = car
                ro = ci * CR
                DDc = ancv + ro * 128 + iota3(CR, 1) * 128 + iota3(CR, 2)
                in_top = (DDc >= t_loav) & (DDc <= t_hiav)
                # retire tops into rings at slot t mod depth
                tHc = tH[:, pl.ds(ro, CR)]
                tE1c = tE1[:, pl.ds(ro, CR)]
                tF1c = tF1[:, pl.ds(ro, CR)]
                tE2c = tE2[:, pl.ds(ro, CR)]
                tF2c = tF2[:, pl.ds(ro, CR)]
                rH[t % DH, :, pl.ds(ro, CR)] = jnp.where(in_top, tHc, NEG)
                rE1[t % DE1, :, pl.ds(ro, CR)] = \
                    jnp.where(in_top, tE1c, NEG)
                rF1[t % DE1, :, pl.ds(ro, CR)] = \
                    jnp.where(in_top, tF1c, NEG)
                rE2[t % DE2, :, pl.ds(ro, CR)] = \
                    jnp.where(in_top, tE2c, NEG)
                rF2[t % DE2, :, pl.ds(ro, CR)] = \
                    jnp.where(in_top, tF2c, NEG)
                viab = jnp.zeros((G, CR, 128), bool)
                for v in (tHc, tE1c, tF1c, tE2c, tF2c):
                    viab |= good_diag(v, DDc)
                delta = jnp.clip(t - lastt[:, pl.ds(ro, CR)], 0, NS)
                vbc = jnp.where(
                    delta >= NS, 0,
                    jnp.left_shift(vb[:, pl.ds(ro, CR)], delta))
                vb[:, pl.ds(ro, CR)] = \
                    (vbc | (viab & in_top).astype(jnp.int32)) \
                    & ((1 << NS) - 1)
                lastt[:, pl.ds(ro, CR)] = jnp.full(
                    (G, CR, 128), 0, jnp.int32) + t
                # transition into score t+1
                ho1b = lb(rH, DH, tH, ages["o1"], ro)
                ho2b = lb(rH, DH, tH, ages["o2"], ro)
                e1b = lb(rE1, DE1, tE1, ages["e1"], ro)
                f1b = lb(rF1, DE1, tF1, ages["e1"], ro)
                e2b = lb(rE2, DE2, tE2, ages["e2"], ro)
                f2b = lb(rF2, DE2, tF2, ages["e2"], ro)
                hxb = lb(rH, DH, tH, ages["x"], ro)
                ho1, ho2 = ho1b[:, 0:CR], ho2b[:, 0:CR]
                src = dict(
                    Hx=hxb[:, 0:CR],
                    Ho1m=shm(ho1, cho1),
                    Ho1p=shp(ho1, ho1b[:, CR:CR + 1]),
                    Ho2m=shm(ho2, cho2),
                    Ho2p=shp(ho2, ho2b[:, CR:CR + 1]),
                    E1m=shm(e1b[:, 0:CR], ce1x),
                    F1p=shp(f1b[:, 0:CR], f1b[:, CR:CR + 1]),
                    E2m=shm(e2b[:, 0:CR], ce2x),
                    F2p=shp(f2b[:, 0:CR], f2b[:, CR:CR + 1]))
                Hn, E1n, F1n, E2n, F2n, bits = transition_values(src)
                in_new = (DDc >= lov) & (DDc <= hiv)
                wH = jnp.where(in_new, Hn, NEG)
                wE1 = jnp.where(in_new, E1n, NEG)
                wF1 = jnp.where(in_new, F1n, NEG)
                wE2 = jnp.where(in_new, E2n, NEG)
                wF2 = jnp.where(in_new, F2n, NEG)
                tH[:, pl.ds(ro, CR)] = wH
                tE1[:, pl.ds(ro, CR)] = wE1
                tF1[:, pl.ds(ro, CR)] = wF1
                tE2[:, pl.ds(ro, CR)] = wE2
                tF2[:, pl.ds(ro, CR)] = wF2
                if is_tb:
                    bits_m = jnp.where(in_new, bits, 0)
                    pbits[:, pl.ds(ro, CR)] = bits_m
                    p4 = bits_m.reshape(G, CR4, 4, 128)
                    packed = (p4[:, :, 0] | (p4[:, :, 1] << 8)
                              | (p4[:, :, 2] << 16) | (p4[:, :, 3] << 24))
                    slot = lax.rem(dm[0], NSLOT)

                    @pl.when(((dm[1] >> slot) & 1) == 1)
                    def _():
                        pltpu.make_async_copy(
                            tbrow.at[slot],
                            tb_ref.at[pl.ds(b0, G), 0, pl.ds(0, CR4)],
                            sem_tb.at[slot]).wait()

                    tbrow[pl.ds(slot, 1)] = packed[None]
                    cp = pltpu.make_async_copy(
                        tbrow.at[slot],
                        tb_ref.at[pl.ds(b0, G),
                                  jnp.minimum(t, spec.S_CAP - 1),
                                  pl.ds(ro // 4, CR4)],
                        sem_tb.at[slot])
                    cp.start()
                    dm[0] = dm[0] + 1
                    dm[1] = dm[1] | (1 << slot)
                # boundary commit reduction (miniwfa.c:325-326)
                viable = jnp.zeros((G, CR, 128), bool)
                for v in (wH, wE1, wF1, wE2, wF2):
                    viable |= v >= -1
                loq = loq | rany_i(viable & (DDc == lov))
                hiq = hiq | rany_i(viable & (DDc == hiv))
                return (loq, hiq,
                        ho1b[:, CR - 1:CR], ho2b[:, CR - 1:CR],
                        e1b[:, CR - 1:CR], e2b[:, CR - 1:CR])

            neg_row = jnp.full((G, 1, 128), NEG, jnp.int32)
            car0 = (zg, zg, neg_row, neg_row, neg_row, neg_row)
            if "sweep" in _CUT:   # compile-bisect knob (parity-breaking)
                car = car0
            else:
                car = lax.fori_loop(s0c, s1c, sweep, car0)
            loq_i, hiq_i = car[0], car[1]

            sh_due = []
            for g in range(G):
                lo_ok = loq_i[g, 0, 0] != 0
                hi_ok = hiq_i[g, 0, 0] != 0
                wf_lo[g] = jnp.where(act[g] & lo_ok, lo_s[g], wf_lo[g])
                wf_hi[g] = jnp.where(act[g] & hi_ok, hi_s[g], wf_hi[g])
                t_lo[g] = jnp.where(act[g], lo_s[g], t_lo[g])
                t_hi[g] = jnp.where(act[g], hi_s[g], t_hi[g])
                # --- 7. shrink due every 256 cycles (miniwfa.c:420)
                sh_due.append(act[g] & (((t + 1) & 0xFF) == 0))

            if "shrink" not in _CUT:
                g0c, g1c = chunk_range_s(wf_lo, wf_hi,
                                         [~d for d in sh_due])
                # shrink-effective hull windows (per-lane scalar gating)
                wlov = lane_vec([jnp.where(sh_due[g], wf_lo[g], BIG)
                                 for g in range(G)])
                whiv = lane_vec([jnp.where(sh_due[g], wf_hi[g], -BIG)
                                 for g in range(G)])
                t_lonv = lane_vec(t_lo)
                t_hinv = lane_vec(t_hi)

                def shr_chunk(ci, car):
                    has_a, mn_a, mx_a = car
                    ro = ci * CR
                    DDc = ancv + ro * 128 + iota3(CR, 1) * 128 \
                        + iota3(CR, 2)
                    viable = jnp.zeros((G, CR, 128), bool)
                    for r in (tH, tE1, tF1, tE2, tF2):
                        viable |= r[:, pl.ds(ro, CR)] >= -1
                    good = viable & (DDc >= t_lonv) & (DDc <= t_hinv)
                    good |= (vb[:, pl.ds(ro, CR)]
                             & ((1 << (NS - 1)) - 1)) != 0
                    good &= (DDc >= wlov) & (DDc <= whiv)
                    has_a = has_a | rany_i(good)
                    mn_a = jnp.minimum(mn_a,
                                       rmin(jnp.where(good, DDc, BIG)))
                    mx_a = jnp.maximum(mx_a,
                                       rmax(jnp.where(good, DDc, -BIG)))
                    return has_a, mn_a, mx_a

                has_i, new_lo, new_hi = lax.fori_loop(
                    g0c, g1c, shr_chunk,
                    (zg, zg + BIG, zg - BIG))
                for g in range(G):
                    shrink_g = sh_due[g] & (has_i[g, 0, 0] != 0)
                    wf_lo[g] = jnp.where(shrink_g, new_lo[g, 0, 0],
                                         wf_lo[g])
                    wf_hi[g] = jnp.where(shrink_g, new_hi[g, 0, 0],
                                         wf_hi[g])

            # --- 8. accounting + early stop (miniwfa.c:421-425)
            for g in range(G):
                n_lo[g] = n_lo[g] + jnp.where(act[g], width_s[g], 0)
                n_hi[g] = n_hi[g] + (n_lo[g] >> 30)
                n_lo[g] = n_lo[g] & 0x3FFFFFFF
                if "p8" not in _CUT:
                    stop = ((milo_s[g] | mihi_s[g]) > 0) \
                        & ((n_hi[g] > mihi_s[g])
                           | ((n_hi[g] == mihi_s[g])
                              & (n_lo[g] > milo_s[g])))
                    stop |= (ms_s[g] > 0) & (t + 1 > ms_s[g])
                    stopped[g] = jnp.where(act[g] & stop, 1, stopped[g])
            return (t + 1, tuple(wf_lo), tuple(wf_hi),
                    tuple(t_lo), tuple(t_hi),
                    tuple(done), tuple(stopped), tuple(ovf),
                    tuple(final_s), tuple(last_state),
                    tuple(n_lo), tuple(n_hi), tuple(sid))

        def cond(carry):
            t, done, stopped, ovf = carry[0], carry[5], carry[6], carry[7]
            a = (done[0] + stopped[0] + ovf[0]) == 0
            for g in range(1, G):
                a = a | ((done[g] + stopped[g] + ovf[g]) == 0)
            return a & (t < spec.S_CAP - 1)

        z = jnp.int32(0)
        zt = (z,) * G
        carry = (z, zt, zt, zt, zt, zt, zt, zt,
                 (jnp.int32(-1),) * G, zt, zt, zt, zt)
        carry = lax.while_loop(cond, cycle, carry)
        (t, _, _, _, _, done, stopped, ovf,
         final_s, last_state, n_lo, n_hi, _) = carry
        if is_tb:
            for i in range(NSLOT):
                @pl.when(((dm[1] >> i) & 1) == 1)
                def _():
                    pltpu.make_async_copy(
                        tbrow.at[i],
                        tb_ref.at[pl.ds(b0, G), 0, pl.ds(0, CR4)],
                        sem_tb.at[i]).wait()
            dm[1] = 0
        for g in range(G):
            fin = done[g] + stopped[g] + ovf[g]
            out_ref[b0 + g, O_S] = final_s[g]
            out_ref[b0 + g, O_DONE] = done[g]
            out_ref[b0 + g, O_STOP] = stopped[g]
            out_ref[b0 + g, O_OVFB] = ovf[g]
            out_ref[b0 + g, O_OVFS] = jnp.where(fin == 0, 1, 0)
            out_ref[b0 + g, O_LS] = last_state[g]
            out_ref[b0 + g, O_NLO] = n_lo[g]
            out_ref[b0 + g, O_NHI] = n_hi[g]
            out_ref[b0 + g, O_LP] = WF_NEG_INF
            out_ref[b0 + g, O_SNC] = 0

    # ---- pallas_call plumbing
    out_shapes = [jax.ShapeDtypeStruct((spec.B, O_N), jnp.int32)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    if is_tb:
        out_shapes.append(jax.ShapeDtypeStruct(
            (spec.B, spec.S_CAP, WR4, 128), jnp.int32))
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))

    scratch = [
        pltpu.VMEM((DH, G, WRP, 128), jnp.int32),    # rH
        pltpu.VMEM((DE1, G, WRP, 128), jnp.int32),   # rE1
        pltpu.VMEM((DE1, G, WRP, 128), jnp.int32),   # rF1
        pltpu.VMEM((DE2, G, WRP, 128), jnp.int32),   # rE2
        pltpu.VMEM((DE2, G, WRP, 128), jnp.int32),   # rF2
        pltpu.VMEM((G, WRP, 128), jnp.int32),        # vb
        pltpu.VMEM((G, WRP, 128), jnp.int32),        # lastt
        pltpu.VMEM((G, WRP, 128), jnp.int32),        # tH
        pltpu.VMEM((G, WRP, 128), jnp.int32),        # tE1
        pltpu.VMEM((G, WRP, 128), jnp.int32),        # tF1
        pltpu.VMEM((G, WRP, 128), jnp.int32),        # tE2
        pltpu.VMEM((G, WRP, 128), jnp.int32),        # tF2
        pltpu.VMEM((G, WR, 128), jnp.int32),         # wta
        pltpu.VMEM((G, WR, 128), jnp.int32),         # wtb
        pltpu.VMEM((G, WR, 128), jnp.int32),         # wqa
        pltpu.VMEM((G, WR, 128), jnp.int32),         # wqb
        pltpu.VMEM((G, WR, 128), jnp.int32),         # baT
        pltpu.VMEM((G, WR, 128), jnp.int32),         # baQ
        pltpu.VMEM((G, WR, 128), jnp.int32),         # pbits
        pltpu.VMEM((NSLOT, G, CR4, 128), jnp.int32),  # tbrow slots
        pltpu.SemaphoreType.DMA((NSLOT,)),           # sem_tb
        pltpu.SMEM((4,), jnp.int32),                 # dm
        pltpu.VMEM((G, NTAB, NTAB), jnp.int32),      # twtv
        pltpu.VMEM((G, NTAB, NTAB), jnp.int32),      # twqv
        pltpu.SMEM((2 * G,), jnp.int32),             # cs
        pltpu.SemaphoreType.DMA,                     # sem2
        pltpu.VMEM((NTAB, NTAB), jnp.int32),         # wtmp
        pltpu.VMEM((DH, 8, 128), jnp.int32),         # bndlo_v
        pltpu.VMEM((DH, 8, 128), jnp.int32),         # bndhi_v
        pltpu.VMEM((G, CR, 128), jnp.int32),         # sun
        pltpu.VMEM((8, 128), jnp.int32),             # laneq registry
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(spec.B // G,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )

    def call(scal, twt, twq, *, interpret=False):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=tuple(out_shapes),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(scal, twt, twq)

    return call


@functools.lru_cache(maxsize=64)
def get_multi_kernel(spec: MSpec, interpret: bool = False):
    """Jitted multi-lane aligner; input/output contract identical to the
    single-lane get_kernel (ops/wavefront_kernel.py) so drivers swap
    freely: tb comes back packed in the same [B, S_CAP, WR//4, 128]
    layout, the scalar row is fetched in ONE RPC."""
    import numpy as np
    call = build_kernel(spec)

    def raw(scal, twt, twq):
        return call(scal, twt, twq, interpret=interpret)

    raw = jax.jit(raw)

    def run(scal, twt, twq):
        outs = raw(scal, twt, twq)
        o = np.asarray(outs[0])
        res = dict(
            final_s=o[:, O_S], done=o[:, O_DONE] != 0,
            stopped=o[:, O_STOP] != 0, ovf_band=o[:, O_OVFB] != 0,
            ovf_scap=o[:, O_OVFS] != 0,
            overflow=(o[:, O_OVFB] != 0) | (o[:, O_OVFS] != 0),
            last_state=o[:, O_LS], n_iter_lo=o[:, O_NLO],
            n_iter_hi=o[:, O_NHI])
        if spec.mode == MODE_TB:
            res["tb_packed"] = outs[1]
        return res

    run.raw = raw   # exposed for AOT prewarm (utils/prewarm.py)
    return run


def arg_shapes(spec: MSpec):
    """ShapeDtypeStructs of get_multi_kernel's jitted arguments (AOT
    prewarm)."""
    import jax
    nsc = SC_SEG + 2 * spec.seg_cap
    s = jax.ShapeDtypeStruct
    return (s((spec.B, nsc), jnp.int32),
            s((spec.B, spec.nseg, NTAB, NTAB), jnp.int32),
            s((spec.B, spec.nseg, NTAB, NTAB), jnp.int32))


def pick_g(mode: int, WR: int, B: int, spec_probe) -> int:
    """Largest co-residency G whose VMEM scratch fits the budget.
    spec_probe(G) -> MSpec."""
    budget = int(_os.environ.get("MWF_MULTI_VMEM_MB", "12")) << 20
    forced = _os.environ.get("MWF_KERNEL_G")
    if forced is not None:
        return max(1, int(forced))
    for g in (8, 4, 2):
        if B < 2:
            break
        if vmem_bytes(spec_probe(g)) <= budget:
            return g
    return 1
