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
[G*CR, 128] flattened blocks, and the straggler while-rounds are SHARED
(the round count becomes the max over lanes instead of the sum).

Semantics are identical to the single-lane kernel (reference
mwf_wfa_core, miniwfa.c:380-435, every '>=' tie-break of wf_next_tb,
miniwfa.c:287-307): per-lane band registers, termination, n_iter,
shrink, escalation flags all vectorize to [G,1,1]; lanes terminate
independently (a finished lane freezes while the others run on), so the
driver buckets similar pairs per group.

Modes: SCORE and TB (with pass-2 checkpoint collapse).  PASS1 stays on
the single-lane kernel — its sf shadow rings double the VMEM and
co-residency cannot fit.

Mosaic notes (probed on v5e, tools/microbench_multi_probe*.py):
  * gathers are 2D-only: [G,R,128] blocks flatten to [G*R,128] values
    (free relayout) for take_along_axis, then reshape back;
  * axis=(1,2) reductions SIGABRT the compiler: every per-lane reduction
    is two-step (axis=2 then axis=1, keepdims);
  * [G,1,1] vectors cannot be built from SMEM scalars via full/concat:
    scalars go through an [8,128] VMEM registry plane
    (write row g, read [0:G,0:1].reshape(G,1,1));
  * 4D ring scratch with a dynamic leading index and a pl.ds middle-dim
    slice reads/writes cleanly; [G,1,1] while-loop carries work.
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
    n += 2 * DH * 8 + 6 * 8                          # registries
    return n * pl_b


def build_kernel(spec: MSpec):
    """Build the pallas_call wrapper: fn(scal, twt, twq) ->
    (out_scal [B, O_N], tb [B, S_CAP, WR//4, 128] int32 if TB mode) —
    the same output contract as the single-lane kernel, so the driver,
    escalation ladder and traceback walker are untouched."""
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
    SEGPAD = -(-spec.seg_cap // 128) * 128

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

    def rany(a):  # bool [G,R,128] -> bool [G,1,1]
        return rmax(jnp.where(a, 1, 0)) != 0

    def b2i(b):
        # bool->int32 on [.,.,1]-shaped masks: astype AND a where with
        # two SCALAR branches both lower as an unimplemented "Lane
        # broadcast"; a select between materialized vector constants
        # lowers fine
        return jnp.where(b, jnp.ones(b.shape, jnp.int32),
                         jnp.zeros(b.shape, jnp.int32))

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
               seg_ref,             # VMEM [G, 2, SEGPAD] checkpoint rows
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

        # ---- per-lane scalar loads (python lists of traced scalars for
        # per-g code; [G,1,1] vectors via the laneq registry plane)
        tl_s = [scal_ref[b0 + g, SC_TL] for g in range(G)]
        ql_s = [scal_ref[b0 + g, SC_QL] for g in range(G)]
        anc_s = [scal_ref[b0 + g, SC_ANC] for g in range(G)]
        nseg_s = [scal_ref[b0 + g, SC_NSEG] for g in range(G)]

        def lane_vec(vals):
            """[G,1,1] vector from G traced scalars, via the registry
            plane (direct full/concat of tiny shapes aborts Mosaic)."""
            for g in range(G):
                laneq[g, :] = jnp.zeros((128,), jnp.int32) + vals[g]
            return laneq[0:G, 0:1].reshape(G, 1, 1)

        tlv = lane_vec(tl_s)
        qlv = lane_vec(ql_s)
        ancv = lane_vec(anc_s)
        msv = lane_vec([scal_ref[b0 + g, SC_MS] for g in range(G)])
        milov = lane_vec([scal_ref[b0 + g, SC_MILO] for g in range(G)])
        mihiv = lane_vec([scal_ref[b0 + g, SC_MIHI] for g in range(G)])
        nsegv = lane_vec(nseg_s)
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
            bndlo_v[j] = jnp.ones((8, 128), jnp.int32)     # empty band
            bndhi_v[j] = jnp.zeros((8, 128), jnp.int32)
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
                hasl = rmax(b2i(has))                          # [G,1,1]
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
            anyg = rmax(b2i(has))

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

        def extend(ro, DDc, k, elig):
            """Chunk LCP extension over [G,CR,128] (miniwfa.c:212-226
            semantics); two phases like the single-lane kernel, with the
            straggler while-rounds SHARED across lanes (each round probes
            one SR-row sub-window PER LANE; the round count is the max
            over lanes, not the sum)."""
            if _os.environ.get("MWF_KDBG_NOEXT"):
                return k, jnp.zeros((G, 1, 1), bool)
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
                return tH[:, pl.ds(ro, CR)], jnp.zeros((G, 1, 1), bool)

            maxr = jnp.minimum(jnp.int32(MAXR_SAFETY),
                               jnp.max(tlv) // 4 + 8192)

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
                return alive.astype(jnp.int32), rnd + 1

            any_i, rnd = lax.while_loop(
                cond, body, (any_un.astype(jnp.int32), jnp.int32(0)))
            # stuck per lane: still-unresolved rows when the cap tripped
            stuck = (rnd >= maxr) & rany(sun[:] != 0)
            return tH[:, pl.ds(ro, CR)], stuck

        def good_diag(v, DDc):
            return (v >= -1) & (v < tlv) & (DDc + v >= -1) & (DDc + v < qlv)

        def chunk_range(d0v, d1v, emptyv):
            """Union fori bounds over lanes of the CR-chunks covering
            per-lane diagonal ranges [d0v, d1v] ([G,1,1] vectors).
            Scalar select branches near [G,1,1] masks fail to lower
            (Lane broadcast): every branch is a materialized vector."""
            zv = jnp.zeros((G, 1, 1), jnp.int32)
            c0 = jnp.clip((d0v - ancv) >> 7, 0, WR - 1) // CR
            c1 = jnp.clip((d1v - ancv) >> 7, 0, WR - 1) // CR + 1
            c1 = jnp.where(emptyv, c0, c1)
            return (jnp.min(jnp.where(emptyv, zv + WR // CR, c0)),
                    jnp.max(c1))

        def bnd_write(slot, lov, hiv):
            # per-row scalar-broadcast writes: a [G,1]->[G,128] lane
            # broadcast of while-carried values fails to lower
            for g in range(G):
                bndlo_v[slot, g] = jnp.zeros((128,), jnp.int32) \
                    + lov[g, 0, 0]
                bndhi_v[slot, g] = jnp.zeros((128,), jnp.int32) \
                    + hiv[g, 0, 0]

        def bnd_read(slot):
            return (bndlo_v[slot, 0:G, 0:1].reshape(G, 1, 1),
                    bndhi_v[slot, 0:G, 0:1].reshape(G, 1, 1))

        def cycle(carry):
            (t, wf_lo, wf_hi, t_lo, t_hi, done_i, stopped_i, ovf_i,
             final_s, last_state, n_lo, n_hi, sid) = carry
            done, stopped, ovf = done_i != 0, stopped_i != 0, ovf_i != 0
            zgc = jnp.zeros((G, 1, 1), jnp.int32)
            alive = ~(done | stopped | ovf)                     # [G,1,1]
            bnd_write(t % DH, t_lo, t_hi)

            # --- 1. extension sweep (miniwfa.c:400-411) + termination
            e0, e1_ = chunk_range(t_lo, t_hi, ~alive)
            zg = jnp.zeros((G, 1, 1), jnp.int32)

            def ext_chunk(ci, car):
                term_a, zero_a, bits_a, stuck_a = car
                ro = ci * CR
                DDc = ancv + ro * 128 + iota3(CR, 1) * 128 + iota3(CR, 2)
                k_old = tH[:, pl.ds(ro, CR)]
                in_top = (DDc >= t_lo) & (DDc <= t_hi) & alive
                elig = in_top & (k_old >= -1) & (DDc + k_old >= -1) \
                    & (k_old < tlv) & (DDc + k_old < qlv)
                k_new, stuck = extend(ro, DDc, k_old, elig)
                k_new = jnp.where(elig, k_new, k_old)
                if "xwrite" not in _CUT:
                    tH[:, pl.ds(ro, CR)] = k_new
                if "xterm" in _CUT:
                    term_c = zero_c = jnp.zeros((G, 1, 1), bool)
                else:
                    at_end = elig & (DDc == d_endv)
                    term_c = rany(at_end & (k_new == tlv - 1))
                    if "xzero" in _CUT:
                        zero_c = jnp.zeros((G, 1, 1), bool)
                    else:
                        zero_c = rany(at_end & (k_new == k_old)
                                      & (k_new == tlv - 1))
                if is_tb:
                    bits_a = jnp.maximum(bits_a, rmax(
                        jnp.where(DDc == d_endv,
                                  pbits[:, pl.ds(ro, CR)], 0)))
                return (term_a | b2i(term_c),
                        zero_a | b2i(zero_c),
                        bits_a, stuck_a | b2i(stuck))

            if _os.environ.get("MWF_KDBG_NOEXTSWEEP"):
                term_i, zero_i, bits_at, stuck_i = zg, zg, zg, zg
            else:
                term_i, zero_i, bits_at, stuck_i = lax.fori_loop(
                    e0, e1_, ext_chunk, (zg, zg, zg, zg))
            term = (term_i != 0) & alive
            ovf = ovf | ((stuck_i != 0) & alive)  # never in correct op.

            # --- 2. termination bookkeeping (miniwfa.c:405-408)
            # NOTE: a scalar-bool & [G,1,1]-bool mask broadcast fails
            # to lower ("Lane broadcast"); gate by scalar-int arithmetic
            zero_ext = term & ((zero_i * jnp.minimum(t, 1)) != 0)
            if is_tb:
                last_state = jnp.where(zero_ext, bits_at & 7, last_state)
            done = done | term
            final_s = jnp.where(term, zgc + t, final_s)

            # --- 3. pass-2 checkpoint collapse (miniwfa.c:413-416)
            if spec.use_seg:
                cidx = jnp.clip(sid, 0, spec.seg_cap - 1)       # [G,1,1]
                # checkpoint schedule rows come in as a VMEM input plane
                # ([G, 2, SEGPAD]: row 0 = scores, row 1 = diagonals);
                # read every lane's next checkpoint with a masked-max
                # over the 3D row (a [G,1]->[G,SEGPAD] gather-index
                # broadcast would be the unimplemented Lane broadcast)
                segi = lax.broadcasted_iota(jnp.int32, (G, 1, SEGPAD), 2)
                eq = segi == cidx
                srow = seg_ref[:, 0:1, :]                       # [G,1,SEGPAD]
                drow = seg_ref[:, 1:2, :]
                m9 = jnp.full((G, 1, SEGPAD), -(BIG), jnp.int32)
                cur_s = jnp.max(jnp.max(jnp.where(eq, srow, m9), axis=2,
                                        keepdims=True), axis=1,
                                keepdims=True)
                cur_d = jnp.max(jnp.max(jnp.where(eq, drow, m9), axis=2,
                                        keepdims=True), axis=1,
                                keepdims=True)
                hit = alive & ~term & (sid < nsegv) & (cur_s == t)
                wf_lo = jnp.where(hit, cur_d, wf_lo)
                wf_hi = jnp.where(hit, cur_d, wf_hi)
                sid = jnp.where(hit, sid + 1, sid)

            # --- 4. band growth + window-overflow check (miniwfa.c:417)
            lo = jnp.maximum(wf_lo - 1, -tlv)
            hi = jnp.minimum(wf_hi + 1, qlv)
            width = hi - lo + 1
            if "p4" in _CUT:
                ovf_now = jnp.zeros((G, 1, 1), bool)
            else:
                ovf_now = alive & ~term & ((lo < ancv)
                                           | (hi > ancv + W - 1))
            ovf = ovf | ovf_now
            act = alive & ~term & ~ovf_now                      # [G,1,1]

            # --- 5+6. retire + transition sweep over the grown band
            u_lo = jnp.minimum(t_lo, lo)
            u_hi = jnp.maximum(t_hi, hi)
            s0c, s1c = chunk_range(u_lo, u_hi, ~act)

            def lb(ring, depth, top_ref, age, ro):
                s_src = t + 1 - age
                if age == 1:
                    blk = top_ref[:, pl.ds(ro, CRB)]
                    blo, bhi = t_lo, t_hi
                else:
                    blk = ring[jnp.mod(s_src, depth), :, pl.ds(ro, CRB)]
                    blo, bhi = bnd_read(jnp.mod(s_src, DH))
                DDb = ancv + ro * 128 + iota3(CRB, 1) * 128 + iota3(CRB, 2)
                return jnp.where((DDb >= blo) & (DDb <= bhi), blk, NEG)

            def sweep(ci, car):
                (loq, hiq, cho1, cho2, ce1x, ce2x) = car
                ro = ci * CR
                DDc = ancv + ro * 128 + iota3(CR, 1) * 128 + iota3(CR, 2)
                in_top = (DDc >= t_lo) & (DDc <= t_hi) & alive
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
                in_new = (DDc >= lo) & (DDc <= hi) & act
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
                loq = loq | b2i(rany(viable & (DDc == lo)))
                hiq = hiq | b2i(rany(viable & (DDc == hi)))
                return (loq, hiq,
                        ho1b[:, CR - 1:CR], ho2b[:, CR - 1:CR],
                        e1b[:, CR - 1:CR], e2b[:, CR - 1:CR])

            neg_row = jnp.full((G, 1, 128), NEG, jnp.int32)
            car0 = (zg, zg, neg_row, neg_row, neg_row, neg_row)
            if "sweep" in _CUT:   # compile-bisect knob (parity-breaking)
                car = car0
            else:
                car = lax.fori_loop(s0c, s1c, sweep, car0)
            lo_ok, hi_ok = car[0] != 0, car[1] != 0

            wf_lo = jnp.where(act & lo_ok, lo, wf_lo)
            wf_hi = jnp.where(act & hi_ok, hi, wf_hi)
            t_lo = jnp.where(act, lo, t_lo)
            t_hi = jnp.where(act, hi, t_hi)

            # --- 7. periodic shrink every 256 cycles (miniwfa.c:420);
            # scalar gate via int arithmetic (scalar-bool & [G,1,1] mask
            # fails to lower)
            sh_g = 1 - jnp.minimum((t + 1) & 0xFF, 1)
            sh_due = act & ((b2i(act) * sh_g) != 0)
            g0c, g1c = chunk_range(wf_lo, wf_hi, ~sh_due)

            def shr_chunk(ci, car):
                has_a, mn_a, mx_a = car
                ro = ci * CR
                DDc = ancv + ro * 128 + iota3(CR, 1) * 128 + iota3(CR, 2)
                viable = jnp.zeros((G, CR, 128), bool)
                for r in (tH, tE1, tF1, tE2, tF2):
                    viable |= r[:, pl.ds(ro, CR)] >= -1
                good = viable & (DDc >= t_lo) & (DDc <= t_hi)
                good |= (vb[:, pl.ds(ro, CR)] & ((1 << (NS - 1)) - 1)) != 0
                good &= (DDc >= wf_lo) & (DDc <= wf_hi)
                has_a = has_a | b2i(rany(good))
                mn_a = jnp.minimum(mn_a, rmin(jnp.where(good, DDc, BIG)))
                mx_a = jnp.maximum(mx_a, rmax(jnp.where(good, DDc, -BIG)))
                return has_a, mn_a, mx_a

            if "shrink" in _CUT:  # compile-bisect knob (parity-breaking)
                has_i, new_lo, new_hi = zg, zg + BIG, zg - BIG
            else:
                has_i, new_lo, new_hi = lax.fori_loop(
                    g0c, g1c, shr_chunk,
                    (zg, zg + BIG, zg - BIG))
            shrink = sh_due & (has_i != 0)
            wf_lo = jnp.where(shrink, new_lo, wf_lo)
            wf_hi = jnp.where(shrink, new_hi, wf_hi)

            # --- 8. accounting + early stop (miniwfa.c:421-425)
            n_lo = n_lo + jnp.where(act, width, zgc)
            n_hi = n_hi + (n_lo >> 30)
            n_lo = n_lo & 0x3FFFFFFF
            if "p8" in _CUT:
                pass
            else:
                stop = ((milov | mihiv) > 0) \
                    & ((n_hi > mihiv) | ((n_hi == mihiv) & (n_lo > milov)))
                stop |= (msv > 0) & (t + 1 > msv)
                stopped = stopped | (act & stop)
            return (t + 1, wf_lo, wf_hi, t_lo, t_hi,
                    b2i(done), b2i(stopped), b2i(ovf),
                    final_s, last_state, n_lo, n_hi, sid)

        def cond(carry):
            t, done, stopped, ovf = carry[0], carry[5], carry[6], carry[7]
            return (jnp.min(done + stopped + ovf) == 0) \
                & (t < spec.S_CAP - 1)

        zg = jnp.zeros((G, 1, 1), jnp.int32)
        carry = (jnp.int32(0), zg, zg, zg, zg,
                 zg, zg, zg,
                 zg - 1, zg, zg, zg, zg)
        carry = lax.while_loop(cond, cycle, carry)
        (t, _, _, _, _, done_i, stopped_i, ovf_i,
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
        done, stopped, ovf = done_i != 0, stopped_i != 0, ovf_i != 0
        aliveo = jnp.where(done | stopped | ovf,
                           jnp.zeros((G, 1, 1), jnp.int32),
                           jnp.ones((G, 1, 1), jnp.int32))
        for g in range(G):
            out_ref[b0 + g, O_S] = final_s[g, 0, 0]
            out_ref[b0 + g, O_DONE] = done_i[g, 0, 0]
            out_ref[b0 + g, O_STOP] = stopped_i[g, 0, 0]
            out_ref[b0 + g, O_OVFB] = ovf_i[g, 0, 0]
            out_ref[b0 + g, O_OVFS] = aliveo[g, 0, 0]
            out_ref[b0 + g, O_LS] = last_state[g, 0, 0]
            out_ref[b0 + g, O_NLO] = n_lo[g, 0, 0]
            out_ref[b0 + g, O_NHI] = n_hi[g, 0, 0]
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
            pl.BlockSpec((G, 2, SEGPAD), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )

    def call(scal, twt, twq, seg_plane, *, interpret=False):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=tuple(out_shapes),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(scal, twt, twq, seg_plane)

    return call


@functools.lru_cache(maxsize=64)
def get_multi_kernel(spec: MSpec, interpret: bool = False):
    """Jitted multi-lane aligner; output dict identical to the
    single-lane get_kernel (ops/wavefront_kernel.py) so drivers swap
    freely: tb comes back packed in the same [B, S_CAP, WR//4, 128]
    layout, the scalar row is fetched in ONE RPC."""
    import numpy as np
    call = build_kernel(spec)

    def raw(scal, twt, twq, seg_plane):
        return call(scal, twt, twq, seg_plane, interpret=interpret)

    raw = jax.jit(raw)

    def run(scal, twt, twq, seg_plane=None):
        if seg_plane is None:
            seg_plane = np.zeros((spec.B, 2, -(-spec.seg_cap // 128) * 128),
                                 np.int32)
            seg_plane[:, 0, :] = -9
        outs = raw(scal, twt, twq, seg_plane)
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

    return run


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
