"""Fused-cycle WFA engine: the whole alignment loop in ONE Pallas kernel.

TPU-native re-design of the wavefront machine (same semantics as
ops/wavefront.py, which mirrors the reference lh3/miniwfa mwf_wfa_core,
miniwfa.c:380-435, including every '>=' tie-break of wf_next_tb,
miniwfa.c:287-307).  The XLA lax-level engine spends ~90% of each cycle in
fixed-cost gather/scatter dispatch (PERF_NOTES.md); here the *entire*
``while s += 1`` loop runs inside one ``pallas_call`` per alignment, with
all DP state VMEM-resident, so a cycle costs microseconds instead of
milliseconds.

Architecture (one grid step == one alignment lane; measured primitive
costs in tools/microbench_mosaic*.py):

* **Band window**: the diagonal band lives in a fixed lane-major window of
  ``W = WR*128`` diagonals: window slot w == diagonal ``anc + w``, laid out
  as ``[WR, 128]`` (sublane-rows x lanes).  The anchor is chosen by the
  host (midpoint of start diagonal 0 and end diagonal ql-tl) and never
  moves; a band outgrowing the window sets an overflow flag and the host
  retries in a larger-W bucket (models/exact.py escalation ladder).
  d±1 neighbour reads of the recurrence are flat shifts (0.15us).

* **Rings in VMEM scratch**: per-state history rings ``[depth, WR, 128]``
  indexed with dynamic leading-dim reads/writes (0.35us) — the TPU
  equivalent of the reference stripe ring (miniwfa.c:67-137).  Depths are
  per-state maxima of the recurrence ages (H: max(x,o1+e1,o2+e2); E/F:
  e1/e2), not the uniform max_pen+1 of the C.  Band-shrink viability is
  captured per retired slice in a separate ``vb`` ring so the periodic
  shrink (miniwfa.c:144-171) still scans the information of all
  max_pen+1 slices x 5 states without storing them.

* **Match extension** (reference wf_extend1_padded, miniwfa.c:212-226):
  each band ROW (128 diagonals) owns a 2-block aligned window of 256
  packed words (4096 chars at cpw=16) of each sequence, held in VMEM.
  A probe is ONE same-shape lane-shuffle gather per window block
  (~0.1us, gather dim = 128 lanes = 1 vreg — the Mosaic constraint) +
  per-lane variable shifts; first mismatch via popcount-ctz.  All
  eligible diagonals probe simultaneously; rows whose probes leave their
  window trigger a vectorized refill: per-row block ids are gathered
  from a transposed word table ``twT[128, NWR<=128]`` with a
  broadcast-index gather and transposed back (~5us, gated on need).
  No top_k, no scatter, no compaction — the full-band gather makes probe
  count free.

* **Traceback rows** stream to HBM: the 7-bit tb byte plane of each cycle
  (README.md:47-48) is DMA'd ``[WR,128]`` VMEM->HBM at dynamic row t
  (0.24us), then converted to the walker's ``[S, W] uint8`` layout by an
  XLA epilogue outside the kernel.

Limits of this engine (host falls back to ops/wavefront.py otherwise):
WR in [8, 128] (W in [1024, 16384]), sequence length <= (128*128-2)*cpw
(~262 kb at cpw=16), modes SCORE and TB (low-mem pass 1 uses the lax
engine until ported).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WF_NEG_INF = -0x40000000  # reference sentinel (miniwfa.c:67)
MODE_SCORE = 0
MODE_TB = 1
MODE_PASS1 = 2

NTAB = 128        # word-table rows/cols: one segment = 128*128 packed words
SEGSTRIDE = 127   # segments overlap by one 128-word block so a row's
                  # 2-block window never straddles a segment boundary
import os as _os
MAXR_SAFETY = int(_os.environ.get("MWF_MAXR_SAFETY", 1 << 20))
# extension-round hard bound; refill progress makes this unreachable in
# correct operation (a small override turns a suspected livelock into a
# visible band-overflow for debugging)

# scalar-input layout (per lane): [tl, ql, anc, n_seg, seg_s..., seg_d...]
SC_TL, SC_QL, SC_ANC, SC_NSEG, SC_SEG = 0, 1, 2, 3, 4

# scalar-output layout: [final_s, done, stopped, ovf_band, ovf_scap,
#                        last_state, n_iter_lo, n_iter_hi, last_ptr, snap_cnt]
(O_S, O_DONE, O_STOP, O_OVFB, O_OVFS, O_LS, O_NLO, O_NHI,
 O_LP, O_SNC, O_N) = range(11)


@dataclass(frozen=True)
class KSpec:
    """Static configuration of the fused-cycle kernel."""

    B: int
    WR: int          # band rows; W = WR * 128 diagonals
    S_CAP: int       # cycle budget (tb rows)
    x: int
    o1: int
    e1: int
    o2: int
    e2: int
    mode: int = MODE_SCORE
    cpw: int = 16    # chars per packed word (16 = 2-bit ACGT, 4 = bytes)
    seg_cap: int = 1
    use_seg: bool = False
    max_s: int = 0
    max_iter: int = 0
    step: int = 0    # low-mem snapshot period (pass 1)
    n_snap: int = 0  # snapshot row capacity (pass 1)
    nseg: int = 1    # word-table segments (each 128*128 words); the
                     # resident segment lives in VMEM, others in HBM

    @property
    def W(self) -> int:
        return self.WR * 128

    @property
    def NS(self) -> int:  # shrink scan depth = max_pen + 1 (miniwfa.c:390)
        return max(self.x, self.o1 + self.e1, self.o2 + self.e2) + 1

    @property
    def max_len(self) -> int:
        nblk = (self.nseg - 1) * SEGSTRIDE + NTAB
        return (nblk * NTAB - 2 * NTAB) * self.cpw


def _ages(spec: KSpec):
    return dict(x=spec.x, o1=spec.o1 + spec.e1, o2=spec.o2 + spec.e2,
                e1=spec.e1, e2=spec.e2)


def snapshot_layout(spec: KSpec):
    """Plane offsets of the serialized sf rings in a snapshot row
    [NP, WR, 128]: [H ring | E1 ring | F1 ring | E2 ring | F2 ring].
    A flat pointer is ``plane*W + w``; the host decoder
    (models/traceback.decode_checkpoints_kernel) inverts this."""
    ages = _ages(spec)
    DH = max(ages["x"], ages["o1"], ages["o2"])
    DE1 = max(ages["e1"], 1)
    DE2 = max(ages["e2"], 1)
    p_h = 0
    p_e1 = p_h + DH
    p_f1 = p_e1 + DE1
    p_e2 = p_f1 + DE1
    p_f2 = p_e2 + DE2
    return p_h, p_e1, p_f1, p_e2, p_f2, p_f2 + DE2


def build_kernel(spec: KSpec):
    """Build the pallas_call wrapper.  Returns fn(scal, twt, twq) ->
    (out_scal [B, O_N], tb [B, S_CAP, WR, 128] int32 if TB mode)."""
    WR, W = spec.WR, spec.W
    CPW = spec.cpw
    BITS = 32 // CPW              # bits per char
    LOGC = {16: 4, 4: 2}[CPW]     # log2 chars/word
    LOGB = {16: 1, 4: 3}[CPW]     # log2 bits/char
    NEG = WF_NEG_INF       # python ints: jnp constants would be captures
    BIG = 0x3FFFFFFF
    is_tb = spec.mode == MODE_TB
    is_p1 = spec.mode == MODE_PASS1
    ages = _ages(spec)
    DH = max(ages["x"], ages["o1"], ages["o2"])      # H ring depth
    DE1 = max(ages["e1"], 1)
    DE2 = max(ages["e2"], 1)
    NS = spec.NS
    nsc = SC_SEG + 2 * spec.seg_cap
    # snapshot plane layout: the serialized sf rings ARE the reachable set
    # (scores >= t+1-age for each state kind) — see snapshot_layout()
    P_H, P_E1, P_F1, P_E2, P_F2, NP = snapshot_layout(spec)

    # [WR,128] index planes (constants)
    def iota_r():
        return lax.broadcasted_iota(jnp.int32, (WR, 128), 0)

    def iota_l():
        return lax.broadcasted_iota(jnp.int32, (WR, 128), 1)

    def sh_m1(a):
        """Value at flat window slot w-1 (diagonal d-1); edge reads NEG."""
        left = jnp.concatenate(
            [jnp.full((WR, 1), NEG, a.dtype), a[:, :-1]], 1)
        carry = jnp.concatenate(
            [jnp.full((1, 128), NEG, a.dtype), a[:-1, :]], 0)[:, 127:128]
        return jnp.where(iota_l() == 0, carry, left)

    def sh_p1(a):
        right = jnp.concatenate(
            [a[:, 1:], jnp.full((WR, 1), NEG, a.dtype)], 1)
        carry = jnp.concatenate(
            [a[1:, :], jnp.full((1, 128), NEG, a.dtype)], 0)[:, 0:1]
        return jnp.where(iota_l() == 127, carry, right)

    def gat(tab, idx):
        """Same-shape lane gather in <=64-row chunks (Mosaic fast path)."""
        outs = []
        for r0 in range(0, WR, 64):
            r1 = min(r0 + 64, WR)
            outs.append(jnp.take_along_axis(tab[r0:r1], idx[r0:r1], axis=1))
        return jnp.concatenate(outs, 0) if len(outs) > 1 else outs[0]

    def ctz_chars(x):
        """First mismatching char index of a packed XOR word (x != 0)."""
        u = x.astype(jnp.uint32)
        ctz = lax.population_count(
            jnp.bitwise_and(~u, u - jnp.uint32(1)).astype(jnp.int32))
        return jnp.right_shift(ctz, LOGB)

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

    def kernel(scal_ref,            # SMEM [B, nsc] (scalar prefetch)
               twt_ref, twq_ref,    # VMEM [1, 128, 128] per-lane word tables
               out_ref,             # SMEM [B, O_N]
               *refs):
        if is_tb:
            tb_ref = refs[0]
            refs = refs[1:]
        if is_p1:
            snap_ref = refs[0]
            refs = refs[1:]
        (rH, rE1, rF1, rE2, rF2, vb,
         tH, tE1, tF1, tE2, tF2,
         wta, wtb, wqa, wqb, baT, baQ,
         pbits, tbrow, sem,
         twtv, twqv, cs, sem2, wtmp) = refs[:25]
        if is_p1:
            (sH, sE1, sF1, sE2, sF2,
             tHs, tE1s, tF1s, tE2s, tF2s, bnd_lo, bnd_hi) = refs[25:]

        b = pl.program_id(0)
        tl = scal_ref[b, SC_TL]
        ql = scal_ref[b, SC_QL]
        anc = scal_ref[b, SC_ANC]
        n_seg = scal_ref[b, SC_NSEG]
        d_end = ql - tl
        DD = anc + iota_r() * 128 + iota_l()      # diagonal per window slot

        # ---- init (scratch persists across grid steps: reset everything)
        for ring, depth in ((rH, DH), (rE1, DE1), (rF1, DE1),
                            (rE2, DE2), (rF2, DE2)):
            for j in range(depth):
                ring[j] = jnp.full((WR, 128), NEG, jnp.int32)
        vb[:] = jnp.zeros((WR, 128), jnp.int32)
        # score-0 top: H[d=0] = -1 (miniwfa.c:119)
        tH[:] = jnp.where(DD == 0, -1, NEG)
        for r in (tE1, tF1, tE2, tF2):
            r[:] = jnp.full((WR, 128), NEG, jnp.int32)
        for r in (wta, wtb, wqa, wqb):
            r[:] = jnp.zeros(r.shape, jnp.int32)
        baT[:] = jnp.full((WR, 128), BIG, jnp.int32)  # all-miss
        baQ[:] = jnp.full((WR, 128), BIG, jnp.int32)
        pbits[:] = jnp.zeros((WR, 128), jnp.int32)
        # resident word-table segment per side: start at segment 0
        cp0 = pltpu.make_async_copy(twt_ref.at[b, 0], twtv, sem2)
        cp0.start()
        cp0.wait()
        cp1 = pltpu.make_async_copy(twq_ref.at[b, 0], twqv, sem2)
        cp1.start()
        cp1.wait()
        cs[0] = 0
        cs[1] = 0
        if is_p1:
            for ring, depth in ((sH, DH), (sE1, DE1), (sF1, DE1),
                                (sE2, DE2), (sF2, DE2)):
                for j in range(depth):
                    ring[j] = jnp.full((WR, 128), NEG, jnp.int32)
            # origin pointer -1 at d=0 (reference miniwfa.c:119 / lax init)
            tHs[:] = jnp.where(DD == 0, -1, NEG)
            for r in (tE1s, tF1s, tE2s, tF2s):
                r[:] = jnp.full((WR, 128), NEG, jnp.int32)
            for j in range(DH):
                bnd_lo[j] = 1   # empty band until really written
                bnd_hi[j] = 0


        NSEGB = (spec.nseg - 1) * SEGSTRIDE + NTAB  # global block count

        def refill(needy, jT, jQ):
            """Re-window rows with out-of-window probes.  Per needy row ONE
            element is elected (smallest target word, then smallest query
            word among ties) and BOTH windows re-center on it — re-centering
            the two sides on different elements can ping-pong forever when a
            row's live probes span more than a window (the cross-side
            livelock).  The elected element is guaranteed covered, so every
            refill makes progress.

            Long sequences: the word table lives in HBM as overlapping
            segments (stride 127 of 128 blocks, so a row's 2-block window
            never straddles a segment); one segment per side is resident in
            VMEM.  When the globally smallest needy row's block lies in
            another segment, that segment is DMA'd in (so that row refills
            next round — progress); rows whose blocks are NOT resident get
            their windows invalidated (base=BIG) instead of garbage."""
            has = jnp.any(needy, axis=1, keepdims=True)           # [WR,1]
            jTn = jnp.where(needy, jT, BIG)
            jminT = jnp.min(jTn, axis=1, keepdims=True)
            elect = needy & (jTn == jminT)
            jminQ = jnp.min(jnp.where(elect, jQ, BIG), axis=1,
                            keepdims=True)

            def pick(base, jmin):
                a_new = jnp.clip(jmin >> 7, 0, NSEGB - 1)
                a_cur = jnp.clip(base[:, 0:1] >> 7, 0, NSEGB - 1)
                return jnp.where(has, a_new, a_cur)               # [WR,1]

            aT = pick(baT, jminT)
            aQ = pick(baQ, jminQ)
            if spec.nseg > 1:
                # BOTH resident segments follow the same globally-elected
                # row (smallest target block among needy rows, then its
                # query block) — independent per-side choices can chase
                # different rows and deadlock, the cross-side livelock at
                # segment granularity
                any_has = jnp.any(has)
                gT = jnp.min(jnp.where(has, aT, NSEGB))
                sel_rows = has & (aT == gT)
                gQ = jnp.min(jnp.where(sel_rows, aQ, NSEGB))
                segT = jnp.clip(gT // SEGSTRIDE, 0, spec.nseg - 1)
                segQ = jnp.clip(gQ // SEGSTRIDE, 0, spec.nseg - 1)

                @pl.when(any_has & (segT != cs[0]))
                def _():
                    cp = pltpu.make_async_copy(twt_ref.at[b, segT], twtv,
                                               sem2)
                    cp.start()
                    cp.wait()
                    cs[0] = segT

                @pl.when(any_has & (segQ != cs[1]))
                def _():
                    cp = pltpu.make_async_copy(twq_ref.at[b, segQ], twqv,
                                               sem2)
                    cp.start()
                    cp.wait()
                    cs[1] = segQ

                cst, csq = cs[0], cs[1]
            else:
                cst = csq = 0
            resT = (jnp.clip(aT // SEGSTRIDE, 0, spec.nseg - 1) == cst)
            resQ = (jnp.clip(aQ // SEGSTRIDE, 0, spec.nseg - 1) == csq)
            # only rows whose elected blocks are resident are (re)windowed;
            # others keep their current (still valid) windows and wait for
            # the resident segment to rotate to them — rewriting them with
            # non-resident garbage would invalidate half the band on every
            # segment switch (a refill storm when the band straddles a
            # segment boundary)
            mf = has & resT & resQ  # both windows re-center together
            baT[:] = jnp.broadcast_to(jnp.where(mf, aT * 128, baT[:, 0:1]),
                                      (WR, 128))
            baQ[:] = jnp.broadcast_to(jnp.where(mf, aQ * 128, baQ[:, 0:1]),
                                      (WR, 128))
            mpad = jnp.broadcast_to(mf, (WR, 128))
            aTloc = jnp.clip(aT - cst * SEGSTRIDE, 0, NTAB - 1)
            aQloc = jnp.clip(aQ - csq * SEGSTRIDE, 0, NTAB - 1)
            twt = twtv[:]
            twq = twqv[:]
            # band rows are re-windowed in 128-row blocks (the gather dim
            # is capped at one vreg = 128 lanes): [<=128,1] slice of the
            # per-row block ids -> lane vector -> broadcast rows.
            for blk in range((WR + NTAB - 1) // NTAB):
                r0 = blk * NTAB
                r1 = min(r0 + NTAB, WR)
                pad = NTAB - (r1 - r0)

                def lanes(a):
                    a = a[r0:r1]
                    if pad:
                        a = jnp.concatenate(
                            [a, jnp.zeros((pad, 1), jnp.int32)], 0)
                    return a

                mrow = mpad[r0:r1]
                if pad:
                    mrow = jnp.concatenate(
                        [mrow, jnp.zeros((pad, 128), bool)], 0)
                aTl, aQl = lanes(aTloc), lanes(aQloc)
                # NOTE: arithmetic on these broadcast transposes crashes
                # the TPU compiler ("limits <= dim" abort) — the +1 for
                # the second window block is applied to the narrow vector
                # BEFORE the transpose+broadcast.
                idxT = jnp.broadcast_to(aTl.T, (NTAB, NTAB))
                idxQ = jnp.broadcast_to(aQl.T, (NTAB, NTAB))
                idxT1 = jnp.broadcast_to(
                    jnp.minimum(aTl + 1, NTAB - 1).T, (NTAB, NTAB))
                idxQ1 = jnp.broadcast_to(
                    jnp.minimum(aQl + 1, NTAB - 1).T, (NTAB, NTAB))

                def fill(win_ref, tw, idx):
                    g0 = jnp.take_along_axis(tw[0:64], idx[0:64], axis=1)
                    g1 = jnp.take_along_axis(tw[64:128], idx[64:128], axis=1)
                    # a masked store of a transpose result aborts the TPU
                    # compiler: write the transpose to a temp, then do a
                    # plain masked select of two scratch values
                    wtmp[:] = jnp.concatenate([g0, g1], 0).T
                    win_ref[r0:r0 + NTAB] = jnp.where(
                        mrow, wtmp[:], win_ref[r0:r0 + NTAB])

                fill(wta, twt, idxT)
                fill(wtb, twt, idxT1)
                fill(wqa, twq, idxQ)
                fill(wqb, twq, idxQ1)

        def probe_side(win_a, win_b, base, pos):
            """16/4-char probe word at char ``pos`` from the row window.
            Returns (chars, n_valid, in_window, word_idx)."""
            j = jnp.right_shift(pos, LOGC)
            c = j - base[:]
            in_win = (c >= 0) & (c < 2 * NTAB)
            cc = jnp.clip(c, 0, 2 * NTAB - 1)
            ca = jnp.minimum(cc, NTAB - 1)
            cb = jnp.clip(cc - NTAB, 0, NTAB - 1)
            ga = gat(win_a[0:WR], ca)
            gb = gat(win_b[0:WR], cb)
            w0 = jnp.where(cc < NTAB, ga, gb)
            off = jnp.bitwise_and(pos, CPW - 1)
            chars = jnp.right_shift(w0.astype(jnp.uint32),
                                    (off * BITS).astype(jnp.uint32))
            return chars, CPW - off, in_win, j

        def extend(k, elig):
            """Full-band LCP extension; returns advanced k.  Mirrors the
            per-diagonal semantics of miniwfa.c:212-226 with the advance
            capped at the matrix edge (no sentinels)."""
            def cond(c):
                return jnp.any(c[1] != 0) & (c[2] < MAXR_SAFETY)

            def body(c):
                k, un_i, rnd = c
                un = un_i != 0   # i1 vectors can't be loop carries (Mosaic)
                pos_t = k + 1
                pos_q = DD + k + 1
                cht, nvt, inwt, jT = probe_side(wta, wtb, baT, pos_t)
                chq, nvq, inwq, jQ = probe_side(wqa, wqb, baQ, pos_q)
                inw = inwt & inwq
                nv = jnp.minimum(nvt, nvq)
                x = jnp.bitwise_xor(cht, chq).astype(jnp.int32)
                # chars at c >= nv are shifted-in garbage: force mismatch
                shv = (nv * BITS).astype(jnp.uint32)
                tail = jnp.where(nv >= CPW, jnp.uint32(0),
                                 jnp.left_shift(jnp.uint32(0xFFFFFFFF), shv))
                xf = x | tail.astype(jnp.int32)
                run = jnp.where(xf == 0, nv, ctz_chars(xf))
                cap = jnp.minimum(tl - 1 - k, ql - 1 - (DD + k))
                cap = jnp.maximum(cap, 0)
                adv = jnp.minimum(run, cap)
                act = un & inw
                k = jnp.where(act, k + adv, k)
                resolved = act & ((run < nv) | (adv >= cap))
                un = un & ~resolved
                # recompute probe words at the ADVANCED positions so the
                # elected element's windows cover where it will probe next
                needy = un & ~inw
                jT2 = jnp.right_shift(k + 1, LOGC)
                jQ2 = jnp.right_shift(DD + k + 1, LOGC)
                @pl.when(jnp.any(needy))
                def _():
                    refill(needy, jT2, jQ2)
                return k, un.astype(jnp.int32), rnd + 1

            k, un_i, rnd = lax.while_loop(
                cond, body, (k, elig.astype(jnp.int32), jnp.int32(0)))
            stuck = rnd >= MAXR_SAFETY
            return k, stuck

        def rd(ring, depth, top_ref, t, age):
            """Source slice at score t+1-age: the top registers when age==1,
            else the ring (slot = score mod depth; jnp.mod is non-negative,
            so virtual negative scores read still-initial NEG slots that are
            overwritten only after their last possible read)."""
            if age == 1:
                return top_ref[:]
            return ring[(t + 1 - age) % depth]

        def good_diag(v):
            """k in [-1, tl) and d+k in [-1, ql) (miniwfa.c:139-171)."""
            return (v >= -1) & (v < tl) & (DD + v >= -1) & (DD + v < ql)

        def cycle(carry):
            (t, wf_lo, wf_hi, t_lo, t_hi, done_i, stopped_i, ovf_i,
             final_s, last_state, n_lo, n_hi, sid, lp, snc) = carry
            done, stopped, ovf = done_i != 0, stopped_i != 0, ovf_i != 0

            # --- 1. extension over the top slice band (miniwfa.c:400-411)
            k_old = tH[:]
            in_top = (DD >= t_lo) & (DD <= t_hi)
            elig = in_top & (k_old >= -1) & (DD + k_old >= -1) \
                & (k_old < tl) & (DD + k_old < ql)
            k_new, ext_stuck = extend(k_old, elig)
            k_new = jnp.where(elig, k_new, k_old)
            tH[:] = k_new
            ovf = ovf | ext_stuck  # never in correct operation

            # --- 2. termination (miniwfa.c:405-408)
            at_end = elig & (DD == d_end)
            term = jnp.any(at_end & (k_new == tl - 1))
            zero_ext = term & (t > 0) & jnp.any(
                at_end & (k_new == k_old) & (k_new == tl - 1))
            if is_tb:
                bits_at = jnp.max(jnp.where(DD == d_end, pbits[:], 0))
                last_state = jnp.where(zero_ext, bits_at & 7, last_state)
            if is_p1:
                # terminal provenance pointer (reference miniwfa.c:577)
                ptr = jnp.max(jnp.where(at_end, tHs[:], NEG))
                lp = jnp.where(term, ptr, lp)
            done = done | term
            final_s = jnp.where(term, t, final_s)

            # --- 3. pass-2 checkpoint collapse (miniwfa.c:413-416)
            if spec.use_seg:
                cid = jnp.clip(sid, 0, spec.seg_cap - 1)
                cur_s = scal_ref[b, SC_SEG + cid]
                cur_d = scal_ref[b, SC_SEG + spec.seg_cap + cid]
                hit = ~term & (sid < n_seg) & (cur_s == t)
                wf_lo = jnp.where(hit, cur_d, wf_lo)
                wf_hi = jnp.where(hit, cur_d, wf_hi)
                sid = jnp.where(hit, sid + 1, sid)

            # --- 4. band growth + window-overflow check (miniwfa.c:417-418)
            lo = jnp.maximum(wf_lo - 1, -tl)
            hi = jnp.minimum(wf_hi + 1, ql)
            width = hi - lo + 1
            ovf_now = ~term & ((lo < anc) | (hi > anc + W - 1))
            ovf = ovf | ovf_now
            act = ~term & ~ovf_now

            # --- 5b. low-mem snapshot bookkeeping (miniwfa.c:585-586):
            # due when score t+1 is a multiple of step, after retiring t
            if is_p1:
                snap_due = act & (jnp.mod(t + 1, spec.step) == 0)
                row = (t + 1) // spec.step - 1
                snap_ok = row < spec.n_snap
                snc = jnp.where(snap_due & snap_ok, snc + 1, snc)
                ovf = ovf | (snap_due & ~snap_ok)
                act = act & ~(snap_due & ~snap_ok)

            @pl.when(act)
            def _():
                # --- 5. retire tops into the rings at slot t mod depth;
                # record slice viability for the shrink scan
                slot = lambda d: t % d  # noqa: E731
                rH[slot(DH)] = tH[:]
                rE1[slot(DE1)] = tE1[:]
                rF1[slot(DE1)] = tF1[:]
                rE2[slot(DE2)] = tE2[:]
                rF2[slot(DE2)] = tF2[:]
                viab = jnp.zeros((WR, 128), bool)
                for r in (tH, tE1, tF1, tE2, tF2):
                    viab |= good_diag(r[:])
                # bit-packed slice viability: bit j = slice of score t-j
                # (kept NS deep; requires NS <= 31, enforced by the host)
                vb[:] = ((vb[:] << 1) | (viab & in_top).astype(jnp.int32)) \
                    & ((1 << NS) - 1)
                if is_p1:
                    sH[slot(DH)] = tHs[:]
                    sE1[slot(DE1)] = tE1s[:]
                    sF1[slot(DE1)] = tF1s[:]
                    sE2[slot(DE2)] = tE2s[:]
                    sF2[slot(DE2)] = tF2s[:]
                    bnd_lo[slot(DH)] = t_lo
                    bnd_hi[slot(DH)] = t_hi

            if is_p1:
                @pl.when(act & snap_due)
                def _():
                    # --- 5c. serialize the sf rings (exactly the reachable
                    # slices, vs the reference's full NS x 5 stripe,
                    # miniwfa.c:451-474) and reset them to fresh flat
                    # indices plane*W + w within each slice's band
                    w_idx = iota_r() * 128 + iota_l()
                    rings = ((sH, DH, P_H), (sE1, DE1, P_E1),
                             (sF1, DE1, P_F1), (sE2, DE2, P_E2),
                             (sF2, DE2, P_F2))
                    for ring, dp, p0 in rings:
                        cp = pltpu.make_async_copy(
                            ring, snap_ref.at[b, row, p0:p0 + dp], sem)
                        cp.start()
                        cp.wait()
                    for ring, dp, p0 in rings:
                        for j in range(dp):
                            s_j = t - jnp.mod(t - j, dp)
                            in_b = (s_j >= 0) \
                                & (DD >= bnd_lo[s_j % DH]) \
                                & (DD <= bnd_hi[s_j % DH])
                            ring[j] = jnp.where(in_b, (p0 + j) * W + w_idx,
                                                NEG)
                    # refresh the sf top registers (score t) to match their
                    # just-reset ring copies: age-1 reads bypass the ring
                    in_t = (DD >= t_lo) & (DD <= t_hi)
                    for top, dp, p0 in ((tHs, DH, P_H), (tE1s, DE1, P_E1),
                                        (tF1s, DE1, P_F1), (tE2s, DE2, P_E2),
                                        (tF2s, DE2, P_F2)):
                        top[:] = jnp.where(
                            in_t, (p0 + t % dp) * W + w_idx, NEG)

            @pl.when(act)
            def _():
                # --- 6. transition into score t+1 (wf_next_prep/tb,
                # miniwfa.c:243-327); age-1 sources are the tops
                ho1 = rd(rH, DH, tH, t, ages["o1"])
                ho2 = rd(rH, DH, tH, t, ages["o2"])
                src = dict(
                    Hx=rd(rH, DH, tH, t, ages["x"]),
                    Ho1m=sh_m1(ho1), Ho1p=sh_p1(ho1),
                    Ho2m=sh_m1(ho2), Ho2p=sh_p1(ho2),
                    E1m=sh_m1(rd(rE1, DE1, tE1, t, ages["e1"])),
                    F1p=sh_p1(rd(rF1, DE1, tF1, t, ages["e1"])),
                    E2m=sh_m1(rd(rE2, DE2, tE2, t, ages["e2"])),
                    F2p=sh_p1(rd(rF2, DE2, tF2, t, ages["e2"])))
                Hn, E1n, F1n, E2n, F2n, bits = transition_values(src)
                in_new = (DD >= lo) & (DD <= hi)
                tH[:] = jnp.where(in_new, Hn, NEG)
                tE1[:] = jnp.where(in_new, E1n, NEG)
                tF1[:] = jnp.where(in_new, F1n, NEG)
                tE2[:] = jnp.where(in_new, E2n, NEG)
                tF2[:] = jnp.where(in_new, F2n, NEG)
                if is_tb:
                    bits_m = jnp.where(in_new, bits, 0)
                    pbits[:] = bits_m
                    tbrow[:] = bits_m
                    cp = pltpu.make_async_copy(
                        tbrow, tb_ref.at[b, jnp.minimum(t, spec.S_CAP - 1)],
                        sem)
                    cp.start()
                    cp.wait()
                if is_p1:
                    # propagate snapshot pointers along the just-chosen
                    # transitions (reference wf_next_seg, miniwfa.c:495-523
                    # — fused with the value recurrence, which the C
                    # couldn't vectorize fused)
                    ho1s = rd(sH, DH, tHs, t, ages["o1"])
                    ho2s = rd(sH, DH, tHs, t, ages["o2"])
                    hxs = rd(sH, DH, tHs, t, ages["x"])
                    e1p = jnp.where(bits & 0x08 != 0,
                                    sh_m1(rd(sE1, DE1, tE1s, t, ages["e1"])),
                                    sh_m1(ho1s))
                    f1p = jnp.where(bits & 0x10 != 0,
                                    sh_p1(rd(sF1, DE1, tF1s, t, ages["e1"])),
                                    sh_p1(ho1s))
                    e2p = jnp.where(bits & 0x20 != 0,
                                    sh_m1(rd(sE2, DE2, tE2s, t, ages["e2"])),
                                    sh_m1(ho2s))
                    f2p = jnp.where(bits & 0x40 != 0,
                                    sh_p1(rd(sF2, DE2, tF2s, t, ages["e2"])),
                                    sh_p1(ho2s))
                    z = bits & 7
                    hp = hxs
                    hp = jnp.where(z == 1, e1p, hp)
                    hp = jnp.where(z == 2, f1p, hp)
                    hp = jnp.where(z == 3, e2p, hp)
                    hp = jnp.where(z == 4, f2p, hp)
                    tHs[:] = jnp.where(in_new, hp, NEG)
                    tE1s[:] = jnp.where(in_new, e1p, NEG)
                    tF1s[:] = jnp.where(in_new, f1p, NEG)
                    tE2s[:] = jnp.where(in_new, e2p, NEG)
                    tF2s[:] = jnp.where(in_new, f2p, NEG)

            # boundary commit (miniwfa.c:325-326): read the new tops back
            viable = jnp.zeros((WR, 128), bool)
            for r in (tH, tE1, tF1, tE2, tF2):
                viable |= r[:] >= -1
            lo_ok = jnp.any(viable & (DD == lo))
            hi_ok = jnp.any(viable & (DD == hi))
            wf_lo = jnp.where(act & lo_ok, lo, wf_lo)
            wf_hi = jnp.where(act & hi_ok, hi, wf_hi)
            t_lo = jnp.where(act, lo, t_lo)
            t_hi = jnp.where(act, hi, t_hi)

            # --- 7. periodic shrink every 256 cycles (miniwfa.c:420):
            # good-diagonal hull over the NS retired slices (minus the
            # stale slot for score t+1-NS) plus the new tops
            sh_due = act & (((t + 1) & 0xFF) == 0)
            good = viable & (DD >= t_lo) & (DD <= t_hi)
            # retired slices of scores t..t-NS+2 (the stale score t+1-NS
            # slice is bit NS-1, excluded — miniwfa.c:144-171 semantics)
            good |= (vb[:] & ((1 << (NS - 1)) - 1)) != 0
            good &= (DD >= wf_lo) & (DD <= wf_hi)
            has = jnp.any(good)
            new_lo = jnp.min(jnp.where(good, DD, BIG))
            new_hi = jnp.max(jnp.where(good, DD, -BIG))
            wf_lo = jnp.where(sh_due & has, new_lo, wf_lo)
            wf_hi = jnp.where(sh_due & has, new_hi, wf_hi)

            # --- 8. accounting + early stop (miniwfa.c:421-425)
            n_lo = n_lo + jnp.where(act, width, 0)
            n_hi = n_hi + (n_lo >> 30)
            n_lo = n_lo & 0x3FFFFFFF
            stop = jnp.zeros((), bool)
            if spec.max_iter > 0:
                mi_hi, mi_lo = spec.max_iter >> 30, spec.max_iter & 0x3FFFFFFF
                stop |= (n_hi > mi_hi) | ((n_hi == mi_hi) & (n_lo > mi_lo))
            if spec.max_s > 0:
                stop |= t + 1 > spec.max_s
            stopped = stopped | (act & stop)
            return (t + 1, wf_lo, wf_hi, t_lo, t_hi,
                    done.astype(jnp.int32), stopped.astype(jnp.int32),
                    ovf.astype(jnp.int32),
                    final_s, last_state, n_lo, n_hi, sid, lp, snc)

        def cond(carry):
            t, done, stopped, ovf = carry[0], carry[5], carry[6], carry[7]
            return (done + stopped + ovf == 0) & (t < spec.S_CAP - 1)

        z = jnp.int32(0)
        carry = (z, z, z, z, z,                      # t, wf_lo/hi, t_lo/hi
                 z, z, z,                            # done, stopped, ovf
                 jnp.int32(-1), z, z, z, z,          # final_s, last_state,
                                                     # n_lo, n_hi, sid
                 jnp.int32(WF_NEG_INF), z)           # last_ptr, snap_cnt
        carry = lax.while_loop(cond, cycle, carry)
        (t, _, _, _, _, done_i, stopped_i, ovf_i,
         final_s, last_state, n_lo, n_hi, _, lp, snc) = carry
        done, stopped, ovf = done_i != 0, stopped_i != 0, ovf_i != 0
        alive = ~(done | stopped | ovf)
        out_ref[b, O_S] = final_s
        out_ref[b, O_DONE] = done.astype(jnp.int32)
        out_ref[b, O_STOP] = stopped.astype(jnp.int32)
        out_ref[b, O_OVFB] = ovf.astype(jnp.int32)
        out_ref[b, O_OVFS] = alive.astype(jnp.int32)
        out_ref[b, O_LS] = last_state
        out_ref[b, O_NLO] = n_lo
        out_ref[b, O_NHI] = n_hi
        out_ref[b, O_LP] = lp
        out_ref[b, O_SNC] = snc

    # ---- pallas_call plumbing
    out_shapes = [jax.ShapeDtypeStruct((spec.B, O_N), jnp.int32)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    if is_tb:
        # full-array ANY ref (HBM): rows DMA'd at dynamic [lane, cycle]
        out_shapes.append(jax.ShapeDtypeStruct(
            (spec.B, spec.S_CAP, WR, 128), jnp.int32))
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    if is_p1:
        # snapshot rows: serialized sf rings, DMA'd at [lane, snapshot]
        out_shapes.append(jax.ShapeDtypeStruct(
            (spec.B, max(spec.n_snap, 1), NP, WR, 128), jnp.int32))
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))

    scratch = [
        pltpu.VMEM((DH, WR, 128), jnp.int32),    # rH
        pltpu.VMEM((DE1, WR, 128), jnp.int32),   # rE1
        pltpu.VMEM((DE1, WR, 128), jnp.int32),   # rF1
        pltpu.VMEM((DE2, WR, 128), jnp.int32),   # rE2
        pltpu.VMEM((DE2, WR, 128), jnp.int32),   # rF2
        pltpu.VMEM((WR, 128), jnp.int32),        # vb (bit-packed)
        pltpu.VMEM((WR, 128), jnp.int32),        # tH
        pltpu.VMEM((WR, 128), jnp.int32),        # tE1
        pltpu.VMEM((WR, 128), jnp.int32),        # tF1
        pltpu.VMEM((WR, 128), jnp.int32),        # tE2
        pltpu.VMEM((WR, 128), jnp.int32),        # tF2
        pltpu.VMEM((((WR + 127) // 128) * 128, 128), jnp.int32),  # wta
        pltpu.VMEM((((WR + 127) // 128) * 128, 128), jnp.int32),  # wtb
        pltpu.VMEM((((WR + 127) // 128) * 128, 128), jnp.int32),  # wqa
        pltpu.VMEM((((WR + 127) // 128) * 128, 128), jnp.int32),  # wqb
        pltpu.VMEM((WR, 128), jnp.int32),        # baT
        pltpu.VMEM((WR, 128), jnp.int32),        # baQ
        pltpu.VMEM((WR, 128), jnp.int32),        # pbits
        pltpu.VMEM((WR, 128), jnp.int32),        # tbrow
        pltpu.SemaphoreType.DMA,
        pltpu.VMEM((NTAB, NTAB), jnp.int32),     # twtv (resident segment)
        pltpu.VMEM((NTAB, NTAB), jnp.int32),     # twqv
        pltpu.SMEM((2,), jnp.int32),             # cs (resident seg ids)
        pltpu.SemaphoreType.DMA,                 # sem2 (table DMA)
        pltpu.VMEM((NTAB, NTAB), jnp.int32),     # wtmp (masked-fill temp)
    ]
    if is_p1:
        scratch += [
            pltpu.VMEM((DH, WR, 128), jnp.int32),    # sH
            pltpu.VMEM((DE1, WR, 128), jnp.int32),   # sE1
            pltpu.VMEM((DE1, WR, 128), jnp.int32),   # sF1
            pltpu.VMEM((DE2, WR, 128), jnp.int32),   # sE2
            pltpu.VMEM((DE2, WR, 128), jnp.int32),   # sF2
            pltpu.VMEM((WR, 128), jnp.int32),        # tHs
            pltpu.VMEM((WR, 128), jnp.int32),        # tE1s
            pltpu.VMEM((WR, 128), jnp.int32),        # tF1s
            pltpu.VMEM((WR, 128), jnp.int32),        # tE2s
            pltpu.VMEM((WR, 128), jnp.int32),        # tF2s
            pltpu.SMEM((DH,), jnp.int32),            # bnd_lo
            pltpu.SMEM((DH,), jnp.int32),            # bnd_hi
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(spec.B,),
        in_specs=[
            # full [B, nseg, 128, 128] word tables stay in HBM; the
            # resident segment is DMA'd into VMEM per lane
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
def get_kernel(spec: KSpec, interpret: bool = False):
    """Jitted fused-cycle aligner.  Returns fn(scal, twt, twq) -> dict
    with the same keys as the lax engine's output (ops/wavefront.py)."""
    call = build_kernel(spec)
    is_tb = spec.mode == MODE_TB
    is_p1 = spec.mode == MODE_PASS1

    def run(scal, twt, twq):
        outs = call(scal, twt, twq, interpret=interpret)
        o = outs[0]
        res = dict(
            final_s=o[:, O_S], done=o[:, O_DONE] != 0,
            stopped=o[:, O_STOP] != 0, ovf_band=o[:, O_OVFB] != 0,
            ovf_scap=o[:, O_OVFS] != 0,
            overflow=(o[:, O_OVFB] != 0) | (o[:, O_OVFS] != 0),
            last_state=o[:, O_LS], n_iter_lo=o[:, O_NLO],
            n_iter_hi=o[:, O_NHI])
        if is_tb:
            # walker layout: [B, S_CAP, W] uint8 rows anchored at anc
            res["tb_bits"] = (outs[1] & 0x7F).astype(jnp.uint8).reshape(
                spec.B, spec.S_CAP, spec.W)
            res["tb_anc"] = jnp.broadcast_to(
                scal[:, SC_ANC:SC_ANC + 1], (spec.B, spec.S_CAP))
        if is_p1:
            np_ = snapshot_layout(spec)[5]
            res["snap"] = outs[1].reshape(
                spec.B, max(spec.n_snap, 1), np_ * spec.W)
            res["snap_cnt"] = o[:, O_SNC]
            res["last_ptr"] = o[:, O_LP]
        return res

    return jax.jit(run)


def nseg_for(length: int, cpw: int) -> int:
    """Segments needed for a sequence length (word-table capacity)."""
    nw = length // cpw + 2
    nb = -(-nw // NTAB)
    return 1 if nb <= NTAB else -(-(nb - NTAB) // SEGSTRIDE) + 1


def pack_table(seqs, cpw: int, nseg: int = 1):
    """Pack sequences into the kernel's segmented transposed word tables
    [B, nseg, 128, 128] int32: segment s, entry [j, a] = packed word
    s*SEGSTRIDE*128 + a*128 + j, each word holding cpw chars little-endian.
    Segments overlap by one 128-word block (SEGSTRIDE=127) so a row's
    2-block probe window never straddles a segment boundary."""
    import numpy as np
    from . import pack as pk

    bits = 2 if cpw == 16 else 8
    b = len(seqs)
    nblk = (nseg - 1) * SEGSTRIDE + NTAB
    flat = np.zeros((b, nblk * NTAB), dtype=np.uint32)
    for i, s in enumerate(seqs):
        if not len(s):
            continue
        raw = np.frombuffer(s, dtype=np.uint8)
        codes = pk._NT2[raw] if cpw == 16 else raw.astype(np.uint32)
        nw = (len(s) + cpw - 1) // cpw
        buf = np.zeros(nw * cpw, dtype=np.uint32)
        buf[:len(s)] = codes
        v = buf.reshape(nw, cpw)
        w = np.zeros(nw, dtype=np.uint32)
        for j in range(cpw):
            w |= v[:, j] << np.uint32(bits * j)
        flat[i, :nw] = w
    out = np.empty((b, nseg, NTAB, NTAB), dtype=np.uint32)
    for sgi in range(nseg):
        off = sgi * SEGSTRIDE * NTAB
        out[:, sgi] = flat[:, off:off + NTAB * NTAB] \
            .reshape(b, NTAB, NTAB).transpose(0, 2, 1)
    return np.ascontiguousarray(out).view(np.int32)
