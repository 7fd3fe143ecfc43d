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
costs in tools/microbench_mosaic*.py, tools/microbench_chunk.py):

* **Band window**: the diagonal band lives in a fixed lane-major window of
  ``W = WR*128`` diagonals: window slot w == diagonal ``anc + w``, laid out
  as ``[WR, 128]`` (sublane-rows x lanes).  The anchor is chosen by the
  host (midpoint of start diagonal 0 and end diagonal ql-tl) and never
  moves; a band outgrowing the window sets an overflow flag and the host
  retries in a larger-W bucket (models/exact.py escalation ladder).
  d±1 neighbour reads of the recurrence are flat shifts.

* **Band-proportional cycles**: every per-cycle phase (extension,
  retire, transition, traceback emit) sweeps only the CR-row *chunks*
  intersecting the LIVE band [lo, hi] — a ``lax.fori_loop`` with traced
  bounds over dynamically-offset sublane slices — so a cycle costs
  O(band), not O(W), exactly like the reference loop whose work is
  Σ band widths (miniwfa.c:397-426).  Cross-chunk d±1 neighbour values
  flow through [1,128] loop carries (m-side) and an 8-row overread
  (p-side; rings are padded to WR+8 rows).  Because rows outside a sweep
  keep stale data, every ring read is masked by the *recorded band* of
  the score it targets (``bnd_lo/bnd_hi`` SMEM registry, the analog of
  the reference's per-slice [lo,hi], miniwfa.c:67-137), and the
  shrink-viability bit-plane ``vb`` carries a per-cell last-update cycle
  ``lastt`` so re-entering rows age out their stale bits.

* **Rings in VMEM scratch**: per-state history rings ``[depth, WR+8,
  128]`` indexed with dynamic leading-dim reads/writes.  Depths are
  per-state maxima of the recurrence ages (H: max(x,o1+e1,o2+e2); E/F:
  e1/e2), not the uniform max_pen+1 of the C.

* **Match extension** (reference wf_extend1_padded, miniwfa.c:212-226):
  each band ROW (128 diagonals) owns a 2-block aligned window of 256
  packed words (4096 chars at cpw=16) of each sequence, held in VMEM.
  A probe is ONE same-shape lane-shuffle gather per window block +
  per-lane variable shifts; first mismatch via popcount-ctz.  All
  eligible diagonals of the live chunk probe simultaneously; rows whose
  probes leave their window trigger a vectorized refill over segmented
  HBM word tables (one resident [128,128] segment per side in VMEM,
  rotated by a globally-elected needy row).

* **Traceback rows** stream to HBM packed 4 rows/word: the 7-bit tb
  byte plane of each cycle (README.md:47-48) is folded 4 sublane rows
  into one int32 row ([CR,128] -> [CR/4,128]) and DMA'd per chunk into
  a ``[B, S_CAP, WR/4, 128] int32`` buffer (1 byte/cell, the
  reference's tb density, README.md:52-53) through an 8-slot ring of
  DMA buffers with deferred waits.  At 1 byte/cell a 5 Mb low-mem
  pass-2 (s≈270k, W=16384) fits in HBM whole, so the two-pass stripe
  mode needs no host streaming.

Limits of this engine (host falls back to ops/wavefront.py otherwise):
WR in [8, 512] (W in [1024, 65536]; low-mem pass 1 up to 32768 — its sf
shadow rings double the VMEM), sequence length bounded by the segmented
word tables (nseg<=64: ~16 Mb at cpw=16), modes SCORE, TB and PASS1,
max_pen+1 <= 31 (bit-packed viability plane).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

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
NSLOT = 8         # tb DMA buffer slots (deferred waits)
import os as _os
MAXR_SAFETY = int(_os.environ.get("MWF_MAXR_SAFETY", 1 << 20))
# extension-round hard bound; refill progress makes this unreachable in
# correct operation (a small override turns a suspected livelock into a
# visible band-overflow for debugging).  The VMEM kernel additionally
# bounds each extend() call by a LENGTH-DERIVED round count (tl//4 +
# 8192 covers the worst legitimate case: every straggler sub-window of
# a chunk consuming a full-length match run at >=32 chars/round, plus
# segment-rotation no-op rounds), so an undiagnosed livelock of the
# straggler loop (see the reverted wide-engine port, PERF_NOTES.md)
# fails in seconds as a visible stuck-lane overflow instead of hanging
# until the TPU worker watchdog kills the call.

# scalar-input layout (per lane): [tl, ql, anc, n_seg, max_s, max_iter_lo,
# max_iter_hi, seg_s..., seg_d...].  max_s / max_iter are RUNTIME scalars
# (not KSpec fields): the early-stop bounds (miniwfa.c:422-425) don't
# change the compiled program, and keeping them out of the cache key lets
# e.g. the auto driver's budgeted probe (max_iter=1e8, mwf_wfa_auto
# miniwfa.c:901) reuse the plain score path's warm compile.
(SC_TL, SC_QL, SC_ANC, SC_NSEG, SC_MS, SC_MILO, SC_MIHI,
 SC_SEG) = range(8)


def _env_subprobes() -> int:
    """Straggler sub-window probes per round.  Validated at KSpec
    construction (not kernel-build) so a bad value can't build a
    livelocking while_loop (0 would never clear un8) or raise mid-build,
    and the value participates in the lru-cache key (env changes after
    the first build are honored by later KSpec constructions)."""
    try:
        v = int(_os.environ.get("MWF_EXT_SUBPROBES", "4"))
    except ValueError:
        v = 4
    return max(1, v)

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
    step: int = 0    # low-mem snapshot period (pass 1)
    n_snap: int = 0  # snapshot row capacity (pass 1)
    nseg: int = 1    # word-table segments (each 128*128 words); the
                     # resident segment lives in VMEM, others in HBM
    cr: int = 8      # sweep chunk rows (multiple of 4, divides WR)
    subprobes: int = field(default_factory=_env_subprobes)
    # NOTE: max_s / max_iter are runtime scal columns (SC_MS/SC_MILO/
    # SC_MIHI), deliberately NOT spec fields — see the layout comment.

    @property
    def W(self) -> int:
        return self.WR * 128

    @property
    def NS(self) -> int:  # shrink scan depth = max_pen + 1 (miniwfa.c:390)
        return max(self.x, self.o1 + self.e1, self.o2 + self.e2) + 1

    @property
    def CR(self) -> int:
        # refill gathers pad row-blocks to NTAB rows, so CR <= NTAB;
        # clamp to the window first (pow2 WR keeps divisibility)
        c = min(self.cr, self.WR, NTAB)
        if c % 4 or self.WR % c:
            c = 8
        return c

    @property
    def max_len(self) -> int:
        nblk = (self.nseg - 1) * SEGSTRIDE + NTAB
        return (nblk * NTAB - 2 * NTAB) * self.cpw


def _ages(spec: KSpec):
    return dict(x=spec.x, o1=spec.o1 + spec.e1, o2=spec.o2 + spec.e2,
                e1=spec.e1, e2=spec.e2)


def transition_values(src):
    """5-state dual-affine recurrence + 7-bit tb byte with the exact
    reference tie-breaks (wf_next_tb, miniwfa.c:287-307).  ``src`` maps
    the 7 source blocks (same shape arrays); shared by the VMEM-ring
    engine below and the HBM-ring wide engine (wavefront_wide.py)."""
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


def snapshot_layout(spec: KSpec):
    """Plane offsets of the serialized sf rings in a snapshot row
    [NP, WR+8, 128]: [H ring | E1 ring | F1 ring | E2 ring | F2 ring].
    A flat pointer is ``plane*WP + w`` with WP = (WR+8)*128; the host
    decoder (models/traceback.decode_checkpoints_kernel) inverts this."""
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
    (out_scal [B, O_N], tb [B, S_CAP, WR//4, 128] int32 if TB mode)."""
    WR, W = spec.WR, spec.W
    WRP = WR + 8            # rings padded so CR+8 block loads never OOB
    WP = WRP * 128          # flat-pointer stride of snapshot planes
    CR = spec.CR
    CRB = CR + 8
    CR4 = CR // 4
    # probe-window blocks per side: 2 = 256 words (4096 chars at cpw=16)
    # costing two gathers + select per probe; 1 = 128 words and ONE
    # gather per probe.  MEASURED: 1-block LOSES big (650M vs 1153M
    # cells/s on the 100 kb bench) — the extra refill rounds it induces
    # dwarf the saved gathers, so the wide window is load-bearing.
    EXTB = int(_os.environ.get("MWF_EXT_BLOCKS", "2"))
    WR4 = WR // 4
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
    NSEGB = (spec.nseg - 1) * SEGSTRIDE + NTAB  # global block count

    def iota2(n, axis):
        return lax.broadcasted_iota(jnp.int32, (n, 128), axis)

    def ctz_chars(x):
        """First mismatching char index of a packed XOR word (x != 0)."""
        u = x.astype(jnp.uint32)
        ctz = lax.population_count(
            jnp.bitwise_and(~u, u - jnp.uint32(1)).astype(jnp.int32))
        return jnp.right_shift(ctz, LOGB)

    def shm(a, prev):
        """Value at flat window slot w-1 (diagonal d-1) for a [CR,128]
        chunk; ``prev`` is the previous row ([1,128], the m-side carry
        from the preceding chunk, NEG-masked)."""
        left = jnp.concatenate(
            [jnp.full((CR, 1), NEG, a.dtype), a[:, :-1]], 1)
        carry = jnp.concatenate([prev, a[:-1, :]], 0)[:, 127:128]
        return jnp.where(iota2(CR, 1) == 0, carry, left)

    def shp(a, nxt):
        """Slot w+1; ``nxt`` is the following row (p-side overread)."""
        right = jnp.concatenate(
            [a[:, 1:], jnp.full((CR, 1), NEG, a.dtype)], 1)
        carry = jnp.concatenate([a[1:, :], nxt], 0)[:, 0:1]
        return jnp.where(iota2(CR, 1) == 127, carry, right)

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
               twt_ref, twq_ref,    # HBM [B, nseg, 128, 128] word tables
               out_ref,             # SMEM [B, O_N]
               *refs):
        if is_tb:
            tb_ref = refs[0]
            refs = refs[1:]
        if is_p1:
            snap_ref = refs[0]
            refs = refs[1:]
        (rH, rE1, rF1, rE2, rF2, vb, lastt,
         tH, tE1, tF1, tE2, tF2,
         wta, wtb, wqa, wqb, baT, baQ,
         pbits, tbrow, sem_tb, dm,
         twtv, twqv, cs, sem2, wtmp, bnd_lo, bnd_hi,
         sun) = refs[:30]
        if is_p1:
            (sH, sE1, sF1, sE2, sF2,
             tHs, tE1s, tF1s, tE2s, tF2s, sem_sn) = refs[30:]

        b = pl.program_id(0)
        tl = scal_ref[b, SC_TL]
        ql = scal_ref[b, SC_QL]
        anc = scal_ref[b, SC_ANC]
        n_seg = scal_ref[b, SC_NSEG]
        max_s = scal_ref[b, SC_MS]
        mi_lo = scal_ref[b, SC_MILO]   # max_iter split like n_iter
        mi_hi = scal_ref[b, SC_MIHI]
        d_end = ql - tl
        DDP = anc + iota2(WRP, 0) * 128 + iota2(WRP, 1)  # full-pad diag map

        # ---- init (scratch persists across grid steps: reset everything)
        for ring, depth in ((rH, DH), (rE1, DE1), (rF1, DE1),
                            (rE2, DE2), (rF2, DE2)):
            for j in range(depth):
                ring[j] = jnp.full((WRP, 128), NEG, jnp.int32)
        vb[:] = jnp.zeros((WRP, 128), jnp.int32)
        lastt[:] = jnp.zeros((WRP, 128), jnp.int32)
        # score-0 top: H[d=0] = -1 (miniwfa.c:119)
        tH[:] = jnp.where(DDP == 0, -1, NEG)
        for r in (tE1, tF1, tE2, tF2):
            r[:] = jnp.full((WRP, 128), NEG, jnp.int32)
        for r in (wta, wtb, wqa, wqb):
            r[:] = jnp.zeros(r.shape, jnp.int32)
        baT[:] = jnp.full((WR, 128), BIG, jnp.int32)  # all-miss
        baQ[:] = jnp.full((WR, 128), BIG, jnp.int32)
        pbits[:] = jnp.zeros((WR, 128), jnp.int32)
        for j in range(DH):
            bnd_lo[j] = 1   # empty band until really recorded
            bnd_hi[j] = 0
        dm[0] = 0           # tb DMA slot counter
        dm[1] = 0           # tb DMA pending bitmask (prev lane drained)
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
                    ring[j] = jnp.full((WRP, 128), NEG, jnp.int32)
            # origin pointer -1 at d=0 (reference miniwfa.c:119 / lax init)
            tHs[:] = jnp.where(DDP == 0, -1, NEG)
            for r in (tE1s, tF1s, tE2s, tF2s):
                r[:] = jnp.full((WRP, 128), NEG, jnp.int32)

        def refill(ro, needy, jT, jQ):
            """Re-window chunk rows with out-of-window probes.  Per needy
            row ONE element is elected (smallest target word, then
            smallest query word among ties) and BOTH windows re-center on
            it — re-centering the two sides on different elements can
            ping-pong forever when a row's live probes span more than a
            window (the cross-side livelock).  The elected element is
            guaranteed covered, so every refill makes progress.

            Long sequences: the word table lives in HBM as overlapping
            segments (stride 127 of 128 blocks, so a row's 2-block window
            never straddles a segment); one segment per side is resident
            in VMEM.  When the elected row's block lies in another
            segment, that segment is DMA'd in (so that row refills next
            round — progress); rows whose blocks are NOT resident keep
            their current windows and wait for the segment to rotate."""
            has = jnp.any(needy, axis=1, keepdims=True)           # [CR,1]
            jTn = jnp.where(needy, jT, BIG)
            jminT = jnp.min(jTn, axis=1, keepdims=True)
            elect = needy & (jTn == jminT)
            jminQ = jnp.min(jnp.where(elect, jQ, BIG), axis=1,
                            keepdims=True)
            baTc = baT[pl.ds(ro, CR)]
            baQc = baQ[pl.ds(ro, CR)]

            def pick(basec, jmin):
                a_new = jnp.clip(jmin >> 7, 0, NSEGB - 1)
                a_cur = jnp.clip(basec[:, 0:1] >> 7, 0, NSEGB - 1)
                return jnp.where(has, a_new, a_cur)               # [CR,1]

            aT = pick(baTc, jminT)
            aQ = pick(baQc, jminQ)
            if spec.nseg > 1:
                # BOTH resident segments follow the same elected row
                # (smallest target block among needy rows, then its query
                # block) — independent per-side choices can chase
                # different rows and deadlock (the cross-side livelock at
                # segment granularity)
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
            mf = has & resT & resQ  # both windows re-center together
            baT[pl.ds(ro, CR)] = jnp.broadcast_to(
                jnp.where(mf, aT * 128, baTc[:, 0:1]), (CR, 128))
            baQ[pl.ds(ro, CR)] = jnp.broadcast_to(
                jnp.where(mf, aQ * 128, baQc[:, 0:1]), (CR, 128))
            mrow = jnp.broadcast_to(mf, (CR, 128))
            aTloc = jnp.clip(aT - cst * SEGSTRIDE, 0, NTAB - 1)
            aQloc = jnp.clip(aQ - csq * SEGSTRIDE, 0, NTAB - 1)
            twt = twtv[:]
            twq = twqv[:]

            def lanes(a):   # [CR,1] block ids -> [NTAB,1] padded
                if CR == NTAB:   # zero-row pads are invalid Mosaic vectors
                    return a
                return jnp.concatenate(
                    [a, jnp.zeros((NTAB - CR, 1), jnp.int32)], 0)

            # NOTE: arithmetic on broadcast transposes crashes the TPU
            # compiler ("limits <= dim" abort) — the +1 for the second
            # window block is applied to the narrow vector BEFORE the
            # transpose+broadcast.
            aTl, aQl = lanes(aTloc), lanes(aQloc)
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
                win_ref[pl.ds(ro, CR)] = jnp.where(
                    mrow, wtmp[0:CR], win_ref[pl.ds(ro, CR)])

            fill(wta, twt, idxT)
            fill(wqa, twq, idxQ)
            if EXTB == 2:
                fill(wtb, twt, idxT1)
                fill(wqb, twq, idxQ1)

        def probe_side(roff, R, win_a, win_b, base, pos):
            """16/4-char probe word at char ``pos`` from the row window
            ([R, 128] rows at dynamic row offset roff).
            Returns (chars, n_valid, in_window, word_idx)."""
            j = jnp.right_shift(pos, LOGC)
            c = j - base[pl.ds(roff, R)]
            in_win = (c >= 0) & (c < EXTB * NTAB)
            if EXTB == 1:
                ca = jnp.clip(c, 0, NTAB - 1)
                w0 = jnp.take_along_axis(win_a[pl.ds(roff, R)], ca, axis=1)
            else:
                cc = jnp.clip(c, 0, 2 * NTAB - 1)
                ca = jnp.minimum(cc, NTAB - 1)
                cb = jnp.clip(cc - NTAB, 0, NTAB - 1)
                ga = jnp.take_along_axis(win_a[pl.ds(roff, R)], ca, axis=1)
                gb = jnp.take_along_axis(win_b[pl.ds(roff, R)], cb, axis=1)
                w0 = jnp.where(cc < NTAB, ga, gb)
            off = jnp.bitwise_and(pos, CPW - 1)
            chars = jnp.right_shift(w0.astype(jnp.uint32),
                                    (off * BITS).astype(jnp.uint32))
            return chars, CPW - off, in_win, j

        def probe_once(roff, R, DDw, k, un):
            """One 16/4-char probe over [R,128] rows at offset roff;
            advances k of active in-window lanes, clears resolved."""
            pos_t = k + 1
            pos_q = DDw + k + 1
            cht, nvt, inwt, jT = probe_side(roff, R, wta, wtb, baT, pos_t)
            chq, nvq, inwq, jQ = probe_side(roff, R, wqa, wqb, baQ, pos_q)
            inw = inwt & inwq
            nv = jnp.minimum(nvt, nvq)
            x = jnp.bitwise_xor(cht, chq).astype(jnp.int32)
            # chars at c >= nv are shifted-in garbage: force mismatch
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

        # straggler sub-window rows (multiples of the 8-row sublane tile;
        # more rows per round trade VPU work for fewer max-over-lanes
        # rounds when stragglers are scattered across the chunk)
        SR = max(8, min(CR, (int(_os.environ.get("MWF_EXT_SR", "8"))
                             // 8) * 8))

        def extend(ro, DDc, k, elig):
            """Chunk LCP extension; returns advanced k.  Mirrors the
            per-diagonal semantics of miniwfa.c:212-226 with the advance
            capped at the matrix edge (no sentinels).

            Two phases: one unrolled full-chunk round resolves ~95% of
            lanes; the remaining long-run/needy lanes iterate over a
            dynamically-offset SR-row sub-window (the round count is a
            max over lanes, so one long match run used to re-probe the
            whole chunk at full width every round)."""
            if _os.environ.get("MWF_KDBG_NOEXT"):
                # profiling knob: no extension at all (breaks parity;
                # bound the run with max_s) — isolates probe-loop cost
                return k, jnp.zeros((), bool)
            unroll = int(_os.environ.get("MWF_EXT_UNROLL", "3"))

            un = elig
            for _ in range(unroll):
                k, un = probe_once(ro, CR, DDc, k, un)
            tH[pl.ds(ro, CR)] = k
            sun[:] = un.astype(jnp.int32)

            def chunk_refill():
                """Refill every unresolved-and-out-of-window lane of the
                chunk (window bases/needs recomputed from tH/sun)."""
                kf = tH[pl.ds(ro, CR)]
                unf = sun[:] != 0
                jT2 = jnp.right_shift(kf + 1, LOGC)
                jQ2 = jnp.right_shift(DDc + kf + 1, LOGC)
                cT = jT2 - baT[pl.ds(ro, CR)]
                cQ = jQ2 - baQ[pl.ds(ro, CR)]
                inw2 = (cT >= 0) & (cT < EXTB * NTAB) \
                    & (cQ >= 0) & (cQ < EXTB * NTAB)
                needy = unf & ~inw2

                @pl.when(jnp.any(needy))
                def _():
                    refill(ro, needy, jT2, jQ2)
                return jnp.any(unf)

            any_un = chunk_refill()

            if _os.environ.get("MWF_KDBG_EXT1"):
                return tH[pl.ds(ro, CR)], jnp.zeros((), bool)

            maxr = jnp.minimum(jnp.int32(MAXR_SAFETY), tl // 4 + 8192)

            def cond(c):
                return (c[0] != 0) & (c[1] < maxr)

            def body(c):
                _, rnd = c
                un_f = sun[:] != 0
                # pick the lowest unresolved row that can PROGRESS (its
                # probe is in-window): a needy row whose word-table
                # segment is not resident cannot advance until the
                # refill's rotation brings its segment in, and choosing
                # it would livelock the loop while fillable rows above
                # starve (observed at nseg>1: the 5 Mb pass-2).  When no
                # row is in-window, the refill below rotates segments
                # and the probe round is a harmless no-op.
                kf = tH[pl.ds(ro, CR)]
                cTf = jnp.right_shift(kf + 1, LOGC) - baT[pl.ds(ro, CR)]
                cQf = jnp.right_shift(DDc + kf + 1, LOGC) \
                    - baQ[pl.ds(ro, CR)]
                inw_f = (cTf >= 0) & (cTf < EXTB * NTAB) \
                    & (cQf >= 0) & (cQf < EXTB * NTAB)
                prog = un_f & inw_f
                # sublane-tile-aligned offset: dynamic sublane slices
                # must start on the (8,128) tile grid on real hardware
                r_loc = jnp.clip(
                    (jnp.min(jnp.where(prog, iota2(CR, 0), CR)) // SR)
                    * SR, 0, CR - SR)
                r_abs = ro + r_loc
                k8 = tH[pl.ds(r_abs, SR)]
                un8 = sun[pl.ds(r_loc, SR)] != 0
                DD8 = anc + r_abs * 128 + iota2(SR, 0) * 128 + iota2(SR, 1)
                # 4 probes/round measured best (64 chars consumed per
                # straggler round; 2 probes left long runs re-entering:
                # cigar 689->756M cells/s, score ~flat, lowmem flat)
                for _ in range(spec.subprobes):
                    k8, un8 = probe_once(r_abs, SR, DD8, k8, un8)
                tH[pl.ds(r_abs, SR)] = k8
                sun[pl.ds(r_loc, SR)] = un8.astype(jnp.int32)
                alive = chunk_refill()
                return alive.astype(jnp.int32), rnd + 1

            any_i, rnd = lax.while_loop(
                cond, body, (any_un.astype(jnp.int32), jnp.int32(0)))
            stuck = rnd >= maxr
            return tH[pl.ds(ro, CR)], stuck

        def good_diag(v, DDc):
            """k in [-1, tl) and d+k in [-1, ql) (miniwfa.c:139-171)."""
            return (v >= -1) & (v < tl) & (DDc + v >= -1) & (DDc + v < ql)

        def chunk_range(d0, d1, empty):
            """fori bounds of the CR-chunks covering diagonals [d0, d1]."""
            c0 = jnp.clip((d0 - anc) >> 7, 0, WR - 1) // CR
            c1 = jnp.clip((d1 - anc) >> 7, 0, WR - 1) // CR + 1
            return c0, jnp.where(empty, c0, c1)

        def cycle(carry):
            (t, wf_lo, wf_hi, t_lo, t_hi, done_i, stopped_i, ovf_i,
             final_s, last_state, n_lo, n_hi, sid, lp, snc) = carry
            done, stopped, ovf = done_i != 0, stopped_i != 0, ovf_i != 0
            # record score-t band for masked ring reads in later cycles
            bnd_lo[t % DH] = t_lo
            bnd_hi[t % DH] = t_hi

            # --- 1. extension sweep over the top-band chunks
            # (miniwfa.c:400-411) + termination reductions (405-408)
            e0, e1_ = chunk_range(t_lo, t_hi, False)

            def ext_chunk(ci, car):
                term_a, zero_a, bits_a, ptr_a, stuck_a = car
                ro = ci * CR
                DDc = anc + ro * 128 + iota2(CR, 0) * 128 + iota2(CR, 1)
                k_old = tH[pl.ds(ro, CR)]
                in_top = (DDc >= t_lo) & (DDc <= t_hi)
                elig = in_top & (k_old >= -1) & (DDc + k_old >= -1) \
                    & (k_old < tl) & (DDc + k_old < ql)
                k_new, stuck = extend(ro, DDc, k_old, elig)
                k_new = jnp.where(elig, k_new, k_old)
                tH[pl.ds(ro, CR)] = k_new
                at_end = elig & (DDc == d_end)
                term_c = jnp.any(at_end & (k_new == tl - 1))
                zero_c = jnp.any(at_end & (k_new == k_old)
                                 & (k_new == tl - 1))
                if is_tb:
                    bits_a = jnp.maximum(bits_a, jnp.max(
                        jnp.where(DDc == d_end, pbits[pl.ds(ro, CR)], 0)))
                if is_p1:
                    ptr_a = jnp.maximum(ptr_a, jnp.max(
                        jnp.where(at_end, tHs[pl.ds(ro, CR)], NEG)))
                return (term_a | term_c.astype(jnp.int32),
                        zero_a | zero_c.astype(jnp.int32),
                        bits_a, ptr_a,
                        stuck_a | stuck.astype(jnp.int32))

            z32 = jnp.int32(0)
            if _os.environ.get("MWF_KDBG_NOEXTSWEEP"):
                # profiling knob: skip the whole extension sweep
                # (parity-breaking; bound with max_s) — isolates the
                # sweep's structural cost from the probe compute
                term_i, zero_i, bits_at, ptr, stuck_i = (
                    z32, z32, z32, jnp.int32(NEG), z32)
            else:
                term_i, zero_i, bits_at, ptr, stuck_i = lax.fori_loop(
                    e0, e1_, ext_chunk, (z32, z32, z32, jnp.int32(NEG), z32))
            term = term_i != 0
            ovf = ovf | (stuck_i != 0)  # never in correct operation

            # --- 2. termination bookkeeping (miniwfa.c:405-408, 577)
            zero_ext = term & (t > 0) & (zero_i != 0)
            if is_tb:
                last_state = jnp.where(zero_ext, bits_at & 7, last_state)
            if is_p1:
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

            # --- 4b. low-mem snapshot bookkeeping (miniwfa.c:585-586):
            # due when score t+1 is a multiple of step, after retiring t
            if is_p1:
                snap_due = act & (jnp.mod(t + 1, spec.step) == 0)
                row = (t + 1) // spec.step - 1
                snap_ok = row < spec.n_snap
                snc = jnp.where(snap_due & snap_ok, snc + 1, snc)
                ovf = ovf | (snap_due & ~snap_ok)
                act = act & ~(snap_due & ~snap_ok)

            # --- 5+6. retire + transition sweep over the grown band
            # chunks (wf_next_prep/tb, miniwfa.c:243-327).  Sweep range
            # covers BOTH the old top band (retire) and the new band
            # (transition); retire is masked by in_top, transition by
            # in_new.  Ring reads are masked by the recorded band of the
            # score they target, so stale rows read as NEG (the C's
            # padded out-of-band reads).
            u_lo = jnp.minimum(t_lo, lo)
            u_hi = jnp.maximum(t_hi, hi)
            s0c, s1c = chunk_range(u_lo, u_hi, ~act)

            def lb(ring, depth, top_ref, age, ro):
                """[CRB,128] masked source block at score t+1-age."""
                s_src = t + 1 - age
                if age == 1:
                    blk = top_ref[pl.ds(ro, CRB)]
                    blo, bhi = t_lo, t_hi
                else:
                    blk = ring[jnp.mod(s_src, depth), pl.ds(ro, CRB)]
                    blo = bnd_lo[jnp.mod(s_src, DH)]
                    bhi = bnd_hi[jnp.mod(s_src, DH)]
                DDb = anc + ro * 128 + iota2(CRB, 0) * 128 + iota2(CRB, 1)
                return jnp.where((DDb >= blo) & (DDb <= bhi), blk, NEG)

            def make_sweep(do_retire, do_trans):
                def sweep(ci, car):
                    (loq, hiq, cho1, cho2, ce1x, ce2x,
                     csh1, csh2, cse1, cse2) = car
                    ro = ci * CR
                    DDc = anc + ro * 128 + iota2(CR, 0) * 128 + iota2(CR, 1)
                    in_top = (DDc >= t_lo) & (DDc <= t_hi)
                    if do_retire:
                        # retire tops into rings at slot t mod depth;
                        # record slice viability for the shrink scan
                        tHc = tH[pl.ds(ro, CR)]
                        tE1c = tE1[pl.ds(ro, CR)]
                        tF1c = tF1[pl.ds(ro, CR)]
                        tE2c = tE2[pl.ds(ro, CR)]
                        tF2c = tF2[pl.ds(ro, CR)]
                        rH[t % DH, pl.ds(ro, CR)] = \
                            jnp.where(in_top, tHc, NEG)
                        rE1[t % DE1, pl.ds(ro, CR)] = \
                            jnp.where(in_top, tE1c, NEG)
                        rF1[t % DE1, pl.ds(ro, CR)] = \
                            jnp.where(in_top, tF1c, NEG)
                        rE2[t % DE2, pl.ds(ro, CR)] = \
                            jnp.where(in_top, tE2c, NEG)
                        rF2[t % DE2, pl.ds(ro, CR)] = \
                            jnp.where(in_top, tF2c, NEG)
                        viab = jnp.zeros((CR, 128), bool)
                        for v in (tHc, tE1c, tF1c, tE2c, tF2c):
                            viab |= good_diag(v, DDc)
                        # bit-packed slice viability (bit j = score t-j),
                        # shifted by the cycles since this row was last
                        # swept so stale bits of re-entering rows age out
                        delta = jnp.clip(t - lastt[pl.ds(ro, CR)], 0, NS)
                        vbc = jnp.where(
                            delta >= NS, 0,
                            jnp.left_shift(vb[pl.ds(ro, CR)], delta))
                        vb[pl.ds(ro, CR)] = \
                            (vbc | (viab & in_top).astype(jnp.int32)) \
                            & ((1 << NS) - 1)
                        lastt[pl.ds(ro, CR)] = jnp.full(
                            (CR, 128), 0, jnp.int32) + t
                        if is_p1:
                            sH[t % DH, pl.ds(ro, CR)] = jnp.where(
                                in_top, tHs[pl.ds(ro, CR)], NEG)
                            sE1[t % DE1, pl.ds(ro, CR)] = jnp.where(
                                in_top, tE1s[pl.ds(ro, CR)], NEG)
                            sF1[t % DE1, pl.ds(ro, CR)] = jnp.where(
                                in_top, tF1s[pl.ds(ro, CR)], NEG)
                            sE2[t % DE2, pl.ds(ro, CR)] = jnp.where(
                                in_top, tE2s[pl.ds(ro, CR)], NEG)
                            sF2[t % DE2, pl.ds(ro, CR)] = jnp.where(
                                in_top, tF2s[pl.ds(ro, CR)], NEG)
                    if not do_trans:
                        return car
                    # transition into score t+1; age-1 sources are the
                    # tops; m-side neighbours come from the PREVIOUS
                    # chunk's pre-overwrite values (loop carries)
                    ho1b = lb(rH, DH, tH, ages["o1"], ro)
                    ho2b = lb(rH, DH, tH, ages["o2"], ro)
                    e1b = lb(rE1, DE1, tE1, ages["e1"], ro)
                    f1b = lb(rF1, DE1, tF1, ages["e1"], ro)
                    e2b = lb(rE2, DE2, tE2, ages["e2"], ro)
                    f2b = lb(rF2, DE2, tF2, ages["e2"], ro)
                    hxb = lb(rH, DH, tH, ages["x"], ro)
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
                    tH[pl.ds(ro, CR)] = wH
                    tE1[pl.ds(ro, CR)] = wE1
                    tF1[pl.ds(ro, CR)] = wF1
                    tE2[pl.ds(ro, CR)] = wE2
                    tF2[pl.ds(ro, CR)] = wF2
                    if is_tb:
                        bits_m = jnp.where(in_new, bits, 0)
                        pbits[pl.ds(ro, CR)] = bits_m
                        # fold 4 sublane rows -> one int32 row (1 B/cell,
                        # the reference tb density, README.md:52-53) and
                        # DMA through the slot ring with deferred waits
                        p4 = bits_m.reshape(CR4, 4, 128)
                        packed = (p4[:, 0] | (p4[:, 1] << 8)
                                  | (p4[:, 2] << 16) | (p4[:, 3] << 24))
                        slot = lax.rem(dm[0], NSLOT)

                        @pl.when(((dm[1] >> slot) & 1) == 1)
                        def _():
                            pltpu.make_async_copy(
                                tbrow.at[slot],
                                tb_ref.at[b, 0, pl.ds(0, CR4)],
                                sem_tb.at[slot]).wait()

                        tbrow[pl.ds(slot, 1)] = packed[None]
                        cp = pltpu.make_async_copy(
                            tbrow.at[slot],
                            tb_ref.at[b, jnp.minimum(t, spec.S_CAP - 1),
                                      pl.ds(ro // 4, CR4)],
                            sem_tb.at[slot])
                        cp.start()
                        dm[0] = dm[0] + 1
                        dm[1] = dm[1] | (1 << slot)
                    if is_p1:
                        # propagate snapshot pointers along the chosen
                        # transitions (reference wf_next_seg,
                        # miniwfa.c:495-523 — fused with the value
                        # recurrence, which the C couldn't vectorize)
                        h1b = lb(sH, DH, tHs, ages["o1"], ro)
                        h2b = lb(sH, DH, tHs, ages["o2"], ro)
                        se1b = lb(sE1, DE1, tE1s, ages["e1"], ro)
                        sf1b = lb(sF1, DE1, tF1s, ages["e1"], ro)
                        se2b = lb(sE2, DE2, tE2s, ages["e2"], ro)
                        sf2b = lb(sF2, DE2, tF2s, ages["e2"], ro)
                        hxs = lb(sH, DH, tHs, ages["x"], ro)[0:CR]
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
                        tHs[pl.ds(ro, CR)] = jnp.where(in_new, hp, NEG)
                        tE1s[pl.ds(ro, CR)] = jnp.where(in_new, e1p, NEG)
                        tF1s[pl.ds(ro, CR)] = jnp.where(in_new, f1p, NEG)
                        tE2s[pl.ds(ro, CR)] = jnp.where(in_new, e2p, NEG)
                        tF2s[pl.ds(ro, CR)] = jnp.where(in_new, f2p, NEG)
                        csh1, csh2 = h1b[CR - 1:CR], h2b[CR - 1:CR]
                        cse1, cse2 = se1b[CR - 1:CR], se2b[CR - 1:CR]
                    # boundary commit reduction (miniwfa.c:325-326)
                    viable = jnp.zeros((CR, 128), bool)
                    for v in (wH, wE1, wF1, wE2, wF2):
                        viable |= v >= -1
                    loq = loq | jnp.any(viable & (DDc == lo)).astype(
                        jnp.int32)
                    hiq = hiq | jnp.any(viable & (DDc == hi)).astype(
                        jnp.int32)
                    return (loq, hiq,
                            ho1b[CR - 1:CR], ho2b[CR - 1:CR],
                            e1b[CR - 1:CR], e2b[CR - 1:CR],
                            csh1, csh2, cse1, cse2)
                return sweep

            neg_row = jnp.full((1, 128), NEG, jnp.int32)
            car0 = (z32, z32, neg_row, neg_row, neg_row, neg_row,
                    neg_row, neg_row, neg_row, neg_row)
            if not is_p1:
                car = lax.fori_loop(s0c, s1c, make_sweep(True, True), car0)
                lo_ok, hi_ok = car[0] != 0, car[1] != 0
            else:
                # snapshot cycles must serialize the sf rings AFTER the
                # whole band retires and BEFORE any transition
                # (miniwfa.c:585-587): split the sweep ONLY on those
                # cycles (1 in `step`); every other cycle uses the same
                # fused retire+transition sweep as score mode — the
                # retire writes ring slot t mod depth, which the
                # transition never reads (ages >= 2 map to other slots;
                # age 1 statically bypasses to the top registers)
                split = act & snap_due

                @pl.when(~split)
                def _():
                    carf = lax.fori_loop(s0c, s1c, make_sweep(True, True),
                                         car0)
                    dm[2] = carf[0]
                    dm[3] = carf[1]

                @pl.when(split)
                def _():
                    lax.fori_loop(s0c, s1c, make_sweep(True, False), car0)
                    # serialize the sf rings (exactly the reachable
                    # slices, vs the reference's full NS x 5 stripe,
                    # miniwfa.c:451-474) and reset them to fresh flat
                    # indices plane*WP + w within each slice's band
                    w_idx = iota2(WRP, 0) * 128 + iota2(WRP, 1)
                    rings = ((sH, DH, P_H), (sE1, DE1, P_E1),
                             (sF1, DE1, P_F1), (sE2, DE2, P_E2),
                             (sF2, DE2, P_F2))
                    for ring, dp, p0 in rings:
                        cp = pltpu.make_async_copy(
                            ring, snap_ref.at[b, row, p0:p0 + dp], sem_sn)
                        cp.start()
                        cp.wait()
                    for ring, dp, p0 in rings:
                        for j in range(dp):
                            s_j = t - jnp.mod(t - j, dp)
                            in_b = (s_j >= 0) \
                                & (DDP >= bnd_lo[jnp.mod(s_j, DH)]) \
                                & (DDP <= bnd_hi[jnp.mod(s_j, DH)])
                            ring[j] = jnp.where(
                                in_b, (p0 + j) * WP + w_idx, NEG)
                    # refresh the sf top registers (score t) to match
                    # their just-reset ring copies: age-1 reads bypass
                    # the ring
                    in_t = (DDP >= t_lo) & (DDP <= t_hi)
                    for top, dp, p0 in ((tHs, DH, P_H), (tE1s, DE1, P_E1),
                                        (tF1s, DE1, P_F1), (tE2s, DE2, P_E2),
                                        (tF2s, DE2, P_F2)):
                        top[:] = jnp.where(
                            in_t, (p0 + t % dp) * WP + w_idx, NEG)

                    carf = lax.fori_loop(s0c, s1c,
                                         make_sweep(False, True), car0)
                    dm[2] = carf[0]
                    dm[3] = carf[1]

                lo_ok, hi_ok = dm[2] != 0, dm[3] != 0

            wf_lo = jnp.where(act & lo_ok, lo, wf_lo)
            wf_hi = jnp.where(act & hi_ok, hi, wf_hi)
            t_lo = jnp.where(act, lo, t_lo)
            t_hi = jnp.where(act, hi, t_hi)

            # --- 7. periodic shrink every 256 cycles (miniwfa.c:420):
            # good-diagonal hull over the NS retired slices (minus the
            # stale slot for score t+1-NS) plus the new tops; a rare
            # separate sweep so the hot path never pays for it
            sh_due = act & (((t + 1) & 0xFF) == 0)
            g0c, g1c = chunk_range(wf_lo, wf_hi, ~sh_due)

            def shr_chunk(ci, car):
                has_a, mn_a, mx_a = car
                ro = ci * CR
                DDc = anc + ro * 128 + iota2(CR, 0) * 128 + iota2(CR, 1)
                viable = jnp.zeros((CR, 128), bool)
                for r in (tH, tE1, tF1, tE2, tF2):
                    viable |= r[pl.ds(ro, CR)] >= -1
                good = viable & (DDc >= t_lo) & (DDc <= t_hi)
                # retired slices of scores t..t-NS+2 (the stale score
                # t+1-NS slice is bit NS-1, excluded — miniwfa.c:144-171)
                good |= (vb[pl.ds(ro, CR)] & ((1 << (NS - 1)) - 1)) != 0
                good &= (DDc >= wf_lo) & (DDc <= wf_hi)
                has_a = has_a | jnp.any(good).astype(jnp.int32)
                mn_a = jnp.minimum(mn_a, jnp.min(
                    jnp.where(good, DDc, BIG)))
                mx_a = jnp.maximum(mx_a, jnp.max(
                    jnp.where(good, DDc, -BIG)))
                return has_a, mn_a, mx_a

            has_i, new_lo, new_hi = lax.fori_loop(
                g0c, g1c, shr_chunk, (z32, jnp.int32(BIG), jnp.int32(-BIG)))
            shrink = sh_due & (has_i != 0)
            wf_lo = jnp.where(shrink, new_lo, wf_lo)
            wf_hi = jnp.where(shrink, new_hi, wf_hi)

            # --- 8. accounting + early stop (miniwfa.c:421-425)
            n_lo = n_lo + jnp.where(act, width, 0)
            n_hi = n_hi + (n_lo >> 30)
            n_lo = n_lo & 0x3FFFFFFF
            # runtime early-stop bounds (miniwfa.c:422-425); 0 = unbounded
            stop = ((mi_lo | mi_hi) > 0) \
                & ((n_hi > mi_hi) | ((n_hi == mi_hi) & (n_lo > mi_lo)))
            stop |= (max_s > 0) & (t + 1 > max_s)
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
        if is_tb:
            # drain outstanding tb DMAs before the next lane reuses tbrow
            for i in range(NSLOT):
                @pl.when(((dm[1] >> i) & 1) == 1)
                def _():
                    pltpu.make_async_copy(
                        tbrow.at[i], tb_ref.at[b, 0, pl.ds(0, CR4)],
                        sem_tb.at[i]).wait()
            dm[1] = 0
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
        # packed tb rows (4 band rows / int32 row), DMA'd per chunk at
        # dynamic [lane, cycle, row-offset]
        out_shapes.append(jax.ShapeDtypeStruct(
            (spec.B, spec.S_CAP, WR4, 128), jnp.int32))
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    if is_p1:
        # snapshot rows: serialized sf rings, DMA'd at [lane, snapshot]
        out_shapes.append(jax.ShapeDtypeStruct(
            (spec.B, max(spec.n_snap, 1), NP, WRP, 128), jnp.int32))
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))

    wpad = ((WR + 127) // 128) * 128
    scratch = [
        pltpu.VMEM((DH, WRP, 128), jnp.int32),    # rH
        pltpu.VMEM((DE1, WRP, 128), jnp.int32),   # rE1
        pltpu.VMEM((DE1, WRP, 128), jnp.int32),   # rF1
        pltpu.VMEM((DE2, WRP, 128), jnp.int32),   # rE2
        pltpu.VMEM((DE2, WRP, 128), jnp.int32),   # rF2
        pltpu.VMEM((WRP, 128), jnp.int32),        # vb (bit-packed)
        pltpu.VMEM((WRP, 128), jnp.int32),        # lastt
        pltpu.VMEM((WRP, 128), jnp.int32),        # tH
        pltpu.VMEM((WRP, 128), jnp.int32),        # tE1
        pltpu.VMEM((WRP, 128), jnp.int32),        # tF1
        pltpu.VMEM((WRP, 128), jnp.int32),        # tE2
        pltpu.VMEM((WRP, 128), jnp.int32),        # tF2
        pltpu.VMEM((wpad, 128), jnp.int32),       # wta
        pltpu.VMEM((wpad, 128), jnp.int32),       # wtb
        pltpu.VMEM((wpad, 128), jnp.int32),       # wqa
        pltpu.VMEM((wpad, 128), jnp.int32),       # wqb
        pltpu.VMEM((WR, 128), jnp.int32),         # baT
        pltpu.VMEM((WR, 128), jnp.int32),         # baQ
        pltpu.VMEM((WR, 128), jnp.int32),         # pbits
        pltpu.VMEM((NSLOT, CR4, 128), jnp.int32),  # tbrow slots
        pltpu.SemaphoreType.DMA((NSLOT,)),        # sem_tb
        pltpu.SMEM((4,), jnp.int32),              # dm: slot ctr, pending,
                                                  # [p1] loq/hiq sweep carry
        pltpu.VMEM((NTAB, NTAB), jnp.int32),      # twtv (resident segment)
        pltpu.VMEM((NTAB, NTAB), jnp.int32),      # twqv
        pltpu.SMEM((2,), jnp.int32),              # cs (resident seg ids)
        pltpu.SemaphoreType.DMA,                  # sem2 (table DMA)
        pltpu.VMEM((NTAB, NTAB), jnp.int32),      # wtmp (masked-fill temp)
        pltpu.SMEM((DH,), jnp.int32),             # bnd_lo (score-band reg)
        pltpu.SMEM((DH,), jnp.int32),             # bnd_hi
        pltpu.VMEM((CR, 128), jnp.int32),         # sun (ext unresolved)
    ]
    if is_p1:
        scratch += [
            pltpu.VMEM((DH, WRP, 128), jnp.int32),    # sH
            pltpu.VMEM((DE1, WRP, 128), jnp.int32),   # sE1
            pltpu.VMEM((DE1, WRP, 128), jnp.int32),   # sF1
            pltpu.VMEM((DE2, WRP, 128), jnp.int32),   # sE2
            pltpu.VMEM((DE2, WRP, 128), jnp.int32),   # sF2
            pltpu.VMEM((WRP, 128), jnp.int32),        # tHs
            pltpu.VMEM((WRP, 128), jnp.int32),        # tE1s
            pltpu.VMEM((WRP, 128), jnp.int32),        # tF1s
            pltpu.VMEM((WRP, 128), jnp.int32),        # tE2s
            pltpu.VMEM((WRP, 128), jnp.int32),        # tF2s
            pltpu.SemaphoreType.DMA,                  # sem_sn (snapshots)
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


def _assemble(spec: KSpec, outs, o=None):
    """Kernel outputs -> the lax-engine-compatible result dict.  ``o``
    may be a pre-fetched numpy copy of the scalar row (host path); when
    absent the slices stay traced (sharded path)."""
    if o is None:
        o = outs[0]
    res = dict(
        final_s=o[:, O_S], done=o[:, O_DONE] != 0,
        stopped=o[:, O_STOP] != 0, ovf_band=o[:, O_OVFB] != 0,
        ovf_scap=o[:, O_OVFS] != 0,
        overflow=(o[:, O_OVFB] != 0) | (o[:, O_OVFS] != 0),
        last_state=o[:, O_LS], n_iter_lo=o[:, O_NLO],
        n_iter_hi=o[:, O_NHI])
    if spec.mode == MODE_TB:
        res["tb_packed"] = outs[1]
    if spec.mode == MODE_PASS1:
        np_ = snapshot_layout(spec)[5]
        res["snap"] = outs[1].reshape(
            spec.B, max(spec.n_snap, 1), np_ * (spec.WR + 8) * 128)
        res["snap_cnt"] = o[:, O_SNC]
        res["last_ptr"] = o[:, O_LP]
    return res


@functools.lru_cache(maxsize=64)
def get_kernel(spec: KSpec, interpret: bool = False):
    """Jitted fused-cycle aligner.  Returns fn(scal, twt, twq) -> dict
    with the same keys as the lax engine's output (ops/wavefront.py),
    except the traceback comes back PACKED (``tb_packed``: [B, S_CAP,
    WR//4, 128] int32, 4 rows/word — see unpack_tb).  The scalar row is
    fetched ONCE and sliced on the host: over the tunnelled TPU every
    separate device->host read is a ~25 ms RPC, and the per-key dict
    slices used to cost ~225 ms/call (9 reads)."""
    import numpy as np
    call = build_kernel(spec)

    def raw(scal, twt, twq):
        return call(scal, twt, twq, interpret=interpret)

    raw = jax.jit(raw)

    def run(scal, twt, twq):
        outs = raw(scal, twt, twq)
        return _assemble(spec, outs, o=np.asarray(outs[0]))

    run.raw = raw   # exposed for AOT prewarm (utils/prewarm.py)
    run.arg_shapes = lambda: arg_shapes(spec)
    return run


def arg_shapes(spec: KSpec):
    """ShapeDtypeStructs of get_kernel's jitted arguments (AOT lowering
    for the compile-cache prewarm, utils/prewarm.py)."""
    nsc = SC_SEG + 2 * spec.seg_cap
    s = jax.ShapeDtypeStruct
    return (s((spec.B, nsc), jnp.int32),
            s((spec.B, spec.nseg, NTAB, NTAB), jnp.int32),
            s((spec.B, spec.nseg, NTAB, NTAB), jnp.int32))


@functools.lru_cache(maxsize=64)
def get_sharded_kernel(spec: KSpec, mesh, axis: str = "data",
                       interpret: bool = False):
    """The fused-cycle kernel SPMD over a device mesh: lanes shard across
    ``axis`` and each device runs its own pallas grid over its local
    lanes (pure data parallelism, the scale-out strategy per SURVEY.md
    §2's parallelism inventory) — so multi-chip deployments scale THIS
    engine's per-chip throughput, not the lax fallback's.  spec.B must
    be divisible by the axis size.  The cell counter is additionally
    merged into ``global_cells`` with a psum over the mesh, matching
    get_sharded_aligner's contract (ops/wavefront.py)."""
    import dataclasses
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    local = dataclasses.replace(spec, B=spec.B // mesh.shape[axis])
    call = build_kernel(local)

    def run(scal, twt, twq):
        res = _assemble(local, call(scal, twt, twq, interpret=interpret))
        cells = (res["n_iter_hi"].astype(jnp.float32) * jnp.float32(2 ** 30)
                 + res["n_iter_lo"].astype(jnp.float32))
        res["global_cells"] = jax.lax.psum(jnp.sum(cells), axis)
        return res

    keys = ["final_s", "done", "stopped", "ovf_band", "ovf_scap",
            "overflow", "last_state", "n_iter_lo", "n_iter_hi"]
    if spec.mode == MODE_TB:
        keys.append("tb_packed")
    if spec.mode == MODE_PASS1:
        keys += ["snap", "snap_cnt", "last_ptr"]
    out_specs = {k: P(axis) for k in keys}
    out_specs["global_cells"] = P()
    try:
        fn = shard_map(run, mesh=mesh, in_specs=(P(axis),) * 3,
                       out_specs=out_specs, check_vma=False)
    except TypeError:  # older jax spelling
        fn = shard_map(run, mesh=mesh, in_specs=(P(axis),) * 3,
                       out_specs=out_specs, check_rep=False)
    return jax.jit(fn)


def unpack_tb(packed) -> "np.ndarray":
    """Unpack kernel tb rows [S, WR4, 128] int32 -> [S, W] uint8 (host).
    Band row r = 4*r4 + j lives in byte j of packed row r4."""
    import numpy as np
    p = np.asarray(packed).view(np.uint32)
    S, WR4, _ = p.shape
    out = np.empty((S, WR4, 4, 128), np.uint8)
    for j in range(4):
        out[:, :, j, :] = ((p >> np.uint32(8 * j)) & 0x7F).astype(np.uint8)
    return out.reshape(S, WR4 * 4 * 128)


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
