"""Batched WFA wavefront engine — the TPU-native core.

This is a from-scratch JAX/XLA design of the WaveFront Alignment recurrence
under a dual affine gap cost.  It replicates the *semantics* of the reference
engine (lh3/miniwfa: miniwfa.c:380-435 ``mwf_wfa_core`` and miniwfa.c:551-601
``mwf_wfa_seg``) — including every tie-break that pins the canonical
co-optimal CIGAR (miniwfa.c:287-307) — but the architecture is built for
XLA's static-shape compilation model and the TPU's vector unit:

* **Batch-first.**  The whole machine carries a leading batch dimension; one
  ``lax.while_loop`` advances every pair in lockstep (one iteration == one
  wavefront cycle == one score increment).  A single *unbatched* global cycle
  counter drives cadence decisions (the 256-cycle band shrink, the
  low-memory snapshot every *p* cycles) so they compile to one-sided
  ``lax.cond`` branches instead of per-lane selects.

* **Static windows over dynamic bands.**  The band [lo, hi] grows, shrinks
  and (low-mem pass 2) collapses at run time.  All state lives in flat
  per-state planes ``[B, NS*L]`` (NS = max_pen+1 ring slices of length L,
  indexed by absolute diagonal + offset); each cycle touches only a
  ``W``-wide window at a per-lane dynamic anchor via gather/scatter along the
  last axis.  ``W`` (band capacity), ``S_CAP`` (score capacity) and plane
  length are static bucket parameters — a lane that outgrows its bucket
  raises an overflow flag and the host re-runs it in a larger bucket.

* **Ring as modular slots.**  Slice for score s lives in slot ``s % NS``;
  sources for the 5-state recurrence are read from slots at ages
  {x, o1+e1, o2+e2, e1, e2}.  Out-of-band cells hold WF_NEG_INF, written as
  an explicit ±(max_pen+1) pad around each new slice, which makes the d±1
  reads off the band edge safe (mirrors the reference's slice padding,
  miniwfa.c:96-100).

* **Match extension** (the LCP scan, reference miniwfa.c:212-226) is a
  chunked vectorized compare: one full-band gather round of CHUNK0
  characters, then a compaction loop that gathers CHUNK1-char blocks for at
  most A_ACTIVE still-running diagonals (long perfect matches are rare but
  unbounded; compaction keeps them from dragging the whole band).

Modes: score-only, traceback (7-bit packed bits per cell, one row per cycle,
reference README.md:47-48), low-mem pass 1 (snapshot stripes + pointer
jumping, miniwfa.c:440-526), and pass-2 band collapse at checkpoints
(miniwfa.c:413-416).  The traceback walk itself is O(n+s) sequential and
runs on the host (miniwfa_tpu/models/traceback.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

WF_NEG_INF = -0x40000000  # matches the reference sentinel (miniwfa.c:67)
T_SENT = 300  # target padding symbol (reference pads with unused chars,
Q_SENT = 301  # miniwfa.c:182-209; int32 symbols >255 are always unused)

MODE_SCORE = 0
MODE_TB = 1
MODE_PASS1 = 2


@dataclass(frozen=True)
class WfSpec:
    """Static (trace-time) configuration of the wavefront machine."""

    B: int          # batch lanes
    W: int          # band window capacity (diagonals incl. pads)
    S_CAP: int      # max score + 1 (cycle budget / tb rows)
    LT: int         # padded target length bucket
    LQ: int         # padded query length bucket
    x: int
    o1: int
    e1: int
    o2: int
    e2: int
    mode: int = MODE_SCORE
    step: int = 0        # snapshot period (pass 1)
    n_snap: int = 0      # snapshot capacity (pass 1)
    seg_cap: int = 1     # checkpoint list capacity (pass 2)
    use_seg: bool = False  # pass-2 band collapse at checkpoints enabled
    max_s: int = 0
    max_iter: int = 0
    chunk0: int = 32     # full-band extension chunk
    chunk1: int = 256    # compaction extension chunk
    a_active: int = 8    # compaction lanes per round

    @property
    def NS(self) -> int:  # ring depth = max_pen + 1 (miniwfa.c:390-392)
        return max(self.x, self.o1 + self.e1, self.o2 + self.e2) + 1

    def replace_b(self, b: int) -> "WfSpec":
        import dataclasses
        return dataclasses.replace(self, B=b)

    @property
    def OFF(self) -> int:  # plane offset: index(d) = OFF + d
        return self.LT + self.NS + 4

    @property
    def L(self) -> int:  # per-slice plane length
        return self.LT + self.LQ + self.W + 2 * self.NS + 16


def _leading_matches(eq: jnp.ndarray) -> jnp.ndarray:
    """Length of the leading all-True run along the last axis."""
    return jnp.sum(jnp.cumprod(eq.astype(jnp.int32), axis=-1), axis=-1)


def build_aligner(spec: WfSpec):
    """Build the jitted batched alignment loop for a static spec.

    Returns fn(t_pad, q_pad, tl, ql, seg_s, seg_d, n_seg) -> outputs dict.
    """
    B, W, NS, L, OFF = spec.B, spec.W, spec.NS, spec.L, spec.OFF
    m1 = NS  # pad width = max_pen + 1
    is_tb = spec.mode in (MODE_TB,)
    is_p1 = spec.mode == MODE_PASS1
    ages = dict(x=spec.x, o1=spec.o1 + spec.e1, o2=spec.o2 + spec.e2,
                e1=spec.e1, e2=spec.e2)
    arW = jnp.arange(W, dtype=jnp.int32)

    def ring_read(plane, slot, base, offset, width):
        idx = slot * L + base[:, None] + (offset + jnp.arange(width, dtype=jnp.int32))[None, :]
        return jnp.take_along_axis(plane, jnp.clip(idx, 0, NS * L - 1), axis=1)

    def ring_write(plane, slot, base, vals):
        idx = slot * L + base[:, None] + arW[None, :]
        return jnp.put_along_axis(plane, idx, vals, axis=1, inplace=False)

    def slot_of(s):  # non-negative modulo: virtual negative scores hit
        return jnp.mod(s, NS)  # the initial all-NEG_INF slots

    def gather_cols(mat, col):  # mat [B, W], col [B] -> [B]
        return jnp.take_along_axis(mat, jnp.clip(col, 0, W - 1)[:, None], axis=1)[:, 0]

    def extend_band(t_pad, q_pad, tl, ql, k, d, elig):
        """Vectorized LCP extension of all eligible diagonals.

        k, d, elig: [B, W].  Returns extended k.
        Reference: wf_extend1_padded (miniwfa.c:212-226); sentinels at the
        sequence ends guarantee the scan can never overrun tl/ql.
        """
        C0, C1, A = spec.chunk0, spec.chunk1, spec.a_active
        ltp, lqp = t_pad.shape[1], q_pad.shape[1]
        arc0 = jnp.arange(C0, dtype=jnp.int32)

        it = k[:, :, None] + 1 + arc0[None, None, :]           # target index
        iq = (d + k)[:, :, None] + 1 + arc0[None, None, :]     # query index
        tc = jnp.take_along_axis(
            t_pad, jnp.clip(it, 0, ltp - 1).reshape(B, -1), axis=1).reshape(B, W, C0)
        qc = jnp.take_along_axis(
            q_pad, jnp.clip(iq, 0, lqp - 1).reshape(B, -1), axis=1).reshape(B, W, C0)
        run = _leading_matches(tc == qc)
        k = jnp.where(elig, k + run, k)
        act = elig & (run == C0)

        arc1 = jnp.arange(C1, dtype=jnp.int32)

        def cond(c):
            return jnp.any(c[1])

        def body(c):
            k, act = c
            vals, sel = lax.top_k(act.astype(jnp.int32), A)    # [B, A]
            valid = vals > 0
            ksel = jnp.take_along_axis(k, sel, axis=1)
            dsel = jnp.take_along_axis(d, sel, axis=1)
            it = ksel[:, :, None] + 1 + arc1[None, None, :]
            iq = (dsel + ksel)[:, :, None] + 1 + arc1[None, None, :]
            tc = jnp.take_along_axis(
                t_pad, jnp.clip(it, 0, ltp - 1).reshape(B, -1), axis=1).reshape(B, A, C1)
            qc = jnp.take_along_axis(
                q_pad, jnp.clip(iq, 0, lqp - 1).reshape(B, -1), axis=1).reshape(B, A, C1)
            run = _leading_matches(tc == qc)
            knew = jnp.where(valid, ksel + run, ksel)
            k = jnp.put_along_axis(k, sel, knew, axis=1, inplace=False)
            act = jnp.put_along_axis(act, sel, valid & (run == C1), axis=1,
                                     inplace=False)
            return k, act

        k, _ = lax.while_loop(cond, body, (k, act))
        return k

    def transition_values(src):
        """The 5-state dual-affine recurrence + 7-bit tb byte.

        ``src`` holds the seven source rows (already shifted to d-1/d/d+1
        alignment).  Tie-break order is the parity contract
        (reference wf_next_tb, miniwfa.c:287-307): '>=' prefers gap-open
        over gap-extend, E1 over E2, F1 over F2, E over F, mismatch over
        any gap.
        """
        pHo1m, pE1m, pHo1p, pF1p = src["Ho1m"], src["E1m"], src["Ho1p"], src["F1p"]
        pHo2m, pE2m, pHo2p, pF2p = src["Ho2m"], src["E2m"], src["Ho2p"], src["F2p"]
        pHx = src["Hx"]
        bit08 = pHo1m < pE1m
        e1 = jnp.maximum(pHo1m, pE1m)
        bit20 = pHo2m < pE2m
        e2 = jnp.maximum(pHo2m, pE2m)
        ze = jnp.where(e1 >= e2, 1, 3)
        e = jnp.maximum(e1, e2)
        bit10 = pHo1p < pF1p
        f1 = jnp.maximum(pHo1p, pF1p) + 1
        bit40 = pHo2p < pF2p
        f2 = jnp.maximum(pHo2p, pF2p) + 1
        zf = jnp.where(f1 >= f2, 2, 4)
        f = jnp.maximum(f1, f2)
        z = jnp.where(e >= f, ze, zf)
        h = jnp.maximum(e, f)
        hx = pHx + 1
        z = jnp.where(hx >= h, 0, z)
        H = jnp.maximum(hx, h)
        bits = (bit08.astype(jnp.int32) << 3) | (bit10.astype(jnp.int32) << 4) \
             | (bit20.astype(jnp.int32) << 5) | (bit40.astype(jnp.int32) << 6) | z
        return H, e1, f1, e2, f2, bits

    def read_sources(planes, s_new, base):
        """Read the seven shifted source windows for the transition into
        score ``s_new`` (reference wf_next_prep, miniwfa.c:243-259)."""
        H, E1, F1, E2, F2 = planes
        hx = ring_read(H, slot_of(s_new - ages["x"]), base, 0, W)
        ho1 = ring_read(H, slot_of(s_new - ages["o1"]), base, -1, W + 2)
        ho2 = ring_read(H, slot_of(s_new - ages["o2"]), base, -1, W + 2)
        se1 = slot_of(s_new - ages["e1"])
        se2 = slot_of(s_new - ages["e2"])
        e1m = ring_read(E1, se1, base, -1, W)
        f1p = ring_read(F1, se1, base, +1, W)
        e2m = ring_read(E2, se2, base, -1, W)
        f2p = ring_read(F2, se2, base, +1, W)
        return dict(Hx=hx, Ho1m=ho1[:, :W], Ho1p=ho1[:, 2:], E1m=e1m, F1p=f1p,
                    Ho2m=ho2[:, :W], Ho2p=ho2[:, 2:], E2m=e2m, F2p=f2p)

    def shrink(planes, slice_lo, slice_hi, wf_lo, wf_hi, tl, ql):
        """Narrow [wf_lo, wf_hi] to the good-diagonal hull over all ring
        slices (reference wf_stripe_shrink, miniwfa.c:144-171).

        Vectorized over the slice axis: one [B, NS, W] gather per state
        plane instead of NS separate window reads."""
        base = wf_lo + OFF
        d = wf_lo[:, None, None] + arW[None, None, :]              # [B,1,W]
        slots = jnp.arange(NS, dtype=jnp.int32)
        flat = slots[None, :, None] * L + base[:, None, None] + arW[None, None, :]
        flat = jnp.clip(flat, 0, NS * L - 1).reshape(B, -1)
        gd = jnp.zeros((B, NS, W), dtype=bool)
        for plane in planes:
            v = jnp.take_along_axis(plane, flat, axis=1).reshape(B, NS, W)
            gd |= (v >= -1) & (v < tl[:, None, None]) \
                & (d + v >= -1) & (d + v < ql[:, None, None])
        in_sl = (d >= slice_lo[:, :, None]) & (d <= slice_hi[:, :, None])
        good = jnp.any(gd & in_sl, axis=1)                          # [B, W]
        dd = wf_lo[:, None] + arW[None, :]
        good &= dd <= wf_hi[:, None]
        has = jnp.any(good, axis=1)
        big = jnp.int32(0x3FFFFFFF)
        new_lo = jnp.min(jnp.where(good, dd, big), axis=1)
        new_hi = jnp.max(jnp.where(good, dd, -big), axis=1)
        return jnp.where(has, new_lo, wf_lo), jnp.where(has, new_hi, wf_hi)

    def init_state(tl, ql):
        zero5 = lambda: jnp.full((B, NS * L), WF_NEG_INF, dtype=jnp.int32)
        planes = [zero5() for _ in range(5)]
        # score-0 slice in slot 0: H[d=0] = -1 (reference miniwfa.c:119)
        planes[0] = planes[0].at[:, OFF].set(-1)
        st = dict(
            H=planes[0], E1=planes[1], F1=planes[2], E2=planes[3], F2=planes[4],
            slice_lo=jnp.zeros((B, NS), jnp.int32),
            slice_hi=jnp.zeros((B, NS), jnp.int32),
            wf_lo=jnp.zeros((B,), jnp.int32),
            wf_hi=jnp.zeros((B,), jnp.int32),
            t=jnp.int32(0),
            done=jnp.zeros((B,), bool),
            stopped=jnp.zeros((B,), bool),
            overflow=jnp.zeros((B,), bool),
            final_s=jnp.full((B,), -1, jnp.int32),
            n_iter_lo=jnp.zeros((B,), jnp.int32),
            n_iter_hi=jnp.zeros((B,), jnp.int32),
            last_state=jnp.zeros((B,), jnp.int32),
            sid=jnp.zeros((B,), jnp.int32),
        )
        if is_tb:
            st["tb_bits"] = jnp.zeros((B, spec.S_CAP, W), jnp.uint8)
            st["tb_lo"] = jnp.zeros((B, spec.S_CAP), jnp.int32)
        if is_p1:
            sf = [jnp.full((B, NS * L), WF_NEG_INF, dtype=jnp.int32) for _ in range(5)]
            sf[0] = sf[0].at[:, OFF].set(-1)  # origin pointer = -1
            st.update(Hs=sf[0], E1s=sf[1], F1s=sf[2], E2s=sf[3], F2s=sf[4],
                      snap_x=jnp.zeros((B, spec.n_snap, NS * 5 * W), jnp.int32),
                      snap_lo=jnp.zeros((B, spec.n_snap, NS), jnp.int32),
                      snap_cnt=jnp.zeros((B,), jnp.int32),
                      last_ptr=jnp.full((B,), WF_NEG_INF, jnp.int32))
        return st

    def snapshot(st):
        """Serialize the shadow (pointer) stripe and reset its cells to
        fresh flat indices (reference wf_snapshot1, miniwfa.c:451-474).

        Flat encoding (ours, self-consistent with the host decoder):
        idx = (slice_k * 5 + state) * W + (d - slice_lo[slice_k]), where
        slice_k = 0 is the oldest slice in the stripe (score s - NS + 1).

        Masked per lane: a lane that terminated earlier in this very cycle
        must NOT take the snapshot (the reference breaks out of the loop
        before the snapshot point, miniwfa.c:576-586).
        """
        t = st["t"]
        act = st["snap_act"]
        sf_planes = [st["Hs"], st["E1s"], st["F1s"], st["E2s"], st["F2s"]]
        # slice k holds score t - (NS-1-k): slot (t+1+k) % NS, vectorized
        kks = jnp.arange(NS, dtype=jnp.int32)
        slots = jnp.mod(t + 1 + kks, NS)                      # [NS]
        lo_k = jnp.take(st["slice_lo"], slots, axis=1)        # [B, NS]
        hi_k = jnp.take(st["slice_hi"], slots, axis=1)
        flat = slots[None, :, None] * L + (lo_k + OFF)[:, :, None] + arW[None, None, :]
        flat2 = flat.reshape(B, -1)
        in_band = arW[None, None, :] <= (hi_k - lo_k)[:, :, None]
        vals = []      # serialized values, [B, NS, W] per state
        new_sf = []
        for ss, plane in enumerate(sf_planes):
            vals.append(jnp.take_along_axis(
                plane, jnp.clip(flat2, 0, NS * L - 1), axis=1).reshape(B, NS, W))
            fresh = (kks[None, :, None] * 5 + ss) * W + arW[None, None, :]
            fresh = jnp.where(in_band, fresh, WF_NEG_INF)
            new_sf.append(jnp.put_along_axis(
                plane, flat2, fresh.reshape(B, -1), axis=1, inplace=False))
        # block layout: (slice_k * 5 + state) * W + w
        block = jnp.stack(vals, axis=2).reshape(B, NS * 5 * W)
        c = st["snap_cnt"]
        ok = c < spec.n_snap
        c_w = jnp.clip(c, 0, spec.n_snap - 1)

        def upd(a, u, cc, aa):  # per-lane masked row update
            cur = lax.dynamic_slice(a, (cc, 0), (1, u.shape[0]))[0]
            return lax.dynamic_update_slice(a, jnp.where(aa, u, cur)[None, :], (cc, 0))

        snap_x = jax.vmap(upd)(st["snap_x"], block, c_w, act)
        snap_lo = jax.vmap(upd)(st["snap_lo"], lo_k, c_w, act)
        st = dict(st)
        st["snap_x"], st["snap_lo"] = snap_x, snap_lo
        amask = act[:, None]
        for nm, new in zip(("Hs", "E1s", "F1s", "E2s", "F2s"), new_sf):
            st[nm] = jnp.where(amask, new, st[nm])
        st["snap_cnt"] = jnp.where(act & ok, c + 1, c)
        st["overflow"] = st["overflow"] | (act & ~ok)
        return st

    def cycle(st, t_pad, q_pad, tl, ql, seg_s, seg_d, n_seg):
        t = st["t"]
        planes = (st["H"], st["E1"], st["F1"], st["E2"], st["F2"])
        act0 = ~(st["done"] | st["stopped"] | st["overflow"])

        # --- 1. extension over the top slice's own band (miniwfa.c:400-411)
        slot_t = slot_of(t)
        ext_lo = lax.dynamic_slice_in_dim(st["slice_lo"], slot_t, 1, axis=1)[:, 0]
        ext_hi = lax.dynamic_slice_in_dim(st["slice_hi"], slot_t, 1, axis=1)[:, 0]
        base_e = ext_lo + OFF
        d = ext_lo[:, None] + arW[None, :]
        k_old = ring_read(st["H"], slot_t, base_e, 0, W)
        in_band = d <= ext_hi[:, None]
        elig = in_band & (k_old >= -1) & (d + k_old >= -1) \
             & (k_old < tl[:, None]) & (d + k_old < ql[:, None])
        k_new = extend_band(t_pad, q_pad, tl, ql, k_old, d, elig)

        # --- 2. termination: only diagonal d_end = ql - tl can finish
        d_end = ql - tl
        w_end = d_end - ext_lo
        at_end_old = gather_cols(k_old, w_end)
        at_end_new = gather_cols(k_new, w_end)
        in_win = (w_end >= 0) & (d_end <= ext_hi)
        elig_end = gather_cols(elig.astype(jnp.int32), w_end) > 0
        term = act0 & in_win & elig_end & (at_end_new == tl - 1)
        new_done = st["done"] | term
        final_s = jnp.where(term, t, st["final_s"])
        zero_ext = term & (at_end_new == at_end_old) & (t > 0)
        last_state = st["last_state"]
        if is_tb:
            # zero-length final extension: seed traceback with the terminal
            # cell's fromState (reference miniwfa.c:405-408)
            row = jnp.clip(t - 1, 0, spec.S_CAP - 1)
            rbits = lax.dynamic_slice(st["tb_bits"], (0, row, 0), (B, 1, W))[:, 0, :]
            rlo = lax.dynamic_slice(st["tb_lo"], (0, row), (B, 1))[:, 0]
            col = d_end - (rlo - m1)
            bits_at = gather_cols(rbits.astype(jnp.int32), col)
            last_state = jnp.where(zero_ext, bits_at & 7, last_state)
        if is_p1:
            ptr = ring_read(st["Hs"], slot_t, (d_end + OFF), 0, 1)[:, 0]
            st = dict(st)
            st["last_ptr"] = jnp.where(term, ptr, st["last_ptr"])

        H_upd = jnp.where(elig, k_new, k_old)
        Hp = ring_write(st["H"], slot_t, base_e, H_upd)

        act = act0 & ~term

        # --- 3. pass-2 checkpoint collapse (miniwfa.c:413-416)
        wf_lo, wf_hi, sid = st["wf_lo"], st["wf_hi"], st["sid"]
        if is_tb and spec.use_seg:
            cur_s = jnp.take_along_axis(seg_s, jnp.clip(sid, 0, spec.seg_cap - 1)[:, None], axis=1)[:, 0]
            cur_d = jnp.take_along_axis(seg_d, jnp.clip(sid, 0, spec.seg_cap - 1)[:, None], axis=1)[:, 0]
            hit = act & (sid < n_seg) & (cur_s == t)
            wf_lo = jnp.where(hit, cur_d, wf_lo)
            wf_hi = jnp.where(hit, cur_d, wf_hi)
            sid = jnp.where(hit, sid + 1, sid)

        # --- 4. band growth, clamped to the matrix (miniwfa.c:417-418)
        lo = jnp.maximum(wf_lo - 1, -tl)
        hi = jnp.minimum(wf_hi + 1, ql)
        width = hi - lo + 1
        ovf = act & (width + 2 * m1 + 2 > W)
        overflow = st["overflow"] | ovf
        act = act & ~ovf

        st = dict(st)
        st.update(H=Hp, done=new_done, final_s=final_s, last_state=last_state,
                  overflow=overflow, wf_lo=wf_lo, wf_hi=wf_hi, sid=sid)

        # --- 5. low-mem snapshot every `step` cycles (miniwfa.c:585-586)
        if is_p1:
            st["snap_act"] = act
            st = lax.cond(jnp.mod(t + 1, spec.step) == 0, snapshot, lambda s: s, st)
            del st["snap_act"]

        # --- 6. transition into score t+1
        anchor = lo - m1
        base = anchor + OFF
        s_new = t + 1
        slot_new = slot_of(s_new)
        d_w = anchor[:, None] + arW[None, :]
        in_new = (d_w >= lo[:, None]) & (d_w <= hi[:, None])

        src = read_sources((st["H"], st["E1"], st["F1"], st["E2"], st["F2"]), s_new, base)
        Hn, E1n, F1n, E2n, F2n, bits = transition_values(src)
        neg = jnp.int32(WF_NEG_INF)
        Hn = jnp.where(in_new, Hn, neg)
        E1n = jnp.where(in_new, E1n, neg)
        F1n = jnp.where(in_new, F1n, neg)
        E2n = jnp.where(in_new, E2n, neg)
        F2n = jnp.where(in_new, F2n, neg)

        st["H"] = ring_write(st["H"], slot_new, base, Hn)
        st["E1"] = ring_write(st["E1"], slot_new, base, E1n)
        st["F1"] = ring_write(st["F1"], slot_new, base, F1n)
        st["E2"] = ring_write(st["E2"], slot_new, base, E2n)
        st["F2"] = ring_write(st["F2"], slot_new, base, F2n)

        if is_p1:
            sfp = (st["Hs"], st["E1s"], st["F1s"], st["E2s"], st["F2s"])
            ssrc = read_sources(sfp, s_new, base)
            # propagate snapshot pointers along the just-chosen transitions
            # (reference wf_next_seg, miniwfa.c:495-523 — here fused with the
            # value recurrence, which the C couldn't vectorize fused)
            e1p = jnp.where(bits & 0x08 != 0, ssrc["E1m"], ssrc["Ho1m"])
            f1p = jnp.where(bits & 0x10 != 0, ssrc["F1p"], ssrc["Ho1p"])
            e2p = jnp.where(bits & 0x20 != 0, ssrc["E2m"], ssrc["Ho2m"])
            f2p = jnp.where(bits & 0x40 != 0, ssrc["F2p"], ssrc["Ho2p"])
            z = bits & 7
            hp = ssrc["Hx"]
            hp = jnp.where(z == 1, e1p, hp)
            hp = jnp.where(z == 2, f1p, hp)
            hp = jnp.where(z == 3, e2p, hp)
            hp = jnp.where(z == 4, f2p, hp)
            for nm, v in (("Hs", hp), ("E1s", e1p), ("F1s", f1p), ("E2s", e2p), ("F2s", f2p)):
                st[nm] = ring_write(st[nm], slot_new, base, jnp.where(in_new, v, neg))

        # slice band bookkeeping (frozen for halted lanes)
        old_slo = lax.dynamic_slice_in_dim(st["slice_lo"], slot_new, 1, axis=1)[:, 0]
        old_shi = lax.dynamic_slice_in_dim(st["slice_hi"], slot_new, 1, axis=1)[:, 0]
        st["slice_lo"] = lax.dynamic_update_slice_in_dim(
            st["slice_lo"], jnp.where(act, lo, old_slo)[:, None], slot_new, axis=1)
        st["slice_hi"] = lax.dynamic_update_slice_in_dim(
            st["slice_hi"], jnp.where(act, hi, old_shi)[:, None], slot_new, axis=1)

        if is_tb:
            row_t = jnp.clip(t, 0, spec.S_CAP - 1)
            st["tb_bits"] = lax.dynamic_update_slice(
                st["tb_bits"], jnp.where(in_new, bits, 0).astype(jnp.uint8)[:, None, :],
                (0, row_t, 0))
            st["tb_lo"] = lax.dynamic_update_slice(st["tb_lo"], lo[:, None], (0, row_t))

        # boundary commit (miniwfa.c:325-326): the grown edge only joins the
        # band if some state there is viable
        lo_ok = (Hn[:, m1] >= -1) | (E1n[:, m1] >= -1) | (F1n[:, m1] >= -1) \
              | (E2n[:, m1] >= -1) | (F2n[:, m1] >= -1)
        w_hi = m1 + (hi - lo)
        hi_ok = (gather_cols(Hn, w_hi) >= -1) | (gather_cols(E1n, w_hi) >= -1) \
              | (gather_cols(F1n, w_hi) >= -1) | (gather_cols(E2n, w_hi) >= -1) \
              | (gather_cols(F2n, w_hi) >= -1)
        st["wf_lo"] = jnp.where(act & lo_ok, lo, st["wf_lo"])
        st["wf_hi"] = jnp.where(act & hi_ok, hi, st["wf_hi"])

        # --- 7. periodic shrink every 256 cycles (miniwfa.c:420, 588)
        def do_shrink(st):
            nlo, nhi = shrink((st["H"], st["E1"], st["F1"], st["E2"], st["F2"]),
                              st["slice_lo"], st["slice_hi"], st["wf_lo"], st["wf_hi"],
                              tl, ql)
            st = dict(st)
            st["wf_lo"] = jnp.where(act, nlo, st["wf_lo"])
            st["wf_hi"] = jnp.where(act, nhi, st["wf_hi"])
            return st

        st = lax.cond((s_new & 0xFF) == 0, do_shrink, lambda s: s, st)

        # --- 8. accounting + early stop (miniwfa.c:421-425); pass 1 has no
        # early stop (miniwfa.c:569-589)
        nlo = st["n_iter_lo"] + jnp.where(act, width, 0)
        nhi = st["n_iter_hi"] + (nlo >> 30)
        nlo = nlo & 0x3FFFFFFF
        st["n_iter_lo"], st["n_iter_hi"] = nlo, nhi
        if not is_p1:
            stop = jnp.zeros((B,), bool)
            if spec.max_iter > 0:  # exact 60-bit compare in (hi, lo) parts
                mi_hi, mi_lo = spec.max_iter >> 30, spec.max_iter & 0x3FFFFFFF
                stop |= (nhi > mi_hi) | ((nhi == mi_hi) & (nlo > mi_lo))
            if spec.max_s > 0:
                stop |= s_new > spec.max_s
            st["stopped"] = st["stopped"] | (act & stop)
        st["t"] = t + 1
        return st

    def run(t_pad, q_pad, tl, ql, seg_s, seg_d, n_seg):
        st = init_state(tl, ql)

        def cond(st):
            alive = ~(st["done"] | st["stopped"] | st["overflow"])
            return jnp.any(alive) & (st["t"] < spec.S_CAP - 1)

        st = lax.while_loop(cond, lambda s: cycle(s, t_pad, q_pad, tl, ql,
                                                  seg_s, seg_d, n_seg), st)
        # lanes still alive at the S_CAP budget are bucket overflows
        alive = ~(st["done"] | st["stopped"] | st["overflow"])
        out = dict(final_s=st["final_s"], done=st["done"], stopped=st["stopped"],
                   ovf_band=st["overflow"], ovf_scap=alive,
                   overflow=st["overflow"] | alive, last_state=st["last_state"],
                   n_iter_lo=st["n_iter_lo"], n_iter_hi=st["n_iter_hi"])
        if is_tb:
            out["tb_bits"] = st["tb_bits"]
            out["tb_lo"] = st["tb_lo"]
        if is_p1:
            out.update(snap_x=st["snap_x"], snap_lo=st["snap_lo"],
                       snap_cnt=st["snap_cnt"], last_ptr=st["last_ptr"])
        return out

    return run


@functools.lru_cache(maxsize=256)
def get_aligner(spec: WfSpec):
    """Jitted single-host aligner for a static spec."""
    return jax.jit(build_aligner(spec))


def _example_args(spec: WfSpec):
    """Abstract input signature for a spec (for eval_shape / entry points)."""
    sd = jax.ShapeDtypeStruct
    return (
        sd((spec.B, spec.LT + 8), jnp.int32),
        sd((spec.B, spec.LQ + 8), jnp.int32),
        sd((spec.B,), jnp.int32),
        sd((spec.B,), jnp.int32),
        sd((spec.B, spec.seg_cap), jnp.int32),
        sd((spec.B, spec.seg_cap), jnp.int32),
        sd((spec.B,), jnp.int32),
    )


@functools.lru_cache(maxsize=64)
def get_sharded_aligner(spec: WfSpec, mesh, axis: str = "data"):
    """The same machine SPMD over a device mesh: the batch axis is sharded
    across `axis`; every device runs its own while_loop over its own lanes
    (pure data parallelism — the scale-out strategy per SURVEY.md §2's
    parallelism inventory), and the cell-throughput counter is merged with
    a psum over the mesh.  spec.B must be divisible by the axis size."""
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    local = spec.replace_b(spec.B // mesh.shape[axis])
    run = build_aligner(local)

    def run_psum(*args):
        out = run(*args)
        cells = (out["n_iter_hi"].astype(jnp.float32) * jnp.float32(2 ** 30)
                 + out["n_iter_lo"].astype(jnp.float32))
        out["global_cells"] = lax.psum(jnp.sum(cells), axis)
        return out

    keys = jax.eval_shape(run, *_example_args(local)).keys()
    out_specs = {k: P(axis) for k in keys}
    out_specs["global_cells"] = P()
    # check_vma off: the while-loop carry starts from unvarying constants
    # (init_state) and becomes device-varying after the first cycle, which
    # the strict VMA typecheck rejects; semantically the loop is per-shard
    try:
        fn = shard_map(run_psum, mesh=mesh,
                       in_specs=(P(axis),) * 7, out_specs=out_specs,
                       check_vma=False)
    except TypeError:  # older jax spelling
        fn = shard_map(run_psum, mesh=mesh,
                       in_specs=(P(axis),) * 7, out_specs=out_specs,
                       check_rep=False)
    return jax.jit(fn)
