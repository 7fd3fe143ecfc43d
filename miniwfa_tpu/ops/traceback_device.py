"""On-device traceback walker for the fused-kernel path.

The reference walks the 7-bit traceback buffer on the CPU it already owns
(wf_traceback, miniwfa.c:329-377).  Here the buffer lives in device HBM
in the kernel's packed layout ([S_CAP, W/512, 128] int32, 4 band rows per
word = 1 byte/cell; ~GBs at 100 kb-5 Mb scale) and hauling it to the host
dwarfs the alignment itself; instead the O(n+s) walk runs on-device as a
``lax.while_loop`` and only the packed CIGAR runs (a few 100 KB) come back.

Match runs are consumed up to 112 chars per iteration from ONE wide
*backward* window per side (an 8-word dynamic slice, funnel-aligned;
count-leading-zeros of the XOR — the mirror of the kernel's forward ctz
probes); DP steps decode the tb byte with the exact reference semantics
(state/ext bits, per-state score decrements, leading overhang).

Emits packed (len<<4|op) runs newest-first with on-device run merging;
the host reverses the slice.  Ops: 1=I 2=D 7='=' 8='X' (htslib packing,
miniwfa.c:51-62).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

OP_I, OP_D, OP_EQ, OP_X = 1, 2, 7, 8


def _build_walk(S_CAP: int, WR4: int, cpw: int,
                x: int, o1: int, e1: int, o2: int, e2: int,
                layout: str = "rows"):
    """layout="rows": the VMEM kernel's tb packing (4 band ROWS per int32
    word, tb [S_CAP, WR4, 128]).  layout="cycles": the gaps-in-sublanes
    kernel's packing (4 CYCLES per word, tb [S_CAP//4, 128], W = 128 —
    ops/wavefront_gaps.py)."""
    W = WR4 * 4 * 128 if layout == "rows" else 128
    BITS = 32 // cpw
    LOGC = {16: 4, 4: 2}[cpw]
    LOGB = {16: 1, 4: 3}[cpw]

    def walk(tb, anc, tl, ql, tw, qw, s_final, last_state):
        """tb: [S_CAP, WR4, 128] int32 packed (band row r = byte r%4 of
        packed row r//4); tw/qw: flat packed word streams.
        Returns (buf [CAP] int32 packed runs newest-first, count)."""
        # each DP step decrements srow by >=1 (<= S_CAP pushes) and match
        # runs interleave DP steps (+1), so 2*S_CAP + 8 bounds the pushes
        CAP = 2 * S_CAP + 8
        # zero-pad the word streams so the wide backward window's slice
        # start is never clamped (clamping would break the funnel
        # alignment); padding chars XOR to spurious matches only BELOW
        # position 0, which the avail cap never lets the run consume
        PAD = 8
        NWW = 8   # raw words per backward window: NWW-1 aligned words
        twp = jnp.pad(tw, (PAD, PAD))
        qwp = jnp.pad(qw, (PAD, PAD))

        def push(buf, nout, op, ln):
            prev = buf[jnp.maximum(nout - 1, 0)]
            merge = (nout > 0) & ((prev & 0xF) == op) & (ln > 0)
            at = jnp.where(merge, nout - 1, nout)
            val = jnp.where(merge, ((prev >> 4) + ln) << 4 | op,
                            (ln << 4) | op)
            buf = lax.dynamic_update_index_in_dim(
                buf, jnp.where(ln > 0, val, buf[jnp.minimum(at, CAP - 1)]),
                jnp.minimum(at, CAP - 1), 0)
            return buf, jnp.where(ln > 0, at + 1, nout)

        def cond(c):
            i, k = c[0], c[1]
            return (i >= 0) & (k >= 0)

        def body(c):
            """One probe-or-step, branch-free: a lax.cond would thread the
            run buffer through both branches and copy it every iteration
            (O(S_CAP) per step — measured dominant); instead both the
            backward match probe and the DP-byte decode are computed as
            scalars and selected."""
            i, k, srow, last, buf, nout = c

            # backward probe: ONE (NWW)-word dynamic slice per side,
            # funnel-shifted into NWW-1 aligned words of chars ENDING at
            # k / i — the per-slice fixed cost dominates the walk loop
            # (PERF_NOTES), so one wide window beats stacked narrow
            # probes: up to (NWW-1)*cpw chars consumed per iteration for
            # 2 memory ops instead of 6
            def backwin(words, top):
                s0 = top + 1 - (NWW - 1) * cpw
                o = jnp.bitwise_and(top + 1, cpw - 1)
                w0 = jnp.right_shift(s0, LOGC) + PAD   # arithmetic >> =
                R = lax.dynamic_slice(words, (w0,), (NWW,))  # floor(s0/cpw)
                sh = (o * BITS).astype(jnp.uint32)
                return [jnp.where(
                    o == 0, R[j],
                    (jnp.right_shift(R[j].astype(jnp.uint32), sh)
                     | jnp.left_shift(
                         R[j + 1].astype(jnp.uint32),
                         jnp.minimum(jnp.uint32(32) - sh, jnp.uint32(31))))
                    .astype(jnp.int32)) for j in range(NWW - 1)]

            At = backwin(twp, k)
            Aq = backwin(qwp, i)
            avail = jnp.minimum(k, i) + 1
            run = jnp.int32(0)
            cont = last == 0   # no match run mid-gap-extension
            for j in reversed(range(NWW - 1)):
                xj = At[j] ^ Aq[j]
                lz = jnp.where(xj == 0, cpw,
                               jnp.right_shift(lax.clz(xj), LOGB))
                run = run + jnp.where(cont, lz, 0)
                cont = cont & (xj == 0)
            run = jnp.minimum(run, avail)
            matching = (last == 0) & (run > 0)

            # DP-byte decode (reference miniwfa.c:341-366); rows layout:
            # the tb cell lives in byte (col>>7)&3 of packed word
            # [col>>9, col&127]; cycles layout: byte srow&3 of word
            # [srow>>2, col]
            col = jnp.clip((i - k) - anc, 0, W - 1)
            sr = jnp.maximum(srow, 0)
            if layout == "rows":
                word = lax.dynamic_slice(
                    tb, (sr, col >> 9, col & 127),
                    (1, 1, 1))[0, 0, 0].astype(jnp.int32)
                byte = jnp.right_shift(
                    word, ((col >> 7) & 3) * 8) & 0x7F
            else:
                word = lax.dynamic_slice(
                    tb, (sr >> 2, col), (1, 1))[0, 0].astype(jnp.int32)
                byte = jnp.right_shift(word, (sr & 3) * 8) & 0x7F
            state = jnp.where(last == 0, byte & 7, last)
            ext = jnp.where(state > 0,
                            jnp.right_shift(byte, state + 2) & 1, 0)
            is_x = state == 0
            is_ins = (state == 1) | (state == 3)
            pen1 = (state == 1) | (state == 2)
            dec = jnp.where(
                is_x, x,
                jnp.where(pen1,
                          jnp.where(ext == 1, e1, o1 + e1),
                          jnp.where(ext == 1, e2, o2 + e2)))

            op = jnp.where(matching, OP_EQ,
                           jnp.where(is_x, OP_X,
                                     jnp.where(is_ins, OP_I, OP_D)))
            ln = jnp.where(matching, run, 1)
            di = jnp.where(matching, run,
                           jnp.where(is_x | is_ins, 1, 0))
            dk = jnp.where(matching, run,
                           jnp.where(is_x | ~is_ins, 1, 0))
            dsrow = jnp.where(matching, 0, dec)
            last_new = jnp.where(
                matching, 0,
                jnp.where((state > 0) & (ext == 1), state, 0))
            buf, nout = push(buf, nout, op, ln)
            return i - di, k - dk, srow - dsrow, last_new, buf, nout

        buf0 = jnp.zeros((CAP,), jnp.int32)
        c = (ql - 1, tl - 1, s_final - 1, last_state, buf0, jnp.int32(0))
        i, k, srow, last, buf, nout = lax.while_loop(cond, body, c)
        # leading overhang (miniwfa.c:368-369)
        buf, nout = push(buf, nout, OP_I, jnp.maximum(i + 1, 0))
        buf, nout = push(buf, nout, OP_D, jnp.maximum(k + 1, 0))
        return buf, nout

    return walk


@functools.lru_cache(maxsize=64)
def _get_walker(S_CAP: int, WR4: int, cpw: int,
                x: int, o1: int, e1: int, o2: int, e2: int):
    return jax.jit(_build_walk(S_CAP, WR4, cpw, x, o1, e1, o2, e2))


@functools.lru_cache(maxsize=64)
def _get_walker_batch(S_CAP: int, WR4: int, cpw: int,
                      x: int, o1: int, e1: int, o2: int, e2: int):
    """All lanes walk in ONE device call: vmap of the while_loop runs
    the lanes lockstep (finished lanes' carries are masked by the while
    batching rule), replacing B sequential dispatch+fetch round-trips
    over the tunnel with one."""
    walk = _build_walk(S_CAP, WR4, cpw, x, o1, e1, o2, e2)

    def walk_packed(*args):
        # fold the run count into the buffer tail: ONE output array =
        # ONE device->host RPC on the tunnel (each costs ~25 ms)
        buf, nout = walk(*args)
        return jnp.concatenate([buf, nout[None]], 0)

    return jax.jit(jax.vmap(walk_packed))


def pack_flat_words(seq: bytes, cpw: int) -> np.ndarray:
    """Flat little-endian packed word stream [NW] int32 for the walker.
    NW is bucketed to the next power of two so walker compiles are shared
    across sequence lengths."""
    from . import pack as pk
    bits = 2 if cpw == 16 else 8
    # min 2 words: the walker reads 2-word windows in one dynamic_slice
    nw = max(2, (len(seq) + cpw - 1) // cpw + 1)
    nwb = 1
    while nwb < nw:
        nwb <<= 1
    codes = np.zeros(nwb * cpw, dtype=np.uint32)
    if len(seq):
        raw = np.frombuffer(seq, dtype=np.uint8)
        codes[:len(seq)] = pk._NT2[raw] if cpw == 16 else raw.astype(np.uint32)
    v = codes.reshape(nwb, cpw)
    w = np.zeros(nwb, dtype=np.uint32)
    for j in range(cpw):
        w |= v[:, j] << np.uint32(bits * j)
    return w.view(np.int32)


def walk_on_device(tb_packed, anc: int, ts: bytes, qs: bytes, s_final: int,
                   last_state: int, cpw: int, pens) -> list:
    """Run the device walker for one lane; returns the packed CIGAR list
    (input order).  tb_packed: [S_CAP, WR4, 128] int32 device array in
    the kernel's 4-rows-per-word layout."""
    S_CAP, WR4 = int(tb_packed.shape[0]), int(tb_packed.shape[1])
    walker = _get_walker(S_CAP, WR4, cpw, *pens)
    tw = jnp.asarray(pack_flat_words(ts, cpw))
    qw = jnp.asarray(pack_flat_words(qs, cpw))
    buf, nout = walker(tb_packed, jnp.int32(anc), jnp.int32(len(ts)),
                       jnp.int32(len(qs)), tw, qw, jnp.int32(s_final),
                       jnp.int32(last_state))
    n = int(nout)
    runs = np.asarray(buf[:n])[::-1]
    return [int(v) for v in runs]


def walk_batch_on_device(tb_packed, ancs, ts_list, qs_list, s_finals,
                         last_states, cpw: int, pens, skip=None) -> list:
    """Walk every lane of a batch in one device call; returns a list of
    packed CIGAR lists (input order).  tb_packed: [B, S_CAP, WR4, 128]
    device array.  Lanes with skip[b] set walk zero-length sequences
    (no iterations, empty result)."""
    import os
    import time
    prof = os.environ.get("MWF_PROF")
    t0 = time.perf_counter()
    B = int(tb_packed.shape[0])
    S_CAP, WR4 = int(tb_packed.shape[1]), int(tb_packed.shape[2])
    walker = _get_walker_batch(S_CAP, WR4, cpw, *pens)
    skip = skip or [False] * B
    tws = [pack_flat_words(t if not sk else b"", cpw)
           for t, sk in zip(ts_list, skip)]
    qws = [pack_flat_words(q if not sk else b"", cpw)
           for q, sk in zip(qs_list, skip)]
    nw = max(w.shape[0] for w in tws + qws)
    tw = np.stack([np.pad(w, (0, nw - w.shape[0])) for w in tws])
    qw = np.stack([np.pad(w, (0, nw - w.shape[0])) for w in qws])
    tl = np.asarray([0 if sk else len(t)
                     for t, sk in zip(ts_list, skip)], np.int32)
    ql = np.asarray([0 if sk else len(q)
                     for q, sk in zip(qs_list, skip)], np.int32)
    t1 = time.perf_counter()
    packed = np.asarray(walker(
        tb_packed, jnp.asarray(ancs, jnp.int32),
        jnp.asarray(tl), jnp.asarray(ql),
        jnp.asarray(tw), jnp.asarray(qw),
        jnp.asarray(s_finals, jnp.int32),
        jnp.asarray(last_states, jnp.int32)))
    t2 = time.perf_counter()
    bufs, nouts = packed[:, :-1], packed[:, -1]
    out = [[int(v) for v in bufs[b, :int(nouts[b])][::-1]]
           for b in range(B)]
    if prof:
        print(f"[prof] walk B={B} pack={t1 - t0:.3f}s "
              f"device+fetch={t2 - t1:.3f}s convert="
              f"{time.perf_counter() - t2:.3f}s "
              f"iters~{int(max(map(len, out), default=0))}", flush=True)
    return out


@functools.lru_cache(maxsize=32)
def _get_walker_gaps(S_CAP: int, cpw: int, out_cap: int,
                     x: int, o1: int, e1: int, o2: int, e2: int):
    """Batch walker over the gaps-kernel tb layout (4 cycles/word).
    Returns packed [G, out_cap+1] (runs + count): tiny gaps emit at most
    tl+ql+2 <= MAX_TOT+3 runs, so the fetch is sliced device-side
    instead of hauling the 2*S_CAP-sized worst-case buffers."""
    walk = _build_walk(S_CAP, 0, cpw, x, o1, e1, o2, e2, layout="cycles")

    def walk_packed(*args):
        buf, nout = walk(*args)
        return jnp.concatenate([buf[:out_cap], nout[None]], 0)

    return jax.jit(jax.vmap(walk_packed))


def walk_gaps_on_device(tb_packed, tl, ql, tw, qw, s_finals, last_states,
                        cpw: int, pens) -> list:
    """Walk every gap lane in one device call; returns a list of packed
    CIGAR lists (input order).  tb_packed: [G, S_CAP//4, 128] device
    array in the gaps kernel's 4-cycles-per-word layout; tl/ql/tw/qw:
    [G] / [G, NW] numpy; the window anchor is -tl per lane."""
    G = int(tb_packed.shape[0])
    S_CAP = int(tb_packed.shape[1]) * 4
    tl = np.asarray(tl, np.int32)
    ql = np.asarray(ql, np.int32)
    # runs bound: every push consumes >=1 target or query char except the
    # two overhang pushes
    out_cap = int(tl.max(initial=0) + ql.max(initial=0) + 4)
    walker = _get_walker_gaps(S_CAP, cpw, out_cap, *pens)
    packed = np.asarray(walker(
        tb_packed, jnp.asarray(-tl), jnp.asarray(tl), jnp.asarray(ql),
        jnp.asarray(tw), jnp.asarray(qw),
        jnp.asarray(s_finals, jnp.int32),
        jnp.asarray(last_states, jnp.int32)))
    bufs, nouts = packed[:, :-1], packed[:, -1]
    if nouts.max(initial=0) > out_cap:
        raise RuntimeError("gaps walker overflowed its run buffer — "
                           "engine bug (runs must be <= tl+ql+2)")
    # .tolist() converts at C speed; a per-element int() comprehension
    # costs ~1 s at 43k gaps
    return [bufs[g, :int(nouts[g])][::-1].tolist() for g in range(G)]


@functools.lru_cache(maxsize=32)
def _get_chain(cap: int):
    def chain(snap, last0, cnt):
        """Pointer-jump the snapshot rows newest->oldest on-device
        (reference wf_traceback_seg, miniwfa.c:528-549): snap [B, cap,
        ...] (trailing dims flattened HERE, inside jit, where the
        reshape is a free bitcast — an eager reshape of a multi-GB
        buffer materializes a copy), last0/cnt [B].  Returns (final
        carry [B], recs [cap, B] where recs[i] is the chain pointer AT
        row c = cap-1-i, -3 for rows past cnt)."""
        snap = snap.reshape(snap.shape[0], cap, -1)

        def step(last, c):
            row = lax.dynamic_index_in_dim(snap, c, axis=1,
                                           keepdims=False)   # [B, NPWP]
            nxt = jnp.take_along_axis(
                row, jnp.clip(last, 0, row.shape[-1] - 1)[:, None],
                1)[:, 0]
            live = c < cnt
            rec = jnp.where(live, last, -3)
            last = jnp.where(live, nxt, last)
            return last, rec

        last_fin, recs = lax.scan(step, last0,
                                  jnp.arange(cap - 1, -1, -1))
        # one output array = one fetch RPC: row 0 is the final carry
        return jnp.concatenate([last_fin[None, :], recs], 0)

    return jax.jit(chain)


def chain_ptrs_on_device(snap, last0, cnt):
    """Fetch only the per-snapshot chain pointers (a few ints per lane)
    instead of whole multi-MB snapshot rows; the (s, d) checkpoint
    arithmetic stays on the host (models/traceback)."""
    cap = int(snap.shape[1])
    packed = np.asarray(_get_chain(cap)(
        snap, jnp.asarray(last0, jnp.int32), jnp.asarray(cnt, jnp.int32)))
    return packed[0], packed[1:]
