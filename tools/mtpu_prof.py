"""Stage-attribution profile of the multi-lane kernel vs single-lane.

Runs both engines under the parity-breaking KDBG cut knobs with a fixed
cycle count (max_s runtime scalar), so the measured wall isolates one
stage class per config:

  noext     — transition/retire/shrink scaffolding only (no extension)
  ext1      — + phase-1 probes and refills (no straggler while-loop)
  full      — everything (real alignment; max_s still bounds cycles)

Usage: mtpu_prof.py [G] [WR] [N] [B] [MAXS] [config]
"""
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np  # noqa: E402

G = int(sys.argv[1]) if len(sys.argv) > 1 else 2
WR = int(sys.argv[2]) if len(sys.argv) > 2 else 128
N = int(sys.argv[3]) if len(sys.argv) > 3 else 50000
B = int(sys.argv[4]) if len(sys.argv) > 4 else 16
MAXS = int(sys.argv[5]) if len(sys.argv) > 5 else 3000
CFG = sys.argv[6] if len(sys.argv) > 6 else "noext"

if CFG == "noext":
    os.environ["MWF_KDBG_NOEXT"] = "1"
elif CFG == "ext1":
    os.environ["MWF_KDBG_EXT1"] = "1"

from miniwfa_tpu.ops import wavefront_kernel as wk  # noqa: E402
from miniwfa_tpu.ops import wavefront_multi as wm  # noqa: E402

rng = random.Random(5)


def mutate(t, sub, ind):
    out = []
    for c in t:
        r = rng.random()
        if r < sub:
            out.append(rng.choice("ACGT".replace(c, "")))
        elif r < sub + ind:
            if rng.random() < .5:
                out.append(rng.choice("ACGT") + c)
            else:
                continue
        else:
            out.append(c)
    return "".join(out)


pairs = []
for i in range(B):
    t = "".join(rng.choice("ACGT") for _ in range(N))
    q = mutate(t, 0.02, 0.002)
    pairs.append((t.encode(), q.encode()))
pen = dict(x=4, o1=4, e1=2, o2=15, e2=1)
mx = max(max(len(t), len(q)) for t, q in pairs)
nseg = wk.nseg_for(mx, 16)
SCAP = 1 << (MAXS + 2).bit_length()
scal = np.zeros((B, wk.SC_SEG + 2), np.int32)
for i, (t, q) in enumerate(pairs):
    scal[i, wk.SC_TL] = len(t)
    scal[i, wk.SC_QL] = len(q)
    scal[i, wk.SC_ANC] = (len(q) - len(t)) // 2 - WR * 128 // 2
    scal[i, wk.SC_MS] = MAXS
twt = wk.pack_table([t for t, _ in pairs], 16, nseg)
twq = wk.pack_table([q for _, q in pairs], 16, nseg)

mspec = wm.MSpec(B=B, G=G, WR=WR, S_CAP=SCAP, mode=wk.MODE_SCORE,
                 cpw=16, cr=64, nseg=nseg, **pen)
kspec = wk.KSpec(B=B, WR=WR, S_CAP=SCAP, mode=wk.MODE_SCORE,
                 cpw=16, cr=64, nseg=nseg, **pen)
for name, get, spec in (("multi", wm.get_multi_kernel, mspec),
                        ("single", wk.get_kernel, kspec)):
    fn = get(spec)
    t0 = time.time()
    o = fn(scal, twt, twq)
    t1 = time.time()
    best = 1e9
    for _ in range(3):
        ta = time.time()
        o = fn(scal, twt, twq)
        best = min(best, time.time() - ta)
    cyc = MAXS * (B // (G if name == "multi" else 1))
    print(f"{CFG} {name} G={G if name == 'multi' else 1} cold={t1 - t0:.1f}s "
          f"warm={best:.3f}s us/groupcycle={best / cyc * 1e6:.2f} "
          f"s={np.asarray(o['final_s'])[:4].tolist()}", flush=True)
