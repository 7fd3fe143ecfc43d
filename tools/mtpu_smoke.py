import os, random, time, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from miniwfa_tpu.ops import wavefront_kernel as wk
from miniwfa_tpu.ops import wavefront_multi as wm

G = int(sys.argv[1]) if len(sys.argv) > 1 else 2
WR = int(sys.argv[2]) if len(sys.argv) > 2 else 64
N = int(sys.argv[3]) if len(sys.argv) > 3 else 20000
B = int(sys.argv[4]) if len(sys.argv) > 4 else 4
SCAP = int(sys.argv[5]) if len(sys.argv) > 5 else 4096
rng = random.Random(5)
def mutate(t, sub, ind):
    out = []
    for c in t:
        r = rng.random()
        if r < sub: out.append(rng.choice("ACGT".replace(c, "")))
        elif r < sub + ind:
            if rng.random() < .5: out.append(rng.choice("ACGT") + c)
            else: continue
        else: out.append(c)
    return "".join(out)
pairs = []
for i in range(B):
    t = "".join(rng.choice("ACGT") for _ in range(N))
    q = mutate(t, 0.02, 0.002)
    pairs.append((t.encode(), q.encode()))
pen = dict(x=4, o1=4, e1=2, o2=15, e2=1)
mx = max(max(len(t), len(q)) for t, q in pairs)
nseg = wk.nseg_for(mx, 16)
nsc = wk.SC_SEG + 2
scal = np.zeros((B, nsc), np.int32)
for i, (t, q) in enumerate(pairs):
    scal[i, wk.SC_TL] = len(t)
    scal[i, wk.SC_QL] = len(q)
    scal[i, wk.SC_ANC] = (len(q) - len(t)) // 2 - WR * 128 // 2
twt = wk.pack_table([t for t, _ in pairs], 16, nseg)
twq = wk.pack_table([q for _, q in pairs], 16, nseg)
for MODE in (wk.MODE_SCORE, wk.MODE_TB):
    mspec = wm.MSpec(B=B, G=G, WR=WR, S_CAP=SCAP, mode=MODE, cpw=16,
                     cr=64, nseg=nseg, **pen)
    kspec = wk.KSpec(B=B, WR=WR, S_CAP=SCAP, mode=MODE, cpw=16,
                     cr=64, nseg=nseg, **pen)
    print(f"mode={MODE} vmem_est={wm.vmem_bytes(mspec)/2**20:.1f}MB", flush=True)
    t0 = time.time()
    fm = wm.get_multi_kernel(mspec)
    om = fm(scal, twt, twq)
    t1 = time.time()
    om2 = fm(scal, twt, twq)
    t2 = time.time()
    fk = wk.get_kernel(kspec)
    ok = fk(scal, twt, twq)
    t3 = time.time()
    ok2 = fk(scal, twt, twq)
    t4 = time.time()
    ni = int(np.asarray(ok["n_iter_lo"]).sum()) + (int(np.asarray(ok["n_iter_hi"]).sum()) << 30)
    print(f"  multi cold {t1-t0:.1f}s warm {t2-t1:.3f}s | single cold {t3-t2:.1f}s warm {t4-t3:.3f}s | cells {ni} | m-warm c/s {ni/(t2-t1)/1e6:.0f}M s-warm {ni/(t4-t3)/1e6:.0f}M", flush=True)
    for k in ("final_s", "done", "stopped", "ovf_band", "n_iter_lo", "n_iter_hi", "last_state"):
        a, b = np.asarray(om[k]), np.asarray(ok[k])
        if not np.array_equal(a, b):
            print(f"  MISMATCH {k}: {a.tolist()} vs {b.tolist()}", flush=True)
    print(f"  s={np.asarray(om['final_s']).tolist()}", flush=True)
