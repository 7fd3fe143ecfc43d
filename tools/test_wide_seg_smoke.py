#!/usr/bin/env python3
"""Wide-engine segment-rotation smoke: a >254 kb pair needs nseg>1 word
tables, exercising the globally-elected segment swap in the wide
engine's refill (wavefront_wide.py).  Compares s/n_iter against the lax
engine on the same pair.  CPU interpret mode.
"""
import os
import random
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")
from miniwfa_tpu.options import Options  # noqa: E402
from miniwfa_tpu.models.exact import align_batch  # noqa: E402
from miniwfa_tpu.ops import wavefront_kernel as wk  # noqa: E402
from miniwfa_tpu.ops import wavefront_wide as ww  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
rng = random.Random(42)
t = [rng.choice("ACGT") for _ in range(N)]
q = list(t)
for _ in range(120):            # sparse subs -> small s, long extensions
    i = rng.randrange(N)
    q[i] = rng.choice([b for b in "ACGT" if b != q[i]])
del q[1000:1050]                # one 50 bp deletion
ts, qs = "".join(t).encode(), "".join(q).encode()

os.environ["MWF_ENGINE"] = "lax"
r = align_batch([(ts, qs)], Options(), w0=4096)[0]
del os.environ["MWF_ENGINE"]
print(f"lax: s={r.s} n_iter={r.n_iter}", flush=True)

nseg = wk.nseg_for(len(ts), 16)
spec = ww.WSpec(B=1, WR=128, S_CAP=2048, x=4, o1=4, e1=2, o2=15, e2=1,
                mode=wk.MODE_SCORE, cpw=16, nseg=nseg)
print(f"wide: nseg={nseg} W={spec.W}", flush=True)
scal = np.zeros((1, wk.SC_ANC + 1), np.int32)
scal[0, :3] = [len(ts), len(qs), (len(qs) - len(ts)) // 2 - spec.W // 2]
twt = wk.pack_table([ts], 16, nseg)
twq = wk.pack_table([qs], 16, nseg)
fn = ww.get_kernel_wide(spec, interpret=True)
t0 = time.perf_counter()
out = {k: np.asarray(v) for k, v in fn(scal, twt, twq).items()}
dt = time.perf_counter() - t0
s = int(out["final_s"][0])
n_iter = (int(out["n_iter_hi"][0]) << 30) | int(out["n_iter_lo"][0])
ok = (s == r.s and n_iter == r.n_iter and bool(out["done"][0]))
print(f"wide: s={s} n_iter={n_iter} done={bool(out['done'][0])} "
      f"ovf={bool(out['overflow'][0])} [{dt:.1f}s] "
      f"{'OK' if ok else 'MISMATCH'}", flush=True)
sys.exit(0 if ok else 1)
