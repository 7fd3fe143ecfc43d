"""Native C++ host-runtime kernels (native/mwfrt.cpp via ctypes): parity
with the pure-Python fallbacks."""

import numpy as np
import pytest

from miniwfa_tpu.utils import native


def test_native_builds_and_loads():
    if not native.available():
        pytest.skip("no compiler available to build libmwfrt.so")
    assert native.available()


def test_lis_parity():
    if not native.available():
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 40, size=500).astype(np.uint64)
    idx = native.lis_u64(a)
    # verify: strictly increasing subsequence and maximal length vs a
    # simple O(n log n) python LIS
    vals = a[idx]
    assert np.all(np.diff(vals.astype(np.int64)) > 0)
    import bisect
    tails = []
    for v in a:
        p = bisect.bisect_left(tails, v)
        if p == len(tails):
            tails.append(v)
        else:
            tails[p] = v
    assert len(idx) == len(tails)


def test_traceback_native_vs_python(goldens):
    """The CIGAR walker must give identical output from the native and the
    Python implementations (same packed tb buffer)."""
    if not native.available():
        pytest.skip("native runtime unavailable")
    from miniwfa_tpu import Options
    from miniwfa_tpu.models import traceback as tbk
    from miniwfa_tpu.models.exact import _buckets_for, _run_device, as_bytes
    from miniwfa_tpu.ops.wavefront import MODE_TB
    import numpy as onp
    import jax

    opt = Options(cigar=True)
    cases = [c for c in goldens["cases"]
             if 0 < max(len(c["t"]), len(c["q"])) <= 256][:12]
    ts = [as_bytes(c["t"]) for c in cases]
    qs = [as_bytes(c["q"]) for c in cases]
    bk = _buckets_for(opt, ts, qs, 512, 512)
    out, spec = _run_device(opt, MODE_TB, bk, ts, qs)
    tb_bits = onp.asarray(jax.device_get(out["tb_bits"]))
    tb_anc = onp.asarray(jax.device_get(out["tb_anc"]))
    for j, c in enumerate(cases):
        s = int(out["final_s"][j])
        if s < 0:
            continue
        last = int(out["last_state"][j])
        nat = native.traceback(tb_bits[j, :max(s, 1)], tb_anc[j, :max(s, 1)],
                               0, ts[j], qs[j], s, last,
                               opt.x, opt.o1, opt.e1, opt.o2, opt.e2)
        # force the python path by calling the module-level walker with the
        # native bridge monkeypatched off
        import miniwfa_tpu.utils.native as nat_mod
        orig = nat_mod.available
        nat_mod.available = lambda: False
        try:
            py = tbk.traceback_walk(opt, tb_bits[j, :max(s, 1)],
                                    tb_anc[j, :max(s, 1)], 0,
                                    ts[j], qs[j], s, last)
        finally:
            nat_mod.available = orig
        assert nat is not None, c["name"]
        assert [int(v) for v in nat] == py, c["name"]
