"""Engine-getter caching: a fresh jit per dispatch means a fresh XLA
compile per dispatch (~1.6 s over the tunnel — the bug that made the
sharded path 5x slower than align_batch until round 3)."""

import numpy as np


def test_sharded_kernel_getter_is_cached():
    import jax
    from jax.sharding import Mesh
    from miniwfa_tpu.ops import wavefront_kernel as wk

    spec = wk.KSpec(B=8, WR=8, S_CAP=512, x=4, o1=4, e1=2, o2=15, e2=1,
                    mode=wk.MODE_SCORE, cpw=16, nseg=1)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    f1 = wk.get_sharded_kernel(spec, mesh, "data")
    f2 = wk.get_sharded_kernel(spec, mesh, "data")
    assert f1 is f2


def test_kernel_getter_is_cached():
    from miniwfa_tpu.ops import wavefront_kernel as wk

    spec = wk.KSpec(B=1, WR=8, S_CAP=512, x=4, o1=4, e1=2, o2=15, e2=1,
                    mode=wk.MODE_SCORE, cpw=16, nseg=1)
    assert wk.get_kernel(spec) is wk.get_kernel(spec)


def test_wide_call_getter_is_cached():
    from miniwfa_tpu.ops import wavefront_wide as ww

    spec = ww.WSpec(B=1, WR=128, S_CAP=512, x=4, o1=4, e1=2, o2=15, e2=1)
    assert ww._get_call(spec) is ww._get_call(spec)
