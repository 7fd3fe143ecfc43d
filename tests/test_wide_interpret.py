"""The wide-band (HBM-ring) Pallas engine in CI (interpret mode on CPU).

ops/wavefront_wide.py is the TPU path for bands beyond the VMEM kernel's
window caps (score mode past W=65536, low-mem pass 1 past W=32768) — the
reference's 5 Mb workloads (README.md:98-99).  Its chunk-staged sweeps,
HBM ring slots and in-place snapshot rows are a distinct code path from
the VMEM kernel, so a golden subset runs it here through the public
driver with ``MWF_ENGINE=wide-interpret`` (w0=16384 lands on its minimum
W bucket).  Interpret mode replays every chunk sweep in Python —
~20-30 s per case — so the subset is small; tools/test_wide_smoke.py
runs the full set on demand.
"""

import pytest


@pytest.fixture
def wide_engine(monkeypatch):
    monkeypatch.setenv("MWF_ENGINE", "wide-interpret")


def _case(goldens, name):
    i = [c["name"] for c in goldens["cases"]].index(name)
    c = goldens["cases"][i]
    return i, (c["t"].encode(), c["q"].encode())


def test_wide_interpret_scores(goldens, wide_engine):
    from miniwfa_tpu import Options
    from miniwfa_tpu.models.exact import align_batch

    # med2k crosses s=256: covers the chunked shrink sweep
    names = ["t3", "med2k"]
    idx, pairs = zip(*(_case(goldens, n) for n in names))
    res = align_batch(list(pairs), Options(**goldens["penalties"]),
                      w0=16384)
    for j, i in enumerate(idx):
        want = goldens["runs"]["score"][i]
        name = goldens["cases"][i]["name"]
        assert res[j].s == want["s"], name
        if name in goldens["niter"]:   # exact cell-count parity
            assert res[j].n_iter == goldens["niter"][name]["n_iter"], name


def test_wide_interpret_lowmem(goldens, wide_engine):
    from miniwfa_tpu import Options
    from miniwfa_tpu.models.exact import align_batch

    # wide pass 1 (snapshot rows + pointer decode) feeding pass 2
    i, pair = _case(goldens, "t3")
    res = align_batch([pair], Options(**goldens["penalties"], cigar=True,
                                      step=16), w0=16384)
    want = goldens["runs"]["lowmem_p16"][i]
    assert res[0].s == want["s"]
    assert res[0].cigar_str == want["cigar"]
