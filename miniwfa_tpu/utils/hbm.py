"""Peak device-memory meter — the km_stat analog (kalloc.c:218-224).

The reference's arena allocator can report its capacity/used bytes via
``km_stat``; here XLA owns allocation, so the meter tracks the bytes the
drivers actually dispatch: every ``note()`` records one device call's
buffer footprint (DP planes, traceback tables, snapshot rows — the
buffers that have OOMed in practice) and the module keeps the peak.
``device_peak()`` additionally reads the runtime's own
``memory_stats()`` counters when the backend exposes them (the
tunnelled axon backend returns None; real PJRT TPU/CPU backends report
``peak_bytes_in_use``).

Zero overhead when nothing reads it: plain integer max-tracking, no
device work, no synchronization.
"""

from __future__ import annotations

from typing import Optional, Tuple

_peak: int = 0
_peak_tag: str = ""


def reset() -> None:
    global _peak, _peak_tag
    _peak = 0
    _peak_tag = ""


def note(tag: str, nbytes: int) -> None:
    """Record one device dispatch's buffer footprint (bytes)."""
    global _peak, _peak_tag
    if nbytes > _peak:
        _peak = int(nbytes)
        _peak_tag = tag


def note_arrays(tag: str, *objs) -> int:
    """Sum ``nbytes`` over arrays / dicts of arrays and record it."""
    total = 0
    for o in objs:
        if o is None:
            continue
        if isinstance(o, dict):
            vals = o.values()
        elif isinstance(o, (list, tuple)):
            vals = o
        else:
            vals = (o,)
        for v in vals:
            total += int(getattr(v, "nbytes", 0) or 0)
    note(tag, total)
    return total


def peak() -> Tuple[int, str]:
    """(peak dispatch bytes, tag of the peak dispatch) since reset()."""
    return _peak, _peak_tag


def device_peak() -> Optional[int]:
    """Runtime peak_bytes_in_use, when the backend reports it."""
    try:
        import jax
        st = jax.devices()[0].memory_stats()
        if st:
            return int(st.get("peak_bytes_in_use", 0)) or None
    except Exception:
        pass
    return None


def snapshot() -> dict:
    """One JSON-able report: the km_stat print."""
    b, tag = peak()
    out = {"peak_dispatch_bytes": b,
           "peak_dispatch_gb": round(b / 2**30, 3),
           "peak_dispatch": tag}
    dp = device_peak()
    if dp is not None:
        out["device_peak_bytes"] = dp
    return out
