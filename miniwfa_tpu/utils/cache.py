"""Persistent XLA compilation cache (compile once per spec bucket, reuse
across processes).  The wavefront while-loop is a large program; first
compile can take minutes on CPU — the cache makes every later CLI/bench
invocation start hot."""

from __future__ import annotations

import os

_DONE = False


def enable_compile_cache(path: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax

    if path is None:
        path = os.environ.get(
            "MWF_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
