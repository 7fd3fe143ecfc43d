"""Test harness config: CPU backend with 8 virtual devices + persistent
compile cache.

Must run before any jax import (pytest loads conftest first; test modules
import miniwfa_tpu/jax lazily inside their own module scope).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override: tests always run on the
# virtual CPU mesh, never on real TPU hardware (the driver benches on TPU)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon sitecustomize registers the TPU plugin at interpreter start and
# clobbers JAX_PLATFORMS; the config update below wins over it
jax.config.update("jax_platforms", "cpu")

_CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import json  # noqa: E402
import pytest  # noqa: E402

_GOLDENS = None


@pytest.fixture(scope="session")
def goldens():
    global _GOLDENS
    if _GOLDENS is None:
        path = os.path.join(os.path.dirname(__file__), "data", "goldens.json")
        with open(path) as f:
            _GOLDENS = json.load(f)
    return _GOLDENS
