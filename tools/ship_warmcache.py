#!/usr/bin/env python3
"""Ship the live XLA compile cache as a committed warm-cache manifest.

Copies every entry of ``<repo>/.jax_cache`` into
``<repo>/warmcache/<key>/`` where ``<key>`` names the jax release and
the device kind the entries were compiled for (hygiene only — jax's
content-addressed hashes already guarantee foreign entries are never
hit).  ``utils/cache.enable_compile_cache()`` seeds a fresh machine's
cache from this directory, so a clean checkout's FIRST run of the
bench/CLI/golden-gate starts hot instead of paying the multi-minute
remote compiles (VERDICT r4 ask #2: own the cold start).

Usage: python tools/ship_warmcache.py [--min-kb N] [--clean]
  --min-kb N   only ship entries >= N KiB (default 0: everything)
  --clean      delete the existing manifest for this key first
"""
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from miniwfa_tpu.utils.cache import repo_root  # noqa: E402


def main():
    min_kb = 0
    clean = "--clean" in sys.argv
    if "--min-kb" in sys.argv:
        min_kb = int(sys.argv[sys.argv.index("--min-kb") + 1])

    import jax
    try:
        dev = jax.devices()[0].device_kind.replace(" ", "-").lower()
    except Exception:  # noqa: BLE001
        dev = "cpu"
    key = f"{dev}-jax{jax.__version__}"

    src = os.environ.get("MWF_JAX_CACHE",
                         os.path.join(repo_root(), ".jax_cache"))
    dst = os.path.join(repo_root(), "warmcache", key)
    if clean and os.path.isdir(dst):
        shutil.rmtree(dst)
    os.makedirs(dst, exist_ok=True)

    n = tot = 0
    for name in sorted(os.listdir(src)):
        p = os.path.join(src, name)
        if not os.path.isfile(p):
            continue
        sz = os.path.getsize(p)
        if sz < min_kb * 1024:
            continue
        q = os.path.join(dst, name)
        if not os.path.exists(q):
            shutil.copy2(p, q)
            n += 1
            tot += sz
    print(f"shipped {n} new entries ({tot / 2**20:.1f} MiB) -> {dst}")


if __name__ == "__main__":
    main()
