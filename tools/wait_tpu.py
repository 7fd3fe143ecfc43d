#!/usr/bin/env python3
"""Block until the TPU tunnel answers a trivial computation (or timeout)."""
import subprocess
import sys
import time

PROBE = "import jax, jax.numpy as jnp; print(int(jnp.sum(jnp.ones(8))))"


def wait(limit=600):
    t0 = time.time()
    attempt = 0
    while time.time() - t0 < limit:
        attempt += 1
        try:
            out = subprocess.run([sys.executable, "-c", PROBE], timeout=60,
                                 capture_output=True, text=True)
            if "8" in out.stdout:
                print(f"tpu healthy after {time.time()-t0:.0f}s "
                      f"({attempt} probes)")
                return 0
        except subprocess.TimeoutExpired:
            pass
        time.sleep(10)
    print("tpu NOT healthy")
    return 1


if __name__ == "__main__":
    sys.exit(wait(int(sys.argv[1]) if len(sys.argv) > 1 else 600))
