#!/usr/bin/env python3
"""Run corpus subsets through the fused kernel to find faulting cases.

Usage: kernel_case_bisect.py <case-name>... | --batch <i0> <i1> | --copies N
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np  # noqa: E402


def main():
    from miniwfa_tpu.options import Options
    from miniwfa_tpu.models.exact import align_batch

    g = json.load(open(os.path.join(os.path.dirname(__file__), "..",
                                    "tests", "data", "goldens.json")))
    pen = g["penalties"]
    cases = g["cases"]
    want = g["runs"]["score"]
    by_name = {c["name"]: i for i, c in enumerate(cases)}

    if sys.argv[1] == "--batch":
        idx = list(range(int(sys.argv[2]), min(int(sys.argv[3]), len(cases))))
    elif sys.argv[1] == "--copies":
        idx = [by_name["t3"]] * int(sys.argv[2])
    else:
        idx = [by_name[n] for n in sys.argv[1:]]

    pairs = [(cases[i]["t"].encode(), cases[i]["q"].encode()) for i in idx]
    res = align_batch(pairs, Options(**pen), w0=1024)
    bad = [(cases[i]["name"], r.s, want[i]["s"])
           for i, r in zip(idx, res) if r.s != want[i]["s"]]
    if bad:
        print("MISMATCH:", bad[:10])
        return 1
    print(f"OK {len(idx)} cases: {[cases[i]['name'] for i in idx][:8]}...")
    return 0


if __name__ == "__main__":
    sys.exit(main())
