"""Round-4 device batch 5 (final): clipped bench_grad, resilient kprobes,
re-measured roofline.

Usage: RTP_ROUND=4 python -m tools.run_round4e [phase ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

os.environ.setdefault("RTP_ROUND", "4")

PHASES: list = []


def phase(name):
    def deco(fn):
        PHASES.append((name, fn))
        return fn

    return deco


@phase("bench_grad")
def run_bench_grad():
    import bench_grad

    bench_grad.main()


@phase("kprobes")
def run_kprobes():
    from tools import kprobes

    kprobes.main()


@phase("roofline")
def run_roofline():
    from tools import roofline

    roofline.main()


def main() -> None:
    want = set(sys.argv[1:])
    results = {}
    for name, fn in PHASES:
        if want and name not in want:
            continue
        t0 = time.perf_counter()
        print(f"==== PHASE {name} start ====", flush=True)
        try:
            fn()
            results[name] = "ok"
        except Exception:
            traceback.print_exc()
            results[name] = "FAILED"
        print(f"==== PHASE {name} {results[name]} "
              f"({time.perf_counter() - t0:.0f}s) ====", flush=True)
    print(json.dumps({"round4e_phases": results}), flush=True)


if __name__ == "__main__":
    main()
