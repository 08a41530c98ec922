"""Round-4 device batch 3: authoritative replay-side numbers.

Batches 1/2 iterated the replay design on hardware (hybrid gather, cond
skip rejection, hoist guard, divergence guards); this batch measures the
COMMITTED final configuration: bench_grad (all rows), kprobes (with the
hoist-guarded gather), bench_geom (in-jit refresh + plain replay), and
config3 at the baked repack-2 front default.

Usage: RTP_ROUND=4 python -m tools.run_round4c [phase ...]
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


@phase("bench_geom")
def run_bench_geom():
    from tools import bench_geom

    bench_geom.main()


@phase("config3")
def run_config3():
    from tools import bench_config3

    old = sys.argv
    try:
        sys.argv = ["bench_config3"]
        bench_config3.main()
    finally:
        sys.argv = old


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
        dt = time.perf_counter() - t0
        print(f"==== PHASE {name} {results[name]} ({dt:.0f}s) ====",
              flush=True)
    print(json.dumps({"round4c_phases": results}), flush=True)


if __name__ == "__main__":
    main()
