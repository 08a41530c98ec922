"""Round-4 device batch 2: re-measure everything the first batch ran with
pre-fix modules.

Batch 1 (tools/run_round4.py) hot-edited several modules after its phases
had cached the old versions; this batch runs the committed code fresh:
  - TPU test lane (new kernels: repack default 1 must stay 9/9)
  - verify drive (the /verify skill's real-chip render + session smoke)
  - bench_front: repack 2/3 sweep rows + ordered/unordered controls
  - bench_grad: production fast rows (auto dead-skip) + noskip/g8 controls
  - kprobes: the noskip control now actually differs (batch 1's in-process
    module aliasing made it identical to the skip row)
  - roofline: fixed FMA peak probe (unrolled; util must be <= 1)
  - bench_geom: groups=1 / auto-skip defaults
  - headline sweep at BENCH_REPACK in {1, 2, 3}

Usage: RTP_ROUND=4 python -m tools.run_round4b [phase ...]
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


@phase("tpu_lane")
def run_tpu_lane():
    from tools import run_tpu_lane as lane

    old = sys.argv
    try:
        sys.argv = ["run_tpu_lane"]
        lane.main()
    finally:
        sys.argv = old


@phase("verify_drive")
def run_verify_drive():
    from tools.run_round4 import run_verify_drive as drive

    drive()


@phase("bench_front")
def run_bench_front():
    from tools import bench_front_full

    old = sys.argv
    try:
        sys.argv = ["bench_front_full", "0", "5000", "50000"]
        bench_front_full.main()
    finally:
        sys.argv = old


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


@phase("bench_geom")
def run_bench_geom():
    from tools import bench_geom

    bench_geom.main()


@phase("headline_repack_sweep")
def run_headline_sweep():
    import bench

    for rp in ("1", "2", "3"):
        os.environ["BENCH_REPACK"] = rp
        print(json.dumps({"headline_repack": int(rp)}), flush=True)
        bench.main()
    os.environ.pop("BENCH_REPACK", None)


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
    print(json.dumps({"round4b_phases": results}), flush=True)


if __name__ == "__main__":
    main()
