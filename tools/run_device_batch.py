"""One-client device batch runner: every real-chip harness as a phase.

The tunneled TPU charges ~10 min acquisition per NEW client and allows one
client at a time, so a round's device agenda runs as one process invoking
phases in order. Each phase is isolated in try/except; artifacts are
written by the harnesses themselves (export RTP_ROUND to pin the round).

Usage: RTP_ROUND=N python -m tools.run_device_batch [phase ...]
       (no args = the full ordered set below)

Phases: tpu_lane verify_drive bench_grad bench_front bench_headline
        roofline kprobes bench_geom config3 scaling_native config5
        headline_repack_sweep

Round 4 ran five of these batches while iterating the replay design on
hardware; the per-batch scripts were consolidated here.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

os.environ.setdefault("SCALING_BACKEND", "native")

PHASES: list = []


def phase(name):
    def deco(fn):
        PHASES.append((name, fn))
        return fn

    return deco


def _with_argv(argv, fn):
    old = sys.argv
    try:
        sys.argv = argv
        fn()
    finally:
        sys.argv = old


@phase("tpu_lane")
def run_tpu_lane():
    # subprocess BEFORE this parent process initializes the backend: two
    # device clients total for a whole batch
    from tools import run_tpu_lane as lane

    _with_argv(["run_tpu_lane"], lane.main)


@phase("verify_drive")
def run_verify_drive():
    """The /verify skill's drive (round-5 version): real-chip render_image
    + session smoke + misuse probe + two-phase parity/replay gates."""
    from tools import verify_drive_r5

    verify_drive_r5.main()


@phase("bench_grad")
def run_bench_grad():
    import bench_grad

    bench_grad.main()


@phase("bench_front")
def run_bench_front():
    from tools import bench_front_full

    # 16000 = the largest-N brute anchor that still compiles (round-4
    # VERDICT weak #6: the 50k brute control was an error row; this pins
    # the vs_brute curve's tail with a real measurement)
    _with_argv(["bench_front_full", "0", "5000", "16000", "50000"],
               bench_front_full.main)


@phase("bench_headline")
def run_bench_headline():
    import bench

    bench.main()


@phase("roofline")
def run_roofline():
    from tools import roofline

    roofline.main()


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

    _with_argv(["bench_config3"], bench_config3.main)
    # two-phase variant rides the same artifact under variants[path]
    _with_argv(["bench_config3", "--two-phase", "4"], bench_config3.main)


@phase("scaling_native")
def run_scaling_native():
    import bench_scaling

    bench_scaling.main()


@phase("config5")
def run_config5():
    from tools import bench_config5

    _with_argv(["bench_config5"], bench_config5.main)


@phase("headline_repack_sweep")
def run_headline_sweep():
    import bench

    for rp in ("1", "2", "3"):
        os.environ["BENCH_REPACK"] = rp
        print(json.dumps({"headline_repack": int(rp)}), flush=True)
        bench.main()
    os.environ.pop("BENCH_REPACK", None)


@phase("twophase_sweep")
def run_twophase_sweep():
    """Headline config across two-phase cut depths (0 = monolithic)."""
    import bench

    for tp in ("0", "2", "3", "4", "6"):
        os.environ["BENCH_TWOPHASE"] = tp
        print(json.dumps({"headline_twophase_cut": int(tp)}), flush=True)
        try:
            bench.main()
        except Exception:
            import traceback

            traceback.print_exc()
    os.environ.pop("BENCH_TWOPHASE", None)


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
    print(json.dumps({"device_batch_phases": results}), flush=True)


if __name__ == "__main__":
    main()
