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
    """The /verify skill's drive: real-chip render_image + session smoke
    + misuse probe."""
    import numpy as np
    import jax
    import raytracingproject_tpu as rt

    scene = rt.scene.make_three_sphere_scene()
    cam = rt.Camera(aspect_ratio=16 / 9, image_width=400, samples_per_pixel=8,
                    max_depth=8, vfov=90.0, lookfrom=(0, 0, 0),
                    lookat=(0, 0, -1))
    img = np.asarray(rt.render_image(scene, cam, jax.random.PRNGKey(0)))
    assert img.shape == (225, 400, 3), img.shape
    tl = img[:10, :10].mean(axis=(0, 1))
    print(json.dumps({"verify_render_shape": list(img.shape),
                      "verify_mean": round(float(img.mean()), 1),
                      "verify_topleft": [round(float(v), 1) for v in tl]}),
          flush=True)
    assert 180 < tl[0] < 230 and tl[2] > 240, tl  # sky gradient top-left

    from raytracingproject_tpu.utils.ppm import write_ppm

    write_ppm(img, "/tmp/device_batch_verify.ppm")

    from raytracingproject_tpu.config import RenderSettings
    from raytracingproject_tpu.session import RendererSession, SessionError

    s = RendererSession(RenderSettings(width=64, height=48))
    try:  # misuse probe: draw before init must raise SessionError
        s.draw_frame()
        raise AssertionError("draw_frame before init did not raise")
    except SessionError:
        pass
    s.init()
    s.load_preconfigured_shapes()
    s.start_interactive_loop(duration_ms=120000, max_frames=3)
    print(json.dumps({"verify_session_frames": 3}), flush=True)


@phase("bench_grad")
def run_bench_grad():
    import bench_grad

    bench_grad.main()


@phase("bench_front")
def run_bench_front():
    from tools import bench_front_full

    _with_argv(["bench_front_full", "0", "5000", "50000"],
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
