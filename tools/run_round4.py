"""Round-4 device batch: every real-chip measurement in ONE session.

The tunneled TPU charges ~10 min acquisition per NEW client and allows one
client at a time, so the round's entire device agenda runs here
sequentially: the TPU test lane first (as a subprocess, BEFORE this parent
process initializes the backend — two clients total for the whole round),
then every benchmark/artifact phase in-process. Each phase is isolated in
try/except so one failure doesn't void the rest; artifacts are written by
the phases themselves (RTP_ROUND pins the round number).

Usage: RTP_ROUND=4 python -m tools.run_round4 [phase ...]
       (no args = all phases, in order)
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

os.environ.setdefault("RTP_ROUND", "4")
os.environ.setdefault("SCALING_BACKEND", "native")

PHASES: list = []  # (name, fn), run in registration order


def phase(name):
    def deco(fn):
        PHASES.append((name, fn))
        return fn

    return deco


@phase("tpu_lane")
def run_tpu_lane():
    # subprocess BEFORE the parent acquires the device (see module doc)
    from tools import run_tpu_lane as lane

    old = sys.argv
    try:
        sys.argv = ["run_tpu_lane"]
        lane.main()
    finally:
        sys.argv = old


@phase("verify_drive")
def run_verify_drive():
    """The /verify skill's drive: real-chip render_image + session smoke."""
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

    write_ppm(img, "/tmp/round4_verify.ppm")

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
    print(json.dumps({"verify_session_frames": 3,
                      "verify_ppm": "/tmp/round4_verify.ppm"}), flush=True)


@phase("bench_grad")
def run_bench_grad():
    import bench_grad

    bench_grad.main()


@phase("bench_front")
def run_bench_front():
    from tools import bench_front_full

    old = sys.argv
    try:
        sys.argv = ["bench_front_full", "0", "5000", "50000"]
        bench_front_full.main()
    finally:
        sys.argv = old


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

    old = sys.argv
    try:
        sys.argv = ["bench_config3"]
        bench_config3.main()
    finally:
        sys.argv = old


@phase("scaling_native")
def run_scaling_native():
    import bench_scaling

    bench_scaling.main()


@phase("config5")
def run_config5():
    from tools import bench_config5

    old = sys.argv
    try:
        sys.argv = ["bench_config5"]
        bench_config5.main()
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
    print(json.dumps({"round4_phases": results}), flush=True)


if __name__ == "__main__":
    main()
