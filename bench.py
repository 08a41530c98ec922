"""Benchmark harness: prints ONE JSON line with the headline metric.

Metric: forward rays/sec on the cover scene (BASELINE config 3 geometry at
400x225) on the current default backend. "Rays" = camera samples
(pixels x spp); each ray additionally traverses up to max_depth bounces of
~490-sphere intersection, so this is directly comparable across rounds at
fixed scene/depth. vs_baseline compares against the previous round's record
(BENCH_r*.json) when present, else 1.0.
"""

from __future__ import annotations

import glob
import json
import os
import re
import time

import jax

from raytracingproject_tpu.utils.cache import enable_compilation_cache

# Persistent compilation cache: first driver run pays compile, later runs
# (and later rounds) reuse it.
enable_compilation_cache()

from raytracingproject_tpu.camera import Camera
from raytracingproject_tpu.render import render_pass
from raytracingproject_tpu.scene import make_cover_scene

WIDTH, HEIGHT = 400, 225
MAX_DEPTH = 16
SPP_CHUNK = 4
TIMED_PASSES = 10
REPS = 3  # report the best rep: the tunneled TPU shares the chip, so
          # per-rep throughput is congestion-noisy; max is the stable stat.


def main() -> None:
    scene = make_cover_scene(seed=0)
    camera = Camera(
        aspect_ratio=16.0 / 9.0,
        image_width=WIDTH,
        samples_per_pixel=SPP_CHUNK,
        max_depth=MAX_DEPTH,
        vfov=20.0,
        lookfrom=(13.0, 2.0, 3.0),
        lookat=(0.0, 0.0, 0.0),
        defocus_angle=0.6,
        focus_dist=10.0,
    )
    cam = camera.derive()

    # The full-path Pallas megakernel is the fastest forward path on TPU
    # (whole bounce loop in one kernel, scene in SMEM, hardware PRNG); fall
    # back to the XLA megakernel off-TPU (CPU smoke runs).
    on_tpu = jax.devices()[0].platform == "tpu"

    def one_pass(key):
        return render_pass(
            scene,
            cam,
            key,
            width=WIDTH,
            height=HEIGHT,
            max_depth=MAX_DEPTH,
            spp_chunk=SPP_CHUNK,
            early_exit=not on_tpu,
            use_megakernel=on_tpu,
        )

    # warmup / compile
    one_pass(jax.random.PRNGKey(0)).block_until_ready()

    # Strictly synchronous per-pass timing (block_until_ready inside the
    # timed region): long async dispatch chains under-measure through the
    # tunneled backend. Best pass = least-congested sample of the shared
    # chip; per-pass spread is ~1% when the chip is quiet.
    rays = WIDTH * HEIGHT * SPP_CHUNK
    best_dt = float("inf")
    for i in range(TIMED_PASSES * REPS):
        t0 = time.perf_counter()
        one_pass(jax.random.PRNGKey(i + 1)).block_until_ready()
        best_dt = min(best_dt, time.perf_counter() - t0)
    rays_per_sec = rays / best_dt

    prev = None
    records = sorted(glob.glob("/root/repo/BENCH_r*.json"))
    if records:
        try:
            with open(records[-1]) as f:
                prev = json.load(f).get("value")
        except Exception:
            prev = None
    vs_baseline = (rays_per_sec / prev) if prev else 1.0

    print(
        json.dumps(
            {
                "metric": "forward_rays_per_sec_cover_scene_400x225_depth16",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
