"""BASELINE config 5, single-chip slice: 4K (3840x2160) at 512 spp.

The pod-scale config's mesh sharding is validated by the 8-device dryrun
(__graft_entry__.dryrun_multichip); what a single chip can prove is the
CHUNKING/MEMORY path at 4K — ~4.25 Grays of camera samples per frame
streamed through the megakernel in spp chunks without OOM — and the honest
frame time at that scale. Records CONFIG5_r{N}.json.

Run: python -m tools.bench_config5 [--spp 512] [--chunks-only]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracingproject_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from raytracingproject_tpu.camera import Camera
from raytracingproject_tpu.color import to_u8
from raytracingproject_tpu.config import RenderSettings
from raytracingproject_tpu.render import render
from raytracingproject_tpu.scene import make_cover_scene
from tools.measure import fresh_salt

WIDTH, HEIGHT = 3840, 2160


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=512)
    ap.add_argument("--depth", type=int, default=50)
    args = ap.parse_args()

    scene = make_cover_scene(seed=0)
    camera = Camera(
        aspect_ratio=16.0 / 9.0, image_width=WIDTH,
        samples_per_pixel=args.spp, max_depth=args.depth,
        vfov=20.0, lookfrom=(13.0, 2.0, 3.0), lookat=(0.0, 0.0, 0.0),
        defocus_angle=0.6, focus_dist=10.0,
    )
    settings = RenderSettings(
        use_megakernel=jax.devices()[0].platform == "tpu",
        use_bvh=True,
        rays_per_batch=1 << 23,  # 8.3M rays/pass: 4K pixels x 1 spp
        sync_every=8,
    )
    pixels = WIDTH * HEIGHT
    spp_chunk = max(1, settings.rays_per_batch // pixels)
    total_rays = pixels * args.spp

    # compile pass (1 spp) so the timed frame is compile-free
    warm_cam = Camera(
        aspect_ratio=16.0 / 9.0, image_width=WIDTH, samples_per_pixel=spp_chunk,
        max_depth=args.depth, vfov=20.0, lookfrom=(13.0, 2.0, 3.0),
        lookat=(0.0, 0.0, 0.0), defocus_angle=0.6, focus_dist=10.0,
    )
    np.asarray(render(scene, warm_cam, jax.random.PRNGKey(0), settings))

    t0 = time.perf_counter()
    img = render(scene, camera, jax.random.PRNGKey(fresh_salt()), settings)
    u8 = np.asarray(to_u8(img))  # host fetch = true frame barrier
    frame_s = time.perf_counter() - t0

    stats = jax.local_devices()[0].memory_stats() or {}
    out = {
        "config": "baseline_5_single_chip_slice_4k",
        "resolution": f"{WIDTH}x{HEIGHT}",
        "spp": args.spp,
        "max_depth": args.depth,
        "total_rays": total_rays,
        "spp_chunk": spp_chunk,
        "n_chunks": (args.spp + spp_chunk - 1) // spp_chunk,
        "frame_seconds": round(frame_s, 1),
        "rays_per_sec": round(total_rays / frame_s, 1),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "image_mean_u8": round(float(u8.mean()), 2),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out), flush=True)

    rounds = [
        int(m.group(1))
        for f in glob.glob("BENCH_r*.json")
        if (m := re.search(r"BENCH_r(\d+)", f))
    ]
    n_round = (max(rounds) + 1) if rounds else 0
    with open(f"CONFIG5_r{n_round:02d}.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
