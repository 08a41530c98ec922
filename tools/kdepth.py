"""Depth sweep: megakernel rays/s vs max_depth, front vs brute.

The marginal cost between consecutive depths isolates the per-bounce cost
(closest hit + scatter + loop overhead) from the fixed per-tile cost
(ray feed, kernel launch, radiance writeback). Comparing front vs brute at
each depth shows how much of each bounce the front culling actually saves —
primary bounces are coherent (block-ordered tiles), later bounces are not.

Usage: python -m tools.kdepth [depths...]   (default 1 4 16)
       KDEPTH_PATHS=front python -m tools.kdepth   (skip brute)
"""

from __future__ import annotations

import json
import os
import sys

from raytracingproject_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from raytracingproject_tpu.bvh import build_bvh, reorder_scene
from raytracingproject_tpu.camera import Camera
from raytracingproject_tpu.ops.pallas.megakernel import front_tables
from raytracingproject_tpu.render import render_pass
from raytracingproject_tpu.scene import make_cover_scene
from tools.measure import marginal_seconds_per_pass

W, H = 400, 225


def main() -> None:
    # sorted + de-duplicated: duplicate or unordered depths would divide by
    # zero / produce misleading negative marginals below (round-2 advisor)
    depths = sorted(set(int(a) for a in sys.argv[1:])) or [1, 4, 16]
    paths = os.environ.get("KDEPTH_PATHS", "front,brute").split(",")
    scene = make_cover_scene(seed=0)
    bvh = build_bvh(scene, leaf_size=8)
    rscene = reorder_scene(scene, bvh)
    front = front_tables(rscene, bvh)
    rays = W * H

    prev = {}
    for depth in depths:
        cam = Camera(
            aspect_ratio=16 / 9, image_width=W, samples_per_pixel=1,
            max_depth=depth, vfov=20.0, lookfrom=(13.0, 2.0, 3.0),
            lookat=(0.0, 0.0, 0.0), defocus_angle=0.6, focus_dist=10.0,
        ).derive()
        row = {"depth": depth}
        for tag, kw in (("front", {"front": front}), ("brute", {})):
            if tag not in paths:
                continue
            def make(key, kw=kw, depth=depth):
                return render_pass(rscene, cam, key, width=W, height=H,
                                   max_depth=depth, use_megakernel=True, **kw)

            sec, _ = marginal_seconds_per_pass(make, k1=4, k2=12, reps=3)
            row[tag + "_mrays"] = round(rays / sec / 1e6, 2)
            row[tag + "_us_per_pass"] = round(sec * 1e6, 1)
            if tag in prev:
                row[tag + "_us_marginal_depth"] = round(
                    (sec - prev[tag]) * 1e6 / (depth - prev["depth"]), 2
                )
            prev[tag] = sec
        prev["depth"] = depth
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
