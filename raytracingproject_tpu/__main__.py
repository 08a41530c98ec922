"""CLI entry point — the analog of the reference's src/main.cpp:11-71.

Renders the RTWeekend cover scene with the exact reference camera config
(400x225, 30 spp, depth 50, vfov 20, lookfrom (13,2,3), defocus 0.6,
focus 10) and writes P3 PPM to stdout with progress on stderr, matching
`camera::render`'s IO contract (src/camera.h:35-49, src/color.h:14-35).

    python -m raytracingproject_tpu > image.ppm
    python -m raytracingproject_tpu --width 800 --spp 64 --scene three > out.ppm
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np
import jax

from raytracingproject_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from raytracingproject_tpu.camera import Camera
from raytracingproject_tpu.color import to_u8
from raytracingproject_tpu.config import RenderSettings
from raytracingproject_tpu.render import render_pass
from raytracingproject_tpu.scene import (
    make_cover_scene,
    make_minimal_scene,
    make_three_sphere_scene,
)
from raytracingproject_tpu.utils.ppm import encode_ppm

SCENES = {
    "cover": make_cover_scene,
    "three": make_three_sphere_scene,
    "minimal": make_minimal_scene,
}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="raytracingproject_tpu")
    ap.add_argument("--scene", choices=sorted(SCENES), default="cover")
    ap.add_argument("--width", type=int, default=400)
    ap.add_argument("--spp", type=int, default=30,
                    help="samples per pixel (reference default 30, src/main.cpp:58)")
    ap.add_argument("--depth", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--use-bvh", action="store_true")
    ap.add_argument("--wavefront", action="store_true",
                    help="stream-compaction renderer instead of the megakernel")
    ap.add_argument("--output", "-o", default="-", help="output path ('-' = stdout)")
    args = ap.parse_args(argv)

    camera = Camera(
        aspect_ratio=16.0 / 9.0,
        image_width=args.width,
        samples_per_pixel=args.spp,
        max_depth=args.depth,
        vfov=20.0 if args.scene == "cover" else 90.0,
        lookfrom=(13.0, 2.0, 3.0) if args.scene == "cover" else (0.0, 0.0, 0.0),
        lookat=(0.0, 0.0, 0.0) if args.scene == "cover" else (0.0, 0.0, -1.0),
        defocus_angle=0.6 if args.scene == "cover" else 0.0,
        focus_dist=10.0 if args.scene == "cover" else 1.0,
    )
    scene = SCENES[args.scene](seed=args.seed) if args.scene == "cover" else SCENES[args.scene]()
    settings = RenderSettings(use_bvh=args.use_bvh)

    width, height = camera.image_size()
    cam = camera.derive(settings.dtype)
    key = jax.random.PRNGKey(args.seed)

    bvh = None
    if settings.use_bvh:
        from raytracingproject_tpu.bvh import build_bvh, reorder_scene

        bvh = build_bvh(scene)
        scene = reorder_scene(scene, bvh)

    pixels = width * height
    spp_chunk = max(1, min(args.spp, settings.rays_per_batch // max(pixels, 1)))

    t0 = time.time()
    if args.wavefront:
        from raytracingproject_tpu.wavefront import render_wavefront

        pool = max(4096, min(settings.rays_per_batch, 1 << (pixels * args.spp - 1).bit_length()))
        acc = render_wavefront(
            scene, cam, key,
            width=width, height=height, spp=args.spp, max_depth=args.depth,
            pool_size=pool,
        )
        img = to_u8(acc / args.spp)
        data = encode_ppm(np.asarray(img))
        elapsed = time.time() - t0
        print("\rDone.                 ", file=sys.stderr)
        rays = pixels * args.spp
        print(f"{rays} rays in {elapsed:.2f}s = {rays/elapsed/1e6:.2f} Mrays/s",
              file=sys.stderr)
        if args.output == "-":
            sys.stdout.write(data)
        else:
            with open(args.output, "w") as f:
                f.write(data)
        return 0

    acc = None
    done = 0
    while done < args.spp:
        chunk = min(spp_chunk, args.spp - done)
        print(f"\rSamples remaining: {args.spp - done} ", end="", file=sys.stderr, flush=True)
        out = render_pass(
            scene,
            cam,
            jax.random.fold_in(key, done),
            width=width,
            height=height,
            max_depth=args.depth,
            spp_chunk=chunk,
            bvh=bvh,
            early_exit=True,
        )
        acc = out if acc is None else acc + out
        done += chunk
        if (done // max(spp_chunk, 1)) % 4 == 0 and done < args.spp:
            acc.block_until_ready()  # bound device queue depth
    img = to_u8(acc / args.spp)
    data = encode_ppm(np.asarray(img))
    elapsed = time.time() - t0
    print(f"\rDone.                 ", file=sys.stderr)
    rays = pixels * args.spp
    print(f"{rays} rays in {elapsed:.2f}s = {rays/elapsed/1e6:.2f} Mrays/s",
          file=sys.stderr)

    if args.output == "-":
        sys.stdout.write(data)
    else:
        with open(args.output, "w") as f:
            f.write(data)
    return 0


if __name__ == "__main__":
    sys.exit(main())
