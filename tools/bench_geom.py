"""Geometry-trainable fwd+bwd: brute recording forward vs per-step
refreshed front (round-3 VERDICT missing #4 'done' criterion).

Paths (cover scene, trainable = center0/radius/albedo):
  brute         — make_fast_train_step, no acceleration (the only geometry
                  path round 3 had)
  front_refresh — make_fast_geometry_train_step + FrontRefresher: host
                  rebuilds the padded sphere table and exact subtree/word
                  union boxes from the CURRENT params before every step
                  (fixed partition, ~O(N) numpy), so the recording forward
                  runs front-culled with bounds that are never stale.

Timing: wall-clock over chained steps INCLUDING the per-step host refresh
(which forces a params fetch each step — the honest cost of the design);
refresh time also reported separately. Writes GEOM_r*.json.

Usage: python -m tools.bench_geom
"""

from __future__ import annotations

import json
import statistics
import time

import jax

from raytracingproject_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from raytracingproject_tpu.bvh import build_bvh
from raytracingproject_tpu.camera import Camera
from raytracingproject_tpu.grad.fast import (
    make_fast_geometry_train_step, make_fast_train_step,
)
from raytracingproject_tpu.ops.pallas.megakernel import FrontRefresher
from raytracingproject_tpu.render import render
from raytracingproject_tpu.scene import make_cover_scene
from tools.measure import fresh_salt

TRAINABLE = ("center0", "radius", "albedo")
CAM_KW = dict(vfov=20.0, lookfrom=(13.0, 2.0, 3.0), lookat=(0.0, 0.0, 0.0),
              defocus_angle=0.6, focus_dist=10.0)
CONFIGS = [  # (label, width, spp, depth, n1, n2, groups)
# groups=1 everywhere: the plain replay scan (no cond skipping — the
# round-4 measured-best default; skip_dead is explicit opt-in) wins, and
# death-depth grouping measured slower (FWDBWD_r04 fast_g8 vs fast)
    ("cover_200px_d8", 200, 2, 8, 4, 16, 1),
    ("cover_400px_d50", 400, 2, 50, 4, 16, 1),
]


def run_config(label, width, spp, depth, n1, n2, groups, artifact):
    scene = make_cover_scene(seed=0)
    cam = Camera(aspect_ratio=16.0 / 9.0, image_width=width,
                 samples_per_pixel=spp, max_depth=depth, **CAM_KW)
    rays = width * cam.image_height * spp
    target = render(scene, cam, jax.random.PRNGKey(0))

    bvh = build_bvh(scene, leaf_size=8)
    refresher = FrontRefresher(scene, bvh, order_point=CAM_KW["lookfrom"])

    bp, bo, bstep = make_fast_train_step(
        scene, cam, spp=spp, trainable=TRAINABLE, replay_groups=groups,
    )
    gp, go, gstep = make_fast_geometry_train_step(
        scene, cam, refresher=refresher, spp=spp, trainable=TRAINABLE,
        replay_groups=groups,
    )

    def time_brute(n):
        key = jax.random.PRNGKey(fresh_salt())
        params, opt = bp, bo
        t0 = time.perf_counter()
        for i in range(n):
            params, opt, loss, _ = bstep(
                params, opt, jax.random.fold_in(key, i), target
            )
        float(loss)
        return time.perf_counter() - t0

    def time_front(n):
        # in-jit refresh: the tables are recomputed ON DEVICE inside the
        # step (FrontRefresher.refresh_in_jit) — the host-refresh variant
        # measured 42-250 ms of tunnel RTTs per step (GEOM_r04 batch 1)
        # and is retired from the bench
        key = jax.random.PRNGKey(fresh_salt())
        params, opt = gp, go
        t0 = time.perf_counter()
        for i in range(n):
            params, opt, loss, _ = gstep(
                params, opt, jax.random.fold_in(key, i), target
            )
        float(loss)
        return time.perf_counter() - t0

    entry = {"rays": rays, "depth": depth, "replay_groups": groups}
    for name, fn in (("brute", time_brute), ("front_refresh", time_front)):
        fn(n1)  # compile/warm
        fn(n2)
        marginals = []
        for _ in range(3):
            d1 = fn(n1)
            d2 = fn(n2)
            if d2 > d1:
                marginals.append((d2 - d1) / (n2 - n1))
        sec = statistics.median(marginals)
        entry[name + "_mrays_s"] = round(rays / sec / 1e6, 3)
        entry[name + "_step_ms"] = round(sec * 1e3, 2)
        entry[name + "_spread_mrays"] = [
            round(rays / m / 1e6, 2) for m in sorted(marginals)
        ]
        print(json.dumps({"config": label, **entry}), flush=True)
    entry["refresh"] = "in-jit (device-side segment reductions)"
    entry["front_over_brute"] = round(
        entry["front_refresh_mrays_s"] / entry["brute_mrays_s"], 3
    )
    artifact[label] = entry
    print(json.dumps({"config": label, **entry}), flush=True)


def main() -> None:
    artifact: dict = {"backend": jax.default_backend(),
                      "trainable": list(TRAINABLE)}
    for cfg in CONFIGS:
        run_config(*cfg, artifact)

    from tools.artifact import artifact_path

    out = artifact_path("GEOM")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"artifact": out}), flush=True)


if __name__ == "__main__":
    main()
