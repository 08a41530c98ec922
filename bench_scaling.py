"""Scaling-efficiency harness: rays/s vs mesh size.

Renders the same total work on 1, 2, 4, ... device meshes (`rays` axis) and
reports parallel efficiency — the BASELINE.md target is >=80% from 1 host
to 4 hosts. On this single-chip environment it runs on the virtual CPU mesh
(JAX_PLATFORMS=cpu + xla_force_host_platform_device_count); on a real
multi-host slice the same script measures ICI/DCN scaling unchanged.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python bench_scaling.py

Prints one JSON line: {"devices": [...], "rays_per_sec": [...],
"efficiency": [...]}.
"""

from __future__ import annotations

import json
import os
import time

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# Default to the virtual CPU mesh unless explicitly told to use the real
# backend (single-chip TPU can't scale anyway; a real multi-host slice
# should set SCALING_BACKEND=native). Must run before any backend init.
if os.environ.get("SCALING_BACKEND", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from raytracingproject_tpu.camera import Camera
from raytracingproject_tpu.parallel import make_mesh, render_sharded
from raytracingproject_tpu.scene import make_three_sphere_scene

WIDTH, SPP, DEPTH = 256, 8, 8


def _camera() -> Camera:
    return Camera(
        aspect_ratio=16.0 / 9.0,
        image_width=WIDTH,
        samples_per_pixel=SPP,
        max_depth=DEPTH,
        vfov=90.0,
        lookfrom=(0.0, 0.0, 0.0),
        lookat=(0.0, 0.0, -1.0),
    )


def measure(n_devices: int) -> float:
    """Forward rays/s on an n-device mesh. Exercises BOTH mesh axes when
    n is even (rays x samples) — the samples-axis psum is the collective
    the pod-scale config rides."""
    samples_axis = 2 if n_devices % 2 == 0 else 1
    mesh = make_mesh(
        devices=jax.devices()[:n_devices], samples_axis_size=samples_axis
    )
    scene = make_three_sphere_scene()
    cam = _camera()
    rays = WIDTH * cam.image_height * SPP

    # warmup/compile
    np.asarray(render_sharded(scene, cam, jax.random.PRNGKey(0), mesh))
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        np.asarray(render_sharded(scene, cam, jax.random.PRNGKey(i + 1), mesh))
    dt = (time.perf_counter() - t0) / reps
    return rays / dt


def measure_train(n_devices: int) -> float:
    """fwd+bwd rays/s through the sharded inverse-rendering step (pixel
    loss + psum-ed grads + Adam) — the round-1 harness never exercised the
    train step (VERDICT weak #6)."""
    from raytracingproject_tpu.grad.inverse import extract_params
    from raytracingproject_tpu.parallel import make_sharded_train_step

    samples_axis = 2 if n_devices % 2 == 0 else 1
    mesh = make_mesh(
        devices=jax.devices()[:n_devices], samples_axis_size=samples_axis
    )
    scene = make_three_sphere_scene()
    cam = _camera()
    spp = 4
    rays = WIDTH * cam.image_height * spp
    target = render_sharded(scene, cam, jax.random.PRNGKey(0), mesh, spp=spp)
    params, opt_state, step = make_sharded_train_step(
        scene, cam, mesh, spp=spp, trainable=("albedo", "center0")
    )
    params, opt_state, loss, _ = step(params, opt_state, jax.random.PRNGKey(1), target)
    float(loss)  # compile + barrier
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        params, opt_state, loss, _ = step(
            params, opt_state, jax.random.fold_in(jax.random.PRNGKey(2), i), target
        )
    float(loss)
    dt = (time.perf_counter() - t0) / reps
    return rays / dt


def measure_tpu_native() -> dict:
    """Single-chip shard_map overhead on the REAL chip: the megakernel path
    through the IDENTICAL flat feed (parallel.shard._render_flat) called
    directly under jit vs wrapped in shard_map over a 1x1 mesh
    (render_sharded). Like-for-like isolates the shard_map/psum cost. The
    production render_pass feed is measured too, both with the once-per-
    frame unpermute (end-to-end) and in slot space (the marginal path).

    Round-3 VERDICT weak #3 fixes: (a) COVER scene at depth 16 — the
    3-sphere scene at depth 8 made the fixed per-frame work dominate and
    an 8.4x "overhead" was recorded without comment; (b) 5 reps with
    median and spread per row; (c) an overhead smaller than the measured
    rep spread is reported as below the noise floor, never as a negative
    number."""
    import functools

    from raytracingproject_tpu.bvh import build_bvh, reorder_scene
    from raytracingproject_tpu.ops.pallas.megakernel import front_tables
    from raytracingproject_tpu.parallel.shard import _render_flat, _pixel_grid
    from raytracingproject_tpu.render import render_pass
    from raytracingproject_tpu.scene import make_cover_scene
    from tools.measure import marginal_seconds_per_pass

    cw, cdepth, cspp = 400, 16, 4
    cam = Camera(
        aspect_ratio=16.0 / 9.0, image_width=cw, samples_per_pixel=cspp,
        max_depth=cdepth, vfov=20.0, lookfrom=(13.0, 2.0, 3.0),
        lookat=(0.0, 0.0, 0.0), defocus_angle=0.6, focus_dist=10.0,
    )
    scene = make_cover_scene(seed=0)
    bvh = build_bvh(scene, leaf_size=8)
    scene = reorder_scene(scene, bvh)
    front = front_tables(scene, bvh, order_point=cam.lookfrom)
    camd = cam.derive()
    height = cam.image_height
    rays = cw * height * cspp
    mesh = make_mesh(devices=jax.devices()[:1], samples_axis_size=1)
    i, j = _pixel_grid(cw, height, 1)

    @functools.partial(jax.jit)
    def flat_unsharded(key):
        return _render_flat(
            scene, camd, i, j, key, max_depth=cdepth, spp_local=cspp,
            use_megakernel=True, front=front,
        )

    def sharded(key):
        return render_sharded(scene, cam, key, mesh, use_megakernel=True,
                              front=front)

    def production_frame(key):
        return render_pass(
            scene, camd, key, width=cw, height=height, max_depth=cdepth,
            spp_chunk=cspp, use_megakernel=True, front=front,
        )

    def production_slots(key):
        return render_pass(
            scene, camd, key, width=cw, height=height, max_depth=cdepth,
            spp_chunk=cspp, use_megakernel=True, front=front, raw_slots=True,
        )

    out = {"tpu_native_scene": "cover488",
           "tpu_native_config": f"{cw}px_d{cdepth}_spp{cspp}", "reps": 5}
    meds = {}
    spreads = {}
    for name, fn in (
        ("flat", flat_unsharded), ("mesh1x1", sharded),
        ("render_pass_frame", production_frame),
        ("render_pass_slots", production_slots),
    ):
        med, _, all_m = marginal_seconds_per_pass(
            fn, k1=2, k2=6, reps=5, return_all=True
        )
        meds[name] = med
        spreads[name] = (all_m[-1] - all_m[0]) / med if med else 0.0
        out[f"tpu_native_{name}_rays_per_sec"] = round(rays / med, 1)
        out[f"tpu_native_{name}_spread_frac"] = round(spreads[name], 3)

    def overhead(a, b):
        """Relative cost of b over a, floored at the joint noise floor."""
        noise = max(spreads[a], spreads[b])
        val = meds[b] / meds[a] - 1.0
        if val <= noise:
            return f"<= noise floor ({noise:.1%})"
        return round(val, 3)

    out["tpu_native_shard_map_overhead"] = overhead("flat", "mesh1x1")
    out["tpu_native_unpermute_overhead"] = overhead(
        "render_pass_slots", "render_pass_frame"
    )
    return out


def main() -> None:
    avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8) if n <= avail]
    rates = [measure(n) for n in sizes]
    train_rates = [measure_train(n) for n in sizes]
    base = rates[0]
    eff = [r / (base * n) for r, n in zip(rates, sizes)]
    virtual = jax.default_backend() == "cpu"
    out = {
        "devices": sizes,
        "rays_per_sec": [round(r, 1) for r in rates],
        "train_rays_per_sec": [round(r, 1) for r in train_rates],
        "efficiency": [round(e, 3) for e in eff],
        "backend": jax.default_backend(),
    }
    if jax.default_backend() == "tpu":
        out.update(measure_tpu_native())
    if virtual:
        # Virtual CPU devices share ONE host's cores: per-device efficiency
        # is meaningless; what matters is that total throughput stays flat
        # (sharding overhead only). Report that explicitly; an overhead
        # measured negative is timing noise, never a real speedup — report
        # it as below the noise floor (round-3 VERDICT weak #4).
        out["virtual_mesh"] = True
        for key, num, den in (
            ("sharding_overhead", rates[-1], base),
            ("train_sharding_overhead", train_rates[-1], train_rates[0]),
        ):
            val = 1.0 - num / den
            out[key] = round(val, 3) if val > 0.02 else "<= noise floor (2%)"
    print(json.dumps(out))

    # Record the per-round artifact (round-1 VERDICT next-step #5); round
    # number from the shared helper so companions agree (advisor round 3).
    from tools.artifact import artifact_path

    path = artifact_path("SCALING")
    # Merge under a per-backend key: the round's artifact holds BOTH the
    # virtual-CPU-mesh sweep and the real-chip native section (round-2
    # VERDICT weak #3) without either run clobbering the other.
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
        if "backend" in merged:  # legacy flat record
            merged = {merged["backend"]: merged}
    merged[out["backend"]] = out
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)


if __name__ == "__main__":
    main()
