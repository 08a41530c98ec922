"""Forward+backward benchmark: rays/s through a full inverse-rendering step
(render + pixel loss + gradient w.r.t. scene params + Adam update) — the
second BASELINE.md metric. Prints one JSON line per path.

Paths:
  xla  — reverse-mode through the XLA megakernel renderer (grad/inverse.py)
  fast — Pallas megakernel forward + path-replay backward (grad/fast.py);
         TPU only.

Device-true methodology: N sequential steps form a true dependency chain
(params_{i+1} depends on params_i), closed by a host fetch of the final
loss; the marginal cost between two step counts cancels fixed overheads
(see tools/measure.py for why naive per-call timing lies on this backend).
"""

from __future__ import annotations

import json
import os
import time

import jax

from raytracingproject_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from raytracingproject_tpu.camera import Camera
from raytracingproject_tpu.grad.fast import make_fast_train_step
from raytracingproject_tpu.grad.inverse import make_train_step, extract_params
from raytracingproject_tpu.render import render
from raytracingproject_tpu.scene import make_cover_scene, make_three_sphere_scene
from tools.measure import fresh_salt

# Marginal window: 12 extra steps (~100 ms at cover scale) keeps tunnel
# dispatch jitter (several ms per fetch) under ~10% of the measurement;
# the round-3 3/9 window swung the cover number 5.1 <-> 7.5 Mrays/s
# between otherwise-identical runs.
N1, N2 = 4, 16
TRAINABLE = ("albedo", "center0", "radius")

# (label, scene factory, camera kwargs, width, spp, depth). The cover scene
# is where the replay backward's O(depth) vs O(N*depth) advantage shows;
# the three-sphere config is kept for cross-round comparability.
CONFIGS = [
    (
        "three_sphere_200px_d8",
        make_three_sphere_scene,
        dict(vfov=90.0, lookfrom=(0.0, 0.0, 0.0), lookat=(0.0, 0.0, -1.0)),
        200, 4, 8,
    ),
    (
        "cover_200px_d8",
        lambda: make_cover_scene(seed=0),
        dict(vfov=20.0, lookfrom=(13.0, 2.0, 3.0), lookat=(0.0, 0.0, 0.0),
             defocus_angle=0.6, focus_dist=10.0),
        200, 2, 8,
    ),
]


def time_steps(step, params0, opt0, target, n_steps: int) -> tuple[float, float]:
    key = jax.random.PRNGKey(fresh_salt())
    params, opt_state = params0, opt0
    t0 = time.perf_counter()
    for i in range(n_steps):
        params, opt_state, loss, _ = step(
            params, opt_state, jax.random.fold_in(key, i), target
        )
    final = float(loss)  # host fetch: the only true barrier here
    return time.perf_counter() - t0, final


def measure(step, params0, opt0, target) -> tuple[float, float]:
    time_steps(step, params0, opt0, target, N1)  # compile/warm
    time_steps(step, params0, opt0, target, N2)
    d1, _ = time_steps(step, params0, opt0, target, N1)
    d2, loss = time_steps(step, params0, opt0, target, N2)
    return (d2 - d1) / (N2 - N1), loss


def main() -> None:
    on_tpu = jax.devices()[0].platform == "tpu"
    artifact: dict = {"backend": jax.devices()[0].platform, "configs": {}}
    for label, scene_fn, cam_kw, width, spp, depth in CONFIGS:
        scene = scene_fn()
        cam = Camera(
            aspect_ratio=16.0 / 9.0,
            image_width=width,
            samples_per_pixel=spp,
            max_depth=depth,
            **cam_kw,
        )
        height = cam.image_height
        rays = width * height * spp
        target = render(scene, cam, jax.random.PRNGKey(0))

        paths = {}
        opt_state, step = make_train_step(scene, cam, spp=spp, trainable=TRAINABLE)
        paths["xla"] = (step, extract_params(scene), opt_state)
        if on_tpu:
            fp, fo, fstep = make_fast_train_step(
                scene, cam, spp=spp, trainable=TRAINABLE
            )
            paths["fast"] = (fstep, fp, fo)
            # material-only training composes with the front-culled forward
            # (fixed geometry -> the tables stay valid; round-2 VERDICT 1b)
            from raytracingproject_tpu.bvh import build_bvh, reorder_scene
            from raytracingproject_tpu.ops.pallas.megakernel import front_tables

            fbvh = build_bvh(scene, leaf_size=8)
            fscene = reorder_scene(scene, fbvh)
            mp, mo, mstep = make_fast_train_step(
                fscene, cam, spp=spp, trainable=("albedo", "fuzz", "ior"),
                front=front_tables(fscene, fbvh),
            )
            paths["fast_front_materials"] = (mstep, mp, mo)

        results = {}
        for name, (step, params0, opt0) in paths.items():
            sec, loss = measure(step, params0, opt0, target)
            results[name] = rays / sec
            print(
                json.dumps(
                    {
                        "metric": f"fwd_bwd_rays_per_sec_{label}_{name}",
                        "value": round(rays / sec, 1),
                        "unit": "rays/s",
                        "step_ms": round(sec * 1e3, 2),
                        "final_loss": loss,
                    }
                ),
                flush=True,
            )
        entry = {k: round(v, 1) for k, v in results.items()}
        if "fast" in results:
            entry["fast_over_xla"] = round(results["fast"] / results["xla"], 3)
            print(json.dumps({
                "metric": f"fast_over_xla_fwd_bwd_speedup_{label}",
                "value": entry["fast_over_xla"],
                "unit": "x",
            }), flush=True)
        artifact["configs"][label] = entry

    # Committed artifact for the driver (VERDICT r2 ask #2/#4): the second
    # BASELINE metric (fwd+bwd rays/s) recorded per round, not just printed.
    import glob
    import re

    rounds = [
        int(m.group(1))
        for f in glob.glob(os.path.join(os.path.dirname(__file__) or ".", "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)", f))
    ]
    n_round = (max(rounds) + 1) if rounds else 0
    out = os.environ.get("FWDBWD_ARTIFACT", f"FWDBWD_r{n_round:02d}.json")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"artifact": out}), flush=True)


if __name__ == "__main__":
    main()
