"""Forward+backward benchmark: rays/s through a full inverse-rendering step
(render + pixel loss + gradient w.r.t. all scene params + Adam update) —
the second BASELINE.md metric. Prints one JSON line.

Methodology matched to this environment: single in-flight computation,
host fetch as the barrier (see memory: tunneled-backend timing hazards).
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax

from raytracingproject_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from raytracingproject_tpu.camera import Camera
from raytracingproject_tpu.grad.inverse import extract_params, make_train_step
from raytracingproject_tpu.render import render
from raytracingproject_tpu.scene import make_three_sphere_scene

WIDTH, SPP, DEPTH = 200, 4, 8
REPS = 5


def main() -> None:
    scene = make_three_sphere_scene()
    cam = Camera(
        aspect_ratio=16.0 / 9.0,
        image_width=WIDTH,
        samples_per_pixel=SPP,
        max_depth=DEPTH,
        vfov=90.0,
        lookfrom=(0.0, 0.0, 0.0),
        lookat=(0.0, 0.0, -1.0),
    )
    height = cam.image_height
    rays = WIDTH * height * SPP

    target = render(scene, cam, jax.random.PRNGKey(0))
    opt_state, step = make_train_step(scene, cam, spp=SPP, trainable=("albedo", "center0", "radius"))
    params = extract_params(scene)

    # compile + warm
    params, opt_state, loss, _ = step(params, opt_state, jax.random.PRNGKey(1), target)
    _ = float(loss)

    times = []
    for i in range(REPS):
        t0 = time.perf_counter()
        params, opt_state, loss, _ = step(
            params, opt_state, jax.random.fold_in(jax.random.PRNGKey(2), i), target
        )
        _ = float(loss)  # host fetch barrier
        times.append(time.perf_counter() - t0)

    dt = float(np.median(times))
    print(
        json.dumps(
            {
                "metric": "fwd_bwd_rays_per_sec_three_sphere_200px_depth8",
                "value": round(rays / dt, 1),
                "unit": "rays/s",
                "step_ms": round(dt * 1e3, 2),
                "final_loss": float(loss),
            }
        )
    )


if __name__ == "__main__":
    main()
