"""Real-chip validation + timing of the megakernel paths (brute vs BVH).

Run on the TPU: `python tools/tpu_validate.py [n_spheres]`. Compares
radiance between the brute-force megakernel and the tile-uniform BVH
megakernel (identical RNG streams -> near-exact agreement is expected),
checks full-depth statistics against the XLA oracle, and reports
device-true rays/s for each path.
"""

from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

from raytracingproject_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from raytracingproject_tpu.camera import Camera, generate_rays
from raytracingproject_tpu.bvh import build_bvh, reorder_scene
from raytracingproject_tpu.ops.pallas.megakernel import pallas_trace_paths
from raytracingproject_tpu.render import ray_color
from raytracingproject_tpu.scene import make_cover_scene, make_random_scene
from tools.measure import marginal_seconds_per_pass

W, H, DEPTH, SPP = 400, 225, 16, 4


def main() -> None:
    n_extra = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    if n_extra:
        scene = make_random_scene(n_extra, seed=3)
        label = f"random{n_extra}"
    else:
        scene = make_cover_scene(seed=0)
        label = "cover"
    bvh = build_bvh(scene, leaf_size=8)
    rscene = reorder_scene(scene, bvh)
    print(f"{label}: {scene.radius.shape[0]} spheres, {bvh.node_min.shape[0]} nodes",
          flush=True)

    cam = Camera(
        aspect_ratio=16 / 9, image_width=W, samples_per_pixel=SPP, max_depth=DEPTH,
        vfov=20.0, lookfrom=(13.0, 2.0, 3.0), lookat=(0.0, 0.0, 0.0),
        defocus_angle=0.6, focus_dist=10.0,
    ).derive()
    jj, ii = jnp.meshgrid(jnp.arange(H, dtype=jnp.int32),
                          jnp.arange(W, dtype=jnp.int32), indexing="ij")
    i_idx = jnp.tile(ii.reshape(-1), SPP)
    j_idx = jnp.tile(jj.reshape(-1), SPP)
    key = jax.random.PRNGKey(0)
    o, d, t = generate_rays(cam, i_idx, j_idx, key)

    # -- correctness: brute vs BVH, same seed -> same RNG stream ----------
    r_brute = np.asarray(pallas_trace_paths(o, d, t, scene, jnp.int32(7), DEPTH))
    r_bvh = np.asarray(
        pallas_trace_paths(o, d, t, rscene, jnp.int32(7), DEPTH, bvh=bvh)
    )
    diff = np.abs(r_brute - r_bvh)
    frac_differ = float((diff.max(axis=-1) > 1e-4).mean())
    print(f"brute vs bvh: max|diff|={diff.max():.2e} mean={diff.mean():.2e} "
          f"frac(rays differing >1e-4)={frac_differ:.4f}", flush=True)

    # -- statistics vs XLA oracle (different RNG, same distributions) ------
    # subsampled: the XLA brute path materializes [R, N] intermediates and
    # OOMs at R=360k x N=5000
    sub = slice(0, 32768)
    r_xla = np.asarray(
        ray_color(scene, o[sub], d[sub], t[sub], jax.random.PRNGKey(3), DEPTH)
    )
    for name, r in [("brute", r_brute[sub]), ("bvh", r_bvh[sub])]:
        dm = np.abs(r.mean(axis=0) - r_xla.mean(axis=0)).max()
        ds = np.abs(r.std(axis=0) - r_xla.std(axis=0)).max()
        print(f"{name} vs xla: channel-mean diff {dm:.4f}, channel-std diff {ds:.4f}",
              flush=True)

    # -- device-true timing -------------------------------------------------
    rays = W * H * SPP

    def pass_brute(k):
        kr, kp = jax.random.split(k)
        oo, dd, tt = generate_rays(cam, i_idx, j_idx, kr)
        seed = jax.random.randint(kp, (), 0, 2**31 - 1, dtype=jnp.int32)
        return pallas_trace_paths(oo, dd, tt, scene, seed, DEPTH)

    def pass_bvh(k):
        kr, kp = jax.random.split(k)
        oo, dd, tt = generate_rays(cam, i_idx, j_idx, kr)
        seed = jax.random.randint(kp, (), 0, 2**31 - 1, dtype=jnp.int32)
        return pallas_trace_paths(oo, dd, tt, rscene, seed, DEPTH, bvh=bvh)

    for name, fn in [("brute", pass_brute), ("bvh", pass_bvh)]:
        sec, _ = marginal_seconds_per_pass(fn, k1=4, k2=12, reps=3)
        print(f"{name}: {rays / sec / 1e6:.2f} Mrays/s ({sec*1e3:.1f} ms/pass)",
              flush=True)


if __name__ == "__main__":
    main()
