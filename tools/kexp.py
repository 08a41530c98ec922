"""Kernel micro-experiments: where does closest-hit time go?

Isolated intersection-only Pallas kernels (no shading/RNG) timed device-true
on the cover scene's primary rays. Variants:

  full      — current design: 13 scalar loads + 11 selects per sphere
  slim      — track best_t + best_index only: 7 loads + 2 selects
  full_u4   — full, sphere loop unrolled x4, x8
  slim_u4   — slim, unrolled x4

Usage: python tools/kexp.py [n_spheres]
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracingproject_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from raytracingproject_tpu.camera import Camera, generate_rays
from raytracingproject_tpu.ops.pallas.megakernel import (
    _scene_table, _sphere_test, _hit_init, N_ROWS, SUB, LANES, TILE,
    ROW_CX, ROW_CY, ROW_CZ, ROW_MX, ROW_MY, ROW_MZ, ROW_RAD,
)
from raytracingproject_tpu.scene import make_cover_scene, make_random_scene
from tools.measure import marginal_seconds_per_pass

T_MIN = 1e-3
T_MAX = jnp.inf


def _slim_test(sph_ref, s, rays, hc):
    ox, oy, oz, dx, dy, dz, tm, a, inv_a = rays
    bt, bs = hc
    cx = sph_ref[ROW_CX, s]; cy = sph_ref[ROW_CY, s]; cz = sph_ref[ROW_CZ, s]
    mx = sph_ref[ROW_MX, s]; my = sph_ref[ROW_MY, s]; mz = sph_ref[ROW_MZ, s]
    rad = sph_ref[ROW_RAD, s]
    ocx = ox - (cx + tm * mx)
    ocy = oy - (cy + tm * my)
    ocz = oz - (cz + tm * mz)
    half_b = ocx * dx + ocy * dy + ocz * dz
    cq = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
    disc = half_b * half_b - a * cq
    dpos = disc > 0.0
    sq = jnp.sqrt(jnp.where(dpos, disc, 1.0))
    r0 = (-half_b - sq) * inv_a
    r1 = (-half_b + sq) * inv_a
    in0 = (r0 > T_MIN) & (r0 < bt)
    in1 = (r1 > T_MIN) & (r1 < bt)
    root = jnp.where(in0, r0, r1)
    better = dpos & (in0 | in1)
    bt = jnp.where(better, root, bt)
    bs = jnp.where(better, jnp.float32(0) + s, bs)
    return (bt, bs)


def _kernel(sph_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
            out_ref, *, n, variant):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tm = tm_ref[:]
    a = jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-20)
    rays = (ox, oy, oz, dx, dy, dz, tm, a, 1.0 / a)
    shape = (SUB, LANES)

    slim = variant.startswith("slim")
    unroll = 8 if variant.endswith("u8") else (4 if variant.endswith("u4") else 1)

    if slim:
        init = (jnp.full(shape, T_MAX, jnp.float32), jnp.zeros(shape, jnp.float32))

        def one(s, hc):
            return _slim_test(sph_ref, s, rays, hc)
    else:
        init = _hit_init(shape)

        def one(s, hc):
            return _sphere_test(sph_ref, s, rays, hc, T_MIN)

    n_main = (n // unroll) * unroll

    def body(q, hc):
        for u in range(unroll):
            hc = one(q * unroll + u, hc)
        return hc

    hc = jax.lax.fori_loop(0, n_main // unroll, body, init)
    for s in range(n_main, n):
        hc = one(s, hc)
    bt = hc[0]
    out_ref[:] = jnp.where(bt < T_MAX, bt, 0.0) + hc[1] * 1e-7


@functools.partial(jax.jit, static_argnames=("variant", "n"))
def run(comps, sph, variant, n):
    tiles = comps[0].shape[0] // SUB
    ray_spec = pl.BlockSpec((SUB, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, n=n, variant=variant),
        grid=(tiles,),
        in_specs=[pl.BlockSpec((N_ROWS, n), lambda i: (0, 0), memory_space=pltpu.SMEM)]
        + [ray_spec] * 7,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct(comps[0].shape, jnp.float32),
    )(sph, *comps)


def main() -> None:
    n_extra = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    scene = make_random_scene(n_extra, seed=3) if n_extra else make_cover_scene(seed=0)
    n = scene.radius.shape[0]
    W, H = 400, 225
    cam = Camera(
        aspect_ratio=16 / 9, image_width=W, samples_per_pixel=1, max_depth=1,
        vfov=20.0, lookfrom=(13.0, 2.0, 3.0), lookat=(0.0, 0.0, 0.0),
        defocus_angle=0.6, focus_dist=10.0,
    ).derive()
    jj, ii = jnp.meshgrid(jnp.arange(H, dtype=jnp.int32),
                          jnp.arange(W, dtype=jnp.int32), indexing="ij")
    i_idx = ii.reshape(-1)
    j_idx = jj.reshape(-1)
    sph = _scene_table(scene)
    rays = W * H
    r_pad = ((rays + TILE - 1) // TILE) * TILE

    def make_pass(variant):
        def one_pass(key):
            o, d, t = generate_rays(cam, i_idx, j_idx, key)
            comps = [
                jnp.pad(x, (0, r_pad - rays)).reshape(-1, LANES).astype(jnp.float32)
                for x in (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], t)
            ]
            return run(tuple(comps), sph, variant, n)

        return one_pass

    for variant in ("full_u4", "full_u8", "slim_u8"):
        sec, _ = marginal_seconds_per_pass(make_pass(variant), k1=8, k2=24, reps=3)
        per_sphere_ns = sec / (r_pad / TILE) / n * 1e9
        print(f"{variant:8s}: {rays / sec / 1e6:7.2f} Mrays/s  "
              f"({sec*1e3:6.2f} ms/pass, {per_sphere_ns:6.0f} ns/sphere/tile)",
              flush=True)


if __name__ == "__main__":
    main()
