"""Fused closest-hit Pallas kernel.

The XLA brute-force path (ops/intersect.closest_hit) materializes [R, N]
intermediates between the quadratic and the argmin; this kernel keeps the
sphere SoA in SMEM and streams ray tiles through registers.

Layout: rays occupy the full native (8, 128) VPU tile — 1024 rays per grid
step per component; the sphere loop is a scalar `fori_loop` reading 7
scalars per sphere from SMEM and updating best-t/best-index with elementwise
selects. No cross-lane reductions, no strided loads — per ray-tile the
kernel is a pure chain of ~22 VPU ops per sphere.

Matches the reference quadratic exactly (src/sphere.h:30-57) including the
open t-interval and moving-sphere center lerp (src/sphere.h:68-72).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracingproject_tpu.config import T_MIN, T_MAX
from raytracingproject_tpu.ops.intersect import HitRecord
from raytracingproject_tpu.ops.vecmath import dot
from raytracingproject_tpu.scene import Scene

SUBLANES = 8
LANES = 128
BLOCKS = 32  # (8,128) ray blocks per grid step; amortizes SMEM scalar loads
RAY_TILE = BLOCKS * SUBLANES * LANES  # 32768 rays per grid step


def _trace_kernel(
    sph_ref,  # SMEM (8, N) float32: rows = cx, cy, cz, mx, my, mz, radius, pad
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,  # VMEM (B*8, 128)
    t_out_ref, idx_out_ref,
    bt_ref, bi_ref,  # VMEM scratch (B*8, 128)
    *, n_spheres: int, t_min: float,
):
    # The sphere loop is the outer `fori_loop` so its 7 scalar SMEM loads
    # (~100 cycles each, serializing) amortize over BLOCKS*1024 rays; the
    # inner unrolled block loop is pure pipelined VPU work with best-t/idx
    # living in VMEM scratch across iterations.
    bt_ref[:] = jnp.full((BLOCKS * SUBLANES, LANES), T_MAX, jnp.float32)
    bi_ref[:] = jnp.zeros((BLOCKS * SUBLANES, LANES), jnp.int32)

    def body(s, _):
        cx = sph_ref[0, s]
        cy = sph_ref[1, s]
        cz = sph_ref[2, s]
        mx = sph_ref[3, s]
        my = sph_ref[4, s]
        mz = sph_ref[5, s]
        rad = sph_ref[6, s]

        for b in range(BLOCKS):
            sl = slice(b * SUBLANES, (b + 1) * SUBLANES)
            ox, oy, oz = ox_ref[sl, :], oy_ref[sl, :], oz_ref[sl, :]
            dx, dy, dz = dx_ref[sl, :], dy_ref[sl, :], dz_ref[sl, :]
            tm = tm_ref[sl, :]
            best_t = bt_ref[sl, :]

            a = jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-20)
            inv_a = 1.0 / a
            # moving-sphere center at this ray's time (src/sphere.h:68-72)
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
            in0 = (r0 > t_min) & (r0 < best_t)
            in1 = (r1 > t_min) & (r1 < best_t)
            root = jnp.where(in0, r0, r1)
            better = dpos & (in0 | in1)
            bt_ref[sl, :] = jnp.where(better, root, best_t)
            bi_ref[sl, :] = jnp.where(better, s, bi_ref[sl, :])
        return 0

    jax.lax.fori_loop(0, n_spheres, body, 0)
    t_out_ref[:] = bt_ref[:]
    idx_out_ref[:] = bi_ref[:]


def _pad_flat(x: jnp.ndarray, total: int) -> jnp.ndarray:
    pad = total - x.shape[0]
    if pad == 0:
        return x.astype(jnp.float32)
    return jnp.concatenate([x, jnp.broadcast_to(x[:1], (pad,))]).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def pallas_closest_hit(
    origin: jnp.ndarray,     # [R, 3]
    direction: jnp.ndarray,  # [R, 3]
    time: jnp.ndarray,       # [R]
    scene: Scene,
    t_min: float = T_MIN,
    interpret: bool = False,
) -> HitRecord:
    """Drop-in replacement for ops.intersect.closest_hit (forward path)."""
    R = origin.shape[0]
    n = scene.radius.shape[0]
    r_pad = ((R + RAY_TILE - 1) // RAY_TILE) * RAY_TILE
    tiles = r_pad // RAY_TILE

    comps = [
        _pad_flat(origin[:, 0], r_pad), _pad_flat(origin[:, 1], r_pad),
        _pad_flat(origin[:, 2], r_pad), _pad_flat(direction[:, 0], r_pad),
        _pad_flat(direction[:, 1], r_pad), _pad_flat(direction[:, 2], r_pad),
        _pad_flat(time, r_pad),
    ]
    comps = [c.reshape(tiles * BLOCKS * SUBLANES, LANES) for c in comps]

    sph = jnp.stack(
        [
            scene.center0[:, 0], scene.center0[:, 1], scene.center0[:, 2],
            scene.center_delta[:, 0], scene.center_delta[:, 1],
            scene.center_delta[:, 2], scene.radius,
            jnp.zeros_like(scene.radius),
        ]
    ).astype(jnp.float32)  # (8, N)

    kernel = functools.partial(_trace_kernel, n_spheres=n, t_min=t_min)
    rows = BLOCKS * SUBLANES
    ray_spec = pl.BlockSpec((rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)

    t_out, idx_out = pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[pl.BlockSpec((8, n), lambda i: (0, 0), memory_space=pltpu.SMEM)]
        + [ray_spec] * 7,
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((tiles * rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((tiles * rows, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, LANES), jnp.float32),
            pltpu.VMEM((rows, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(sph, *comps)

    t = t_out.reshape(-1)[:R]
    idx = idx_out.reshape(-1)[:R]

    hit = jnp.isfinite(t)
    t_safe = jnp.where(hit, t, 1.0)
    p = origin + t_safe[:, None] * direction
    hit_center = jnp.take(scene.center0, idx, axis=0) + time[:, None] * jnp.take(
        scene.center_delta, idx, axis=0
    )
    r_sel = jnp.take(scene.radius, idx)
    r_safe = jnp.where(r_sel != 0.0, r_sel, 1.0)
    outward = (p - hit_center) / r_safe[:, None]
    front_face = dot(direction, outward) < 0.0
    normal = jnp.where(front_face[:, None], outward, -outward)
    return HitRecord(t=t, idx=idx, hit=hit, p=p, normal=normal, front_face=front_face)
