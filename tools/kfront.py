"""Prototype: front-culled closest hit vs unrolled brute force.

The tile-uniform BVH traversal loses to brute force because EVERY node costs
a vector->scalar `any()` sync (~460 cycles measured). This kernel pays ONE
sync per 24 subtrees per bounce:

1. cut the BVH into F subtrees ("front", bvh.bvh_front); each owns a
   contiguous sphere range (padded to the unroll factor by repeating its
   last sphere — retesting a sphere is a no-op under strict `<` updates);
2. slab-test all F boxes vectorized per lane (no sync);
3. per subtree, collapse sublanes with a cheap max -> (1,128); stack 8
   subtrees -> (8,128); ONE MXU matmul with ones(128,128) gives per-subtree
   lane counts broadcast across lanes;
4. weight row r of group g by 2^(8g+r), add 3 groups, sum over sublanes:
   a (1,128) tile whose every lane holds the same 24-bit word (exact in
   f32: each row spans <=17 bits, the cross-row sum <=24); extract it with
   ONE jnp.max sync;
5. scalar loop over the 24 bits: subtrees with no lane coverage are skipped
   entirely (0-trip inner loop); hit subtrees run the exact unrolled sphere
   test on their contiguous SMEM rows.

Usage: python tools/kfront.py [n_spheres]   (cover scene when omitted)
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracingproject_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from raytracingproject_tpu.bvh import build_bvh, bvh_front, reorder_scene
from raytracingproject_tpu.camera import Camera, generate_rays
from raytracingproject_tpu.ops.pallas.megakernel import (
    _scene_table, _sphere_test, _hit_init, N_ROWS, SUB, LANES, TILE,
)
from raytracingproject_tpu.scene import make_cover_scene, make_random_scene
from tools.measure import marginal_seconds_per_pass

T_MIN = 1e-3
T_MAX = jnp.inf
WORD = 24  # subtrees per packed word (f32-exact)


def pack_front_tables(scene, max_nodes: int, unroll: int, leaf_size: int = 8):
    """(padded sphere table, front float table (8,F), front int table (2,F)).

    Sphere ranges are padded to a multiple of `unroll` by repeating each
    subtree's last sphere (idempotent under the strict `<` best-t update)."""
    bvh = build_bvh(scene, leaf_size=leaf_size)
    scene_r = reorder_scene(scene, bvh)
    fr = bvh_front(bvh, max_nodes=max_nodes)
    sph = np.asarray(_scene_table(scene_r))  # (N_ROWS, n)

    cols = []
    new_start = np.zeros_like(fr.start)
    new_count = np.zeros_like(fr.count)
    pos = 0
    for k in range(fr.start.shape[0]):
        s, c = int(fr.start[k]), int(fr.count[k])
        if c == 0:
            new_start[k] = 0
            continue
        cp = ((c + unroll - 1) // unroll) * unroll
        block = sph[:, s : s + c]
        if cp > c:
            block = np.concatenate(
                [block, np.repeat(block[:, -1:], cp - c, axis=1)], axis=1
            )
        new_start[k] = pos
        new_count[k] = cp
        cols.append(block)
        pos += cp
    sph_pad = np.concatenate(cols, axis=1)
    ff = np.zeros((8, fr.fmin.shape[0]), np.float32)
    ff[0:3] = fr.fmin.T
    ff[3:6] = fr.fmax.T
    fi = np.stack([new_start, new_count]).astype(np.int32)
    return jnp.asarray(sph_pad), jnp.asarray(ff), jnp.asarray(fi)


def _row_weights():
    """(8,128) tile: row r = 2^r (exact)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0)
    return (jnp.int32(1) << r).astype(jnp.float32)


def _kernel_front(sph_ref, ff_ref, fi_ref,
                  ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
                  out_ref, *, n_front, unroll):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tm = tm_ref[:]
    a = jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-20)
    rays = (ox, oy, oz, dx, dy, dz, tm, a, 1.0 / a)
    shape = (SUB, LANES)

    inv_dx = 1.0 / jnp.where(jnp.abs(dx) > 1e-20, dx, 1e-20)
    inv_dy = 1.0 / jnp.where(jnp.abs(dy) > 1e-20, dy, 1e-20)
    inv_dz = 1.0 / jnp.where(jnp.abs(dz) > 1e-20, dz, 1e-20)

    def slab(f):
        t0 = (ff_ref[0, f] - ox) * inv_dx
        t1 = (ff_ref[3, f] - ox) * inv_dx
        tn = jnp.minimum(t0, t1)
        tf = jnp.maximum(t0, t1)
        t0 = (ff_ref[1, f] - oy) * inv_dy
        t1 = (ff_ref[4, f] - oy) * inv_dy
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        t0 = (ff_ref[2, f] - oz) * inv_dz
        t1 = (ff_ref[5, f] - oz) * inv_dz
        tn = jnp.maximum(tn, jnp.maximum(jnp.minimum(t0, t1), T_MIN))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        return jnp.where(tf > tn, 1.0, 0.0)

    ones = jnp.ones((LANES, LANES), jnp.float32)
    wrow = _row_weights()

    assert n_front % WORD == 0
    hc = _hit_init(shape)
    for w in range(n_front // WORD):
        acc = None
        for g in range(WORD // SUB):
            base = w * WORD + g * SUB
            rows = [
                jnp.max(slab(base + r), axis=0, keepdims=True) for r in range(SUB)
            ]
            grp = jnp.concatenate(rows, axis=0)  # (8,128)
            counts = jax.lax.dot(
                grp, ones, preferred_element_type=jnp.float32
            )  # rowsum broadcast across lanes
            bits = jnp.where(counts > 0.0, wrow * float(1 << (SUB * g)), 0.0)
            acc = bits if acc is None else acc + bits
        word_tile = jnp.sum(acc, axis=0, keepdims=True)  # (1,128), lanes equal
        word = jnp.max(word_tile).astype(jnp.int32)      # ONE sync per 24 subtrees

        def sub_body(f, h):
            bit = jax.lax.shift_right_logical(word, f - w * WORD) & 1
            cnt = jnp.where(bit > 0, fi_ref[1, f], 0)
            start = fi_ref[0, f]

            def inner(q, hh):
                base_s = start + q * unroll
                for u in range(unroll):
                    hh = _sphere_test(sph_ref, base_s + u, rays, hh, T_MIN)
                return hh

            return jax.lax.fori_loop(0, cnt // unroll, inner, h)

        hc = jax.lax.fori_loop(w * WORD, (w + 1) * WORD, sub_body, hc)

    bt = hc[0]
    out_ref[:] = jnp.where(bt < T_MAX, bt, 0.0)


def _kernel_brute(sph_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  tm_ref, out_ref, *, n, unroll):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tm = tm_ref[:]
    a = jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-20)
    rays = (ox, oy, oz, dx, dy, dz, tm, a, 1.0 / a)
    hc = _hit_init((SUB, LANES))
    n_main = (n // unroll) * unroll

    def body(q, h):
        for u in range(unroll):
            h = _sphere_test(sph_ref, q * unroll + u, rays, h, T_MIN)
        return h

    hc = jax.lax.fori_loop(0, n_main // unroll, body, hc)
    for s in range(n_main, n):
        hc = _sphere_test(sph_ref, s, rays, hc, T_MIN)
    bt = hc[0]
    out_ref[:] = jnp.where(bt < T_MAX, bt, 0.0)


@functools.partial(jax.jit, static_argnames=("n_front", "unroll", "interpret"))
def run_front(comps, sph, ff, fi, n_front, unroll, interpret=False):
    tiles = comps[0].shape[0] // SUB
    ray_spec = pl.BlockSpec((SUB, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_front, n_front=n_front, unroll=unroll),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(sph.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(ff.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(fi.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
        ]
        + [ray_spec] * 7,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct(comps[0].shape, jnp.float32),
        interpret=interpret,
    )(sph, ff, fi, *comps)


@functools.partial(jax.jit, static_argnames=("n", "unroll", "interpret"))
def run_brute(comps, sph, n, unroll, interpret=False):
    tiles = comps[0].shape[0] // SUB
    ray_spec = pl.BlockSpec((SUB, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_brute, n=n, unroll=unroll),
        grid=(tiles,),
        in_specs=[pl.BlockSpec(sph.shape, lambda i: (0, 0), memory_space=pltpu.SMEM)]
        + [ray_spec] * 7,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct(comps[0].shape, jnp.float32),
        interpret=interpret,
    )(sph, *comps)


def main() -> None:
    n_extra = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    scene = make_random_scene(n_extra, seed=3) if n_extra else make_cover_scene(seed=0)
    n = int(scene.radius.shape[0])
    W, H = 400, 225
    cam = Camera(
        aspect_ratio=16 / 9, image_width=W, samples_per_pixel=1, max_depth=1,
        vfov=20.0, lookfrom=(13.0, 2.0, 3.0), lookat=(0.0, 0.0, 0.0),
        defocus_angle=0.6, focus_dist=10.0,
    ).derive()
    jj, ii = jnp.meshgrid(jnp.arange(H, dtype=jnp.int32),
                          jnp.arange(W, dtype=jnp.int32), indexing="ij")
    i_idx, j_idx = ii.reshape(-1), jj.reshape(-1)
    rays = W * H
    r_pad = ((rays + TILE - 1) // TILE) * TILE

    bvh = build_bvh(scene, leaf_size=8)
    scene_r = reorder_scene(scene, bvh)
    sph_brute = _scene_table(scene_r)
    UN = 8

    def comps_of(key):
        o, d, t = generate_rays(cam, i_idx, j_idx, key)
        return tuple(
            jnp.pad(x, (0, r_pad - rays)).reshape(-1, LANES).astype(jnp.float32)
            for x in (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], t)
        )

    # correctness first: identical best_t (same spheres, padding idempotent)
    comps = comps_of(jax.random.PRNGKey(0))
    ref = np.asarray(run_brute(comps, sph_brute, n, UN))
    for F in (24, 48):
        sph_p, ff, fi = pack_front_tables(scene, max_nodes=F, unroll=UN)
        got = np.asarray(run_front(comps, sph_p, ff, fi, F, UN))
        bad = ~np.isclose(got, ref, rtol=1e-6, atol=1e-6)
        print(f"F={F}: parity {1 - bad.mean():.6%} "
              f"(max|d|={np.abs(got - ref).max():.2e})", flush=True)

    def make_brute(key):
        return run_brute(comps_of(key), sph_brute, n, UN)

    sec, _ = marginal_seconds_per_pass(make_brute, k1=8, k2=24, reps=3)
    print(f"brute_u8  n={n}: {rays / sec / 1e6:8.2f} Mrays/s ({sec*1e3:.2f} ms)",
          flush=True)

    for F in (24, 48):
        sph_p, ff, fi = pack_front_tables(scene, max_nodes=F, unroll=UN)

        def make_front(key, sph_p=sph_p, ff=ff, fi=fi, F=F):
            return run_front(comps_of(key), sph_p, ff, fi, F, UN)

        sec, _ = marginal_seconds_per_pass(make_front, k1=8, k2=24, reps=3)
        print(f"front_{F:02d}  n={n}: {rays / sec / 1e6:8.2f} Mrays/s "
              f"({sec*1e3:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
