"""Host-side simulation of the tile-uniform BVH traversal: counts node
visits and sphere tests per bounce to bound the achievable speedup before
touching the kernel. Primary rays only (bounce coherence is worse, so this
is an optimistic bound for deeper bounces).

Usage: python tools/visit_sim.py [n_spheres] [leaf_size]
"""

from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp


def main() -> None:
    n_extra = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    leaf = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from raytracingproject_tpu.bvh import build_bvh, reorder_scene
    from raytracingproject_tpu.camera import Camera, generate_rays
    from raytracingproject_tpu.scene import make_cover_scene, make_random_scene

    scene = make_random_scene(n_extra, seed=3) if n_extra else make_cover_scene(seed=0)
    bvh = build_bvh(scene, leaf_size=leaf)
    scene = reorder_scene(scene, bvh)
    n = int(scene.radius.shape[0])
    m = int(bvh.node_min.shape[0])
    print(f"{n} spheres, {m} nodes (leaf={leaf})")

    W, H, SPP = 400, 225, 1
    cam = Camera(
        aspect_ratio=16 / 9, image_width=W, samples_per_pixel=SPP, max_depth=16,
        vfov=20.0, lookfrom=(13.0, 2.0, 3.0), lookat=(0.0, 0.0, 0.0),
        defocus_angle=0.6, focus_dist=10.0,
    ).derive()
    jj, ii = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    i_idx = jnp.asarray(ii.reshape(-1), jnp.int32)
    j_idx = jnp.asarray(jj.reshape(-1), jnp.int32)
    o, d, t = generate_rays(cam, i_idx, j_idx, jax.random.PRNGKey(0))
    o = np.asarray(o); d = np.asarray(d); tmv = np.asarray(t)

    nmin = np.asarray(bvh.node_min); nmax = np.asarray(bvh.node_max)
    miss = np.asarray(bvh.miss_link); lstart = np.asarray(bvh.leaf_start)
    lcount = np.asarray(bvh.leaf_count)
    c0 = np.asarray(scene.center0); cd = np.asarray(scene.center_delta)
    rad = np.asarray(scene.radius)

    TILE = 1024
    R = o.shape[0]
    tiles = R // TILE
    inner_v = leaf_v = sph_t = 0
    rng = np.random.default_rng(0)
    sample_tiles = rng.choice(tiles, size=min(tiles, 24), replace=False)

    for tix in sample_tiles:
        sl = slice(tix * TILE, (tix + 1) * TILE)
        ox, dx = o[sl], d[sl]
        tt = tmv[sl]
        inv = 1.0 / np.where(np.abs(dx) > 1e-20, dx, 1e-20)
        best = np.full(TILE, np.inf)
        ptr = 0
        while ptr >= 0:
            t0 = (nmin[ptr][None] - ox) * inv
            t1 = (nmax[ptr][None] - ox) * inv
            tn = np.maximum(np.minimum(t0, t1).max(axis=1), 1e-3)
            tf = np.minimum(np.maximum(t0, t1).min(axis=1), best)
            hit = (tf > tn).any()
            if lcount[ptr] > 0:
                leaf_v += 1
                if hit:
                    s0, c = lstart[ptr], lcount[ptr]
                    sph_t += int(c)
                    for s in range(s0, s0 + c):
                        cc = c0[s][None] + tt[:, None] * cd[s][None]
                        oc = ox - cc
                        a = (dx * dx).sum(1)
                        hb = (oc * dx).sum(1)
                        cq = (oc * oc).sum(1) - rad[s] ** 2
                        disc = hb * hb - a * cq
                        ok = disc > 0
                        sq = np.sqrt(np.where(ok, disc, 1.0))
                        r0 = (-hb - sq) / a
                        r1 = (-hb + sq) / a
                        in0 = (r0 > 1e-3) & (r0 < best)
                        in1 = (r1 > 1e-3) & (r1 < best)
                        root = np.where(in0, r0, r1)
                        upd = ok & (in0 | in1)
                        best = np.where(upd, root, best)
                ptr = miss[ptr]
            else:
                inner_v += 1
                ptr = ptr + 1 if hit else miss[ptr]

    k = len(sample_tiles)
    print(f"per tile (primary bounce): inner visits {inner_v/k:.1f}, "
          f"leaf visits {leaf_v/k:.1f}, sphere tests {sph_t/k:.1f} "
          f"(brute = {n})")


if __name__ == "__main__":
    main()
