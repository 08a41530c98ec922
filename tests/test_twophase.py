"""Death-coherent two-phase megakernel pipeline (round-5 addition).

In interpret mode the TPU interpreter's PRNG returns zeros, so every path
is deterministic and the two-phase pipeline must match the monolithic
megakernel BIT-COMPARABLY (same bounces, same zero draws) — the strongest
parity the CPU lane can assert. Statistical parity of the real HW-PRNG
paths rides the TPU lane (test_tpu_lane.py) and the bench artifacts.
"""

import numpy as np
import jax
import jax.numpy as jnp

from raytracingproject_tpu.camera import Camera, generate_rays
from raytracingproject_tpu.grad.inverse import extract_params
from raytracingproject_tpu.ops.pallas.megakernel import (
    pallas_trace_paths,
    pallas_trace_paths_twophase,
    pallas_trace_record,
    pallas_trace_record_twophase,
)
from raytracingproject_tpu.scene import make_three_sphere_scene

DEPTH = 6
CUT = 2


def _rays(n=2000, key=0):
    cam = Camera(
        aspect_ratio=16.0 / 9.0, image_width=64, samples_per_pixel=1,
        max_depth=DEPTH, vfov=90.0, lookfrom=(0.0, 0.0, 0.0),
        lookat=(0.0, 0.0, -1.0), defocus_angle=0.0, focus_dist=1.0,
    )
    d = cam.derive()
    idx = jax.random.randint(jax.random.PRNGKey(key), (n,), 0, 64 * 36)
    i = (idx % 64).astype(jnp.int32)
    j = (idx // 64).astype(jnp.int32)
    return generate_rays(d, i, j, jax.random.PRNGKey(key + 1))


def test_twophase_matches_monolithic():
    scene = make_three_sphere_scene()
    o, d, t = _rays()
    mono = np.asarray(
        pallas_trace_paths(o, d, t, scene, jnp.int32(7), max_depth=DEPTH,
                           interpret=True)
    )
    for cuts in ((CUT,), (1, 3)):
        two = np.asarray(
            pallas_trace_paths_twophase(o, d, t, scene, jnp.int32(7),
                                        max_depth=DEPTH, cuts=cuts,
                                        interpret=True)
        )
        assert np.isfinite(two).all()
        np.testing.assert_allclose(two, mono, atol=1e-5)


def test_twophase_front_matches_monolithic():
    from raytracingproject_tpu.bvh import build_bvh, reorder_scene
    from raytracingproject_tpu.ops.pallas.megakernel import front_tables

    scene = make_three_sphere_scene()
    bvh = build_bvh(scene, leaf_size=2)
    rscene = reorder_scene(scene, bvh)
    front = front_tables(rscene, bvh)
    o, d, t = _rays(1024)
    mono = np.asarray(
        pallas_trace_paths(o, d, t, rscene, jnp.int32(7), max_depth=DEPTH,
                           interpret=True, front=front)
    )
    two = np.asarray(
        pallas_trace_paths_twophase(o, d, t, rscene, jnp.int32(7),
                                    max_depth=DEPTH, cuts=(CUT,),
                                    interpret=True, front=front)
    )
    np.testing.assert_allclose(two, mono, atol=1e-5)


def test_twophase_record_miss_identity():
    """record_miss=True returns (rad_no_sky, miss_dir, miss_thr); adding the
    sky term outside must reproduce the in-kernel sky path exactly."""
    from raytracingproject_tpu.render import sky_color

    scene = make_three_sphere_scene()
    o, d, t = _rays(1500)
    base = np.asarray(
        pallas_trace_paths_twophase(o, d, t, scene, jnp.int32(3),
                                    max_depth=DEPTH, cuts=(CUT,),
                                    interpret=True)
    )
    rad, mdir, mthr = pallas_trace_paths_twophase(
        o, d, t, scene, jnp.int32(3), max_depth=DEPTH, cuts=(CUT,),
        interpret=True, record_miss=True,
    )
    missed = np.asarray(mdir).any(axis=-1)
    sky = np.asarray(sky_color(mdir))
    total = np.asarray(rad) + np.where(
        missed[:, None], np.asarray(mthr) * sky, 0.0
    )
    np.testing.assert_allclose(total, base, atol=2e-5)


def test_twophase_record_matches_monolithic_record():
    """Two-phase residuals, unpermuted, must equal the monolithic record's
    rows (same zero-PRNG paths in interpret mode)."""
    scene = make_three_sphere_scene()
    o, d, t = _rays(1800)
    R = o.shape[0]
    rad_m, res_m = pallas_trace_record(o, d, t, scene, jnp.int32(5),
                                       max_depth=DEPTH, interpret=True)
    rad2, res1, res2, src, dest, n_alive = pallas_trace_record_twophase(
        o, d, t, scene, jnp.int32(5), max_depth=DEPTH, cut=CUT,
        interpret=True,
    )
    from raytracingproject_tpu.ops.pallas.megakernel import (
        LANES, _take_ray_rows,
    )

    np.testing.assert_allclose(np.asarray(rad2), np.asarray(rad_m), atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(res1.idx)[:, :R], np.asarray(res_m.idx)[:CUT]
    )
    # src/dest are 128-ray ROW permutations; unpermute the packed planes
    idx2_orig = np.asarray(_take_ray_rows(res2.idx, dest, axis=1))[:, :R]
    np.testing.assert_array_equal(idx2_orig, np.asarray(res_m.idx)[CUT:])
    nd2 = jnp.stack([
        _take_ray_rows(p, dest, axis=1) for p in
        (res2.ndx, res2.ndy, res2.ndz)
    ], axis=-1)
    np.testing.assert_allclose(np.asarray(nd2)[:, :R],
                               np.asarray(res_m.ndir)[CUT:], atol=1e-6)
    # packed layout: row positions >= n_alive are all-DEAD
    na = int(n_alive) * LANES
    assert (np.asarray(res2.idx)[:, na:] == -2).all()


def test_twophase_replay_value_and_grads():
    """replay_radiance_twophase at the recording params reproduces the
    recorded radiance, and the full custom-VJP gradient equals the
    monolithic fast path's gradient (identical zero-PRNG paths). The tiny
    capacity run exercises the exact lax.cond overflow fallback."""
    from raytracingproject_tpu.grad.fast import (
        make_fast_radiance, make_fast_radiance_twophase,
    )
    from raytracingproject_tpu.grad.replay import replay_radiance_twophase

    scene = make_three_sphere_scene()
    o, d, t = _rays(1200)
    params = extract_params(scene)
    rad, res1, res2, src, dest, n_alive = pallas_trace_record_twophase(
        o, d, t, scene, jnp.int32(5), max_depth=DEPTH, cut=CUT,
        interpret=True,
    )
    rep = replay_radiance_twophase(params, scene, o, d, t, res1, res2, src,
                                   dest, n_alive)
    np.testing.assert_allclose(np.asarray(rep), np.asarray(rad), atol=2e-5,
                               rtol=2e-4)

    mono_fn = make_fast_radiance(scene, DEPTH, interpret=True)
    seed = jnp.float32(5)

    def loss(fn):
        return lambda p: jnp.mean(fn(p, o, d, t, seed) ** 2)

    g_mono = jax.grad(loss(mono_fn))(params)
    for cap_frac in (0.5, 0.001):  # generous capacity + overflow fallback
        two_fn = make_fast_radiance_twophase(scene, DEPTH, cut=CUT,
                                             cap_frac=cap_frac,
                                             interpret=True)
        g_two = jax.grad(loss(two_fn))(params)
        for a, b in zip(jax.tree.leaves(g_two), jax.tree.leaves(g_mono)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=2e-3)
