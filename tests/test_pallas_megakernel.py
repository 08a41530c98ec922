"""Full-path Pallas megakernel vs the XLA megakernel — statistical parity
(different RNG streams, same distributions), interpret mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracingproject_tpu.camera import Camera, generate_rays
from raytracingproject_tpu.ops.pallas.megakernel import pallas_trace_paths
from raytracingproject_tpu.render import ray_color
from raytracingproject_tpu.scene import make_minimal_scene, make_three_sphere_scene


def gen(cam, n_rays, key):
    d = cam.derive()
    w, h = cam.image_size()
    idx = jax.random.randint(key, (n_rays,), 0, w * h)
    i = (idx % w).astype(jnp.int32)
    j = (idx // w).astype(jnp.int32)
    return generate_rays(d, i, j, jax.random.fold_in(key, 1))


def test_megakernel_depth1_exact():
    """Depth-1 paths are RNG-free (primary hit -> throughput stops, or sky):
    the Pallas and XLA megakernels must agree to float tolerance per-ray.

    NOTE: the TPU interpreter returns zeros from prng_random_bits, so
    RNG-dependent bounces cannot be validated here; the statistical parity
    of deeper paths runs on real TPU (verify drives / bench)."""
    scene = make_three_sphere_scene()
    cam = Camera(
        aspect_ratio=16.0 / 9.0,
        image_width=64,
        samples_per_pixel=1,
        max_depth=8,
        vfov=90.0,
        lookfrom=(0.0, 0.0, 0.0),
        lookat=(0.0, 0.0, -1.0),
        defocus_angle=0.0,
        focus_dist=1.0,
    )
    R = 4096
    o, d, t = gen(cam, R, jax.random.PRNGKey(0))

    pk = np.asarray(
        pallas_trace_paths(o, d, t, scene, jnp.int32(7), max_depth=1, interpret=True)
    )
    xk = np.asarray(ray_color(scene, o, d, t, jax.random.PRNGKey(3), max_depth=1))
    assert np.isfinite(pk).all()
    np.testing.assert_allclose(pk, xk, atol=5e-5)


def test_megakernel_sky_exact():
    """Rays that miss everything: the sky gradient is deterministic and must
    match the XLA path exactly (no RNG involvement)."""
    scene = make_minimal_scene()
    scene = scene._replace(center0=scene.center0 + 1e6)  # park spheres away
    R = 2048
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-1, 1, (R, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    t = jnp.asarray(rng.random(R).astype(np.float32))
    pk = np.asarray(
        pallas_trace_paths(o, d, t, scene, jnp.int32(1), max_depth=4, interpret=True)
    )
    xk = np.asarray(ray_color(scene, o, d, t, jax.random.PRNGKey(1), max_depth=4))
    np.testing.assert_allclose(pk, xk, atol=2e-5)


def test_megakernel_bvh_depth1_exact():
    """Tile-uniform BVH traversal vs brute megakernel vs XLA, depth-1
    (RNG-free), interpret mode. Tiny scene: the interpreter executes the
    per-node while loop sequentially, so node count must stay small here;
    the full cover-scene parity runs compiled on the TPU lane
    (tests/test_tpu_lane.py)."""
    from raytracingproject_tpu.bvh import build_bvh, reorder_scene

    scene = make_three_sphere_scene()
    bvh = build_bvh(scene, leaf_size=2)
    rscene = reorder_scene(scene, bvh)
    cam = Camera(
        aspect_ratio=16.0 / 9.0,
        image_width=64,
        samples_per_pixel=1,
        max_depth=8,
        vfov=90.0,
        lookfrom=(0.0, 0.0, 0.0),
        lookat=(0.0, 0.0, -1.0),
        defocus_angle=0.0,
        focus_dist=1.0,
    )
    R = 1024
    o, d, t = gen(cam, R, jax.random.PRNGKey(4))

    pk_bvh = np.asarray(
        pallas_trace_paths(o, d, t, rscene, jnp.int32(7), max_depth=1,
                           interpret=True, bvh=bvh)
    )
    pk_brute = np.asarray(
        pallas_trace_paths(o, d, t, scene, jnp.int32(7), max_depth=1, interpret=True)
    )
    xk = np.asarray(ray_color(scene, o, d, t, jax.random.PRNGKey(3), max_depth=1))
    assert np.isfinite(pk_bvh).all()
    np.testing.assert_allclose(pk_bvh, pk_brute, atol=5e-6)
    np.testing.assert_allclose(pk_bvh, xk, atol=5e-5)


def test_megakernel_front_depth1_exact():
    """Front-culled closest hit vs brute megakernel vs XLA, depth-1
    (RNG-free), interpret mode. The front path tests the same spheres in the
    same leaf order within uncullled subtrees (padding repeats are no-ops
    under the strict `<` update), so radiance must match brute to float
    tolerance."""
    from raytracingproject_tpu.bvh import build_bvh, reorder_scene
    from raytracingproject_tpu.ops.pallas.megakernel import front_tables

    scene = make_three_sphere_scene()
    bvh = build_bvh(scene, leaf_size=2)
    rscene = reorder_scene(scene, bvh)
    front = front_tables(rscene, bvh)
    cam = Camera(
        aspect_ratio=16.0 / 9.0,
        image_width=64,
        samples_per_pixel=1,
        max_depth=8,
        vfov=90.0,
        lookfrom=(0.0, 0.0, 0.0),
        lookat=(0.0, 0.0, -1.0),
        defocus_angle=0.0,
        focus_dist=1.0,
    )
    R = 1024
    o, d, t = gen(cam, R, jax.random.PRNGKey(4))

    pk_front = np.asarray(
        pallas_trace_paths(o, d, t, rscene, jnp.int32(7), max_depth=1,
                           interpret=True, front=front)
    )
    pk_brute = np.asarray(
        pallas_trace_paths(o, d, t, scene, jnp.int32(7), max_depth=1, interpret=True)
    )
    xk = np.asarray(ray_color(scene, o, d, t, jax.random.PRNGKey(3), max_depth=1))
    assert np.isfinite(pk_front).all()
    np.testing.assert_allclose(pk_front, pk_brute, atol=5e-6)
    np.testing.assert_allclose(pk_front, xk, atol=5e-5)


def test_megakernel_front_multiword_depth1_exact():
    """Two-level front (>1 word of 24 subtrees, word-level cull active) vs
    brute, depth-1 exact, interpret mode on a 100-sphere scene."""
    from raytracingproject_tpu.bvh import build_bvh, reorder_scene
    from raytracingproject_tpu.ops.pallas.megakernel import front_tables
    from raytracingproject_tpu.scene import make_random_scene

    scene = make_random_scene(100, seed=2)
    bvh = build_bvh(scene, leaf_size=4)
    rscene = reorder_scene(scene, bvh)
    front = front_tables(rscene, bvh, max_nodes=48)
    assert front.wf.shape == (8, 2)
    cam = Camera(
        aspect_ratio=16.0 / 9.0,
        image_width=64,
        samples_per_pixel=1,
        max_depth=8,
        vfov=20.0,
        lookfrom=(13.0, 2.0, 3.0),
        lookat=(0.0, 0.0, 0.0),
        defocus_angle=0.0,
        focus_dist=10.0,
    )
    R = 1024
    o, d, t = gen(cam, R, jax.random.PRNGKey(6))

    pk_front = np.asarray(
        pallas_trace_paths(o, d, t, rscene, jnp.int32(7), max_depth=1,
                           interpret=True, front=front)
    )
    pk_brute = np.asarray(
        pallas_trace_paths(o, d, t, rscene, jnp.int32(7), max_depth=1,
                           interpret=True)
    )
    assert np.isfinite(pk_front).all()
    np.testing.assert_allclose(pk_front, pk_brute, atol=5e-6)


def test_front_tables_idempotent_padding():
    """front_tables pads each subtree's range to an UNROLL multiple by
    repeating the last sphere; every padded column must equal the subtree's
    last real column, and starts must be contiguous."""
    from raytracingproject_tpu.bvh import build_bvh, reorder_scene
    from raytracingproject_tpu.ops.pallas.megakernel import UNROLL, front_tables
    from raytracingproject_tpu.scene import make_random_scene

    scene = make_random_scene(100, seed=1)
    bvh = build_bvh(scene, leaf_size=8)
    rscene = reorder_scene(scene, bvh)
    front = front_tables(rscene, bvh)
    sph = np.asarray(front.sph)
    fi = np.asarray(front.fi)
    pos = 0
    for k in range(fi.shape[1]):
        start, count = int(fi[0, k]), int(fi[1, k])
        if count == 0:
            continue
        assert start == pos
        assert count % UNROLL == 0
        pos += count
    assert pos == sph.shape[1]


def test_megakernel_deterministic_given_seed():
    scene = make_three_sphere_scene()
    R = 1024
    rng = np.random.default_rng(2)
    o = jnp.asarray(rng.uniform(-2, 2, (R, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    t = jnp.asarray(rng.random(R).astype(np.float32))
    a = np.asarray(pallas_trace_paths(o, d, t, scene, jnp.int32(5), max_depth=6, interpret=True))
    b = np.asarray(pallas_trace_paths(o, d, t, scene, jnp.int32(5), max_depth=6, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_megakernel_record_miss_identity():
    """record_miss=True must be a pure refactor of the sky accumulation:
    radiance + miss_thr * default_sky(miss_dir) == the plain kernel's
    radiance (same seed -> same PRNG stream -> identical paths). This is
    the exactness contract env-map lighting rides on (render_pass applies
    the texture lookup to the recorded planes)."""
    from raytracingproject_tpu.render import sky_color

    scene = make_three_sphere_scene()
    cam = Camera(
        aspect_ratio=16.0 / 9.0, image_width=64, samples_per_pixel=1,
        max_depth=8, vfov=90.0, lookfrom=(0.0, 0.0, 0.0),
        lookat=(0.0, 0.0, -1.0), defocus_angle=0.0, focus_dist=1.0,
    )
    R = 4096
    o, d, t = gen(cam, R, jax.random.PRNGKey(5))
    plain = np.asarray(
        pallas_trace_paths(o, d, t, scene, jnp.int32(11), max_depth=4,
                           interpret=True)
    )
    rad, mdir, mthr = pallas_trace_paths(
        o, d, t, scene, jnp.int32(11), max_depth=4, interpret=True,
        record_miss=True,
    )
    rad, mdir, mthr = np.asarray(rad), np.asarray(mdir), np.asarray(mthr)
    assert np.isfinite(rad).all() and np.isfinite(mdir).all()
    total = rad + mthr * np.asarray(sky_color(jnp.asarray(mdir)))
    np.testing.assert_allclose(total, plain, atol=2e-5)
    # never-missed paths leave their planes at exactly zero
    never = (np.abs(mdir).sum(axis=-1) == 0.0)
    assert (mthr[never] == 0.0).all()


def test_segmented_record_miss_identity():
    """Same contract across depth segments: the miss planes ride the
    inter-segment compaction and come back in original ray order."""
    from raytracingproject_tpu.ops.pallas.megakernel import (
        pallas_trace_paths_segmented,
    )
    from raytracingproject_tpu.render import sky_color

    scene = make_three_sphere_scene()
    cam = Camera(
        aspect_ratio=16.0 / 9.0, image_width=64, samples_per_pixel=1,
        max_depth=8, vfov=90.0, lookfrom=(0.0, 0.0, 0.0),
        lookat=(0.0, 0.0, -1.0), defocus_angle=0.0, focus_dist=1.0,
    )
    R = 2048
    o, d, t = gen(cam, R, jax.random.PRNGKey(9))
    plain = np.asarray(
        pallas_trace_paths_segmented(
            o, d, t, scene, jnp.int32(3), max_depth=6, seg_len=2,
            interpret=True,
        )
    )
    rad, mdir, mthr = pallas_trace_paths_segmented(
        o, d, t, scene, jnp.int32(3), max_depth=6, seg_len=2,
        interpret=True, record_miss=True,
    )
    total = np.asarray(rad) + np.asarray(mthr) * np.asarray(
        sky_color(jnp.asarray(np.asarray(mdir)))
    )
    np.testing.assert_allclose(total, plain, atol=2e-5)


# ---------------------------------------------------------------------------
# FrontRefresher: per-step geometry-training tables (round-4)
# ---------------------------------------------------------------------------

def test_front_refresher_matches_front_tables_at_build_params():
    """At the build-time parameters, refreshed tables must trace identically
    to the static front_tables path (same partition, same exact boxes up to
    build-vs-union rounding; the kernel result is what matters)."""
    from raytracingproject_tpu.bvh import build_bvh, reorder_scene
    from raytracingproject_tpu.grad.inverse import extract_params
    from raytracingproject_tpu.ops.pallas.megakernel import (
        FrontRefresher, front_tables,
    )
    from raytracingproject_tpu.scene import make_random_scene

    scene = make_random_scene(60, seed=5)
    bvh = build_bvh(scene, leaf_size=4)
    rscene = reorder_scene(scene, bvh)
    front = front_tables(rscene, bvh, order_point=(13.0, 2.0, 3.0))
    refresher = FrontRefresher(scene, bvh, order_point=(13.0, 2.0, 3.0))
    fr2 = refresher.refresh(extract_params(scene))

    cam = Camera(
        aspect_ratio=16.0 / 9.0, image_width=48, samples_per_pixel=1,
        max_depth=3, vfov=20.0, lookfrom=(13.0, 2.0, 3.0),
        lookat=(0.0, 0.0, 0.0),
    )
    o, d, t = gen(cam, 2048, jax.random.PRNGKey(3))
    r1 = pallas_trace_paths(o, d, t, rscene, jnp.int32(5), 3,
                            front=front, interpret=True)
    r2 = pallas_trace_paths(o, d, t, scene, jnp.int32(5), 3,
                            front=fr2, interpret=True)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1), atol=1e-6)
    # remap maps padded columns to ORIGINAL scene order: composing the
    # leaf remap with prim_order must reproduce it
    po = np.asarray(bvh.prim_order)
    np.testing.assert_array_equal(
        np.asarray(fr2.remap), po[np.asarray(front.remap)]
    )


def test_front_refresher_tracks_moved_geometry():
    """After moving a sphere, refreshed boxes must still bound it (culling
    stays exactness-preserving) and the kernel must agree with the brute
    megakernel on the MOVED scene."""
    from raytracingproject_tpu.bvh import build_bvh
    from raytracingproject_tpu.grad.inverse import apply_params, extract_params
    from raytracingproject_tpu.ops.pallas.megakernel import FrontRefresher
    from raytracingproject_tpu.scene import make_random_scene

    scene = make_random_scene(40, seed=9)
    bvh = build_bvh(scene, leaf_size=4)
    refresher = FrontRefresher(scene, bvh)
    params = extract_params(scene)
    moved = params._replace(
        center0=params.center0.at[7].add(jnp.asarray([0.9, -0.4, 0.6]))
    )
    fr = refresher.refresh(moved)
    moved_scene = apply_params(scene, moved)

    # every sphere is inside its subtree's refreshed box
    ff = np.asarray(fr.ff)
    fi = np.asarray(fr.fi)
    sph = np.asarray(fr.sph)
    for k in range(fi.shape[1]):
        s, c = fi[0, k], fi[1, k]
        if c == 0:
            continue
        cols = sph[:, s : s + c]
        for tt in (0.0, 1.0):
            ctr = cols[0:3] + tt * cols[3:6]
            assert (ctr - np.abs(cols[6]) >= ff[0:3, k][:, None] - 1e-5).all()
            assert (ctr + np.abs(cols[6]) <= ff[3:6, k][:, None] + 1e-5).all()

    cam = Camera(
        aspect_ratio=16.0 / 9.0, image_width=48, samples_per_pixel=1,
        max_depth=3, vfov=20.0, lookfrom=(13.0, 2.0, 3.0),
        lookat=(0.0, 0.0, 0.0),
    )
    o, d, t = gen(cam, 2048, jax.random.PRNGKey(4))
    r_brute = pallas_trace_paths(o, d, t, moved_scene, jnp.int32(5), 3,
                                 interpret=True)
    r_front = pallas_trace_paths(o, d, t, moved_scene, jnp.int32(5), 3,
                                 front=fr, interpret=True)
    np.testing.assert_allclose(np.asarray(r_front), np.asarray(r_brute),
                               atol=1e-6)


def test_geometry_train_step_dynamic_front_matches_brute():
    """make_fast_geometry_train_step with refreshed tables must produce the
    same loss/grads as the brute fast step (same keys; interpret PRNG is
    deterministic, and culled subtrees cannot contain winners)."""
    from raytracingproject_tpu.bvh import build_bvh
    from raytracingproject_tpu.grad.fast import (
        make_fast_geometry_train_step, make_fast_train_step,
    )
    from raytracingproject_tpu.ops.pallas.megakernel import FrontRefresher
    from raytracingproject_tpu.scene import make_random_scene

    scene = make_random_scene(30, seed=11)
    cam = Camera(
        aspect_ratio=1.0, image_width=32, samples_per_pixel=1, max_depth=3,
        vfov=20.0, lookfrom=(13.0, 2.0, 3.0), lookat=(0.0, 0.0, 0.0),
    )
    target = jnp.zeros((32, 32, 3))
    trainable = ("center0", "radius", "albedo")

    bp, bo, bstep = make_fast_train_step(
        scene, cam, spp=1, trainable=trainable, interpret=True,
    )
    bvh = build_bvh(scene, leaf_size=4)
    refresher = FrontRefresher(scene, bvh, order_point=(13.0, 2.0, 3.0))
    gp, go, gstep = make_fast_geometry_train_step(
        scene, cam, spp=1, trainable=trainable, interpret=True,
    )

    key = jax.random.PRNGKey(6)
    bp1, _, bloss, bg = bstep(bp, bo, key, target)
    gp1, _, gloss, gg = gstep(gp, go, key, target, refresher.refresh(gp))
    np.testing.assert_allclose(float(gloss), float(bloss), rtol=1e-6)
    for f in bg._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(gg, f)), np.asarray(getattr(bg, f)),
            atol=1e-6, err_msg=f,
        )
    # a second step exercises the refresh-after-update loop
    gp2, _, gloss2, _ = gstep(gp1, go, jax.random.fold_in(key, 1), target,
                              refresher.refresh(gp1))
    assert np.isfinite(float(gloss2))


def test_front_repack_variants_match():
    """Intra-word best-t re-packing (FrontTables.repack) is an evaluation-
    order change only: culled chunks cannot contain a strictly closer hit,
    so radiance must match repack=1 exactly (same strict `<` updates over
    the same sphere set)."""
    from raytracingproject_tpu.bvh import build_bvh, reorder_scene
    from raytracingproject_tpu.ops.pallas.megakernel import front_tables
    from raytracingproject_tpu.scene import make_random_scene

    scene = make_random_scene(80, seed=13)
    bvh = build_bvh(scene, leaf_size=4)
    rscene = reorder_scene(scene, bvh)
    cam = Camera(
        aspect_ratio=16.0 / 9.0, image_width=48, samples_per_pixel=1,
        max_depth=3, vfov=20.0, lookfrom=(13.0, 2.0, 3.0),
        lookat=(0.0, 0.0, 0.0),
    )
    o, d, t = gen(cam, 2048, jax.random.PRNGKey(21))
    base = None
    for rp in (1, 2, 3):
        front = front_tables(rscene, bvh, order_point=(13.0, 2.0, 3.0),
                             repack=rp)
        rad = np.asarray(
            pallas_trace_paths(o, d, t, rscene, jnp.int32(5), 3,
                               front=front, interpret=True)
        )
        if base is None:
            base = rad
        else:
            np.testing.assert_allclose(rad, base, atol=1e-6,
                                       err_msg=f"repack={rp}")


def test_refresh_in_jit_matches_host_refresh():
    """The on-device (jittable) table refresh must reproduce the host
    refresh exactly: same padded sphere table, same subtree/word/super
    union boxes, same layout tables."""
    from raytracingproject_tpu.bvh import build_bvh
    from raytracingproject_tpu.grad.inverse import extract_params
    from raytracingproject_tpu.ops.pallas.megakernel import FrontRefresher
    from raytracingproject_tpu.scene import make_random_scene

    scene = make_random_scene(70, seed=17)
    bvh = build_bvh(scene, leaf_size=4)
    refresher = FrontRefresher(scene, bvh, order_point=(13.0, 2.0, 3.0))
    params = extract_params(scene)
    moved = params._replace(
        center0=params.center0.at[5].add(jnp.asarray([0.4, 0.2, -0.3])),
        radius=params.radius.at[11].multiply(1.3),
    )
    host = refresher.refresh(moved)
    dev = jax.jit(refresher.refresh_in_jit)(moved)
    for name in ("sph", "ff", "fi", "wf", "sf", "remap"):
        np.testing.assert_allclose(
            np.asarray(getattr(dev, name)), np.asarray(getattr(host, name)),
            atol=1e-5, err_msg=name,
        )


def test_geometry_train_step_in_jit_refresh_matches_explicit():
    """make_fast_geometry_train_step(refresher=...) (in-jit refresh, no
    front argument) must match the explicit-front step exactly."""
    from raytracingproject_tpu.bvh import build_bvh
    from raytracingproject_tpu.grad.fast import make_fast_geometry_train_step
    from raytracingproject_tpu.ops.pallas.megakernel import FrontRefresher
    from raytracingproject_tpu.scene import make_random_scene

    scene = make_random_scene(30, seed=11)
    cam = Camera(
        aspect_ratio=1.0, image_width=32, samples_per_pixel=1, max_depth=3,
        vfov=20.0, lookfrom=(13.0, 2.0, 3.0), lookat=(0.0, 0.0, 0.0),
    )
    target = jnp.zeros((32, 32, 3))
    trainable = ("center0", "radius", "albedo")
    bvh = build_bvh(scene, leaf_size=4)
    refresher = FrontRefresher(scene, bvh, order_point=(13.0, 2.0, 3.0))

    ep, eo, estep = make_fast_geometry_train_step(
        scene, cam, spp=1, trainable=trainable, interpret=True,
    )
    ap, ao, astep = make_fast_geometry_train_step(
        scene, cam, refresher=refresher, spp=1, trainable=trainable,
        interpret=True,
    )
    key = jax.random.PRNGKey(6)
    ep1, _, eloss, eg = estep(ep, eo, key, target, refresher.refresh(ep))
    ap1, _, aloss, ag = astep(ap, ao, key, target)
    np.testing.assert_allclose(float(aloss), float(eloss), rtol=1e-6)
    for f in eg._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(ag, f)), np.asarray(getattr(eg, f)),
            atol=1e-6, err_msg=f,
        )
