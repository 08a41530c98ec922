"""Front-kernel round-5 additions: sub-block descent + per-word early-out.

Both are culling-only changes — radiance must match the plain front kernel
exactly (same visit order within surviving blocks; culled blocks/words
cannot contain a strictly closer hit). Interpret mode on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp

from raytracingproject_tpu.bvh import build_bvh, reorder_scene
from raytracingproject_tpu.camera import Camera, generate_rays
from raytracingproject_tpu.ops.pallas.megakernel import (
    front_tables, pallas_trace_paths,
)
from raytracingproject_tpu.scene import make_random_scene


def _rays(n=1024, key=0):
    cam = Camera(
        aspect_ratio=16.0 / 9.0, image_width=64, samples_per_pixel=1,
        max_depth=4, vfov=40.0, lookfrom=(8.0, 3.0, 8.0),
        lookat=(0.0, 0.0, 0.0), defocus_angle=0.0, focus_dist=1.0,
    )
    d = cam.derive()
    idx = jax.random.randint(jax.random.PRNGKey(key), (n,), 0, 64 * 36)
    i = (idx % 64).astype(jnp.int32)
    j = (idx // 64).astype(jnp.int32)
    return generate_rays(d, i, j, jax.random.PRNGKey(key + 1))


def _setup(n_spheres=300):
    scene = make_random_scene(n_spheres, seed=5)
    bvh = build_bvh(scene, leaf_size=8)
    rscene = reorder_scene(scene, bvh)
    return rscene, bvh


def test_subblock_descent_exact():
    rscene, bvh = _setup()
    o, d, t = _rays()
    # big subtrees so ksub > 1 genuinely exercises the descent
    plain = front_tables(rscene, bvh, max_nodes=24,
                         order_point=(8.0, 3.0, 8.0))
    desc = front_tables(rscene, bvh, max_nodes=24,
                        order_point=(8.0, 3.0, 8.0), sub_block=True)
    assert desc.ksub > 1, desc.ksub
    a = np.asarray(pallas_trace_paths(o, d, t, rscene, jnp.int32(7), 2,
                                      interpret=True, front=plain))
    b = np.asarray(pallas_trace_paths(o, d, t, rscene, jnp.int32(7), 2,
                                      interpret=True, front=desc))
    assert np.isfinite(b).all()
    np.testing.assert_allclose(b, a, atol=1e-6)


def test_word_earlyout_exact():
    rscene, bvh = _setup()
    o, d, t = _rays(1024, key=3)
    # multiple words so the early-out has words to skip
    plain = front_tables(rscene, bvh, max_nodes=72,
                         order_point=(8.0, 3.0, 8.0))
    weo = front_tables(rscene, bvh, max_nodes=72,
                       order_point=(8.0, 3.0, 8.0), word_earlyout=True)
    a = np.asarray(pallas_trace_paths(o, d, t, rscene, jnp.int32(7), 2,
                                      interpret=True, front=plain))
    b = np.asarray(pallas_trace_paths(o, d, t, rscene, jnp.int32(7), 2,
                                      interpret=True, front=weo))
    np.testing.assert_allclose(b, a, atol=1e-6)


def test_subblock_plus_earlyout_exact():
    rscene, bvh = _setup()
    o, d, t = _rays(1024, key=9)
    plain = front_tables(rscene, bvh, max_nodes=48,
                         order_point=(8.0, 3.0, 8.0))
    both = front_tables(rscene, bvh, max_nodes=48,
                        order_point=(8.0, 3.0, 8.0), sub_block=True,
                        word_earlyout=True)
    a = np.asarray(pallas_trace_paths(o, d, t, rscene, jnp.int32(2), 3,
                                      interpret=True, front=plain))
    b = np.asarray(pallas_trace_paths(o, d, t, rscene, jnp.int32(2), 3,
                                      interpret=True, front=both))
    np.testing.assert_allclose(b, a, atol=1e-6)


def test_hbm_word_earlyout_exact():
    """HBM-staged front with per-word early-out vs without (interpret)."""
    from raytracingproject_tpu.ops.pallas.megakernel import front_tables_hbm

    rscene, bvh = _setup(200)
    o, d, t = _rays(1024, key=11)
    plain = front_tables_hbm(rscene, bvh, max_nodes=48,
                             order_point=(8.0, 3.0, 8.0))
    weo = front_tables_hbm(rscene, bvh, max_nodes=48,
                           order_point=(8.0, 3.0, 8.0), word_earlyout=True)
    a = np.asarray(pallas_trace_paths(o, d, t, rscene, jnp.int32(7), 2,
                                      interpret=True, front=plain))
    b = np.asarray(pallas_trace_paths(o, d, t, rscene, jnp.int32(7), 2,
                                      interpret=True, front=weo))
    np.testing.assert_allclose(b, a, atol=1e-6)


def test_hbm_subblock_exact():
    """HBM front with BLOCK-sized subtrees + sub-block descent vs the
    plain HBM front (interpret)."""
    from raytracingproject_tpu.ops.pallas.megakernel import front_tables_hbm

    rscene, bvh = _setup(400)
    o, d, t = _rays(1024, key=13)
    plain = front_tables_hbm(rscene, bvh, max_nodes=24,
                             order_point=(8.0, 3.0, 8.0))
    sub = front_tables_hbm(rscene, bvh, max_nodes=24,
                           order_point=(8.0, 3.0, 8.0), sub_block=True,
                           word_earlyout=True)
    assert sub.ksub == 16
    a = np.asarray(pallas_trace_paths(o, d, t, rscene, jnp.int32(5), 2,
                                      interpret=True, front=plain))
    b = np.asarray(pallas_trace_paths(o, d, t, rscene, jnp.int32(5), 2,
                                      interpret=True, front=sub))
    np.testing.assert_allclose(b, a, atol=1e-6)
