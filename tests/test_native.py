"""Native (C++) component tests: SAH BVH builder + PPM encoder, and their
parity with the Python fallbacks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracingproject_tpu.native import load_library
from raytracingproject_tpu.bvh import (
    _build_bvh_native,
    _build_bvh_python,
    build_bvh,
    reorder_scene,
    bvh_closest_hit,
    SENTINEL,
)
from raytracingproject_tpu.ops.intersect import closest_hit
from raytracingproject_tpu.scene import make_cover_scene
from raytracingproject_tpu.utils.ppm import encode_ppm, read_ppm, _encode_native


def test_native_libs_compile():
    assert load_library("bvh_builder") is not None
    assert load_library("ppm_io") is not None


def test_native_bvh_structure():
    scene = make_cover_scene(seed=0)
    bvh = _build_bvh_native(scene, leaf_size=4)
    assert bvh is not None
    n = scene.num_spheres
    m = bvh.node_min.shape[0]
    assert sorted(np.asarray(bvh.prim_order).tolist()) == list(range(n))
    lc = np.asarray(bvh.leaf_count)
    assert int(lc[lc > 0].sum()) == n
    miss = np.asarray(bvh.miss_link)
    ids = np.arange(m)
    assert np.all((miss > ids) | (miss == SENTINEL))
    # root box bounds every node
    bmin, bmax = np.asarray(bvh.node_min), np.asarray(bvh.node_max)
    assert np.all(bmin >= bmin[0] - 1e-4) and np.all(bmax <= bmax[0] + 1e-4)


def test_native_bvh_traversal_parity():
    """SAH and median trees differ in shape but must give identical hits."""
    scene = make_cover_scene(seed=0)
    nat = _build_bvh_native(scene, leaf_size=4)
    assert nat is not None

    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-8, 8, (256, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(256, 3)).astype(np.float32))
    t = jnp.asarray(rng.random(256).astype(np.float32))

    ref = closest_hit(o, d, t, scene.center0, scene.center_delta, scene.radius)
    got = bvh_closest_hit(o, d, t, reorder_scene(scene, nat), nat)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    hit = np.asarray(ref.hit)
    t_ref = np.asarray(ref.t)[hit]
    t_got = np.asarray(got.t)[hit]
    np.testing.assert_allclose(t_got, t_ref, rtol=5e-3, atol=1e-3)
    perm = np.asarray(nat.prim_order)
    same = perm[np.asarray(got.idx)[hit]] == np.asarray(ref.idx)[hit]
    near_tie = np.abs(t_got - t_ref) <= 5e-3 * np.abs(t_ref) + 1e-3
    assert np.all(same | near_tie)


def test_native_ppm_matches_python():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    native = _encode_native(np.ascontiguousarray(img), 47, 33)
    assert native is not None
    # python fallback reference
    import io

    buf = io.StringIO()
    buf.write("P3\n47 33\n255\n")
    for r, g, b in img.reshape(-1, 3):
        buf.write(f"{r} {g} {b}\n")
    assert native == buf.getvalue()


def test_ppm_roundtrip_via_native(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    p = tmp_path / "x.ppm"
    p.write_text(encode_ppm(img))
    np.testing.assert_array_equal(read_ppm(p), img)
