"""Pallas closest-hit kernel parity vs the XLA brute-force scan.

Runs in interpreter mode on the CPU test mesh (pallas TPU kernels
interpret-execute anywhere); the real-TPU compiled path is exercised by
bench/verify drives.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracingproject_tpu.ops.intersect import closest_hit
from raytracingproject_tpu.ops.pallas.trace import pallas_closest_hit
from raytracingproject_tpu.scene import make_cover_scene, make_three_sphere_scene


def random_rays(m, seed):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.uniform(-8, 8, (m, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(m, 3)).astype(np.float32)),
        jnp.asarray(rng.random(m).astype(np.float32)),
    )


@pytest.mark.parametrize("scene_fn,m", [(make_three_sphere_scene, 300), (make_cover_scene, 512)])
def test_pallas_matches_brute(scene_fn, m):
    scene = scene_fn()
    o, d, t = random_rays(m, 0)
    ref = closest_hit(o, d, t, scene.center0, scene.center_delta, scene.radius)
    got = pallas_closest_hit(o, d, t, scene, interpret=True)

    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    hit = np.asarray(ref.hit)
    t_ref = np.asarray(ref.t)[hit]
    t_got = np.asarray(got.t)[hit]
    np.testing.assert_allclose(t_got, t_ref, rtol=5e-3, atol=1e-3)
    same = np.asarray(got.idx)[hit] == np.asarray(ref.idx)[hit]
    near_tie = np.abs(t_got - t_ref) <= 5e-3 * np.abs(t_ref) + 1e-3
    assert np.all(same | near_tie)


def test_pallas_ray_padding():
    """Ray counts not divisible by the tile size must round-trip."""
    scene = make_three_sphere_scene()
    o, d, t = random_rays(77, 1)
    ref = closest_hit(o, d, t, scene.center0, scene.center_delta, scene.radius)
    got = pallas_closest_hit(o, d, t, scene, interpret=True)
    assert got.t.shape == (77,)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
