"""Intersection tests vs a float64 numpy oracle of the reference math
(src/sphere.h:30-57, src/aabb.h:35-53, src/hittable_list.h:25-39)."""

import numpy as np
import jax.numpy as jnp

from raytracingproject_tpu.ops.intersect import sphere_hit_t, closest_hit, aabb_hit


def oracle_sphere_hit(origin, direction, center, radius, t_min=1e-3, t_max=np.inf):
    """Scalar float64 re-derivation of sphere::hit (src/sphere.h:30-57)."""
    oc = origin - center
    a = direction @ direction
    half_b = oc @ direction
    c = oc @ oc - radius * radius
    disc = half_b * half_b - a * c
    if disc < 0:
        return None
    sqrtd = np.sqrt(disc)
    root = (-half_b - sqrtd) / a
    if not (t_min < root < t_max):
        root = (-half_b + sqrtd) / a
        if not (t_min < root < t_max):
            return None
    return root


def test_sphere_hit_random_vs_oracle():
    rng = np.random.default_rng(0)
    R, N = 64, 8
    origin = rng.normal(size=(R, 3)) * 3
    direction = rng.normal(size=(R, 3))
    center = rng.normal(size=(N, 3)) * 2
    radius = rng.uniform(0.2, 1.5, size=N)

    t, valid = sphere_hit_t(
        jnp.asarray(origin, jnp.float32),
        jnp.asarray(direction, jnp.float32),
        jnp.asarray(center, jnp.float32),
        jnp.asarray(radius, jnp.float32),
    )
    t, valid = np.asarray(t), np.asarray(valid)
    for r in range(R):
        for n in range(N):
            expected = oracle_sphere_hit(origin[r], direction[r], center[n], radius[n])
            assert valid[r, n] == (expected is not None), (r, n)
            if expected is not None:
                np.testing.assert_allclose(t[r, n], expected, rtol=2e-3, atol=2e-4)


def test_inside_sphere_uses_far_root():
    # ray starts inside: near root is negative, reference takes the far root
    t, valid = sphere_hit_t(
        jnp.zeros((1, 3)),
        jnp.asarray([[0.0, 0.0, 1.0]]),
        jnp.asarray([[0.0, 0.0, 0.0]]),
        jnp.asarray([2.0]),
    )
    assert bool(valid[0, 0])
    np.testing.assert_allclose(float(t[0, 0]), 2.0, rtol=1e-6)


def test_epsilon_rejects_self_intersection():
    # grazing hit at t < t_min must be rejected (interval.surrounds is open,
    # src/interval.h:30-32; epsilon 0.001 src/camera_cpu.h:15)
    t, valid = sphere_hit_t(
        jnp.asarray([[0.0, 0.0, -1.0]]),   # on the surface
        jnp.asarray([[0.0, 0.0, 1.0]]),    # heading through the sphere
        jnp.asarray([[0.0, 0.0, 0.0]]),
        jnp.asarray([1.0]),
        t_min=1e-3,
    )
    # t=0 root excluded; far root t=2 selected
    assert bool(valid[0, 0])
    np.testing.assert_allclose(float(t[0, 0]), 2.0, rtol=1e-6)


def test_closest_hit_picks_nearest_and_normal_faces_ray():
    origin = jnp.asarray([[0.0, 0.0, 0.0]])
    direction = jnp.asarray([[0.0, 0.0, -1.0]])
    time = jnp.zeros((1,))
    centers = jnp.asarray([[0.0, 0.0, -5.0], [0.0, 0.0, -2.0]])
    deltas = jnp.zeros((2, 3))
    radius = jnp.asarray([0.5, 0.5])
    rec = closest_hit(origin, direction, time, centers, deltas, radius)
    assert int(rec.idx[0]) == 1
    np.testing.assert_allclose(float(rec.t[0]), 1.5, rtol=1e-6)
    assert bool(rec.front_face[0])
    np.testing.assert_allclose(np.asarray(rec.normal[0]), [0.0, 0.0, 1.0], atol=1e-6)


def test_closest_hit_inside_flips_normal():
    origin = jnp.asarray([[0.0, 0.0, 0.0]])
    direction = jnp.asarray([[0.0, 0.0, -1.0]])
    time = jnp.zeros((1,))
    rec = closest_hit(
        origin, direction, time,
        jnp.asarray([[0.0, 0.0, 0.0]]), jnp.zeros((1, 3)), jnp.asarray([2.0]),
    )
    assert bool(rec.hit[0]) and not bool(rec.front_face[0])
    # outward normal at (0,0,-2) is (0,0,-1); flipped against ray => (0,0,1)
    np.testing.assert_allclose(np.asarray(rec.normal[0]), [0.0, 0.0, 1.0], atol=1e-6)


def test_moving_sphere_center_lerp():
    # sphere moves +x by 1 over t in [0,1] (src/sphere.h:68-72)
    origin = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    direction = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    time = jnp.asarray([0.0, 1.0])
    centers = jnp.asarray([[0.0, 0.0, -3.0]])
    deltas = jnp.asarray([[10.0, 0.0, 0.0]])   # far away at time 1
    radius = jnp.asarray([0.5])
    rec = closest_hit(origin, direction, time, centers, deltas, radius)
    assert bool(rec.hit[0])       # time 0: sphere at z=-3, hit
    assert not bool(rec.hit[1])   # time 1: sphere at x=10, miss


def test_miss_reports_no_hit():
    rec = closest_hit(
        jnp.asarray([[0.0, 0.0, 0.0]]),
        jnp.asarray([[0.0, 1.0, 0.0]]),
        jnp.zeros((1,)),
        jnp.asarray([[0.0, -5.0, 0.0]]),
        jnp.zeros((1, 3)),
        jnp.asarray([1.0]),
    )
    assert not bool(rec.hit[0])


def test_aabb_slab():
    o = jnp.asarray([[0.0, 0.0, 0.0]] * 4)
    d = jnp.asarray(
        [
            [1.0, 0.0, 0.0],    # through the box
            [-1.0, 0.0, 0.0],   # away from the box
            [1.0, 1.0, 0.0],    # diagonal through
            [0.0, 1.0, 0.0],    # parallel miss (zero direction component)
        ]
    )
    bmin = jnp.asarray([[2.0, -1.0, -1.0]] * 4)
    bmax = jnp.asarray([[4.0, 1.0, 1.0]] * 4)
    hit = np.asarray(aabb_hit(o, d, bmin, bmax))
    assert hit.tolist() == [True, False, False, False]
    # the diagonal ray exits y-slab at t=1 before entering x-slab at t=2
