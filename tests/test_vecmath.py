"""Unit tests for ops.vecmath against the reference formulas (src/vec3.h)."""

import numpy as np
import jax.numpy as jnp

from raytracingproject_tpu.ops import vecmath as vm


def test_dot_cross_batched():
    rng = np.random.default_rng(0)
    u = rng.normal(size=(16, 3))
    v = rng.normal(size=(16, 3))
    np.testing.assert_allclose(
        np.asarray(vm.dot(jnp.asarray(u), jnp.asarray(v))),
        np.einsum("ij,ij->i", u, v),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(vm.cross(jnp.asarray(u), jnp.asarray(v))),
        np.cross(u, v),
        rtol=1e-5,
        atol=1e-6,
    )


def test_normalize_unit_length():
    rng = np.random.default_rng(1)
    v = rng.normal(size=(32, 3))
    n = np.asarray(vm.normalize(jnp.asarray(v)))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, rtol=1e-6)


def test_near_zero():
    # threshold 1e-8 per component (src/vec3.h:50-54)
    v = jnp.asarray([[1e-9, 1e-9, 1e-9], [1e-7, 0.0, 0.0]])
    assert np.asarray(vm.near_zero(v)).tolist() == [True, False]


def test_reflect():
    # v - 2*dot(v,n)*n (src/vec3.h:149-151): 45-degree bounce off y plane
    v = jnp.asarray([[1.0, -1.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    np.testing.assert_allclose(np.asarray(vm.reflect(v, n)), [[1.0, 1.0, 0.0]], atol=1e-7)


def test_refract_matches_reference_formula():
    # src/vec3.h:153-158 in float64 numpy
    rng = np.random.default_rng(2)
    for _ in range(20):
        uv = rng.normal(size=3)
        uv = uv / np.linalg.norm(uv)
        n = rng.normal(size=3)
        n = n / np.linalg.norm(n)
        if np.dot(uv, n) > 0:
            n = -n
        ratio = rng.uniform(0.5, 1.5)
        cos_theta = min(np.dot(-uv, n), 1.0)
        r_out_perp = ratio * (uv + cos_theta * n)
        r_out_par = -np.sqrt(abs(1.0 - np.dot(r_out_perp, r_out_perp))) * n
        expected = r_out_perp + r_out_par
        got = np.asarray(
            vm.refract(jnp.asarray(uv[None]), jnp.asarray(n[None]), ratio)
        )[0]
        np.testing.assert_allclose(got, expected, atol=1e-6)


def test_refract_snell_law():
    # exiting angle obeys Snell's law for refraction without TIR
    uv = jnp.asarray([[np.sin(0.3), -np.cos(0.3), 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    ratio = 1.0 / 1.5
    out = np.asarray(vm.refract(uv, n, ratio))[0]
    sin_out = abs(out[0]) / np.linalg.norm(out)
    np.testing.assert_allclose(sin_out, ratio * np.sin(0.3), atol=1e-6)
