"""Distribution tests for ops.sampling.

The reference uses rejection sampling from a global mt19937
(src/vec3.h:121-147); we use analytic transforms. These tests check the
*distributions* match: support, isotropy moments, radial CDF.
"""

import numpy as np
import jax
import jax.numpy as jnp

from raytracingproject_tpu.ops import sampling as smp

N = 200_000


def test_unit_disk_support_and_radial_cdf():
    p = np.asarray(smp.random_in_unit_disk(jax.random.PRNGKey(0), (N,)))
    r2 = p[:, 0] ** 2 + p[:, 1] ** 2
    assert np.all(p[:, 2] == 0.0)
    assert np.all(r2 <= 1.0 + 1e-6)
    # uniform over disk => r^2 ~ U[0,1]
    assert abs(r2.mean() - 0.5) < 0.01
    assert abs(np.mean(r2 < 0.25) - 0.25) < 0.01


def test_unit_vector_isotropic():
    v = np.asarray(smp.random_unit_vector(jax.random.PRNGKey(1), (N,)))
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    assert np.all(np.abs(v.mean(axis=0)) < 0.01)
    # each component of a uniform direction has variance 1/3
    np.testing.assert_allclose(v.var(axis=0), 1.0 / 3.0, atol=0.01)


def test_unit_sphere_interior_uniform():
    p = np.asarray(smp.random_in_unit_sphere(jax.random.PRNGKey(2), (N,)))
    r = np.linalg.norm(p, axis=-1)
    assert np.all(r <= 1.0 + 1e-6)
    # uniform in ball => r^3 ~ U[0,1]
    assert abs((r**3).mean() - 0.5) < 0.01


def test_hemisphere_alignment():
    normal = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (N, 3))
    v = np.asarray(smp.random_on_hemisphere(jax.random.PRNGKey(3), normal))
    assert np.all(v[:, 1] > 0.0)
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
