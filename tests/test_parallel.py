"""Sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4's fake
backend): sharded render parity, sharded training step, mesh factorization."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracingproject_tpu.camera import Camera
from raytracingproject_tpu.parallel import make_mesh, render_sharded, make_sharded_train_step
from raytracingproject_tpu.render import render
from raytracingproject_tpu.scene import make_three_sphere_scene, make_minimal_scene
from raytracingproject_tpu.grad.inverse import extract_params


def small_camera(**overrides):
    kw = dict(
        aspect_ratio=16.0 / 9.0,
        image_width=64,
        samples_per_pixel=16,
        max_depth=6,
        vfov=90.0,
        lookfrom=(0.0, 0.0, 0.0),
        lookat=(0.0, 0.0, -1.0),
        defocus_angle=0.0,
        focus_dist=1.0,
    )
    kw.update(overrides)
    return Camera(**kw)


def test_requires_8_devices():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"


@pytest.mark.parametrize("samples_axis", [1, 2, 8])
def test_mesh_factorization(samples_axis):
    mesh = make_mesh(samples_axis_size=samples_axis)
    assert mesh.shape["samples"] == samples_axis
    assert mesh.shape["rays"] == 8 // samples_axis


def test_mesh_bad_factor_raises():
    with pytest.raises(ValueError):
        make_mesh(samples_axis_size=3)


@pytest.mark.parametrize("samples_axis", [1, 2, 4])
def test_render_sharded_matches_statistics(samples_axis):
    """Sharded and unsharded renders use different key derivations, so
    compare statistically: same scene/camera, matched spp, MC tolerance."""
    scene = make_three_sphere_scene()
    cam = small_camera(samples_per_pixel=32)
    mesh = make_mesh(samples_axis_size=samples_axis)
    img_sharded = np.asarray(render_sharded(scene, cam, jax.random.PRNGKey(0), mesh))
    img_ref = np.asarray(render(scene, cam, jax.random.PRNGKey(1)))
    diff = np.abs(img_sharded - img_ref)
    assert diff.mean() < 0.025, diff.mean()
    assert np.quantile(diff, 0.99) < 0.2


def test_render_sharded_deterministic():
    scene = make_minimal_scene()
    cam = small_camera(image_width=32, samples_per_pixel=8)
    mesh = make_mesh(samples_axis_size=2)
    a = np.asarray(render_sharded(scene, cam, jax.random.PRNGKey(3), mesh))
    b = np.asarray(render_sharded(scene, cam, jax.random.PRNGKey(3), mesh))
    np.testing.assert_array_equal(a, b)


def test_sharded_train_step_runs_and_descends():
    scene = make_minimal_scene()
    cam = small_camera(image_width=32, samples_per_pixel=8, max_depth=4)
    mesh = make_mesh(samples_axis_size=2)

    # target rendered from a perturbed-albedo scene
    true_scene = scene._replace(
        albedo=scene.albedo.at[1].set(jnp.asarray([0.9, 0.1, 0.1]))
    )
    target = render_sharded(true_scene, cam, jax.random.PRNGKey(4), mesh)

    params, opt_state, step = make_sharded_train_step(
        scene, cam, mesh, spp=8, learning_rate=5e-2, trainable=("albedo",)
    )
    losses = []
    for it in range(25):
        params, opt_state, loss, grads = step(
            params, opt_state, jax.random.fold_in(jax.random.PRNGKey(5), it), target
        )
        losses.append(float(loss))
        for name, leaf in grads._asdict().items():
            assert np.all(np.isfinite(np.asarray(leaf))), name

    assert losses[-1] < losses[0], losses
    # albedo of sphere 1 moved toward the true red-ish albedo
    got = np.asarray(params.albedo[1])
    assert got[0] > 0.75 and got[1] < 0.25, got
