"""Edge-aware gradients (grad/edge.py): full-frame FD validation and the
BASELINE config-4 geometry-recovery demo.

Round-1 VERDICT missing #4: FD tests were restricted to interior windows
because silhouette gradients were absent. The smoothed-primary-visibility
estimator carries boundary terms, so these FD checks run over the FULL
frame with no masking, including center/radius of a sphere whose silhouette
crosses many pixels.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from raytracingproject_tpu.camera import Camera, generate_rays
from raytracingproject_tpu.grad.edge import make_soft_train_step, soft_primary_radiance
from raytracingproject_tpu.grad.inverse import SceneParams, extract_params
from raytracingproject_tpu.render import render
from raytracingproject_tpu.scene import SceneBuilder

DEPTH = 3
W, H, SPP = 64, 36, 2
SOFT = 0.02


def _scene():
    return (
        SceneBuilder()
        .add_lambertian((0.0, -100.5, -1.0), 100.0, (0.6, 0.6, 0.2))
        .add_lambertian((0.0, 0.0, -1.0), 0.5, (0.1, 0.2, 0.7))
        .build()
    )


def _camera():
    return Camera(
        aspect_ratio=16.0 / 9.0, image_width=W, samples_per_pixel=SPP,
        max_depth=DEPTH, vfov=90.0, lookfrom=(0.0, 0.0, 0.0),
        lookat=(0.0, 0.0, -1.0),
    )


def _full_frame_rays(cam):
    d = cam.derive()
    jj, ii = jnp.meshgrid(jnp.arange(H, dtype=jnp.int32),
                          jnp.arange(W, dtype=jnp.int32), indexing="ij")
    i = jnp.tile(ii.reshape(-1), SPP)
    j = jnp.tile(jj.reshape(-1), SPP)
    return generate_rays(d, i, j, jax.random.PRNGKey(1))


def _fd_vs_analytic(depth, field, coord, eps=2e-4):
    scene = _scene()
    cam = _camera()
    o, d, t = _full_frame_rays(cam)
    key = jax.random.PRNGKey(3)
    w = jax.random.uniform(jax.random.PRNGKey(4), (o.shape[0], 3))

    def loss(params):
        rad = soft_primary_radiance(params, scene, o, d, t, key, depth, SOFT)
        return jnp.sum(rad * w) / o.shape[0]

    params = extract_params(scene)
    g = jax.grad(loss)(params)
    sphere = 1  # the small sphere

    def perturb(sign):
        if field == "radius":
            return params._replace(radius=params.radius.at[sphere].add(sign * eps))
        return params._replace(
            center0=params.center0.at[sphere, coord].add(sign * eps)
        )

    fd = (float(loss(perturb(+1))) - float(loss(perturb(-1)))) / (2 * eps)
    an = float(g.radius[sphere]) if field == "radius" else float(
        g.center0[sphere, coord]
    )
    return fd, an


@pytest.mark.parametrize("field,coord", [
    ("center0", 0), ("center0", 1), ("center0", 2), ("radius", None),
])
def test_full_frame_fd_matches_analytic_primary(field, coord):
    """d(loss)/d(center, radius): central finite differences over the WHOLE
    frame vs jax.grad, no interior-window mask — at depth 1, where the
    estimator is exact (the primary silhouette is the only discontinuity
    and it is smoothed). Deterministic given the key, so FD is exact up to
    O(eps^2)."""
    fd, an = _fd_vs_analytic(1, field, coord)
    assert abs(fd - an) < 2e-2 * max(abs(fd), abs(an), 0.02), (
        f"{field}[{coord}]: fd={fd:.5f} analytic={an:.5f}"
    )
    if field == "radius":
        # the silhouette term must actually be there
        assert abs(an) > 1e-3


@pytest.mark.parametrize("field", ["center0", "radius"])
def test_full_frame_fd_full_depth_signal(field):
    """Full path depth: FD additionally sees the UNMODELED boundary terms
    (secondary-bounce silhouettes / shadow edges and object-over-object
    occlusion boundaries — see grad/edge.py docstring), so exact agreement
    is not expected. What must hold full-frame: the analytic gradient has
    the right sign and a substantial share of the FD magnitude — where the
    hard estimator's full-frame geometry gradient was near-zero/NaN-prone
    and FD tests needed interior-window masking (round-1 VERDICT #4)."""
    coord = 1 if field == "center0" else None
    fd, an = _fd_vs_analytic(DEPTH, field, coord)
    assert fd * an > 0, f"sign flip: fd={fd:.5f} analytic={an:.5f}"
    assert 0.2 * abs(fd) < abs(an) < 2.0 * abs(fd), (
        f"fd={fd:.5f} analytic={an:.5f}"
    )


def test_geometry_recovery_demo():
    """BASELINE config 4: recover (center, radius, albedo) jointly from a
    hard-rendered target using the soft-silhouette loss."""
    true_scene = _scene()
    cam = _camera()
    target = render(true_scene, cam, jax.random.PRNGKey(0))

    wrong = (
        SceneBuilder()
        .add_lambertian((0.0, -100.5, -1.0), 100.0, (0.6, 0.6, 0.2))
        .add_lambertian((0.12, -0.08, -1.05), 0.38, (0.4, 0.4, 0.4))
        .build()
    )
    params, opt_state, step = make_soft_train_step(
        wrong, cam, optimizer=optax.adam(1e-2), spp=4, softness=0.03,
        trainable=("center0", "radius", "albedo"),
    )
    key = jax.random.PRNGKey(7)
    # Anneal softness 0.03 -> 0.004: wide early (boundary gradient reaches
    # far), sharp late (the soft loss's O(softness) optimum displacement
    # vanishes — without annealing the params visibly drift off the target
    # after converging).
    n_iter = 300
    for it in range(n_iter):
        w = 0.03 * (0.004 / 0.03) ** (it / n_iter)
        params, opt_state, loss, _ = step(
            params, opt_state, jax.random.fold_in(key, it), target,
            jnp.float32(w),
        )

    true_p = extract_params(true_scene)
    c_err = float(jnp.abs(params.center0[1] - true_p.center0[1]).max())
    r_err = float(jnp.abs(params.radius[1] - true_p.radius[1]))
    a_err = float(jnp.abs(params.albedo[1] - true_p.albedo[1]).max())
    assert c_err < 0.02, f"center error {c_err:.4f} (loss {float(loss):.5f})"
    assert r_err < 0.02, f"radius error {r_err:.4f}"
    assert a_err < 0.10, f"albedo error {a_err:.4f}"


def test_topk_estimator_equals_dense():
    """The O(R*k) candidate estimator (round-2 VERDICT #5) must be
    value-EXACT vs the dense [R, N] estimator when k covers the scene, and
    gradient-equal to float noise (column reordering changes reduction
    order only)."""
    scene = _scene()
    cam = _camera()
    o, d, t = _full_frame_rays(cam)
    params = extract_params(scene)
    key = jax.random.PRNGKey(5)

    dense = soft_primary_radiance(params, scene, o, d, t, key, DEPTH, SOFT)
    topk = soft_primary_radiance(
        params, scene, o, d, t, key, DEPTH, SOFT, candidates_k=2
    )
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(topk))

    def loss(fn_kwargs):
        def f(p):
            rad = soft_primary_radiance(
                p, scene, o, d, t, key, DEPTH, SOFT, **fn_kwargs
            )
            return jnp.mean(rad)
        return jax.grad(f)(params)

    gd = loss({})
    gt = loss({"candidates_k": 2})
    for f in gd._fields:
        a, b = np.asarray(getattr(gd, f)), np.asarray(getattr(gt, f))
        scale = max(np.abs(a).max(), 1e-3)
        assert np.abs(a - b).max() < 5e-3 * scale, (
            f, np.abs(a - b).max(), scale
        )


def test_cover_scale_recovery_single_sphere():
    """Round-2 VERDICT #5 'done' criterion: geometry recovery of ONE
    cover-scene sphere (the others frozen) with the O(R*k) candidate
    estimator — the dense [R, N] form would materialize W*H*SPP x 488
    tensors here. A big diffuse sphere's center/radius are perturbed and
    recovered from a hard-rendered target; all other spheres' gradients are
    masked out."""
    import optax

    from raytracingproject_tpu.config import RenderSettings
    from raytracingproject_tpu.scene import make_cover_scene

    scene = make_cover_scene(seed=0)
    n = int(scene.radius.shape[0])
    sphere = n - 2  # the big lambertian at (-4, 1, 0) (added 3rd from last)
    np.testing.assert_allclose(
        np.asarray(scene.center0[sphere]), [-4.0, 1.0, 0.0]
    )

    cam = Camera(
        aspect_ratio=16.0 / 9.0, image_width=128, samples_per_pixel=2,
        max_depth=3, vfov=20.0, lookfrom=(13.0, 2.0, 3.0),
        lookat=(0.0, 0.0, 0.0), defocus_angle=0.0,
    )
    target = render(scene, cam, jax.random.PRNGKey(0), RenderSettings())

    true_c = np.asarray(scene.center0[sphere]).copy()
    true_r = float(scene.radius[sphere])
    wrong = scene._replace(
        center0=scene.center0.at[sphere].add(jnp.asarray([0.25, -0.15, 0.2])),
        radius=scene.radius.at[sphere].multiply(0.8),
    )

    params, opt_state, step = make_soft_train_step(
        wrong, cam, optimizer=optax.adam(2e-2), spp=2, softness=0.05,
        trainable=("center0", "radius"), candidates_k=8,
    )

    mask = SceneParams(
        center0=jnp.zeros_like(params.center0).at[sphere].set(1.0),
        center_delta=jnp.zeros_like(params.center_delta),
        radius=jnp.zeros_like(params.radius).at[sphere].set(1.0),
        albedo=jnp.zeros_like(params.albedo),
        fuzz=jnp.zeros_like(params.fuzz),
        ior=jnp.zeros_like(params.ior),
    )

    key = jax.random.PRNGKey(7)
    n_steps = 160
    for i in range(n_steps):
        w = 0.05 * (0.003 / 0.05) ** (i / max(n_steps - 1, 1))
        k = jax.random.fold_in(key, i)
        params_new, opt_state, loss, _ = step(params, opt_state, k, target, w)
        # freeze every sphere but the target one
        params = jax.tree.map(
            lambda old, new, m: old + (new - old) * m, params, params_new, mask
        )

    got_c = np.asarray(params.center0[sphere])
    got_r = float(params.radius[sphere])
    # The camera looks along ~-x (lookfrom (13,2,3) -> origin): x is the
    # DEPTH axis, where silhouette information is weak and confounded with
    # radius (closer+smaller ~ farther+bigger), so depth gets a looser
    # bound than the two image-plane axes.
    err = np.abs(got_c - true_c)
    assert err[1] < 0.08 and err[2] < 0.08, (got_c, true_c)
    assert err[0] < 0.40, (got_c, true_c)
    # Depth and radius are individually only weakly constrained (their
    # silhouette observable is the ANGULAR size r/dist); assert that
    # observable tightly instead of each factor.
    lookfrom = np.array([13.0, 2.0, 3.0])
    start_c = true_c + np.array([0.25, -0.15, 0.2])
    ang_true = true_r / np.linalg.norm(lookfrom - true_c)
    ang_got = got_r / np.linalg.norm(lookfrom - got_c)
    ang_start = 0.8 * true_r / np.linalg.norm(lookfrom - start_c)
    assert abs(ang_got - ang_true) < 0.10 * ang_true, (ang_got, ang_true)
    assert abs(ang_got - ang_true) < 0.4 * abs(ang_start - ang_true)
    # and the optimization must have actually improved the start point
    start_err = np.array([0.25, 0.15, 0.2])
    assert err[1] < start_err[1] and err[2] < start_err[2]
