"""Early-exit (while_loop) bounce loop must equal the fixed scan bitwise:
bounce k consumes fold_in(key, k) in both paths."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracingproject_tpu.camera import Camera
from raytracingproject_tpu.render import render_pass
from raytracingproject_tpu.scene import make_three_sphere_scene
from raytracingproject_tpu.bvh import build_bvh, reorder_scene


def test_early_exit_matches_scan():
    scene = make_three_sphere_scene()
    cam = Camera(
        aspect_ratio=16.0 / 9.0,
        image_width=48,
        samples_per_pixel=4,
        max_depth=12,
        vfov=90.0,
        lookfrom=(0.0, 0.0, 0.0),
        lookat=(0.0, 0.0, -1.0),
        defocus_angle=0.0,
        focus_dist=1.0,
    )
    d = cam.derive()
    kw = dict(width=48, height=27, max_depth=12, spp_chunk=4)
    key = jax.random.PRNGKey(11)
    a = np.asarray(render_pass(scene, d, key, early_exit=False, **kw))
    b = np.asarray(render_pass(scene, d, key, early_exit=True, **kw))
    np.testing.assert_array_equal(a, b)


def test_early_exit_with_bvh_matches():
    scene = make_three_sphere_scene()
    bvh = build_bvh(scene)
    sscene = reorder_scene(scene, bvh)
    cam = Camera(
        aspect_ratio=1.0,
        image_width=32,
        samples_per_pixel=4,
        max_depth=10,
        vfov=60.0,
        lookfrom=(0.0, 0.5, 2.0),
        lookat=(0.0, 0.0, -1.0),
        defocus_angle=0.0,
    )
    d = cam.derive()
    kw = dict(width=32, height=32, max_depth=10, spp_chunk=4)
    key = jax.random.PRNGKey(12)
    a = np.asarray(render_pass(sscene, d, key, bvh=bvh, early_exit=False, **kw))
    b = np.asarray(render_pass(sscene, d, key, bvh=bvh, early_exit=True, **kw))
    np.testing.assert_array_equal(a, b)
