"""Golden-image comparison against the reference's committed render.

/root/reference/image.ppm is the CPU tracer's output of the cover scene at
400x225, 30 spp, depth 50 (src/main.cpp:55-68). Our cover scene uses a
different RNG stream for BOTH scene generation (sphere placement) and path
sampling, so pixel-exact comparison is impossible; what must match is the
global image statistics (the deterministic big spheres + ground + sky
dominate) within Monte-Carlo + scene-layout tolerance.

Full per-pixel parity is validated elsewhere against our own float64 oracle
(test_render.py) where scenes are identical.
"""

from pathlib import Path

import numpy as np
import jax
import pytest

from raytracingproject_tpu.camera import Camera
from raytracingproject_tpu.color import to_u8
from raytracingproject_tpu.render import render
from raytracingproject_tpu.scene import make_cover_scene
from raytracingproject_tpu.utils.ppm import read_ppm

REF = Path("/root/reference/image.ppm")


def test_cover_scene_statistics_match_reference():
    if not REF.exists():
        pytest.skip("reference image not mounted")
    ref = read_ppm(REF).astype(np.float64) / 255.0

    cam = Camera(
        aspect_ratio=16.0 / 9.0,
        image_width=400,
        samples_per_pixel=8,   # enough for image-level stats
        max_depth=50,
        vfov=20.0,
        lookfrom=(13.0, 2.0, 3.0),
        lookat=(0.0, 0.0, 0.0),
        defocus_angle=0.6,
        focus_dist=10.0,
    )
    scene = make_cover_scene(seed=0)
    img = np.asarray(to_u8(render(scene, cam, jax.random.PRNGKey(0)))).astype(np.float64) / 255.0

    assert img.shape == ref.shape
    # global statistics: mean brightness per channel within a few percent
    np.testing.assert_allclose(img.mean(axis=(0, 1)), ref.mean(axis=(0, 1)), atol=0.035)
    # sky region (top rows) is deterministic: tight match
    np.testing.assert_allclose(
        img[:30].mean(axis=(0, 1)), ref[:30].mean(axis=(0, 1)), atol=0.02
    )
    # ground/sphere region: same overall structure (row-mean profile)
    row_img = img.mean(axis=(1, 2))
    row_ref = ref.mean(axis=(1, 2))
    assert np.abs(row_img - row_ref).mean() < 0.04
