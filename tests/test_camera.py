"""Camera tests vs hand-computed reference math (src/camera.h:52-113)."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from raytracingproject_tpu.camera import Camera, generate_rays


def cover_camera(**overrides):
    """The cover-scene camera config (src/main.cpp:55-68)."""
    kw = dict(
        aspect_ratio=16.0 / 9.0,
        image_width=400,
        samples_per_pixel=30,
        max_depth=50,
        vfov=20.0,
        lookfrom=(13.0, 2.0, 3.0),
        lookat=(0.0, 0.0, 0.0),
        vup=(0.0, 1.0, 0.0),
        defocus_angle=0.6,
        focus_dist=10.0,
    )
    kw.update(overrides)
    return Camera(**kw)


def test_image_height_floor_min1():
    # height = int(width/aspect), min 1 (src/camera.h:53-54)
    assert cover_camera().image_height == 225
    assert Camera(aspect_ratio=1000.0, image_width=10).image_height == 1
    assert Camera(aspect_ratio=1.0, image_width=100).image_height == 100


def test_derived_frame_matches_reference_formulas():
    cam = cover_camera()
    d = cam.derive(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)

    lookfrom = np.array([13.0, 2.0, 3.0])
    lookat = np.zeros(3)
    vup = np.array([0.0, 1.0, 0.0])
    theta = math.radians(20.0)
    h = math.tan(theta / 2)
    viewport_height = 2 * h * 10.0
    viewport_width = viewport_height * (400 / 225)
    w = (lookfrom - lookat) / np.linalg.norm(lookfrom - lookat)
    u = np.cross(vup, w); u /= np.linalg.norm(u)
    v = np.cross(w, u)
    viewport_u = viewport_width * u
    viewport_v = viewport_height * -v
    pdu = viewport_u / 400
    pdv = viewport_v / 225
    upper_left = lookfrom - 10.0 * w - viewport_u / 2 - viewport_v / 2
    pixel00 = upper_left + 0.5 * (pdu + pdv)
    defocus_radius = 10.0 * math.tan(math.radians(0.3))

    np.testing.assert_allclose(np.asarray(d.center), lookfrom, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d.pixel00_loc), pixel00, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d.pixel_delta_u), pdu, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(d.pixel_delta_v), pdv, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(d.defocus_disk_u)), defocus_radius, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(d.defocus_disk_v)), defocus_radius, rtol=1e-5
    )


def test_generate_rays_within_pixel_and_disk():
    cam = cover_camera()
    d = cam.derive()
    n = 4096
    i = jnp.full((n,), 200, jnp.int32)
    j = jnp.full((n,), 112, jnp.int32)
    origin, direction, time = generate_rays(d, i, j, jax.random.PRNGKey(0))
    origin, direction, time = map(np.asarray, (origin, direction, time))

    # origins lie on the defocus disk around center (defocus_angle 0.6 > 0)
    center = np.asarray(d.center)
    du, dv = np.asarray(d.defocus_disk_u), np.asarray(d.defocus_disk_v)
    r = np.linalg.norm(du)
    dist = np.linalg.norm(origin - center, axis=-1)
    assert np.all(dist <= r * (1 + 1e-5))

    # ray targets (origin+direction) stay within the pixel square around its center
    pdu, pdv = np.asarray(d.pixel_delta_u), np.asarray(d.pixel_delta_v)
    pixel_center = np.asarray(d.pixel00_loc) + 200 * pdu + 112 * pdv
    target = origin + direction
    off = target - pixel_center
    au = off @ pdu / (pdu @ pdu)
    av = off @ pdv / (pdv @ pdv)
    assert np.all(np.abs(au) <= 0.5 + 1e-4)
    assert np.all(np.abs(av) <= 0.5 + 1e-4)

    # motion-blur time ~ U[0,1) (src/camera.h:97)
    assert np.all((time >= 0) & (time < 1))
    assert abs(time.mean() - 0.5) < 0.03


def test_no_defocus_origin_is_center():
    cam = cover_camera(defocus_angle=0.0)
    d = cam.derive()
    i = jnp.zeros((64,), jnp.int32)
    j = jnp.zeros((64,), jnp.int32)
    origin, _, _ = generate_rays(d, i, j, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        np.asarray(origin), np.broadcast_to(np.asarray(d.center), (64, 3)), atol=1e-7
    )
