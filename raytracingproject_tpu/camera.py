"""Camera model (reference: src/camera.h).

Same public fields, names, and defaults as the reference camera
(src/camera.h:15-26) so configurations transfer 1:1. `initialize()` math
(src/camera.h:52-85) is reproduced exactly in float64 on the host; ray
generation (src/camera.h:87-113) is a pure batched function of pixel indices
and a PRNG key.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from raytracingproject_tpu.ops.sampling import random_in_unit_disk


class CameraDerived(NamedTuple):
    """Device-side derived camera frame (src/camera.h:117-126 privates)."""

    center: jnp.ndarray          # [3]
    pixel00_loc: jnp.ndarray     # [3]
    pixel_delta_u: jnp.ndarray   # [3]
    pixel_delta_v: jnp.ndarray   # [3]
    defocus_disk_u: jnp.ndarray  # [3]
    defocus_disk_v: jnp.ndarray  # [3]
    defocus_angle: jnp.ndarray   # [] degrees (<=0 disables the disk)


@dataclasses.dataclass(frozen=True)
class Camera:
    """Reference camera config surface (src/camera.h:15-26), same defaults."""

    aspect_ratio: float = 1.0
    image_width: int = 100
    samples_per_pixel: int = 10
    max_depth: int = 10

    vfov: float = 90.0
    lookfrom: Tuple[float, float, float] = (0.0, 0.0, -1.0)
    lookat: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    vup: Tuple[float, float, float] = (0.0, 1.0, 0.0)

    defocus_angle: float = 0.0
    focus_dist: float = 10.0

    @property
    def image_height(self) -> int:
        """height = width / aspect, floored, min 1 (src/camera.h:53-54)."""
        h = int(self.image_width / self.aspect_ratio)
        return max(h, 1)

    def image_size(self) -> Tuple[int, int]:
        """(width, height), as reference `camera::image_size` (src/camera.h:28-30)."""
        return (self.image_width, self.image_height)

    def derive(self, dtype=jnp.float32) -> CameraDerived:
        """Reproduces `camera::initialize` (src/camera.h:52-85) in float64,
        then casts the frame to the render dtype."""
        width, height = self.image_width, self.image_height
        lookfrom = np.asarray(self.lookfrom, np.float64)
        lookat = np.asarray(self.lookat, np.float64)
        vup = np.asarray(self.vup, np.float64)

        center = lookfrom
        theta = math.radians(self.vfov)
        h = math.tan(theta / 2.0)
        viewport_height = 2.0 * h * self.focus_dist
        viewport_width = viewport_height * (width / height)

        w = (lookfrom - lookat) / np.linalg.norm(lookfrom - lookat)
        u = np.cross(vup, w)
        u = u / np.linalg.norm(u)
        v = np.cross(w, u)

        viewport_u = viewport_width * u
        viewport_v = viewport_height * -v
        pixel_delta_u = viewport_u / width
        pixel_delta_v = viewport_v / height

        viewport_upper_left = center - self.focus_dist * w - viewport_u / 2 - viewport_v / 2
        pixel00_loc = viewport_upper_left + 0.5 * (pixel_delta_u + pixel_delta_v)

        defocus_radius = self.focus_dist * math.tan(math.radians(self.defocus_angle / 2.0))
        defocus_disk_u = u * defocus_radius
        defocus_disk_v = v * defocus_radius

        return CameraDerived(
            center=jnp.asarray(center, dtype),
            pixel00_loc=jnp.asarray(pixel00_loc, dtype),
            pixel_delta_u=jnp.asarray(pixel_delta_u, dtype),
            pixel_delta_v=jnp.asarray(pixel_delta_v, dtype),
            defocus_disk_u=jnp.asarray(defocus_disk_u, dtype),
            defocus_disk_v=jnp.asarray(defocus_disk_v, dtype),
            defocus_angle=jnp.asarray(self.defocus_angle, dtype),
        )


def generate_rays(
    cam: CameraDerived,
    i: jnp.ndarray,  # [R] pixel column indices
    j: jnp.ndarray,  # [R] pixel row indices
    key: jax.Array,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched `camera::get_ray` (src/camera.h:87-100).

    Returns (origin [R,3], direction [R,3], time [R]). Directions are NOT
    normalized, matching the reference (the quadratic uses a = |d|^2).
    Jitter is uniform in the pixel square (src/camera.h:102-107); the origin
    is a defocus-disk sample when defocus_angle > 0 (src/camera.h:94,109-113);
    ray time ~ U[0,1) for motion blur (src/camera.h:97).
    """
    k_px, k_disk, k_time = jax.random.split(key, 3)
    shape = i.shape

    # pixel_sample_square: offsets in [-0.5, 0.5)
    off = jax.random.uniform(k_px, shape + (2,), minval=-0.5, maxval=0.5)
    pixel_center = (
        cam.pixel00_loc[None, :]
        + i[:, None].astype(cam.pixel00_loc.dtype) * cam.pixel_delta_u[None, :]
        + j[:, None].astype(cam.pixel00_loc.dtype) * cam.pixel_delta_v[None, :]
    )
    pixel_sample = (
        pixel_center
        + off[..., 0:1] * cam.pixel_delta_u[None, :]
        + off[..., 1:2] * cam.pixel_delta_v[None, :]
    )

    disk = random_in_unit_disk(k_disk, shape)
    defocus_origin = (
        cam.center[None, :]
        + disk[..., 0:1] * cam.defocus_disk_u[None, :]
        + disk[..., 1:2] * cam.defocus_disk_v[None, :]
    )
    use_disk = cam.defocus_angle > 0.0
    origin = jnp.where(use_disk, defocus_origin, cam.center[None, :])

    direction = pixel_sample - origin
    time = jax.random.uniform(k_time, shape)
    return origin, direction, time
