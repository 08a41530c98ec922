"""Device mesh construction.

Replaces the reference's physical-device selection + queue-family logic
(src/vulkan/device.cpp:52-148) with `jax.sharding.Mesh` over the available
chips. Axes:
- `rays`:    pixels are sharded along this axis (the renderer's DP).
- `samples`: spp is sharded along this axis (a second DP axis whose partial
  sums are psum-reduced — the analog of the reference's per-pixel sample
  accumulation loop, src/camera.h:41-44).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    devices=None,
    samples_axis_size: int = 1,
    axis_names: tuple[str, str] = ("rays", "samples"),
) -> Mesh:
    """Build a 2D (rays x samples) mesh over `devices`.

    `samples_axis_size` must divide the device count; the remaining factor
    becomes the rays axis. With a single device this still works (1x1 mesh),
    so all sharded entry points run unmodified on one chip.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % samples_axis_size != 0:
        raise ValueError(
            f"samples_axis_size {samples_axis_size} does not divide device count {n}"
        )
    n_rays = n // samples_axis_size
    grid = np.asarray(devices).reshape(n_rays, samples_axis_size)
    return Mesh(grid, axis_names)


def multihost_init(**kwargs) -> None:
    """Initialize multi-host JAX (`jax.distributed.initialize`) — the DCN
    analog of the reference's (absent) multi-node support. Safe to call on
    single-host; it is a no-op if distribution is already initialized."""
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialized
