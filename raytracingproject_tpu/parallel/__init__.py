"""Multi-device scaling: mesh construction, sharded rendering, sharded training.

The reference has no distributed parallelism (SURVEY.md §2.5); its implicit
per-pixel data parallelism inside the compute shader and its dual-queue
pipelining generalize here to:
- rays/pixels sharded over the `rays` mesh axis (DP over pixels),
- samples sharded over the `samples` mesh axis (DP over spp),
- scene parameters replicated, gradients all-reduced (psum) by XLA's
  transpose of the sharded render.
"""

from raytracingproject_tpu.parallel.mesh import make_mesh
from raytracingproject_tpu.parallel.shard import (
    render_sharded,
    make_sharded_train_step,
)

__all__ = ["make_mesh", "render_sharded", "make_sharded_train_step"]
