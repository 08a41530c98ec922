"""Configuration dataclasses.

Mirrors the reference's two config surfaces so settings transfer 1:1:
- `GraphicalEnvironmentSettings` POD (reference: src/common_objects.h:9-15)
  -> `RenderSettings` here (same field names and defaults where meaningful).
- Camera public fields (reference: src/camera.h:15-26) -> `Camera` dataclass
  in camera.py.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

# Material type codes for the SoA scene (replaces the reference's
# lambertian/metal/dielectric subclasses, src/material.h:16-81).
LAMBERTIAN = 0
METAL = 1
DIELECTRIC = 2

# Shadow-acne epsilon: the reference intersects over interval(0.001, inf)
# (src/camera_cpu.h:15). Kept at the same value; in float32 this is still a
# safe bound for the scene scales the reference uses (unit spheres, r=1000
# ground sphere viewed from ~13 units away).
T_MIN = 1e-3
T_MAX = jnp.inf


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Renderer session settings (reference: src/common_objects.h:9-15).

    `width`/`height`/`max_frames_in_flight`/`sphere_count` keep the reference
    defaults. TPU-specific knobs are appended.
    """

    max_frames_in_flight: int = 2
    max_images: int = 2
    width: int = 1024
    height: int = 768
    sphere_count: int = 20

    # TPU additions
    dtype: jnp.dtype = jnp.float32
    # Rays processed per device batch in the megakernel renderer. Static so
    # XLA compiles once; pixels*spp are chunked to this size.
    rays_per_batch: int = 1 << 17
    # Use the Pallas trace kernel for closest-hit when available.
    use_pallas: bool = False
    # Run the whole bounce loop in one Pallas TPU kernel (fastest forward
    # path; forward-only — gradients use the XLA megakernel). TPU-backend
    # only (render raises off-TPU) and always computes/returns float32
    # regardless of `dtype`.
    use_megakernel: bool = False
    # Use BVH traversal instead of brute-force closest-hit scan. Combined
    # with use_megakernel this selects the tile-uniform in-kernel traversal
    # (the fast path on TPU); alone it selects the XLA per-ray traversal
    # (correctness alternative; slower than brute force on TPU lanes).
    use_bvh: bool = False
    # Max primitives per BVH leaf. 4 suits the XLA per-ray traversal (its
    # leaf cost is a [R, L] gather); the megakernel amortizes node overhead
    # over a 1024-ray tile and prefers larger leaves (8).
    bvh_leaf_size: int = 4
    # Host-sync the accumulator every N sample chunks. Bounds the device
    # queue depth — long unsynced dispatch chains destabilize tunneled
    # backends, and 2 in-flight chunks (the reference's
    # max_frames_in_flight, src/common_objects.h:10) are enough overlap.
    sync_every: int = 4
    # Megakernel depth segmentation (megakernel.pallas_trace_paths_segmented):
    # cut the bounce loop into segments with alive-ray compaction between
    # them. MEASURED VERDICT (round 3, real v5e): the compaction costs far
    # more than tile-granular early exit saves — 0.48 vs 5.34 Mrays/s plain
    # at depth 50, 400x225 — and the full CONFIG3 grid (3168 tiles) faulted
    # the TPU worker. Kept as a tested, opt-in alternative; default OFF
    # (None = 0 = one monolithic kernel, the measured winner at every depth).
    depth_segment: int | None = None
    # Death-coherent two-phase tracing (megakernel.pallas_trace_paths_
    # twophase): trace bounces [0, two_phase) for the whole frame, compact
    # alive rays ONCE (cumsum-gather, no device sort), trace the tail on
    # packed survivor tiles. Cuts the tile-granularity early-exit waste the
    # segmented design paid 11x too much for. None/0 = monolithic.
    two_phase: int | None = None
