"""Color pipeline: gamma correction and 8-bit quantization
(reference: src/color.h).
"""

from __future__ import annotations

import jax.numpy as jnp


def linear_to_gamma(x: jnp.ndarray) -> jnp.ndarray:
    """gamma 2: sqrt of non-negative linear value (src/color.h:9-12)."""
    return jnp.sqrt(jnp.maximum(x, 0.0))


def to_u8(image: jnp.ndarray) -> jnp.ndarray:
    """`write_color` quantization (src/color.h:14-35): gamma, clamp to
    [0, 0.999], scale by 256, truncate to int. Input is the per-pixel *mean*
    radiance (the /spp divide already applied)."""
    g = linear_to_gamma(image)
    clamped = jnp.clip(g, 0.0, 0.999)
    return (256.0 * clamped).astype(jnp.uint8)
