"""Batched 3-vector math (reference: src/vec3.h).

Vectors are arrays whose last axis has size 3; every function broadcasts over
leading batch axes. This replaces the reference's scalar `vec3` class and its
free functions (src/vec3.h:105-158) with SoA-friendly ops the VPU can chew
through 8x128 lanes at a time.
"""

from __future__ import annotations

import jax.numpy as jnp

# Degenerate-direction threshold (reference: src/vec3.h:50-54).
NEAR_ZERO_EPS = 1e-8


def dot(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the last axis (src/vec3.h:105-109)."""
    return jnp.sum(u * v, axis=-1)


def cross(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched cross product (src/vec3.h:111-115)."""
    return jnp.cross(u, v)


def length_squared(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(v * v, axis=-1)


def length(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(length_squared(v))


def normalize(v: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """`unit_vector` (src/vec3.h:117-119). `eps` guards 0-length inputs.

    The guard sits BEFORE the square root: `max(sqrt(x), eps)` keeps the
    VALUE finite but its gradient is `0 * d(sqrt)/dx|_0 = 0 * inf = NaN`
    at x == 0 — reached through degenerate recorded scatter directions
    (lambertian u ~ -n, the case src/vec3.h's near_zero flags) and
    measured NaN-poisoning geometry training (round 5). `max(x, eps^2)`
    routes the zero-length branch's gradient to the constant instead;
    values are identical (max commutes with the monotone square)."""
    if eps:
        import jax

        inv = jax.lax.rsqrt(jnp.maximum(length_squared(v), eps * eps))
        return v * inv[..., None]
    return v / length(v)[..., None]


def near_zero(v: jnp.ndarray) -> jnp.ndarray:
    """True where the vector is ~zero in all components (src/vec3.h:50-54)."""
    return jnp.all(jnp.abs(v) < NEAR_ZERO_EPS, axis=-1)


def reflect(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror reflection v - 2*dot(v,n)*n (src/vec3.h:149-151)."""
    return v - 2.0 * dot(v, n)[..., None] * n


def refract(uv: jnp.ndarray, n: jnp.ndarray, etai_over_etat: jnp.ndarray) -> jnp.ndarray:
    """Snell refraction of unit vector `uv` about normal `n`
    (src/vec3.h:153-158). `etai_over_etat` broadcasts over batch axes.
    """
    cos_theta = jnp.minimum(dot(-uv, n), 1.0)
    ratio = jnp.asarray(etai_over_etat)
    if ratio.ndim < cos_theta.ndim:
        ratio = jnp.broadcast_to(ratio, cos_theta.shape)
    r_out_perp = ratio[..., None] * (uv + cos_theta[..., None] * n)
    # Grad-safe sqrt: derivative at 0 is inf (double-where); k==0 means the
    # parallel component vanishes, which the mask reproduces exactly.
    k = jnp.abs(1.0 - length_squared(r_out_perp))
    k_pos = k > 0.0
    sqrt_k = jnp.where(k_pos, jnp.sqrt(jnp.where(k_pos, k, 1.0)), 0.0)
    r_out_parallel = -sqrt_k[..., None] * n
    return r_out_perp + r_out_parallel
