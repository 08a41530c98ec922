"""Fast differentiable rendering: Pallas forward + path-replay backward.

The Pallas megakernel (ops/pallas/megakernel.py) is forward-only — Mosaic
kernels have no automatic VJP. This module gives it one via jax.custom_vjp:

  forward  — the megakernel WITH in-kernel residual recording
             (pallas_trace_record): full speed, hardware PRNG, optional
             tile-uniform BVH traversal;
  backward — reverse-mode through the O(depth)-per-ray path replay
             (grad/replay.py), never touching O(N_spheres) work again.

This closes SURVEY.md §7 build-plan step 5 ("custom VJPs for the Pallas
path"). Gradients flow to SceneParams only; ray origins/directions/times
receive zero cotangents (camera parameters are not trained — matches
grad/inverse.py's scope).

BVH caveat: a FlatBVH is built over FIXED geometry. Training geometry
(center/radius) with `bvh` passed would silently use stale bounds; geometry
training must either pass bvh=None (brute megakernel forward — still the
fast path) or rebuild the BVH outside jit every step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from raytracingproject_tpu.grad.inverse import SceneParams, apply_params
from raytracingproject_tpu.grad.replay import replay_radiance
from raytracingproject_tpu.scene import Scene


def make_fast_radiance(scene: Scene, max_depth: int, bvh=None, front=None,
                       interpret: bool = False, replay_groups: int = 1,
                       replay_skip_dead: bool | None = None,
                       replay_gather: str | None = None):
    """Build radiance_fn(params, origin, direction, time, seed_f32) -> [R,3]
    with the Pallas-forward / replay-backward custom VJP.

    `scene` supplies the non-differentiable topology (mat_type, array
    ordering); if `bvh` or `front` is given, `scene` must already be in BVH
    leaf order (bvh.reorder_scene) and params must be in the same ordering.
    `front` (megakernel.FrontTables) runs the front-culled closest hit in
    both the plain and residual-recording forwards — the fast path for
    material-only training on large scenes. Like `bvh`, the tables snapshot
    FIXED geometry: see the module-docstring caveat.
    `seed_f32` is the PRNG seed as float32 (int seeds have no tangent type;
    it is rounded and cast in the forward).
    `replay_groups > 1` sorts rays by death depth and replays in that many
    slices so dead bounces are skipped per slice (replay_radiance's
    dead-depth skipping) — the lever that makes depth-50 backward cost
    ~the mean path length, not max_depth. Gradients agree to float
    precision (tests/test_replay.py asserts 2e-4 relative tolerance;
    cond-wrapped scans fuse differently, measured ~2.6e-5 rel).
    """
    from raytracingproject_tpu.ops.pallas.megakernel import (
        pallas_trace_paths, pallas_trace_record,
    )

    @jax.custom_vjp
    def radiance(params, origin, direction, time, seed_f32):
        s = apply_params(scene, params)
        seed = seed_f32.astype(jnp.int32)
        return pallas_trace_paths(
            origin, direction, time, s, seed, max_depth,
            interpret=interpret, bvh=bvh, front=front,
        )

    def fwd(params, origin, direction, time, seed_f32):
        s = apply_params(scene, params)
        seed = seed_f32.astype(jnp.int32)
        rad, res = pallas_trace_record(
            origin, direction, time, s, seed, max_depth,
            interpret=interpret, bvh=bvh, front=front,
        )
        return rad, (params, origin, direction, time, res)

    def bwd(saved, g):
        params, origin, direction, time, res = saved
        _, vjp = jax.vjp(
            lambda p: replay_radiance(p, scene, origin, direction, time, res,
                                      n_groups=replay_groups,
                                      skip_dead=replay_skip_dead,
                                      gather=replay_gather),
            params,
        )
        (g_params,) = vjp(g)
        return (
            g_params,
            jnp.zeros_like(origin),
            jnp.zeros_like(direction),
            jnp.zeros_like(time),
            jnp.zeros((), time.dtype),
        )

    radiance.defvjp(fwd, bwd)
    return radiance


def make_fast_radiance_twophase(scene: Scene, max_depth: int, cut: int = 4,
                                cap_frac: float = 0.25, front=None,
                                interpret: bool = False):
    """make_fast_radiance with the DEATH-COHERENT two-phase pipeline:

    forward  — pallas_trace_paths_twophase (short full-frame prefix, one
               alive-first compaction, packed tail — the tile-granularity
               early-exit-waste fix, ROOFLINE_r04 missing #1);
    fwd      — pallas_trace_record_twophase (same pipeline, residuals
               recorded per phase);
    backward — replay_radiance_twophase: `cut` bounces for every ray plus
               the depth tail for only a survivor-capacity prefix
               (cap_frac of the padded ray count), with an exact
               full-width lax.cond fallback on overflow — O(live depth)
               structurally, never approximate.

    `front` (FrontTables) snapshots fixed geometry — same caveat as
    make_fast_radiance."""
    from raytracingproject_tpu.ops.pallas.megakernel import (
        pallas_trace_paths_twophase, pallas_trace_record_twophase,
    )
    from raytracingproject_tpu.grad.replay import replay_radiance_twophase

    @jax.custom_vjp
    def radiance(params, origin, direction, time, seed_f32):
        s = apply_params(scene, params)
        seed = seed_f32.astype(jnp.int32)
        return pallas_trace_paths_twophase(
            origin, direction, time, s, seed, max_depth, cuts=(cut,),
            interpret=interpret, front=front,
        )

    def fwd(params, origin, direction, time, seed_f32):
        s = apply_params(scene, params)
        seed = seed_f32.astype(jnp.int32)
        rad, res1, res2, src, dest, n_alive = pallas_trace_record_twophase(
            origin, direction, time, s, seed, max_depth, cut=cut,
            interpret=interpret, front=front,
        )
        return rad, (params, origin, direction, time, res1, res2, src, dest,
                     n_alive)

    def bwd(saved, g):
        params, origin, direction, time, res1, res2, src, dest, n_alive = saved
        r_pad = res1.idx.shape[1]
        cap = max(1, int(round(r_pad * cap_frac)))
        _, vjp = jax.vjp(
            lambda p: replay_radiance_twophase(
                p, scene, origin, direction, time, res1, res2, src, dest,
                n_alive, cap_rays=cap,
            ),
            params,
        )
        (g_params,) = vjp(g)
        return (
            g_params,
            jnp.zeros_like(origin),
            jnp.zeros_like(direction),
            jnp.zeros_like(time),
            jnp.zeros((), time.dtype),
        )

    radiance.defvjp(fwd, bwd)
    return radiance


def make_fast_radiance_dynamic_front(scene: Scene, max_depth: int,
                                     interpret: bool = False,
                                     replay_groups: int = 1,
                                     replay_skip_dead: bool | None = None):
    """make_fast_radiance with the front tables as a TRACED ARGUMENT:
    radiance_fn(params, origin, direction, time, seed_f32, front) -> [R,3].

    This is the geometry-training path (round-3 VERDICT missing #4): the
    caller refreshes the tables from the current params every step
    (megakernel.FrontRefresher), so the forward's culling bounds are exact
    for the geometry being differentiated — no stale-bounds hazard. The
    front's `remap` must map kernel winner columns to THIS scene's order
    (FrontRefresher does; plain front_tables maps to leaf order). Gradients
    flow to params only; the tables get symbolic-zero cotangents (they are
    a redundant encoding of params — their true cotangent is absorbed by
    the replay, which re-derives every sphere attribute from params)."""
    from raytracingproject_tpu.ops.pallas.megakernel import (
        pallas_trace_paths, pallas_trace_record,
    )

    @jax.custom_vjp
    def radiance(params, origin, direction, time, seed_f32, front):
        s = apply_params(scene, params)
        seed = seed_f32.astype(jnp.int32)
        return pallas_trace_paths(
            origin, direction, time, s, seed, max_depth,
            interpret=interpret, front=front,
        )

    def fwd(params, origin, direction, time, seed_f32, front):
        s = apply_params(scene, params)
        seed = seed_f32.astype(jnp.int32)
        rad, res = pallas_trace_record(
            origin, direction, time, s, seed, max_depth,
            interpret=interpret, front=front,
        )
        return rad, (params, origin, direction, time, res, front)

    def _zero_ct(x):
        import numpy as np

        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.zeros_like(x)
        return np.zeros(x.shape, jax.dtypes.float0)

    def bwd(saved, g):
        params, origin, direction, time, res, front = saved
        _, vjp = jax.vjp(
            lambda p: replay_radiance(p, scene, origin, direction, time, res,
                                      n_groups=replay_groups,
                                      skip_dead=replay_skip_dead),
            params,
        )
        (g_params,) = vjp(g)
        return (
            g_params,
            jnp.zeros_like(origin),
            jnp.zeros_like(direction),
            jnp.zeros_like(time),
            jnp.zeros((), time.dtype),
            jax.tree.map(_zero_ct, front),
        )

    radiance.defvjp(fwd, bwd)
    return radiance


def make_fast_geometry_train_step(
    scene: Scene,
    camera,
    optimizer=None,
    *,
    refresher=None,
    spp: int = 8,
    learning_rate: float = 2e-2,
    trainable: tuple[str, ...] | None = None,
    interpret: bool = False,
    replay_groups: int = 1,
    replay_skip_dead: bool | None = None,
):
    """Geometry-capable fast training with per-step front refresh.

    With `refresher` (megakernel.FrontRefresher): the front tables are
    recomputed from the CURRENT params ON DEVICE inside the step's jit
    (refresher.refresh_in_jit — static-layout gathers + segment reductions,
    zero host round-trips) and the step signature matches
    make_fast_train_step: step(params, opt_state, key, target).

    Without `refresher`: step(params, opt_state, key, target, front) — the
    caller supplies tables per step (e.g. refresher.refresh(params) on the
    host; ~7 tunnel RTTs per step on remote backends, measured 42-250 ms
    in GEOM_r04 — prefer the in-jit form).

    Either way the culling bounds are exact for the geometry being
    differentiated — no stale-bounds hazard."""
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
    radiance_fn = make_fast_radiance_dynamic_front(
        scene, max_depth, interpret=interpret, replay_groups=replay_groups,
        replay_skip_dead=replay_skip_dead,
    )

    jj, ii = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.int32),
        jnp.arange(width, dtype=jnp.int32),
        indexing="ij",
    )
    i_idx = jnp.tile(ii.reshape(-1), spp)
    j_idx = jnp.tile(jj.reshape(-1), spp)

    def loss_fn(params, key, target, front):
        k_ray, k_path = jax.random.split(key)
        o, d, t = generate_rays(cam, i_idx, j_idx, k_ray)
        seed = jax.random.randint(k_path, (), 0, 2**31 - 1).astype(jnp.float32)
        if front is None:
            # in-jit refresh: tables derived from the SAME params being
            # differentiated (their cotangent is symbolic zero in the
            # custom VJP — the replay re-derives every attribute from
            # params, so no gradient is lost)
            front = jax.lax.stop_gradient(refresher.refresh_in_jit(params))
        rad = radiance_fn(params, o, d, t, seed, front)
        img = rad.reshape(spp, height, width, 3).mean(axis=0)
        return jnp.mean((img - target) ** 2)

    @jax.jit
    def step_explicit(params, opt_state, key, target, front):
        loss, grads = jax.value_and_grad(loss_fn)(params, key, target, front)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, grads

    @jax.jit
    def step_auto(params, opt_state, key, target):
        loss, grads = jax.value_and_grad(loss_fn)(params, key, target, None)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, grads

    params0 = extract_params(scene)
    if refresher is None:
        # The explicit-front form trusts the CALLER to refresh tables every
        # step; a front reused across steps while geometry trains reopens
        # exactly the stale-bounds hazard make_fast_train_step raises on.
        # Warn (not raise: per-step host refresh is a legitimate pattern).
        import warnings

        geo = set(GEOMETRY_FIELDS if trainable is None else trainable)
        if geo & set(GEOMETRY_FIELDS):
            warnings.warn(
                "make_fast_geometry_train_step without a refresher: the "
                "caller MUST pass fresh front tables every step (e.g. "
                "refresher.refresh(params)); reusing one front while "
                f"{sorted(geo & set(GEOMETRY_FIELDS))} train gives silently "
                "wrong culling/gradients. Prefer passing refresher= for the "
                "in-jit refresh.",
                stacklevel=2,
            )
    step = step_auto if refresher is not None else step_explicit
    return params0, optimizer.init(params0), step


GEOMETRY_FIELDS = ("center0", "center_delta", "radius")


def make_fast_train_step(
    scene: Scene,
    camera,
    optimizer=None,
    *,
    spp: int = 8,
    learning_rate: float = 2e-2,
    trainable: tuple[str, ...] | None = None,
    interpret: bool = False,
    bvh=None,
    front=None,
    replay_groups: int = 1,
    replay_skip_dead: bool | None = None,
    replay_gather: str | None = None,
    two_phase: int | None = None,
    cap_frac: float = 0.25,
):
    """Inverse-rendering train step on the fast path (grad/inverse.py's
    make_train_step with the Pallas forward + replay backward).

    `two_phase` (a cut depth, e.g. 4) switches to the death-coherent
    two-phase pipeline (make_fast_radiance_twophase): compacted forward +
    O(live-depth) backward with `cap_frac` survivor capacity. bvh and the
    replay_* knobs do not apply there.

    `front` (megakernel.FrontTables over `scene`, which must already be in
    BVH leaf order) runs the front-culled closest hit in the recording
    forward — the fast path for MATERIAL-ONLY training (albedo/fuzz/ior).
    The tables snapshot fixed geometry, so passing `front`/`bvh` while
    `trainable` includes a geometry field raises (stale-bounds gradients
    would be silently wrong — the module-docstring caveat, enforced).

    Returns (params0, opt_state0, step) with
    step(params, opt_state, key, target_image) ->
        (params, opt_state, loss, grads)."""
    if (bvh is not None or front is not None):
        geo = set(GEOMETRY_FIELDS if trainable is None else trainable)
        geo &= set(GEOMETRY_FIELDS)
        if geo:
            raise ValueError(
                f"bvh/front snapshot FIXED geometry but {sorted(geo)} are "
                "trainable; train materials only, or pass bvh=None and "
                "front=None for geometry training"
            )
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
    if two_phase is not None:
        radiance_fn = make_fast_radiance_twophase(
            scene, max_depth, cut=two_phase, cap_frac=cap_frac, front=front,
            interpret=interpret,
        )
    else:
        radiance_fn = make_fast_radiance(scene, max_depth, bvh=bvh,
                                         front=front, interpret=interpret,
                                         replay_groups=replay_groups,
                                         replay_skip_dead=replay_skip_dead,
                                         replay_gather=replay_gather)

    jj, ii = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.int32),
        jnp.arange(width, dtype=jnp.int32),
        indexing="ij",
    )
    i_idx = jnp.tile(ii.reshape(-1), spp)
    j_idx = jnp.tile(jj.reshape(-1), spp)

    def loss_fn(params, key, target):
        k_ray, k_path = jax.random.split(key)
        o, d, t = generate_rays(cam, i_idx, j_idx, k_ray)
        seed = jax.random.randint(k_path, (), 0, 2**31 - 1).astype(jnp.float32)
        rad = radiance_fn(params, o, d, t, seed)
        img = rad.reshape(spp, height, width, 3).mean(axis=0)
        return jnp.mean((img - target) ** 2)

    @jax.jit
    def step(params, opt_state, key, target):
        loss, grads = jax.value_and_grad(loss_fn)(params, key, target)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, grads

    params0 = extract_params(scene)
    return params0, optimizer.init(params0), step
