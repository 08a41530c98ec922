"""Float64 numpy path-tracing oracle.

An independent re-derivation of the reference math (src/camera.h,
src/camera_cpu.h, src/material.h, src/sphere.h) in vectorized numpy float64
with its own RNG. Used to validate the JAX renderer statistically: matched
scenes/cameras/spp, MC-noise-aware tolerances (SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np

LAMBERTIAN, METAL, DIELECTRIC = 0, 1, 2
T_MIN = 1e-3


def scene_to_numpy(scene):
    return {
        "center0": np.asarray(scene.center0, np.float64),
        "center_delta": np.asarray(scene.center_delta, np.float64),
        "radius": np.asarray(scene.radius, np.float64),
        "mat_type": np.asarray(scene.mat_type),
        "albedo": np.asarray(scene.albedo, np.float64),
        "fuzz": np.asarray(scene.fuzz, np.float64),
        "ior": np.asarray(scene.ior, np.float64),
    }


def _unit(v):
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-300)


def _random_unit_vector(rng, n):
    # rejection sampling, as the reference (src/vec3.h:129-139)
    out = np.empty((n, 3))
    need = np.arange(n)
    while need.size:
        p = rng.uniform(-1, 1, size=(need.size, 3))
        ok = (p * p).sum(-1) < 1
        out[need[ok]] = p[ok]
        need = need[~ok]
    return _unit(out)


def _random_in_unit_sphere(rng, n):
    out = np.empty((n, 3))
    need = np.arange(n)
    while need.size:
        p = rng.uniform(-1, 1, size=(need.size, 3))
        ok = (p * p).sum(-1) < 1
        out[need[ok]] = p[ok]
        need = need[~ok]
    return out


def _random_in_unit_disk(rng, n):
    out = np.empty((n, 2))
    need = np.arange(n)
    while need.size:
        p = rng.uniform(-1, 1, size=(need.size, 2))
        ok = (p * p).sum(-1) < 1
        out[need[ok]] = p[ok]
        need = need[~ok]
    return out


def closest_hit_np(sc, origin, direction, time):
    """hittable_list::hit closest scan (src/hittable_list.h:25-39)."""
    center = sc["center0"][None] + time[:, None, None] * sc["center_delta"][None]
    oc = origin[:, None, :] - center
    a = (direction * direction).sum(-1)[:, None]
    half_b = np.einsum("rnc,rc->rn", oc, direction)
    c = (oc * oc).sum(-1) - sc["radius"][None] ** 2
    disc = half_b**2 - a * c
    with np.errstate(invalid="ignore"):
        sqrtd = np.sqrt(np.maximum(disc, 0.0))
        r0 = (-half_b - sqrtd) / a
        r1 = (-half_b + sqrtd) / a
    in0 = (r0 > T_MIN) & np.isfinite(r0)
    in1 = (r1 > T_MIN) & np.isfinite(r1)
    root = np.where(in0, r0, r1)
    valid = (disc >= 0) & (in0 | in1)
    t_all = np.where(valid, root, np.inf)
    idx = np.argmin(t_all, axis=-1)
    t = t_all[np.arange(len(t_all)), idx]
    hit = np.isfinite(t)
    p = origin + t[:, None] * direction
    hc = sc["center0"][idx] + time[:, None] * sc["center_delta"][idx]
    outward = (p - hc) / sc["radius"][idx][:, None]
    front = np.einsum("rc,rc->r", direction, outward) < 0
    normal = np.where(front[:, None], outward, -outward)
    return t, idx, hit, p, normal, front


def trace_np(sc, origin, direction, time, rng, max_depth):
    """Iterative ray_color (src/camera_cpu.h:8-26) in float64."""
    n = len(origin)
    throughput = np.ones((n, 3))
    radiance = np.zeros((n, 3))
    alive = np.ones(n, bool)
    origin = origin.copy()
    direction = direction.copy()

    for _ in range(max_depth):
        if not alive.any():
            break
        t, idx, hit, p, normal, front = closest_hit_np(sc, origin, direction, time)
        miss = alive & ~hit
        if miss.any():
            unit = _unit(direction[miss])
            aa = 0.5 * (unit[:, 1] + 1.0)
            sky = (1 - aa)[:, None] * np.ones(3) + aa[:, None] * np.array([0.5, 0.7, 1.0])
            radiance[miss] += throughput[miss] * sky
        live = alive & hit
        if not live.any():
            alive &= False
            break

        mat = sc["mat_type"][idx]
        scat_dir = np.zeros((n, 3))
        atten = np.ones((n, 3))
        cont = np.ones(n, bool)

        lam = live & (mat == LAMBERTIAN)
        if lam.any():
            scat_dir[lam] = normal[lam] + _random_unit_vector(rng, lam.sum())
            atten[lam] = sc["albedo"][idx[lam]]

        met = live & (mat == METAL)
        if met.any():
            ud = _unit(direction[met])
            refl = ud - 2 * np.einsum("rc,rc->r", ud, normal[met])[:, None] * normal[met]
            scat_dir[met] = refl + sc["fuzz"][idx[met]][:, None] * _random_in_unit_sphere(
                rng, met.sum()
            )
            atten[met] = sc["albedo"][idx[met]]
            cont[met] = np.einsum("rc,rc->r", scat_dir[met], normal[met]) > 0

        die = live & (mat == DIELECTRIC)
        if die.any():
            ior = sc["ior"][idx[die]]
            ratio = np.where(front[die], 1.0 / ior, ior)
            ud = _unit(direction[die])
            cos = np.minimum(np.einsum("rc,rc->r", -ud, normal[die]), 1.0)
            sin = np.sqrt(np.maximum(1 - cos**2, 0))
            cannot = ratio * sin > 1.0
            r0 = ((1 - ratio) / (1 + ratio)) ** 2
            refl_p = r0 + (1 - r0) * (1 - cos) ** 5
            do_refl = cannot | (refl_p > rng.random(die.sum()))
            refl = ud - 2 * np.einsum("rc,rc->r", ud, normal[die])[:, None] * normal[die]
            perp = ratio[:, None] * (ud + cos[:, None] * normal[die])
            par = -np.sqrt(np.abs(1 - (perp * perp).sum(-1)))[:, None] * normal[die]
            refr = perp + par
            scat_dir[die] = np.where(do_refl[:, None], refl, refr)

        throughput[live] *= atten[live]
        origin[live] = p[live]
        direction[live] = scat_dir[live]
        alive = live & cont
    return radiance


def render_np(scene, camera, spp, rng=None):
    """Full oracle render -> mean radiance [H, W, 3] float64."""
    rng = rng or np.random.default_rng(1234)
    sc = scene_to_numpy(scene)
    w, h = camera.image_size()
    d = camera.derive()
    center = np.asarray(d.center, np.float64)
    p00 = np.asarray(d.pixel00_loc, np.float64)
    pdu = np.asarray(d.pixel_delta_u, np.float64)
    pdv = np.asarray(d.pixel_delta_v, np.float64)
    ddu = np.asarray(d.defocus_disk_u, np.float64)
    ddv = np.asarray(d.defocus_disk_v, np.float64)

    jj, ii = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    i = ii.reshape(-1).astype(np.float64)
    j = jj.reshape(-1).astype(np.float64)
    npix = w * h

    acc = np.zeros((npix, 3))
    for _ in range(spp):
        off = rng.uniform(-0.5, 0.5, size=(npix, 2))
        sample = (
            p00[None]
            + (i + off[:, 0])[:, None] * pdu[None]
            + (j + off[:, 1])[:, None] * pdv[None]
        )
        if camera.defocus_angle > 0:
            disk = _random_in_unit_disk(rng, npix)
            orig = center[None] + disk[:, 0:1] * ddu[None] + disk[:, 1:2] * ddv[None]
        else:
            orig = np.broadcast_to(center, (npix, 3)).copy()
        direction = sample - orig
        time = rng.random(npix)
        acc += trace_np(sc, orig, direction, time, rng, camera.max_depth)
    return (acc / spp).reshape(h, w, 3)
