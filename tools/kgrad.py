"""Isolate where fwd+bwd time goes on the fast path (cover scene).

Times, with the marginal methodology (tools/measure.py):
  fwd          — pallas_trace_paths (no residuals), brute
  fwd_front    — same, front-culled closest hit
  record       — pallas_trace_record (residual-recording forward), brute
  record_front — same, front-culled (round-3 VERDICT weak #2: the front
                 RECORDING forward measured slower than brute on the cover
                 scene; this splits exactly where)
  replay_bwd   — value_and_grad through replay_radiance, FIXED residuals
  replay_bwd_gG — same with dead-depth-skipping grouped replay (G groups)
  full         — the custom-VJP fast radiance (record + replay bwd)

Run on the real chip: `python -m tools.kgrad [width] [spp] [depth]`.
Emits one JSON object; tools/kprobes.py aggregates it into KPROBES_r*.json.
"""

from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp

from raytracingproject_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from raytracingproject_tpu.bvh import build_bvh, reorder_scene
from raytracingproject_tpu.camera import Camera, generate_rays
from raytracingproject_tpu.grad.fast import make_fast_radiance
from raytracingproject_tpu.grad.inverse import extract_params
from raytracingproject_tpu.grad.replay import replay_radiance
from raytracingproject_tpu.ops.pallas.megakernel import (
    front_tables, pallas_trace_paths, pallas_trace_record,
)
from raytracingproject_tpu.scene import make_cover_scene
from tools.measure import marginal_seconds_per_pass

GROUPS = 8


def run(width: int = 200, spp: int = 2, depth: int = 8) -> dict:
    scene = make_cover_scene(seed=0)
    cam = Camera(
        aspect_ratio=16.0 / 9.0, image_width=width, samples_per_pixel=spp,
        max_depth=depth, vfov=20.0, lookfrom=(13.0, 2.0, 3.0),
        lookat=(0.0, 0.0, 0.0), defocus_angle=0.6, focus_dist=10.0,
    )
    height = cam.image_height
    camd = cam.derive(jnp.float32)
    n_rays = width * height * spp

    bvh = build_bvh(scene, leaf_size=8)
    rscene = reorder_scene(scene, bvh)
    front = front_tables(rscene, bvh, order_point=(13.0, 2.0, 3.0))

    jj, ii = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.int32), jnp.arange(width, dtype=jnp.int32),
        indexing="ij",
    )
    i_idx = jnp.tile(ii.reshape(-1), spp)
    j_idx = jnp.tile(jj.reshape(-1), spp)

    def rays_of(key):
        return generate_rays(camd, i_idx, j_idx, key)

    params = extract_params(scene)

    def p_fwd(key):
        o, d, t = rays_of(key)
        seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
        return pallas_trace_paths(o, d, t, scene, seed, depth)

    def p_fwd_front(key):
        o, d, t = rays_of(key)
        seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
        return pallas_trace_paths(o, d, t, rscene, seed, depth, front=front)

    def p_record(key):
        o, d, t = rays_of(key)
        seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
        rad, res = pallas_trace_record(o, d, t, scene, seed, depth)
        return rad.sum() + res.ndir.sum() + res.idx.sum()

    def p_record_front(key):
        o, d, t = rays_of(key)
        seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
        rad, res = pallas_trace_record(o, d, t, rscene, seed, depth,
                                       front=front)
        return rad.sum() + res.ndir.sum() + res.idx.sum()

    # fixed residuals for the isolated backward
    o0, d0, t0 = rays_of(jax.random.PRNGKey(7))
    _, res0 = pallas_trace_record(o0, d0, t0, scene, jnp.int32(123), depth)
    res0 = jax.tree.map(lambda x: x.block_until_ready(), res0)

    import inspect

    from raytracingproject_tpu.grad.replay import PathResiduals

    # tolerate an older in-process grad.replay without skip_dead (the
    # round-4 device batch hot-imports this file into a process that
    # already cached the module)
    has_skip = "skip_dead" in inspect.signature(replay_radiance).parameters
    # residuals/rays ride as jit OPERANDS, never closures: closed-over
    # device arrays are baked into the program as constants, and the
    # flagship residuals (650 MB) blew the remote compiler's request limit
    replay_ops = (res0.idx, res0.ndir, res0.refl, o0, d0, t0)

    def make_replay_bwd(groups, skip=None, gather=None):
        kw = {"skip_dead": skip} if has_skip else {}
        if gather:
            kw["gather"] = gather

        def p(key, ri, rn, rr, o_, d_, t_):
            res = PathResiduals(idx=ri, ndir=rn, refl=rr)

            def loss(p_):
                rad = replay_radiance(p_, scene, o_, d_, t_, res,
                                      n_groups=groups, **kw)
                return jnp.mean(rad * jax.random.uniform(key, rad.shape))

            l, g = jax.value_and_grad(loss)(params)
            return l + sum(jnp.sum(v) for v in jax.tree.leaves(g))

        return p

    radiance_fn = make_fast_radiance(scene, depth)  # plain scan (default)

    def p_full(key):
        o, d, t = rays_of(key)
        seed = jax.random.randint(key, (), 0, 2**31 - 1).astype(jnp.float32)

        def loss(p_):
            return jnp.mean(radiance_fn(p_, o, d, t, seed))

        l, g = jax.value_and_grad(loss)(params)
        return l + sum(jnp.sum(v) for v in jax.tree.leaves(g))

    out = {"n_rays": n_rays, "depth": depth, "width": width, "spp": spp}

    # COMPILED-ON-HARDWARE gradient cross-check: the cond-skipping replay
    # must produce the same gradients as the plain scan (CPU tests assert
    # this; this re-asserts it through the TPU compiler, guarding against
    # a cond/remat transpose miscompile being mistaken for speed)
    if has_skip:
        def gsum(skip):
            def loss(p_, ri, rn, rr, o_, d_, t_):
                res = PathResiduals(idx=ri, ndir=rn, refl=rr)
                rad = replay_radiance(p_, scene, o_, d_, t_, res,
                                      n_groups=1, skip_dead=skip)
                return jnp.mean(rad)

            return jax.jit(jax.grad(loss))(params, *replay_ops)

        ga, gb = gsum(True), gsum(False)
        rel = max(
            float(jnp.linalg.norm(x - y) / (jnp.linalg.norm(y) + 1e-12))
            for x, y in zip(jax.tree.leaves(ga), jax.tree.leaves(gb))
        )
        out["skip_vs_noskip_grad_rel_err"] = round(rel, 8)
        assert rel < 1e-3, f"skip/noskip gradients diverge on TPU: {rel}"
    probes = [
        ("fwd", p_fwd, ()), ("fwd_front", p_fwd_front, ()),
        ("record", p_record, ()), ("record_front", p_record_front, ()),
        ("replay_bwd", make_replay_bwd(1), replay_ops),  # plain (default)
        ("replay_bwd_skip", make_replay_bwd(1, skip=True), replay_ops),
        (f"replay_bwd_g{GROUPS}", make_replay_bwd(GROUPS), replay_ops),
        # ray-minor transposed MXU gather (round-5): the [R, C] one-hot
        # pads C=13 -> 128 lanes, ~8x wasted MAC slots per step
        ("replay_bwd_colT", make_replay_bwd(1, gather="colT"), replay_ops),
    ]

    extra = set(
        t for t in os.environ.get("KGRAD_EXTRA", "").split(",") if t
    )
    if "bisect" in extra:
        # round-5 missing #2: bisect the front+record collapse (record_front
        # 78 ms vs fwd_front 27 ms at d50 while record_brute ~= fwd_brute).
        # Each variant drops part of the recording; the one that recovers
        # fwd_front speed names the culprit.
        def rec_probe(sc, fr, mask, consume_code):
            def p(key):
                o, d, t = rays_of(key)
                seed = jax.random.randint(key, (), 0, 2**31 - 1,
                                          dtype=jnp.int32)
                rad, res = pallas_trace_record(o, d, t, sc, seed, depth,
                                               front=fr, res_mask=mask)
                acc = rad.sum()
                if consume_code:
                    acc = acc + res.idx.sum()
                if mask[1]:
                    acc = acc + res.ndir[..., 0].sum()
                return acc

            return p

        probes += [
            ("record_front_code_only",
             rec_probe(rscene, front, (True, False, False, False), True), ()),
            ("record_front_dirs_only",
             rec_probe(rscene, front, (False, True, True, True), False), ()),
            ("record_brute_code_only",
             rec_probe(scene, None, (True, False, False, False), True), ()),
        ]
        front_rp1 = front_tables(rscene, bvh, order_point=(13.0, 2.0, 3.0),
                                 repack=1)
        probes.append((
            "record_front_rp1",
            rec_probe(rscene, front_rp1, (True, True, True, True), True), (),
        ))

    if "twophase" in extra:
        from raytracingproject_tpu.grad.fast import make_fast_radiance_twophase
        from raytracingproject_tpu.grad.replay import replay_radiance_twophase
        from raytracingproject_tpu.ops.pallas.megakernel import (
            pallas_trace_paths_twophase, pallas_trace_record_twophase,
        )

        CUT = 4

        def p_fwd_two(key):
            o, d, t = rays_of(key)
            seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
            return pallas_trace_paths_twophase(o, d, t, scene, seed, depth,
                                               cuts=(CUT,))

        def p_fwd_two_front(key):
            o, d, t = rays_of(key)
            seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
            return pallas_trace_paths_twophase(o, d, t, rscene, seed, depth,
                                               cuts=(CUT,), front=front)

        def p_rec_two(key):
            o, d, t = rays_of(key)
            seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
            rad, r1, r2, _, _, _ = pallas_trace_record_twophase(
                o, d, t, scene, seed, depth, cut=CUT)
            return rad.sum() + r1.ndx.sum() + r2.idx.sum()

        def p_rec_two_front(key):
            o, d, t = rays_of(key)
            seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
            rad, r1, r2, _, _, _ = pallas_trace_record_twophase(
                o, d, t, rscene, seed, depth, cut=CUT, front=front)
            return rad.sum() + r1.ndx.sum() + r2.idx.sum()

        # isolated two-phase backward on fixed residuals (cap 25%)
        _, tr1, tr2, tsrc, tdest, tna = pallas_trace_record_twophase(
            o0, d0, t0, scene, jnp.int32(123), depth, cut=CUT)
        two_ops = (tr1, tr2, tsrc, tdest, tna, o0, d0, t0)
        cap = max(1, int(round(tr1.idx.shape[1] * 0.25)))

        def p_replay_two(key, r1, r2, srcx, destx, nax, o_, d_, t_):
            def loss(p_):
                rad = replay_radiance_twophase(
                    p_, scene, o_, d_, t_, r1, r2, srcx, destx, nax,
                    cap_rays=cap)
                return jnp.mean(rad * jax.random.uniform(key, rad.shape))

            l, g = jax.value_and_grad(loss)(params)
            return l + sum(jnp.sum(v) for v in jax.tree.leaves(g))

        two_fn = make_fast_radiance_twophase(scene, depth, cut=CUT,
                                             cap_frac=0.25)

        def p_full_two(key):
            o, d, t = rays_of(key)
            seed = jax.random.randint(key, (), 0, 2**31 - 1).astype(jnp.float32)

            def loss(p_):
                return jnp.mean(two_fn(p_, o, d, t, seed))

            l, g = jax.value_and_grad(loss)(params)
            return l + sum(jnp.sum(v) for v in jax.tree.leaves(g))

        probes += [
            ("fwd_twophase", p_fwd_two, ()),
            ("fwd_twophase_front", p_fwd_two_front, ()),
            ("record_twophase", p_rec_two, ()),
            ("record_twophase_front", p_rec_two_front, ()),
            ("replay_bwd_twophase", p_replay_two, two_ops),
            ("full_twophase", p_full_two, ()),
        ]
    if depth <= 16:
        # at depth 50 the K-pass measurement scan stacks each pass's
        # hoisted gather buffer (~4.3 GB at 400px) past HBM; the full
        # custom-VJP step there is measured by bench_grad's python-loop
        # chain instead (same work, one dispatch per step)
        probes.append(("full", p_full, ()))
    for name, fn, ops in probes:
        try:
            sec, _ = marginal_seconds_per_pass(fn, operands=ops)
        except Exception as e:  # one OOM/compile failure != no artifact
            out[name + "_error"] = str(e).split("\n")[0][:140]
            print(json.dumps({name: "FAILED",
                              "error": out[name + "_error"]}), flush=True)
            continue
        out[name + "_mrays_s"] = round(n_rays / sec / 1e6, 3)
        out[name + "_ms"] = round(sec * 1e3, 2)
        print(json.dumps(out), flush=True)
    return out


def main() -> None:
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    run(width, spp, depth)


if __name__ == "__main__":
    main()
