"""Round-5 verify drive: skill drive + compiled sanity of the new paths.

One device client. Covers:
  1. render_image on the 3-sphere scene (skill's drive) + PPM write
  2. session smoke (Vulkan 3s-loop analog) + misuse probe
  3. compiled two-phase forward vs monolithic on the cover scene at a
     small config (statistical parity, same estimator different streams)
  4. compiled two-phase record + replay value check (replay == recorded
     radiance at the recording params)
"""

import json

import numpy as np
import jax
import jax.numpy as jnp

from raytracingproject_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import raytracingproject_tpu as rt
from raytracingproject_tpu.utils.ppm import write_ppm


def main() -> None:
    # --- 1. skill drive ---
    scene = rt.scene.make_three_sphere_scene()
    cam = rt.Camera(aspect_ratio=16 / 9, image_width=400, samples_per_pixel=8,
                    max_depth=8, vfov=90.0, lookfrom=(0, 0, 0),
                    lookat=(0, 0, -1))
    img = np.asarray(rt.render_image(scene, cam, jax.random.PRNGKey(0)))
    assert img.shape == (225, 400, 3), img.shape
    tl = img[:10, :10].mean(axis=(0, 1))
    print(json.dumps({"verify_render_shape": list(img.shape),
                      "verify_mean": round(float(img.mean()), 1),
                      "verify_topleft": [round(float(v), 1) for v in tl]}),
          flush=True)
    assert 180 < tl[0] < 230 and tl[2] > 240, tl
    write_ppm(img, "/tmp/verify_r5.ppm")

    # --- 2. session smoke + misuse probe ---
    from raytracingproject_tpu.config import RenderSettings
    from raytracingproject_tpu.session import RendererSession, SessionError

    s = RendererSession(RenderSettings(width=64, height=48))
    try:
        s.draw_frame()
        raise AssertionError("draw_frame before init did not raise")
    except SessionError:
        pass
    s.init()
    s.load_preconfigured_shapes()
    s.start_interactive_loop(duration_ms=120000, max_frames=3)
    print(json.dumps({"verify_session_frames": 3}), flush=True)

    # --- 3. two-phase forward parity (cover scene, small config) ---
    from raytracingproject_tpu.bvh import build_bvh, reorder_scene
    from raytracingproject_tpu.camera import generate_rays
    from raytracingproject_tpu.ops.pallas.megakernel import (
        front_tables, pallas_trace_paths, pallas_trace_paths_twophase,
        pallas_trace_record_twophase,
    )
    from raytracingproject_tpu.scene import make_cover_scene

    cover = make_cover_scene(seed=0)
    bvh = build_bvh(cover, leaf_size=8)
    rcover = reorder_scene(cover, bvh)
    front = front_tables(rcover, bvh, order_point=(13.0, 2.0, 3.0))
    cam2 = rt.Camera(
        aspect_ratio=16.0 / 9.0, image_width=200, samples_per_pixel=4,
        max_depth=16, vfov=20.0, lookfrom=(13.0, 2.0, 3.0),
        lookat=(0.0, 0.0, 0.0), defocus_angle=0.6, focus_dist=10.0,
    )
    camd = cam2.derive()
    h = cam2.image_height
    jj, ii = jnp.meshgrid(jnp.arange(h, dtype=jnp.int32),
                          jnp.arange(200, dtype=jnp.int32), indexing="ij")
    i_idx = jnp.tile(ii.reshape(-1), 4)
    j_idx = jnp.tile(jj.reshape(-1), 4)
    o, d, t = generate_rays(camd, i_idx, j_idx, jax.random.PRNGKey(2))

    mono = np.asarray(
        pallas_trace_paths(o, d, t, rcover, jnp.int32(11), 16, front=front)
    )
    two = np.asarray(
        pallas_trace_paths_twophase(o, d, t, rcover, jnp.int32(12), 16,
                                    cuts=(4,), front=front)
    )
    dm = abs(float(mono.mean()) - float(two.mean()))
    print(json.dumps({"twophase_mono_mean": round(float(mono.mean()), 5),
                      "twophase_two_mean": round(float(two.mean()), 5),
                      "abs_mean_diff": round(dm, 5)}), flush=True)
    # MC estimator parity: means over 180k samples agree within noise
    assert dm < 0.01, (mono.mean(), two.mean())

    # --- 4. two-phase record + replay value check ---
    from raytracingproject_tpu.grad.inverse import extract_params
    from raytracingproject_tpu.grad.replay import replay_radiance_twophase

    params = extract_params(rcover)
    rad, res1, res2, src, dest, n_alive = pallas_trace_record_twophase(
        o, d, t, rcover, jnp.int32(13), 16, cut=4, front=front,
    )
    rep = np.asarray(jax.jit(replay_radiance_twophase, static_argnames=())(
        params, rcover, o, d, t, res1, res2, src, dest, n_alive
    ))
    radn = np.asarray(rad)
    err = np.abs(rep - radn).max(axis=-1)
    # Percentile gate, not max: replay-vs-kernel f32 drift on the deepest
    # glass paths reaches ~5% on a handful of rays and is IDENTICAL across
    # monolithic/two-phase x brute/front (measured 2026-08-21: all four
    # variants maxrel 0.056926, p999 4.5e-5, frac>1e-3 = 3.3e-5) — a
    # property of the estimator pair, not of any pipeline.
    p999 = float(np.quantile(err, 0.999))
    frac_bad = float((err > 1e-3).mean())
    frac_alive = float(np.asarray(n_alive)) / res1.idx.shape[1]
    print(json.dumps({"replay_vs_recorded_p999": round(p999, 6),
                      "replay_frac_gt_1e3": round(frac_bad, 6),
                      "survivor_frac_after_cut4": round(frac_alive, 4)}),
          flush=True)
    assert p999 < 1e-3 and frac_bad < 1e-3, (p999, frac_bad)
    print(json.dumps({"verify_r5": "ok"}), flush=True)


if __name__ == "__main__":
    main()
