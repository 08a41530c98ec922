"""Full-path megakernel: brute vs front-culled closest hit, device-true.

Measures pallas_trace_paths (the whole bounce loop, depth 16) on the cover
scene (~488 spheres) and a 5000-sphere random scene, with the honest
scan-marginal host-fetch methodology (tools/measure.py).

Usage: python tools/bench_front_full.py [n_extra_spheres ...]
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

from raytracingproject_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from raytracingproject_tpu.bvh import build_bvh, reorder_scene
from raytracingproject_tpu.camera import Camera, generate_rays
from raytracingproject_tpu.ops.pallas.megakernel import (
    default_front_nodes, front_tables, front_tables_hbm, pallas_trace_paths,
)
from raytracingproject_tpu.scene import make_cover_scene, make_random_scene
from tools.measure import marginal_seconds_per_pass

W, H, DEPTH = 400, 225, 16


ROWS: list[dict] = []


CAM_POS = (13.0, 2.0, 3.0)


def bench_scene(scene, tag: str, fronts=(None,), unordered_control=False) -> None:
    """Measures the PRODUCTION path (render_pass: block-tiled rays +
    megakernel) so numbers reflect what render() users get.

    Fronts are built camera-distance-ordered (near-to-far best-t culling,
    bvh.bvh_front order_point); `unordered_control=True` additionally
    measures the first front size with the round-3 leaf ordering so the
    ordering win is isolated in the artifact."""
    from raytracingproject_tpu.render import render_pass

    n = int(scene.radius.shape[0])
    cam = Camera(
        aspect_ratio=16 / 9, image_width=W, samples_per_pixel=1, max_depth=DEPTH,
        vfov=20.0, lookfrom=CAM_POS, lookat=(0.0, 0.0, 0.0),
        defocus_angle=0.6, focus_dist=10.0,
    ).derive()
    rays = W * H

    bvh = build_bvh(scene, leaf_size=8)
    rscene = reorder_scene(scene, bvh)

    brute = None
    try:
        def make_brute(key):
            return render_pass(rscene, cam, key, width=W, height=H,
                               max_depth=DEPTH, use_megakernel=True)

        sec, _ = marginal_seconds_per_pass(make_brute, k1=4, k2=12, reps=3)
        brute = rays / sec
        ROWS.append({"scene": tag, "n": n, "path": "brute",
                     "mrays_per_s": round(brute / 1e6, 2)})
        print(json.dumps(ROWS[-1]), flush=True)
    except Exception as e:  # >16k spheres: brute's SMEM table cannot exist
        import re as _re

        msg = _re.sub(r"\x1b\[[0-9;]*m", "", str(e)).split("\n")[0][:120]
        row = {"scene": tag, "n": n, "path": "brute", "error": msg}
        ROWS.append(row)
        print(json.dumps(row), flush=True)

    # (front_size, order_point, repack, sub_block, word_earlyout, two_phase)
    variants = [(f, CAM_POS, 1, False, False, 0) for f in fronts]
    # intra-word best-t re-packing on the default front size (the lever
    # that makes distance ordering pay inside a single 24-subtree word)
    variants += [(fronts[0], CAM_POS, rp, False, False, 0) for rp in (2, 3)]
    if unordered_control:
        variants.append((fronts[0], None, 1, False, False, 0))
    # round-5 additions: per-word best-t early-out, sub-block descent
    # (with BIGGER subtrees — fewer words + intra-subtree culling), and the
    # death-coherent two-phase pipeline composed with the front
    variants += [
        (fronts[0], CAM_POS, 2, False, True, 0),
        (fronts[0], CAM_POS, 2, False, False, 4),
        (fronts[0], CAM_POS, 2, False, True, 4),
    ]
    if n > 1000:
        big = max(24, (n // 100 // 24) * 24)  # ~100 spheres/subtree
        mid = max(24, (n // 52 // 24) * 24)   # ~52 spheres/subtree
        variants += [
            (big, CAM_POS, 1, True, True, 0),
            (mid, CAM_POS, 1, True, True, 0),
            (mid, CAM_POS, 1, True, True, 4),
        ]
    seen = set()
    for f, op, rp, sb, weo, tp in variants:
        fn = default_front_nodes(n) if f is None else f
        key_v = (fn, op, rp, sb, weo, tp)
        if key_v in seen:
            continue
        seen.add(key_v)
        suffix = "" if op is not None else "_unordered"
        if rp > 1:
            suffix += f"_rp{rp}"
        if sb:
            suffix += "_sub"
        if weo:
            suffix += "_weo"
        if tp:
            suffix += f"_tp{tp}"
        try:
            try:
                front = front_tables(rscene, bvh, max_nodes=fn,
                                     order_point=op, repack=rp, sub_block=sb,
                                     word_earlyout=weo)
                label = f"front_{fn}{suffix}"
            except ValueError:
                front = front_tables_hbm(rscene, bvh, max_nodes=fn,
                                         order_point=op, word_earlyout=weo,
                                         sub_block=sb)
                # repack is a SMEM-front knob; drop it from the HBM label
                label = f"front_hbm_{front.ff.shape[1]}" \
                    + suffix.replace("_rp2", "").replace("_rp3", "")
        except Exception as e:
            # a front that cannot BUILD at this size (e.g. a subtree
            # overflowing the HBM block) is a row, not a crashed phase
            row = {"scene": tag, "n": n, "path": f"front_{fn}{suffix}",
                   "error": str(e).split("\n")[0][:120]}
            ROWS.append(row)
            print(json.dumps(row), flush=True)
            continue

        def make_front(key, front=front, tp=tp):
            return render_pass(rscene, cam, key, width=W, height=H,
                               max_depth=DEPTH, use_megakernel=True,
                               front=front, two_phase=tp)

        try:
            sec, _ = marginal_seconds_per_pass(make_front, k1=4, k2=12, reps=3)
        except Exception as e:
            row = {"scene": tag, "n": n, "path": label,
                   "error": str(e).split("\n")[0][:120]}
            ROWS.append(row)
            print(json.dumps(row), flush=True)
            continue
        fr = rays / sec
        row = {"scene": tag, "n": n, "path": label,
               "mrays_per_s": round(fr / 1e6, 2)}
        if brute:
            row["vs_brute"] = round(fr / brute, 2)
        ROWS.append(row)
        print(json.dumps(row), flush=True)


def _write_artifact() -> None:
    # per-round artifact (round-2 VERDICT #3 asked for committed evidence
    # of front scaling at 5k/50k spheres); round number from the shared
    # helper so companion artifacts agree (advisor round-3 finding)
    from tools.artifact import artifact_path

    with open(artifact_path("FRONT"), "w") as f:
        json.dump({"depth": DEPTH, "resolution": f"{W}x{H}", "rows": ROWS},
                  f, indent=1)


def main() -> None:
    extras = [int(a) for a in sys.argv[1:]] or [0, 5000]
    for ne in extras:
        try:
            if ne == 0:
                bench_scene(make_cover_scene(seed=0), "cover488",
                            fronts=(None, 48, 96), unordered_control=True)
            elif ne <= 15000:
                bench_scene(make_random_scene(ne, seed=3), f"random{ne}",
                            fronts=(None, 384, 624), unordered_control=True)
            else:
                bench_scene(make_random_scene(ne, seed=3), f"random{ne}",
                            fronts=(None,), unordered_control=True)
        finally:
            _write_artifact()  # partial rows survive a crashed scene


if __name__ == "__main__":
    main()
