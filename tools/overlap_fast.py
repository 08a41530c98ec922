"""AOT multi-chip evidence for the PRODUCTION path (round-4 VERDICT #6).

OVERLAP_r02 analyzed the XLA train step's collectives; this compiles the
megakernel-forward / replay-backward sharded train step (the path
production training actually runs: front-culled recording forward,
two-phase option, shard_map psum-transpose gradients) AOT for a v5e 2x4
topology with the real TPU compiler, then records:

- the collective census (async pairs vs sync, bytes) — overlap_hlo.analyze
- per-device compiled memory (argument/output/temp/generated-code bytes)
  from the compiled executable's memory analysis

Cover-scene scale; the flagship 1200x675 config is attempted first and the
400x225 config recorded as fallback if the AOT compile of the big grid
fails. Run: python -m tools.overlap_fast (1-chip host is fine).
"""

from __future__ import annotations

import json
import os

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from raytracingproject_tpu.bvh import build_bvh, reorder_scene
from raytracingproject_tpu.camera import Camera
from raytracingproject_tpu.ops.pallas.megakernel import front_tables
from raytracingproject_tpu.parallel import make_mesh, make_sharded_train_step
from raytracingproject_tpu.scene import make_cover_scene
from tools.overlap_hlo import analyze, tpu_topology_mesh

COVER_CAM = dict(vfov=20.0, lookfrom=(13.0, 2.0, 3.0), lookat=(0.0, 0.0, 0.0),
                 defocus_angle=0.6, focus_dist=10.0)


def compile_config(mesh, width: int, depth: int, spp: int, two_phase):
    scene = make_cover_scene(seed=0)
    bvh = build_bvh(scene, leaf_size=8)
    rscene = reorder_scene(scene, bvh)
    front = front_tables(rscene, bvh, order_point=COVER_CAM["lookfrom"])
    cam = Camera(aspect_ratio=16.0 / 9.0, image_width=width,
                 samples_per_pixel=spp, max_depth=depth, **COVER_CAM)
    params, opt_state, step = make_sharded_train_step(
        rscene, cam, mesh, spp=spp, trainable=("albedo", "fuzz", "ior"),
        use_megakernel=True, front=front, two_phase=two_phase,
    )
    target = jnp.zeros((cam.image_height, width, 3), jnp.float32)
    key = jax.random.PRNGKey(0)
    sds = lambda t: jax.tree.map(  # noqa: E731
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), t
    )
    compiled = (
        jax.jit(step)
        .lower(sds(params), sds(opt_state), sds(key), sds(target))
        .compile()
    )
    hlo = compiled.as_text()
    out = {
        "config": f"cover_{width}_d{depth}_spp{spp}"
                  + (f"_twophase{two_phase}" if two_phase else ""),
        "n_spheres": int(scene.radius.shape[0]),
        "scheduled": "is_scheduled=true" in hlo.splitlines()[0],
    }
    out.update(analyze(hlo))
    try:
        ma = compiled.memory_analysis()
        out["device_memory"] = {
            "argument_bytes": int(ma.argument_size_in_bytes),
            "output_bytes": int(ma.output_size_in_bytes),
            "temp_bytes": int(ma.temp_size_in_bytes),
            "generated_code_bytes": int(ma.generated_code_size_in_bytes),
        }
    except Exception as e:
        out["device_memory_error"] = f"{type(e).__name__}: {e}"
    return out


def main() -> None:
    mesh = tpu_topology_mesh()
    compiler = "tpu_aot_v5e:2x4"
    if mesh is None:
        mesh = make_mesh(devices=jax.devices()[:8], samples_axis_size=2)
        compiler = "xla_cpu_virtual8"
    result = {"compiler": compiler, "mesh": dict(mesh.shape),
              "path": "megakernel_front fwd + path-replay bwd (grad/fast)",
              "configs": []}
    # flagship first; smaller config as guaranteed row
    for width, depth, spp, tp in ((1200, 50, 8, 4), (400, 16, 8, 4),
                                  (400, 16, 8, None)):
        try:
            row = compile_config(mesh, width, depth, spp, tp)
        except Exception as e:
            row = {"config": f"cover_{width}_d{depth}_spp{spp}"
                             + (f"_twophase{tp}" if tp else ""),
                   "error": f"{type(e).__name__}: {str(e).splitlines()[0][:160]}"}
        print(json.dumps(row), flush=True)
        result["configs"].append(row)

    ok = [r for r in result["configs"] if "error" not in r]
    if ok:
        r0 = ok[0]
        result["verdict"] = (
            "async overlap present" if r0["n_async"] else
            "collectives synchronous: grad payload is KB-scale on ICI, "
            "overlap immaterial (same conclusion as OVERLAP_r02 for the "
            "XLA step, now evidenced for the production fast path)"
        )

    from tools.artifact import artifact_path

    path = artifact_path("OVERLAP")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"artifact": path}), flush=True)


if __name__ == "__main__":
    main()
