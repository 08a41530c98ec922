"""Measured evidence replacing the round-1 "overlapped all-reduce" claim.

Round 1 shipped the assertion (parallel/shard.py docstring) that "XLA async
collectives overlap the grad all-reduce with the backward sweep" with no
artifact behind it. This tool AOT-compiles the ACTUAL sharded train step
(`make_sharded_train_step`, cover scene) for an 8-chip v5e topology with the
REAL TPU compiler (jax.experimental.topologies — works on a 1-chip host) and
inspects the optimized, scheduled HLO:

- count `all-reduce-start`/`-done` pairs (async, overlappable) vs plain
  `all-reduce` (synchronous), and the instruction window inside each pair;
- record the byte size of every gradient collective.

Measured result (v5e:2x4, cover scene, 488 spheres): the compiler emits TWO
synchronous all-reduces totalling a few KB — the parameter gradients of a
488-sphere scene are ~14 KB, so the collective is microseconds on ICI and
the latency-hiding scheduler rightly declines to async it (also when asked:
xla_tpu_enable_async_collective_fusion changes nothing). Overlap is
IMMATERIAL for this workload class; the honest scaling story is that the
gradient collective is negligible, not that it is hidden. parallel/shard.py
cites this artifact instead of the old claim.

Run: python tools/overlap_hlo.py   (1-chip host is fine; CPU-mesh fallback)
"""

from __future__ import annotations

import glob
import json
import os
import re

# sitecustomize already consumed JAX_PLATFORMS, so pin CPU via jax.config
# (same dance as tests/conftest.py); the XLA flag must still be in the env
# before the CPU client initializes.
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from raytracingproject_tpu.camera import Camera
from raytracingproject_tpu.parallel import make_mesh, make_sharded_train_step
from raytracingproject_tpu.scene import make_cover_scene

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1}


def _shape_bytes(sig: str) -> int:
    """Sum buffer bytes of every `dtype[dims]` group in an HLO type string."""
    total = 0
    for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", sig):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES.get(dt, 4)
    return total


def analyze(hlo: str) -> dict:
    """Collective census of a scheduled HLO module: async start/done pairs
    (with the instruction window available for overlap) vs sync ops."""
    lines = hlo.splitlines()
    op_re = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.*?)\s+([\w\-]+)\(")
    starts: dict[str, int] = {}
    pairs, sync = [], []
    for idx, line in enumerate(lines):
        m = op_re.match(line)
        if not m:
            continue
        name, sig, op = m.groups()
        if op.endswith(("-start",)) and op.startswith(("all-reduce", "all-gather", "reduce-scatter")):
            starts[name] = idx
        elif op.endswith("-done") and op.startswith(("all-reduce", "all-gather", "reduce-scatter")):
            for sname, sidx in starts.items():
                if sname in line:
                    window = sum(
                        1 for l in lines[sidx + 1 : idx] if op_re.match(l)
                    )
                    pairs.append(
                        {"op": op[: -len("-done")], "overlap_window_ops": window,
                         "bytes": _shape_bytes(sig)}
                    )
        elif op in ("all-reduce", "all-gather", "reduce-scatter"):
            sync.append({"op": op, "name": name, "bytes": _shape_bytes(sig)})
    return {
        "async_pairs": pairs,
        "sync_collectives": sync,
        "n_async": len(pairs),
        "n_sync": len(sync),
        "sync_bytes_total": sum(s["bytes"] for s in sync),
        "max_overlap_window_ops": max((p["overlap_window_ops"] for p in pairs), default=0),
    }


def tpu_topology_mesh():
    """8-chip v5e mesh from an AOT topology description — lets the REAL TPU
    compiler (latency-hiding scheduler included) compile the multi-chip
    program on a 1-chip host. Returns None when unavailable."""
    try:
        from jax.experimental import topologies
        from jax.sharding import Mesh
        import numpy as np

        topo = topologies.get_topology_desc(topology_name="v5e:2x4", platform="tpu")
        return Mesh(np.array(topo.devices).reshape(4, 2), ("rays", "samples"))
    except Exception as e:  # no AOT support in this env
        print(f"# TPU topology unavailable ({type(e).__name__}: {e}); CPU fallback")
        return None


def main() -> None:
    mesh = tpu_topology_mesh()
    compiler = "tpu_aot_v5e:2x4"
    if mesh is None:
        mesh = make_mesh(devices=jax.devices()[:8], samples_axis_size=2)
        compiler = "xla_cpu_virtual8"
    scene = make_cover_scene(seed=0)
    cam = Camera(
        aspect_ratio=16.0 / 9.0,
        image_width=256,
        samples_per_pixel=8,
        max_depth=6,
        vfov=20.0,
        lookfrom=(13.0, 2.0, 3.0),
        lookat=(0.0, 0.0, 0.0),
        defocus_angle=0.6,
        focus_dist=10.0,
    )
    params, opt_state, step = make_sharded_train_step(
        scene, cam, mesh, spp=8, trainable=("albedo", "center0", "radius")
    )
    target = jnp.zeros((cam.image_height, 256, 3), jnp.float32)
    key = jax.random.PRNGKey(0)
    # Abstract args: AOT-topology devices cannot hold concrete buffers.
    sds = lambda t: jax.tree.map(  # noqa: E731
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), t
    )
    compiled = (
        jax.jit(step).lower(sds(params), sds(opt_state), sds(key), sds(target)).compile()
    )
    hlo = compiled.as_text()

    grad_floats = sum(
        int(jnp.size(v)) for v in params._asdict().values()
    )
    out = {
        "compiler": compiler,
        "mesh": dict(mesh.shape),
        "n_spheres": int(scene.radius.shape[0]),
        "grad_param_bytes": grad_floats * 4,
        "scheduled": "is_scheduled=true" in hlo.splitlines()[0],
    }
    out.update(analyze(hlo))
    out["verdict"] = (
        "async overlap present" if out["n_async"] else
        "collectives synchronous: grad payload is KB-scale, overlap immaterial"
    )
    print(json.dumps(out, indent=1))

    rounds = [
        int(m.group(1))
        for f in glob.glob("/root/repo/BENCH_r*.json")
        if (m := re.search(r"BENCH_r(\d+)", f))
    ]
    n_round = (max(rounds) + 1) if rounds else 0
    with open(f"/root/repo/OVERLAP_r{n_round:02d}.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
