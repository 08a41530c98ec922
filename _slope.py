import time, os, functools, jax, jax.numpy as jnp
from raytracingproject_tpu.camera import Camera, generate_rays
from raytracingproject_tpu.render import ray_color
from raytracingproject_tpu.scene import make_cover_scene
from raytracingproject_tpu.ops.pallas.megakernel import pallas_trace_paths

W,H,DEPTH,SPP = 400,225,16,4
scene = make_cover_scene(seed=0)
cam = Camera(aspect_ratio=16/9, image_width=W, samples_per_pixel=SPP, max_depth=DEPTH,
             vfov=20.0, lookfrom=(13.,2.,3.), lookat=(0.,0.,0.),
             defocus_angle=0.6, focus_dist=10.0).derive()
jj, ii = jnp.meshgrid(jnp.arange(H, dtype=jnp.int32), jnp.arange(W, dtype=jnp.int32), indexing="ij")
i_idx = jnp.tile(ii.reshape(-1), SPP); j_idx = jnp.tile(jj.reshape(-1), SPP)

@functools.partial(jax.jit, static_argnames=("passes","mode"))
def render_loop(key, passes, mode):
    def body(acc, p):
        k = jax.random.fold_in(key, p)
        k_ray, k_path = jax.random.split(k)
        o, d, t = generate_rays(cam, i_idx, j_idx, k_ray)
        if mode == "mega":
            seed = jax.random.randint(k_path, (), 0, 2**31 - 1)
            rad = pallas_trace_paths(o, d, t, scene, seed, DEPTH)
        else:
            rad = ray_color(scene, o, d, t, k_path, DEPTH, early_exit=(mode=="early"))
        return acc + rad.sum(), None
    acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(passes))
    return acc

salt = int.from_bytes(os.urandom(4), "little") % (2**30)
def timed(mode, passes):
    k = jax.random.PRNGKey(salt + passes)
    t0 = time.perf_counter(); s = float(render_loop(k, passes, mode)); return time.perf_counter()-t0, s

for mode, k1, k2 in [("mega", 8, 24), ("early", 2, 6), ("scan", 2, 6)]:
    timed(mode, k1)  # compile both shapes
    timed(mode, k2)
    d1, _ = timed(mode, k1)
    d2, _ = timed(mode, k2)
    marginal = (d2 - d1) / (k2 - k1)
    print(f"{mode}: dt({k1})={d1:.2f}s dt({k2})={d2:.2f}s -> {W*H*SPP/marginal/1e6:.2f} Mrays/s device-true", flush=True)
