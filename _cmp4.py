import time, jax, jax.numpy as jnp
from raytracingproject_tpu.camera import Camera, generate_rays
from raytracingproject_tpu.render import render_pass
from raytracingproject_tpu.scene import make_cover_scene
from raytracingproject_tpu.ops.pallas.megakernel import pallas_trace_paths

W,H,DEPTH,SPP = 400,225,16,4
scene = make_cover_scene(seed=0)
cam = Camera(aspect_ratio=16/9, image_width=W, samples_per_pixel=SPP, max_depth=DEPTH,
             vfov=20.0, lookfrom=(13.,2.,3.), lookat=(0.,0.,0.),
             defocus_angle=0.6, focus_dist=10.0).derive()
jj, ii = jnp.meshgrid(jnp.arange(H, dtype=jnp.int32), jnp.arange(W, dtype=jnp.int32), indexing="ij")
i_idx = jnp.tile(ii.reshape(-1), SPP); j_idx = jnp.tile(jj.reshape(-1), SPP)

@jax.jit
def mega(key):
    k_ray, k_path = jax.random.split(key)
    o, d, t = generate_rays(cam, i_idx, j_idx, k_ray)
    seed = jax.random.randint(k_path, (), 0, 2**31 - 1)
    return pallas_trace_paths(o, d, t, scene, seed, DEPTH).reshape(SPP, H, W, 3).sum(0)

early = lambda k: render_pass(scene, cam, k, width=W, height=H, max_depth=DEPTH, spp_chunk=SPP, early_exit=True)

mega(jax.random.PRNGKey(0)).block_until_ready()
early(jax.random.PRNGKey(0)).block_until_ready()

def one(f, n=10):
    t0=time.perf_counter(); acc=None
    for i in range(n):
        out=f(jax.random.PRNGKey(i+1)); acc = out if acc is None else acc+out
    acc.block_until_ready()
    return W*H*SPP*n/(time.perf_counter()-t0)/1e6

for rep in range(6):
    m = one(mega); e = one(early)
    print(f"rep{rep}: mega={m:8.2f}  early={e:8.2f} Mrays/s", flush=True)
