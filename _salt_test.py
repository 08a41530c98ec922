import time, os, jax
import bench
from raytracingproject_tpu.camera import Camera
from raytracingproject_tpu.render import render_pass
from raytracingproject_tpu.scene import make_cover_scene
W,H,DEPTH,SPP = 400,225,16,4
scene = make_cover_scene(seed=0)
cam = Camera(aspect_ratio=16/9, image_width=W, samples_per_pixel=SPP, max_depth=DEPTH,
             vfov=20.0, lookfrom=(13.,2.,3.), lookat=(0.,0.,0.),
             defocus_angle=0.6, focus_dist=10.0).derive()
f = lambda k: render_pass(scene, cam, k, width=W, height=H, max_depth=DEPTH, spp_chunk=SPP, use_megakernel=True)
f(jax.random.PRNGKey(0)).block_until_ready()
salt = int.from_bytes(os.urandom(4), "little")
# fresh keys
for i in range(3):
    t0=time.perf_counter(); f(jax.random.PRNGKey(salt+i)).block_until_ready()
    print(f"fresh key {i}: {time.perf_counter()-t0:.3f}s", flush=True)
# seen keys (1..3 were used by bench.py runs)
for i in range(1,4):
    t0=time.perf_counter(); f(jax.random.PRNGKey(i)).block_until_ready()
    print(f"seen key {i}: {time.perf_counter()-t0:.3f}s", flush=True)
# repeat a fresh key (now seen once in THIS process)
t0=time.perf_counter(); f(jax.random.PRNGKey(salt)).block_until_ready()
print(f"repeat fresh key: {time.perf_counter()-t0:.3f}s", flush=True)
