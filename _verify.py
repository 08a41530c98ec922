import time, jax, jax.numpy as jnp
from raytracingproject_tpu.camera import Camera
from raytracingproject_tpu.render import render_pass
from raytracingproject_tpu.scene import make_cover_scene

W,H,DEPTH,SPP = 400,225,16,4
scene = make_cover_scene(seed=0)
cam = Camera(aspect_ratio=16/9, image_width=W, samples_per_pixel=SPP, max_depth=DEPTH,
             vfov=20.0, lookfrom=(13.,2.,3.), lookat=(0.,0.,0.),
             defocus_angle=0.6, focus_dist=10.0).derive()
mega = lambda k: render_pass(scene, cam, k, width=W, height=H, max_depth=DEPTH, spp_chunk=SPP, use_megakernel=True)
xla  = lambda k: render_pass(scene, cam, k, width=W, height=H, max_depth=DEPTH, spp_chunk=SPP, early_exit=True)
img_m = mega(jax.random.PRNGKey(0)).block_until_ready()
img_x = xla(jax.random.PRNGKey(0)).block_until_ready()
print("mega mean/std:", float(img_m.mean()/SPP), float(img_m.std()/SPP))
print("xla  mean/std:", float(img_x.mean()/SPP), float(img_x.std()/SPP))
print("mean abs diff of means:", float(jnp.abs(img_m.mean(0).mean(0)-img_x.mean(0).mean(0)).max()/SPP))
# strictly synchronous single-pass timing
for name, f in [("mega", mega), ("xla_early", xla)]:
    ts = []
    for i in range(8):
        k = jax.random.PRNGKey(100+i)
        t0 = time.perf_counter(); f(k).block_until_ready(); ts.append(time.perf_counter()-t0)
    ts_ms = ", ".join(f"{t*1e3:.1f}" for t in ts)
    best = min(ts)
    print(f"{name}: per-pass ms [{ts_ms}] -> best {W*H*SPP/best/1e6:.1f} Mrays/s", flush=True)
