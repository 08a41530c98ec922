import time, os, jax, jax.numpy as jnp
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
salt = int.from_bytes(os.urandom(4), "little") % (2**30)

# 1) loop with host-fetch of a scalar at the end (true dependency)
N = 20
t0 = time.perf_counter()
acc = None
for i in range(N):
    out = f(jax.random.PRNGKey(salt + i))
    acc = out if acc is None else acc + out
s = float(acc.sum())   # host transfer forces full completion
dt = time.perf_counter() - t0
print(f"true fwd: {N} passes in {dt:.3f}s -> {W*H*SPP*N/dt/1e6:.1f} Mrays/s (checksum {s:.1f})", flush=True)

# 2) calibrate: known-flops elementwise chain
x = jax.random.normal(jax.random.PRNGKey(salt), (8192, 1024), jnp.float32)
@jax.jit
def chain(x):
    def body(i, x): return x * 1.000001 + 0.000001
    return jax.lax.fori_loop(0, 1000, body, x)
chain(x).block_until_ready()
t0 = time.perf_counter(); y = chain(x); s2 = float(y.sum()); dt = time.perf_counter()-t0
flops = 8192*1024*1000*2
print(f"elementwise: {flops/dt/1e12:.2f} Tflop/s f32 (dt {dt*1e3:.1f}ms, checksum {s2:.1f})", flush=True)

# 3) tunnel RTT
t0 = time.perf_counter(); _ = float(jnp.zeros(()).sum()); rtt = time.perf_counter()-t0
print(f"rtt-ish: {rtt*1e3:.1f}ms")
