"""The megakernel renderer: jitted, differentiable path tracing.

The reference's recursive `ray_color` (src/camera_cpu.h:8-26) becomes a
`lax.scan` over bounce depth carrying (origin, direction, throughput,
radiance, alive). All rays advance in lockstep; terminated rays are masked.
This is the correctness oracle and the gradient path — the Pallas wavefront
kernels (ops/pallas/) are the speed path and are validated against this.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from raytracingproject_tpu.camera import Camera, CameraDerived, generate_rays
from raytracingproject_tpu.config import RenderSettings, T_MIN
from raytracingproject_tpu.materials import scatter
from raytracingproject_tpu.ops.intersect import closest_hit
from raytracingproject_tpu.ops.vecmath import normalize
from raytracingproject_tpu.scene import Scene

SKY_WHITE = (1.0, 1.0, 1.0)
SKY_BLUE = (0.5, 0.7, 1.0)


def sky_color(direction: jnp.ndarray, sky_tex: jnp.ndarray | None = None) -> jnp.ndarray:
    """Background radiance for a miss ray.

    Default: the reference's gradient (src/camera_cpu.h:23-25):
    lerp(white, (0.5,0.7,1.0)) by 0.5*(unit_dir.y + 1).

    With `sky_tex` ([Ht, Wt, 3] linear float): an equirectangular
    environment-map lookup (bilinear in the texture plane). This is the
    TPU-native role for the session's `add_texture` (the reference loads,
    transitions, and *displays* its texture, src/vulkan/texture.cpp:9-43 +
    frag binding 1; here the honest path-tracing equivalent is an
    environment light sampled on miss)."""
    unit = normalize(direction, eps=1e-12)
    if sky_tex is None:
        a = 0.5 * (unit[..., 1] + 1.0)
        white = jnp.asarray(SKY_WHITE, direction.dtype)
        blue = jnp.asarray(SKY_BLUE, direction.dtype)
        return (1.0 - a)[..., None] * white + a[..., None] * blue

    ht, wt = sky_tex.shape[0], sky_tex.shape[1]
    # equirectangular: u from azimuth, v from polar angle (y-up)
    u = 0.5 + jnp.arctan2(unit[..., 2], unit[..., 0]) / (2.0 * jnp.pi)
    v = jnp.arccos(jnp.clip(unit[..., 1], -1.0, 1.0)) / jnp.pi
    x = u * (wt - 1)
    y = v * (ht - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, wt - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, ht - 1)
    x1 = jnp.minimum(x0 + 1, wt - 1)
    y1 = jnp.minimum(y0 + 1, ht - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    flat = sky_tex.reshape(-1, 3)
    c00 = jnp.take(flat, y0 * wt + x0, axis=0)
    c01 = jnp.take(flat, y0 * wt + x1, axis=0)
    c10 = jnp.take(flat, y1 * wt + x0, axis=0)
    c11 = jnp.take(flat, y1 * wt + x1, axis=0)
    top = c00 * (1 - fx) + c01 * fx
    bot = c10 * (1 - fx) + c11 * fx
    return (top * (1 - fy) + bot * fy).astype(direction.dtype)


class _PathState(NamedTuple):
    origin: jnp.ndarray      # [R, 3]
    direction: jnp.ndarray   # [R, 3]
    throughput: jnp.ndarray  # [R, 3] product of attenuations so far
    radiance: jnp.ndarray    # [R, 3] accumulated light
    alive: jnp.ndarray       # [R] bool — still bouncing


def _bounce(
    scene: Scene,
    time: jnp.ndarray,
    state: _PathState,
    key: jax.Array,
    bvh=None,
    use_pallas: bool = False,
    sky_tex: jnp.ndarray | None = None,
) -> _PathState:
    """One bounce of every live ray: closest hit (brute-force scan, BVH
    traversal, or the fused Pallas kernel), scatter or sky."""
    if use_pallas:
        from raytracingproject_tpu.ops.pallas.trace import pallas_closest_hit

        rec = pallas_closest_hit(state.origin, state.direction, time, scene, t_min=T_MIN)
    elif bvh is not None:
        from raytracingproject_tpu.bvh import bvh_closest_hit

        rec = bvh_closest_hit(
            state.origin, state.direction, time, scene, bvh, t_min=T_MIN
        )
    else:
        rec = closest_hit(
            state.origin,
            state.direction,
            time,
            scene.center0,
            scene.center_delta,
            scene.radius,
            t_min=T_MIN,
        )
    sc = scatter(key, state.direction, rec, scene)

    miss = state.alive & ~rec.hit
    # On miss: add throughput * sky and retire (src/camera_cpu.h:23-25).
    radiance = state.radiance + jnp.where(
        miss[..., None], state.throughput * sky_color(state.direction, sky_tex), 0.0
    )
    # On hit: multiply throughput by attenuation; absorb (metal below
    # hemisphere) retires the ray with no contribution (src/camera_cpu.h:20).
    hit_live = state.alive & rec.hit
    throughput = jnp.where(
        hit_live[..., None], state.throughput * sc.attenuation, state.throughput
    )
    alive = hit_live & sc.scattered

    origin = jnp.where(hit_live[..., None], rec.p, state.origin)
    direction = jnp.where(hit_live[..., None], sc.direction, state.direction)
    return _PathState(origin, direction, throughput, radiance, alive)


def ray_color(
    scene: Scene,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    time: jnp.ndarray,
    key: jax.Array,
    max_depth: int,
    bvh=None,
    early_exit: bool = False,
    use_pallas: bool = False,
    sky_tex: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Radiance for a batch of rays — iterative counterpart of the
    reference's depth-limited recursion (src/camera_cpu.h:8-26). Rays still
    alive after `max_depth` bounces contribute black (depth exhausted).

    `bvh` (a FlatBVH built over `scene` — scene must already be in leaf
    order, see bvh.reorder_scene) switches closest-hit to the stackless
    traversal; forward-only (while_loop is not reverse-differentiable).

    `early_exit=True` runs the bounce loop as a while_loop that stops when
    every ray has terminated — identical radiance (bounce k consumes the
    same fold_in(key, k) stream either way), but typical scenes finish in
    2-4 bounces, not max_depth. Forward-only."""
    n = origin.shape[0]
    dtype = origin.dtype
    state = _PathState(
        origin=origin,
        direction=direction,
        throughput=jnp.ones((n, 3), dtype),
        radiance=jnp.zeros((n, 3), dtype),
        alive=jnp.ones((n,), bool),
    )

    if early_exit:
        def cond(carry):
            depth, state = carry
            return (depth < max_depth) & jnp.any(state.alive)

        def body(carry):
            depth, state = carry
            k = jax.random.fold_in(key, depth)
            return depth + 1, _bounce(scene, time, state, k, bvh, use_pallas, sky_tex)

        _, state = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
        return state.radiance

    def step(state, depth):
        k = jax.random.fold_in(key, depth)
        return _bounce(scene, time, state, k, bvh, use_pallas, sky_tex), None

    state, _ = jax.lax.scan(step, state, jnp.arange(max_depth))
    return state.radiance


@lru_cache(maxsize=None)
def _block_order(width: int, height: int, spp: int = 1, tile: int = 1024):
    """(slot_pix, gather): ray ordering that feeds the Pallas megakernel in
    compact screen blocks.

    The kernel processes rays in consecutive `tile`-ray (1024) chunks; in
    row-major order a chunk spans 2.5 image rows, so its rays fan across
    the whole width and touch many BVH-front subtrees. Here rays are
    ordered block-by-block — all `spp` samples of one bxb pixel block
    consecutively — with b chosen so one block's rays fill about one tile
    (32x32 for spp 1, 16x16 for spp 4): a chunk's spatial footprint is one
    small screen block and the front culling skips far more subtrees.
    (A sample-major layout — whole 32x32-block image per sample plane —
    was measured on hardware in round 3: the cheaper output reshape did
    not pay for the 4x larger per-tile footprint; interleaved wins.)

    `slot_pix[r]` is the row-major pixel id ray slot r renders (padded to a
    `tile` multiple with pixel 0, dropped on unpermute); `gather[s, p]` is
    the slot of (sample s, pixel p), so `rad[gather]` restores [spp, H*W]
    row-major order. The unpermute gather costs ~10 ns/ray on the tunneled
    v5e — render() therefore accumulates in SLOT space across sample
    chunks (render_pass(raw_slots=True)) and unpermutes once per frame."""
    import numpy as np

    b = 32
    while b > 8 and b * b * spp > tile:
        b //= 2
    idx = np.arange(width * height, dtype=np.int64).reshape(height, width)
    slots = []
    gather = np.empty((spp, width * height), np.int64)
    pos = 0
    for by in range(0, height, b):
        for bx in range(0, width, b):
            blk = idx[by : by + b, bx : bx + b].reshape(-1)
            for s in range(spp):
                gather[s, blk] = pos + np.arange(blk.size)
                slots.append(blk)
                pos += blk.size
    slot_pix = np.concatenate(slots)
    pad = (-slot_pix.size) % tile
    if pad:
        slot_pix = np.concatenate([slot_pix, np.zeros(pad, np.int64)])
    return slot_pix.astype(np.int32), gather.astype(np.int32)


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "max_depth", "spp_chunk", "early_exit", "use_pallas",
        "use_megakernel", "depth_segment", "two_phase", "raw_slots",
    ),
)
def render_pass(
    scene: Scene,
    cam: CameraDerived,
    key: jax.Array,
    *,
    width: int,
    height: int,
    max_depth: int,
    spp_chunk: int = 1,
    bvh=None,
    front=None,
    early_exit: bool = False,
    use_pallas: bool = False,
    use_megakernel: bool = False,
    depth_segment: int = 0,
    two_phase: int = 0,
    sky_tex: jnp.ndarray | None = None,
    raw_slots: bool = False,
) -> jnp.ndarray:
    """`spp_chunk` samples of every pixel; returns the radiance *sum*
    [H, W, 3] over the chunk (caller divides by total spp, as
    src/color.h:20-22).

    `use_megakernel=True` runs the full bounce loop inside one Pallas TPU
    kernel (ops/pallas/megakernel.py) — the fastest forward path: rays stay
    in VMEM/registers from camera ray to radiance, the scene table lives in
    SMEM, and RNG is the per-core hardware PRNG. Forward-only.
    """
    if raw_slots and not use_megakernel:
        raise ValueError("raw_slots (slot-space output) is a megakernel-"
                         "path option; the XLA paths return [H, W, 3]")
    jj, ii = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.int32),
        jnp.arange(width, dtype=jnp.int32),
        indexing="ij",
    )
    k_ray, k_path = jax.random.split(key)
    if use_megakernel:
        if jax.default_backend() != "tpu":
            raise ValueError(
                "use_megakernel requires a TPU backend (the Pallas megakernel "
                f"has no {jax.default_backend()} lowering); use early_exit or "
                "use_pallas instead, or run under interpret via "
                "ops.pallas.megakernel.pallas_trace_paths(interpret=True)"
            )
        from raytracingproject_tpu.ops.pallas.megakernel import (
            TILE, pallas_trace_paths,
        )

        # Feed rays in compact screen blocks (all samples of one block
        # consecutively) so each 1024-ray kernel tile has a small spatial
        # footprint — see _block_order. Padding rays re-render pixel (0,0)
        # and are dropped by the gather.
        slot_pix, gather = _block_order(width, height, spp_chunk, TILE)
        flat_i = ii.reshape(-1)
        flat_j = jj.reshape(-1)
        i = flat_i[slot_pix]
        j = flat_j[slot_pix]
        origin, direction, time = generate_rays(cam, i, j, k_ray)
        seed = jax.random.randint(k_path, (), 0, 2**31 - 1, dtype=jnp.int32)
        # With `front` (the default when settings.use_bvh is on), closest-hit
        # is the front-culled scan — the fastest acceleration path measured.
        # With `bvh`, it is the tile-uniform traversal. Either way the scene
        # must already be in leaf order (render() below reorders).
        # With a sky texture the kernel records (miss dir, miss throughput)
        # instead of adding the built-in gradient; the equirect env-map
        # lookup happens here in XLA (one vectorized gather over rays).
        record_miss = sky_tex is not None
        if depth_segment and max_depth > depth_segment and bvh is None:
            # Deep bounce limits: segment the depth loop and compact alive
            # rays between segments (tile-granular early exit alone lets one
            # live lane drag 1024 rays through all 50 bounces).
            from raytracingproject_tpu.ops.pallas.megakernel import (
                pallas_trace_paths_segmented,
            )

            out = pallas_trace_paths_segmented(
                origin, direction, time, scene, seed, max_depth,
                seg_len=depth_segment, front=front, record_miss=record_miss,
            )
        elif two_phase and max_depth > two_phase and bvh is None:
            # Death-coherent two-phase trace: short full-frame prefix, one
            # alive-first compaction, packed depth tail (cuts the
            # tile-granularity early-exit waste; megakernel docstring).
            # brute/front closest hits only (the tile-uniform bvh path has
            # no segment kernel and is not the production config).
            from raytracingproject_tpu.ops.pallas.megakernel import (
                pallas_trace_paths_twophase,
            )

            out = pallas_trace_paths_twophase(
                origin, direction, time, scene, seed, max_depth,
                cuts=(two_phase,), front=front, record_miss=record_miss,
            )
        else:
            out = pallas_trace_paths(
                origin, direction, time, scene, seed, max_depth, bvh=bvh,
                front=front, record_miss=record_miss,
            )
        if record_miss:
            rad, mdir, mthr = out
            rad = rad + mthr * sky_color(mdir, sky_tex)
        else:
            rad = out
        if raw_slots:
            # slot-space radiance: the caller accumulates chunks here and
            # unpermutes ONCE per frame (blocks_to_image) — the [spp, H*W]
            # gather costs ~10 ns/ray on the tunneled chip, ~13% of a
            # cover-scene pass
            return rad
        rad = rad[jnp.asarray(gather)]  # [spp_chunk, H*W, 3] row-major
        return rad.sum(axis=0).reshape(height, width, 3)

    i = jnp.tile(ii.reshape(-1), spp_chunk)
    j = jnp.tile(jj.reshape(-1), spp_chunk)
    origin, direction, time = generate_rays(cam, i, j, k_ray)
    rad = ray_color(
        scene, origin, direction, time, k_path, max_depth, bvh, early_exit,
        use_pallas, sky_tex,
    )
    return rad.reshape(spp_chunk, height, width, 3).sum(axis=0)


@partial(jax.jit, static_argnames=("width", "height", "spp_chunk"))
def blocks_to_image(
    slot_rad: jnp.ndarray, width: int, height: int, spp_chunk: int
) -> jnp.ndarray:
    """Slot-space radiance sum [R_pad, 3] (render_pass(raw_slots=True),
    possibly accumulated over many chunks) -> row-major image sum
    [H, W, 3]. One gather per frame instead of one per pass."""
    from raytracingproject_tpu.ops.pallas.megakernel import TILE

    _, gather = _block_order(width, height, spp_chunk, TILE)
    return slot_rad[jnp.asarray(gather)].sum(axis=0).reshape(height, width, 3)


def render(
    scene: Scene,
    camera: Camera,
    key: jax.Array | None = None,
    settings: RenderSettings | None = None,
    sky_texture: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Full render: mean radiance image [H, W, 3] in linear space.

    Equivalent of `camera::render` (src/camera.h:32-50) minus the PPM
    output — use `color.to_u8` + `utils.ppm.write_ppm` for that. Sample
    passes are chunked so each device batch stays at a static size.
    """
    settings = settings or RenderSettings()
    # Sky textures ride the megakernel too: the kernel records (miss dir,
    # miss throughput) planes and the equirect lookup happens in XLA
    # (render_pass) — per-lane gathers never enter the kernel.
    use_megakernel = settings.use_megakernel
    key = key if key is not None else jax.random.PRNGKey(0)
    width, height = camera.image_size()
    cam = camera.derive(settings.dtype)
    spp = camera.samples_per_pixel

    bvh = None
    front = None
    if settings.use_bvh:
        from raytracingproject_tpu.bvh import build_bvh, reorder_scene

        leaf = settings.bvh_leaf_size
        if use_megakernel and leaf < 8:
            leaf = 8  # front subtrees amortize culling over 1024-ray tiles
        bvh = build_bvh(scene, leaf_size=leaf)
        scene = reorder_scene(scene, bvh)
        if use_megakernel:
            # The front-culled scan beats both brute force and the
            # tile-uniform traversal on TPU (megakernel.py:_closest_hit_front
            # docstring has the numbers); the megakernel takes it instead of
            # the node-walking BVH. Scenes past the ~1 MiB SMEM budget
            # (~16k spheres) use the HBM-staged front (double-buffered DMA
            # of live subtree blocks).
            from raytracingproject_tpu.ops.pallas.megakernel import (
                front_tables, front_tables_hbm,
            )

            # near-to-far subtree order from the camera position: stage-2's
            # best-t clamp culls far words once near geometry has been hit.
            # HBM-staged fronts keep LEAF order instead — their cost is DMA
            # block streaming, where leaf-order locality measured slightly
            # ahead of distance order (FRONT_r04: 0.83 vs 0.77 Mrays/s at
            # 50k spheres).
            op = tuple(float(x) for x in camera.lookfrom)
            # intra-word re-packing pays on shallow/coherent bounce loops
            # (headline d16: 13.83 vs 13.57 Mrays/s) and costs at deep
            # incoherent ones (CONFIG3 d50: 8.18 vs 8.47) — pick per depth
            rp = 2 if camera.max_depth <= 24 else 1
            try:
                front = front_tables(scene, bvh, order_point=op, repack=rp)
            except ValueError:
                front = front_tables_hbm(scene, bvh)
            bvh = None

    pixels = width * height
    spp_chunk = max(1, min(spp, settings.rays_per_batch // max(pixels, 1)))

    # Segmentation is opt-in only: measured 11x SLOWER than the monolithic
    # kernel at depth 50 (tile early exit + front culling already absorb the
    # depth tail), and the compaction graph faulted the TPU worker at
    # CONFIG3's 3168-tile grid. See RenderSettings.depth_segment.
    depth_segment = settings.depth_segment or 0

    acc = jnp.zeros((height, width, 3), settings.dtype)
    # Megakernel chunks accumulate in SLOT space (ray feed order) and
    # unpermute once at the end — the per-pass [spp, H*W] unpermute gather
    # costs ~10 ns/ray on the tunneled chip (~13% of a cover pass).
    slot_acc = None
    done = 0
    chunks = 0
    while done < spp:
        chunk = min(spp_chunk, spp - done)
        k = jax.random.fold_in(key, done)
        raw = use_megakernel and chunk == spp_chunk
        out = render_pass(
            scene,
            cam,
            k,
            width=width,
            height=height,
            max_depth=camera.max_depth,
            spp_chunk=chunk,
            bvh=bvh,
            front=front,
            early_exit=True,
            use_pallas=settings.use_pallas,
            use_megakernel=use_megakernel,
            depth_segment=depth_segment,
            two_phase=settings.two_phase or 0,
            sky_tex=sky_texture,
            raw_slots=raw,
        )
        if raw:
            slot_acc = out if slot_acc is None else slot_acc + out
            sync_target = slot_acc
        else:
            acc = acc + out
            sync_target = acc
        done += chunk
        chunks += 1
        if settings.sync_every and chunks % settings.sync_every == 0 and done < spp:
            sync_target.block_until_ready()
    if slot_acc is not None:
        acc = acc + blocks_to_image(slot_acc, width, height, spp_chunk)
    return acc / spp


def render_image(
    scene: Scene,
    camera: Camera,
    key: jax.Array | None = None,
    settings: RenderSettings | None = None,
    sky_texture: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Render and quantize to uint8 [H, W, 3] (gamma + clamp per
    src/color.h:14-35)."""
    from raytracingproject_tpu.color import to_u8

    return to_u8(render(scene, camera, key, settings, sky_texture))
