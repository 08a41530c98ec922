"""Full-path Pallas megakernel: the entire bounce loop in one TPU kernel.

Per grid step a tile of rays lives in registers/VMEM from camera ray to
final radiance — no HBM traffic between bounces (the megakernel design of
SURVEY.md §7, tier (b)). Everything the XLA megakernel (render.py) does per
bounce happens in-kernel:

- closest hit: either a rolled `fori_loop` over all spheres (brute) or a
  **tile-uniform BVH traversal** (pass `bvh=`): one scalar node pointer per
  1024-ray tile walks the DFS-pre-order flat BVH (miss links — the ordered
  traversal the reference stubbed at src/bvh.h:16-24); each node does a
  vectorized per-lane slab test, a cross-lane `any` decides descend vs skip,
  and leaves test their <=leaf_size spheres with the exact quadratic. No
  per-lane gathers anywhere: winner *attributes* (center, radius, material,
  albedo, fuzz, ior) are selected into registers during the loop — TPU lanes
  cannot gather efficiently; selects are one VPU op each. Sub-linear in
  scene size whenever the tile's rays are coherent (primary rays and
  low-bounce scatter are); worst case degenerates to ~brute + node overhead.
- scatter: lambertian / metal / dielectric with Schlick, reproducing
  src/material.h:16-81 exactly,
- RNG: the per-core hardware PRNG (pltpu.prng_random_bits), seeded per
  (grid step, ray tile); uniform floats via the 24-bit mantissa trick;
  unit vectors via Box-Muller + normalize (same distributions as
  ops/sampling.py),
- sky accumulation and depth-limited termination with an early-exit: each
  bounce body is predicated on "any ray in the tile still alive", so a
  tile whose rays all terminated skips the remaining depth iterations.

Forward-only; validated statistically against the XLA megakernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracingproject_tpu.config import T_MIN, T_MAX, LAMBERTIAN, METAL, DIELECTRIC
from raytracingproject_tpu.scene import Scene

SUB, LANES = 8, 128
TILE = SUB * LANES  # 1024 rays per grid step

# sphere table rows (SMEM): cx cy cz mx my mz rad mat alb_r alb_g alb_b fuzz ior
ROW_CX, ROW_CY, ROW_CZ = 0, 1, 2
ROW_MX, ROW_MY, ROW_MZ = 3, 4, 5
ROW_RAD, ROW_MAT = 6, 7
ROW_AR, ROW_AG, ROW_AB = 8, 9, 10
ROW_FUZZ, ROW_IOR = 11, 12
N_ROWS = 16  # padded to sublane multiple

# BVH node tables (SMEM): float rows = box min/max, int rows = links.
NF_MNX, NF_MNY, NF_MNZ, NF_MXX, NF_MXY, NF_MXZ = 0, 1, 2, 3, 4, 5
NI_MISS, NI_START, NI_COUNT = 0, 1, 2
SENTINEL_I32 = -1  # bvh.SENTINEL: traversal done


def _uniform(shape):
    """U[0,1) from hardware PRNG bits (24-bit mantissa). The bitcast to
    uint32 matters: a signed >> would sign-extend half the draws."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # Mosaic has no uint32->f32 cast; after >>8 the top byte is zero, so a
    # bitcast to int32 is value-preserving and int32->f32 is supported.
    return pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))


def _unit_vector(shape):
    """Uniform directions on S^2 via the cylinder map (Archimedes): z
    uniform in [-1,1], azimuth uniform — exactly the distribution of
    src/vec3.h:137-139, at 2 uniforms + sqrt/cos/sin (the earlier
    Box-Muller route cost 4 uniforms + 2 log + 2 sqrt + 2 cos + 2 sin +
    rsqrt per draw; scatter runs this every bounce)."""
    z = 2.0 * _uniform(shape) - 1.0
    s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    th = (2.0 * jnp.pi) * _uniform(shape)
    return s * jnp.cos(th), s * jnp.sin(th), z


def _ball_radius(shape):
    """Radius CDF^-1 for uniform-in-ball sampling: u^(1/3) (cbrt has no
    Mosaic lowering; exp(log(u)/3)). unit_vector * ball_radius is the
    src/vec3.h:129-135 distribution."""
    u = jnp.maximum(_uniform(shape), 1e-30)
    return jnp.exp(jnp.log(u) * (1.0 / 3.0))


def _sphere_test(sph_ref, s, rays, hc, t_min):
    """Test sphere `s` (scalar SMEM index) against the ray tile; update the
    (best_t, winner attributes) carry `hc`. Exact reference quadratic
    (src/sphere.h:30-57) with the open t-interval, moving-sphere center lerp
    (src/sphere.h:68-72)."""
    return _sphere_test_ld(lambda row: sph_ref[row, s], s, rays, hc, t_min)


def _sphere_test_ld(ld, s_global, rays, hc, t_min):
    """_sphere_test with an abstract scalar loader `ld(row)` — lets the
    HBM-staged front reuse the exact quadratic on a DMA-staged block
    (ld indexes the SMEM staging buffer; `s_global` is the winner index to
    record, which need not equal the staged column)."""
    ox, oy, oz, dx, dy, dz, tm, a, inv_a = rays
    (bt, hx, hy, hz, hrad, hmat, har, hag, hab, hfz, hio) = hc
    cx = ld(ROW_CX); cy = ld(ROW_CY); cz = ld(ROW_CZ)
    mx = ld(ROW_MX); my = ld(ROW_MY); mz = ld(ROW_MZ)
    rad = ld(ROW_RAD)

    ccx = cx + tm * mx   # src/sphere.h:68-72 motion lerp
    ccy = cy + tm * my
    ccz = cz + tm * mz
    ocx = ox - ccx; ocy = oy - ccy; ocz = oz - ccz
    half_b = ocx * dx + ocy * dy + ocz * dz
    cq = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
    disc = half_b * half_b - a * cq
    dpos = disc > 0.0
    sq = jnp.sqrt(jnp.where(dpos, disc, 1.0))
    r0 = (-half_b - sq) * inv_a
    r1 = (-half_b + sq) * inv_a
    in0 = (r0 > t_min) & (r0 < bt)
    in1 = (r1 > t_min) & (r1 < bt)
    root = jnp.where(in0, r0, r1)
    better = dpos & (in0 | in1)

    bt = jnp.where(better, root, bt)
    hx = jnp.where(better, ccx, hx)
    hy = jnp.where(better, ccy, hy)
    hz = jnp.where(better, ccz, hz)
    hrad = jnp.where(better, rad, hrad)
    # WINNER INDEX RIDES THE MATERIAL SLOT: hmat carries mat + 4*index
    # (exact f32 integers below 2^24; mat in {0,1,2}); the bounce loop
    # decodes with one floor + one fma at shade time. A separate winner
    # carry was the round-4 front+record collapse: the 12th loop-carried
    # vector crossed the register-spill threshold inside the front's
    # nested scalar loops (bisected by KPROBES_r05 record_front_code_only
    # = collapsed vs record_front_dirs_only = full speed), costing
    # 25.7 -> 77.8 ms at depth 50. Folding the index into an EXISTING
    # select keeps the sphere-test op count and carry width identical to
    # the non-recording kernel.
    hmat = jnp.where(better, ld(ROW_MAT) + 4.0 * s_global, hmat)
    har = jnp.where(better, ld(ROW_AR), har)
    hag = jnp.where(better, ld(ROW_AG), hag)
    hab = jnp.where(better, ld(ROW_AB), hab)
    hfz = jnp.where(better, ld(ROW_FUZZ), hfz)
    hio = jnp.where(better, ld(ROW_IOR), hio)
    return (bt, hx, hy, hz, hrad, hmat, har, hag, hab, hfz, hio)


def _hit_init(shape):
    zeros = jnp.zeros(shape, jnp.float32)
    return (jnp.full(shape, T_MAX, jnp.float32), zeros, zeros, zeros,
            jnp.ones(shape, jnp.float32), zeros, zeros, zeros, zeros,
            zeros, jnp.ones(shape, jnp.float32))


UNROLL = 8


def _closest_hit_brute(sph_ref, rays, t_min, n_spheres, shape):
    """Linear scan (src/hittable_list.h:25-39): every sphere vs every lane.

    Unrolled x8: Mosaic does not software-pipeline fori_loop bodies, so the
    rolled loop serializes each sphere's 13 scalar SMEM loads against its
    ~25 VPU ops; unrolling lets 8 spheres' loads and quadratics overlap
    (measured on the isolated kernel, tools/kexp.py: 54 Mrays/s rolled,
    114 at x4, 138 at x8)."""
    n_main = (n_spheres // UNROLL) * UNROLL

    def body(q, hc):
        for u in range(UNROLL):
            hc = _sphere_test(sph_ref, q * UNROLL + u, rays, hc, t_min)
        return hc

    hc = jax.lax.fori_loop(0, n_main // UNROLL, body, _hit_init(shape))
    for s in range(n_main, n_spheres):  # static remainder
        hc = _sphere_test(sph_ref, s, rays, hc, t_min)
    return hc


def _closest_hit_bvh(sph_ref, nf_ref, ni_ref, rays, t_min, shape):
    """Tile-uniform stackless BVH traversal.

    One scalar pointer walks the flat tree (pre-order + miss links, the
    layout of bvh.FlatBVH): per node, every lane slab-tests the node box
    against its own ray with its own current best_t; if ANY lane hits, an
    inner node descends (ptr+1) and a leaf runs the exact sphere test on its
    contiguous primitives; otherwise the whole subtree is skipped via the
    miss link. Per-lane best_t tightens during traversal, culling later
    subtrees. The reference's intended ordered traversal (src/bvh.h:16-24)
    shrank the right child's t-range the same way — here the "t-range" is
    the per-lane best_t vector.
    """
    ox, oy, oz, dx, dy, dz, tm, a, inv_a = rays
    # Slab reciprocals, hoisted out of the node loop (direction is fixed for
    # the whole traversal). Clamp |d| ~ 0 to a finite huge reciprocal so
    # (mn - o) * inv can't produce NaN via 0 * inf (matches bvh.py:239).
    inv_dx = 1.0 / jnp.where(jnp.abs(dx) > 1e-20, dx, 1e-20)
    inv_dy = 1.0 / jnp.where(jnp.abs(dy) > 1e-20, dy, 1e-20)
    inv_dz = 1.0 / jnp.where(jnp.abs(dz) > 1e-20, dz, 1e-20)

    # Two-level loop: the INNER while walks inner nodes carrying only
    # (scalar ptr, scalar found) — no vector carries, no per-node copies of
    # the 11-field hit state — until it parks on an overlapping leaf (or the
    # sentinel). The OUTER loop (one iteration per *visited leaf*) runs the
    # sphere tests and re-enters the walk at the leaf's miss link. A rolled
    # single-loop formulation pays a lax.cond with the full hit-state carry
    # at EVERY node; here the expensive state only crosses per leaf.

    def outer_cond(c):
        return c[0] >= 0

    def outer_body(c):
        ptr0 = c[0]
        hc = c[1:]
        bt = hc[0]

        def seek_cond(s):
            p, found = s
            return (p >= 0) & jnp.logical_not(found)

        def seek_body(s):
            p, _ = s
            t0 = (nf_ref[NF_MNX, p] - ox) * inv_dx
            t1 = (nf_ref[NF_MXX, p] - ox) * inv_dx
            tn = jnp.minimum(t0, t1)
            tf = jnp.maximum(t0, t1)
            t0 = (nf_ref[NF_MNY, p] - oy) * inv_dy
            t1 = (nf_ref[NF_MXY, p] - oy) * inv_dy
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
            t0 = (nf_ref[NF_MNZ, p] - oz) * inv_dz
            t1 = (nf_ref[NF_MXZ, p] - oz) * inv_dz
            tn = jnp.maximum(tn, jnp.maximum(jnp.minimum(t0, t1), t_min))
            tf = jnp.minimum(tf, jnp.minimum(jnp.maximum(t0, t1), bt))
            # any lane enters the box within its open (t_min, best_t) range
            any_hit = jnp.max(jnp.where(tf > tn, 1.0, 0.0)) > 0.0
            is_leaf = ni_ref[NI_COUNT, p] > 0
            found = any_hit & is_leaf
            nxt = jnp.where(
                any_hit & jnp.logical_not(is_leaf),
                p + 1,                       # descend (first child is next in pre-order)
                jnp.where(found, p, ni_ref[NI_MISS, p]),  # park / skip subtree
            )
            return (nxt, found)

        leaf, found = jax.lax.while_loop(seek_cond, seek_body, (ptr0, False))
        node = jnp.maximum(leaf, 0)
        start = ni_ref[NI_START, node]
        count = jnp.where(found, ni_ref[NI_COUNT, node], 0)  # 0-trip if done

        def leaf_body(k, h):
            return _sphere_test(sph_ref, start + k, rays, h, t_min)

        hc = jax.lax.fori_loop(0, count, leaf_body, hc)
        nxt = jnp.where(found, ni_ref[NI_MISS, node], jnp.int32(SENTINEL_I32))
        return (nxt, *hc)

    out = jax.lax.while_loop(
        outer_cond, outer_body, (jnp.int32(0), *_hit_init(shape))
    )
    return out[1:]


WORD = 24  # front subtrees per packed any-bits word (f32-exact, see below)


def _row_weights():
    """(8,128) tile with row r = 2^r (exact integer powers)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0)
    return (jnp.int32(1) << r).astype(jnp.float32)


def _slab_factory(box_ref, rays, t_min, bt=None):
    """any-lane slab test against column `f` of an (8, F) SMEM box table
    (rows 0-2 = min xyz, 3-5 = max xyz): returns (sub, lanes) 1.0/0.0.

    With `bt` (per-lane current best hit t), the far plane is clamped to it:
    a lane only "enters" a box within its open (t_min, best_t) interval —
    the same per-lane tightening the tile-uniform traversal uses
    (_closest_hit_bvh seek_body). Exactness-preserving: a box entered only
    at t >= best_t cannot contain a strictly closer hit."""
    ox, oy, oz, dx, dy, dz, *_ = rays
    inv_dx = 1.0 / jnp.where(jnp.abs(dx) > 1e-20, dx, 1e-20)
    inv_dy = 1.0 / jnp.where(jnp.abs(dy) > 1e-20, dy, 1e-20)
    inv_dz = 1.0 / jnp.where(jnp.abs(dz) > 1e-20, dz, 1e-20)

    def slab(f):
        t0 = (box_ref[0, f] - ox) * inv_dx
        t1 = (box_ref[3, f] - ox) * inv_dx
        tn = jnp.minimum(t0, t1)
        tf = jnp.maximum(t0, t1)
        t0 = (box_ref[1, f] - oy) * inv_dy
        t1 = (box_ref[4, f] - oy) * inv_dy
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        t0 = (box_ref[2, f] - oz) * inv_dz
        t1 = (box_ref[5, f] - oz) * inv_dz
        tn = jnp.maximum(tn, jnp.maximum(jnp.minimum(t0, t1), t_min))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        if bt is not None:
            tf = jnp.minimum(tf, bt)
        return jnp.where(tf > tn, 1.0, 0.0)

    return slab


def _pack_any_bits(slab, n: int, base=0):
    """Pack "any lane hit box base+k" bits for k in [0, n), n <= WORD, into
    ONE int32 scalar with a single vector->scalar sync. `n` must be static;
    `base` may be a traced scalar (dynamic SMEM column loads are free).
    Exact in f32: each 8-row group spans <=17 mantissa bits and the
    cross-group sum <=24."""
    # Per group of 8 boxes: collapse sublanes with a max -> (1,128) each,
    # stack -> (8,128), cross-lane max -> (8,1), weight row r of group g by
    # 2^(8g+r), accumulate groups; ONE final scalar sum is the sync. (An
    # MXU-matmul formulation measured identical throughput — the pack is
    # not the bottleneck — so the simpler reduction form is kept.)
    w8 = _row_weights()[:, :1]
    acc = None
    for g in range(0, n, SUB):
        cnt = min(SUB, n - g)
        rows = [
            jnp.max(slab(base + g + r), axis=0, keepdims=True)
            for r in range(cnt)
        ]
        if cnt < SUB:
            rows += [jnp.zeros((1, LANES), jnp.float32)] * (SUB - cnt)
        grp = jnp.concatenate(rows, axis=0)
        lane_any = jnp.max(grp, axis=1, keepdims=True)  # (8, 1)
        bits = jnp.where(lane_any > 0.0, w8 * float(1 << g), 0.0)
        acc = bits if acc is None else acc + bits
    return jnp.sum(acc).astype(jnp.int32)  # the one sync


def _closest_hit_front(sph_ref, ff_ref, fi_ref, wf_ref, sf_ref, livew_ref,
                       live_ref, rays, t_min, n_front, shape, repack=1,
                       bf_ref=None, liveb_ref=None, ksub=0,
                       word_earlyout=False):
    """Hierarchical front-culled closest hit: >= ONE scalar sync per
    bounce, at most one per 24 live subtrees — kernel code size O(1) in the
    front size.

    The tile-uniform traversal (_closest_hit_bvh) pays a vector->scalar
    `any()` sync (~460 cycles measured) at EVERY node, which outweighs its
    O(log N) visit savings. Here the BVH is cut into a front of F subtrees
    (bvh.bvh_front), each owning a contiguous sphere range; subtrees are
    grouped into words of 24, words into super-words of 24 (three levels,
    F <= 13824, ~360k spheres at 26/subtree):

    - stage 1 builds the LIVE WORD LIST in SMEM scratch (`livew_ref`):
      * F <= 24 (one word): the word is trivially live, no pack;
      * F <= 576: slab-test the word union boxes (wf_ref), pack the
        any-bits into one scalar (_pack_any_bits, one sync), scalar-extract
        the set bits;
      * F > 576: slab-test the super-word union boxes (sf_ref) and pack
        (one sync); per LIVE super-word only, pack its 24 word boxes (one
        sync each — the pack takes a traced base) and extract. Dead
        super-words cost nothing beyond their one slab column.
    - stage 2 walks ONLY the live words (a fori_loop over the compacted
      list — dead words never cross the 11-tensor hit-state carry): per
      word, slab-test its 24 subtree boxes clamped to the per-lane best_t
      so far (one sync), scalar-compact the live (start, count) ranges into
      `live_ref`, and run the exact unrolled sphere test on their
      contiguous SMEM rows (ranges pre-padded to UNROLL by repeating their
      last sphere — idempotent under strict < updates).

    Subtree slab tests clamp their far plane to the per-lane best_t carried
    from the words already processed (see _slab_factory): in dense scenes
    the first hits shrink best_t to ~the nearest surface, and later words'
    subtrees cull against it.

    Radiance equals the brute scan up to closest-hit TIE-BREAKING: culled
    subtrees cannot contain a strictly closer winner and padding repeats
    are no-ops under the strict `<` update, but the front visits subtrees
    in a different ORDER than the brute scan, so rays whose two best hits
    tie to the last f32 ulp can pick the other sphere (measured ~0.07% of
    cover-scene rays; test_tpu_lane.py pins the rate)."""
    n_words = n_front // WORD
    n_super = (n_words + WORD - 1) // WORD
    hc = _hit_init(shape)

    # ---- stage 1: live word list ----
    if n_words == 1:
        livew_ref[0, 0] = jnp.int32(0)
        n_live_w = jnp.int32(1)
    else:
        slab_w = _slab_factory(wf_ref, rays, t_min)

        def extract_words(wword, wbase, c0):
            def extract(k, c):
                bit = jax.lax.shift_right_logical(wword, k) & 1

                @pl.when(bit > 0)
                def _():
                    livew_ref[0, c] = wbase + k

                return c + bit

            return jax.lax.fori_loop(0, WORD, extract, c0)

        if n_super == 1:
            wword = _pack_any_bits(slab_w, n_words)

            def extract(k, c):
                bit = jax.lax.shift_right_logical(wword, k) & 1

                @pl.when(bit > 0)
                def _():
                    livew_ref[0, c] = jnp.int32(k)

                return c + bit

            n_live_w = jax.lax.fori_loop(0, n_words, extract, jnp.int32(0))
        else:
            slab_s = _slab_factory(sf_ref, rays, t_min)
            sword = _pack_any_bits(slab_s, n_super)

            def super_body(sw, c):
                bit = jax.lax.shift_right_logical(sword, sw) & 1

                def live_fn(cc):
                    # wf is padded to a WORD multiple of word columns, so a
                    # static 24-box pack is always in range; padding words
                    # are degenerate boxes that never set a bit.
                    wword = _pack_any_bits(slab_w, WORD, base=sw * WORD)
                    return extract_words(wword, sw * WORD, cc)

                return jax.lax.cond(bit > 0, live_fn, lambda cc: cc, c)

            n_live_w = jax.lax.fori_loop(0, n_super, super_body, jnp.int32(0))

    # ---- stage 2: per live word ----
    # `repack` splits each word's 24 subtrees into that many chunks and
    # re-slab-tests every chunk against the CURRENT best-t (one extra
    # ~460-cycle pack sync per extra chunk). With distance-ordered fronts
    # (bvh_front order_point) the first chunk holds the nearest geometry,
    # so by the second pack best-t has collapsed to ~the first surface and
    # far subtrees cull — the lever that makes ordering pay even when the
    # scene fits ONE word (the 488-sphere cover case has no second word to
    # clamp). repack=1 reproduces the round-3 kernel exactly.
    per = WORD // repack
    assert per * repack == WORD, f"repack {repack} must divide {WORD}"

    def word_body(l, h):
        w = livew_ref[0, l]

        def chunk_body(c, hh):
            slab_f = _slab_factory(ff_ref, rays, t_min, bt=hh[0])
            base = w * WORD + c * per
            word = _pack_any_bits(slab_f, per, base=base)

            def extract(k, cc):
                bit = jax.lax.shift_right_logical(word, k) & 1

                @pl.when(bit > 0)
                def _():
                    live_ref[0, cc] = fi_ref[0, base + k]
                    live_ref[1, cc] = fi_ref[1, base + k]

                return cc + bit

            # wholly-culled chunk: skip the `per`-iteration extract loop
            n_live = jax.lax.cond(
                word != 0,
                lambda: jax.lax.fori_loop(0, per, extract, jnp.int32(0)),
                lambda: jnp.int32(0),
            )

            def live_body(l2, hhh):
                start = live_ref[0, l2]
                cnt = live_ref[1, l2]

                def inner(q, h4):
                    base_s = start + q * UNROLL
                    for u in range(UNROLL):
                        h4 = _sphere_test(sph_ref, base_s + u, rays, h4, t_min)
                    return h4

                if bf_ref is None:
                    return jax.lax.fori_loop(0, cnt // UNROLL, inner, hhh)

                # SUB-BLOCK DESCENT (round-5 missing #5): one more culling
                # level INSIDE the live subtree — slab-test its 8-sphere
                # sub-block boxes (column j of bf_ref bounds padded sphere
                # columns [8j, 8j+8); starts are UNROLL-aligned so the
                # subtree's blocks are start//8 .. start//8 + cnt//8), pack
                # the any-bits (ONE extra sync per live subtree), and scan
                # only the live blocks. Bits past cnt//8 belong to the NEXT
                # subtree's boxes and are ignored by the extract bound.
                # Profitable when subtrees are large (the front is built
                # with FEWER, BIGGER subtrees when descent is on).
                slab_b = _slab_factory(bf_ref, rays, t_min, bt=hhh[0])
                bword = _pack_any_bits(slab_b, ksub, base=start // UNROLL)

                def ext(k, c3):
                    bit = jax.lax.shift_right_logical(bword, k) & 1

                    @pl.when(bit > 0)
                    def _():
                        liveb_ref[0, c3] = start + k * UNROLL

                    return c3 + bit

                n_blk = jax.lax.fori_loop(0, cnt // UNROLL, ext, jnp.int32(0))

                def blk_body(q, h4):
                    base_s = liveb_ref[0, q]
                    for u in range(UNROLL):
                        h4 = _sphere_test(sph_ref, base_s + u, rays, h4, t_min)
                    return h4

                return jax.lax.fori_loop(0, n_blk, blk_body, hhh)

            return jax.lax.fori_loop(0, n_live, live_body, hh)

        chunks = lambda hh: jax.lax.fori_loop(0, repack, chunk_body, hh)
        if not word_earlyout:
            return chunks(h)
        # PER-WORD EARLY-OUT (round-5 missing #5): one union-box slab test
        # against the best-t carried from earlier words skips the whole
        # word (its chunk packs + extraction) when every lane's best hit is
        # already nearer — with distance-ordered fronts, far words die this
        # way after the first surfaces are found. Cost: one slab column +
        # one sync per live word.
        slab_wbt = _slab_factory(wf_ref, rays, t_min, bt=h[0])
        still = jnp.max(slab_wbt(w)) > 0.0
        return jax.lax.cond(still, chunks, lambda hh: hh, h)

    return jax.lax.fori_loop(0, n_live_w, word_body, hc)


def _bounce_loop(seed_ref, closest_hit, ox_ref, oy_ref, oz_ref,
                 dx_ref, dy_ref, dz_ref, tm_ref, rr_ref, rg_ref, rb_ref,
                 *, max_depth: int, t_min: float, res_refs=None,
                 init_refs=None, state_out_refs=None, inject_bug=None,
                 miss_refs=None, miss_init_refs=None,
                 res_mask=(True, True, True, True)):
    """Shared kernel body: depth loop of (closest hit -> shade/scatter).

    `res_refs` = (code, ndx, ndy, ndz) VMEM refs of shape
    (max_depth, SUB, LANES): when given, per-bounce path decisions are
    recorded for the path-replay backward (grad/replay.py). `code` packs
    the winner index and the dielectric branch bit into one f32 plane —
    code = 2*idx + refl_bit with idx in {-2 dead, -1 miss, >=0 hit} and
    refl_bit only ever set on hits (exact in f32 below 2^22 spheres;
    decode: i32 arithmetic >> 1 floors correctly for -2/-4). Packing saves
    one [depth, R] f32 plane of HBM traffic vs a separate refl plane.

    `init_refs` = (thr_r, thr_g, thr_b, rad_r, rad_g, rad_b, alive) input
    refs and `state_out_refs` = (ox, oy, oz, dx, dy, dz, thr_r, thr_g,
    thr_b, alive) output refs turn the loop into a resumable SEGMENT of a
    deeper bounce loop: the caller carries ray state across kernel launches
    and compacts still-alive rays between segments
    (pallas_trace_paths_segmented) — the stream-compaction design of
    SURVEY.md §7 at segment granularity.

    `miss_refs` = (mdx, mdy, mdz, mtr, mtg, mtb) output refs of shape
    (SUB, LANES): when given, the hardcoded sky gradient is NOT accumulated
    in-kernel; instead the miss direction and the throughput at miss time
    are recorded (a path misses at most once — the miss retires it — so a
    plain overwrite is exact). The caller applies any environment radiance
    outside the kernel: rad += mthr * sky(mdir). This is how `add_texture`'s
    equirect environment map (render.sky_color) rides the megakernel — the
    per-lane texture gather TPUs can't do in-kernel becomes one vectorized
    XLA gather over rays that missed. `miss_init_refs` carries the planes
    across depth segments (zero direction = "has not missed")."""
    # Two independent seed words (advisor round 1): `seed + program_id` made
    # sample chunks whose seeds differ by < the tile count reuse identical
    # per-tile streams and could overflow int32; feeding the tile index as a
    # separate word lets the PRNG mix them nonlinearly.
    pltpu.prng_seed(seed_ref[0, 0], pl.program_id(0))

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tm = tm_ref[:]

    shape = (SUB, LANES)
    if init_refs is None:
        thr_r = jnp.ones(shape, jnp.float32)
        thr_g = jnp.ones(shape, jnp.float32)
        thr_b = jnp.ones(shape, jnp.float32)
        rad_r = jnp.zeros(shape, jnp.float32)
        rad_g = jnp.zeros(shape, jnp.float32)
        rad_b = jnp.zeros(shape, jnp.float32)
        # alive carried as a 0/1 float mask: bool vectors can't round-trip a
        # Mosaic cond carry (i8->i1 truncation is unsupported).
        alive = jnp.ones(shape, jnp.float32)
    else:
        thr_r, thr_g, thr_b = (r[:] for r in init_refs[0:3])
        rad_r, rad_g, rad_b = (r[:] for r in init_refs[3:6])
        alive = init_refs[6][:]
    if miss_refs is not None:
        if miss_init_refs is not None:
            miss0 = tuple(r[:] for r in miss_init_refs)
        else:
            miss0 = tuple(jnp.zeros(shape, jnp.float32) for _ in range(6))
    else:
        miss0 = ()

    def bounce(dep, carry):
        (ox, oy, oz, dx, dy, dz, thr_r, thr_g, thr_b, rad_r, rad_g, rad_b,
         alive) = carry[:13]
        miss_c = carry[13:]

        a = jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-20)
        inv_a = 1.0 / a
        rays = (ox, oy, oz, dx, dy, dz, tm, a, inv_a)

        (bt, hx, hy, hz, hrad, hmatp, har, hag, hab, hfz, hio) = closest_hit(
            rays, shape
        )
        # decode the packed material slot (see _sphere_test_ld): hmatp =
        # mat + 4*winner_index, both exact f32 integers; *0.25 and the
        # floor are exact, so the split is lossless
        bs = jnp.floor(hmatp * 0.25)
        hmat = hmatp - 4.0 * bs

        hit = bt < T_MAX
        t_safe = jnp.where(hit, bt, 1.0)
        px = ox + t_safe * dx
        py = oy + t_safe * dy
        pz = oz + t_safe * dz
        inv_r = 1.0 / jnp.where(hrad != 0.0, hrad, 1.0)
        nx = (px - hx) * inv_r   # outward normal (src/sphere.h:52)
        ny = (py - hy) * inv_r
        nz = (pz - hz) * inv_r
        d_dot_n = dx * nx + dy * ny + dz * nz
        front = d_dot_n < 0.0    # src/hittable.h:15-21
        sgn = jnp.where(front, 1.0, -1.0)
        nx = nx * sgn; ny = ny * sgn; nz = nz * sgn

        # ---- sky on miss (src/camera_cpu.h:23-25) ----
        inv_len = jax.lax.rsqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-20))
        alive_b = alive > 0.5
        m = jnp.where(alive_b & ~hit, 1.0, 0.0)
        if miss_refs is None:
            sky_a = 0.5 * (dy * inv_len + 1.0)
            rad_r = rad_r + m * thr_r * (1.0 - sky_a + sky_a * 0.5)
            rad_g = rad_g + m * thr_g * (1.0 - sky_a + sky_a * 0.7)
            rad_b = rad_b + m * thr_b * (1.0 - sky_a + sky_a * 1.0)
        else:
            # record (direction, throughput) at the miss instead; the caller
            # adds thr * sky(dir) outside the kernel (env-map support)
            mdx, mdy, mdz, mtr, mtg, mtb = miss_c
            miss_c = (
                jnp.where(m > 0.0, dx, mdx), jnp.where(m > 0.0, dy, mdy),
                jnp.where(m > 0.0, dz, mdz), jnp.where(m > 0.0, thr_r, mtr),
                jnp.where(m > 0.0, thr_g, mtg), jnp.where(m > 0.0, thr_b, mtb),
            )

        # ---- scatter (src/material.h) ----
        inv_dlen = inv_len
        udx = dx * inv_dlen; udy = dy * inv_dlen; udz = dz * inv_dlen

        # lambertian: normal + unit vector
        uvx, uvy, uvz = _unit_vector(shape)
        lam_x = nx + uvx; lam_y = ny + uvy; lam_z = nz + uvz

        # metal: reflect(unit_dir) + fuzz * in_unit_sphere. The ball point
        # reuses the SAME unit vector scaled by the ball-radius CDF^-1: a
        # lane is exactly one material, so the lambertian and metal variants
        # are never both consumed — per-lane draws stay independent across
        # bounces and the ball point is exactly src/vec3.h:129-135
        # distributed.
        u_dot_n = udx * nx + udy * ny + udz * nz
        rfl_x = udx - 2.0 * u_dot_n * nx
        rfl_y = udy - 2.0 * u_dot_n * ny
        rfl_z = udz - 2.0 * u_dot_n * nz
        br = _ball_radius(shape)
        fx = uvx * br; fy = uvy * br; fz = uvz * br
        met_x = rfl_x + hfz * fx; met_y = rfl_y + hfz * fy; met_z = rfl_z + hfz * fz
        met_ok = (met_x * nx + met_y * ny + met_z * nz) > 0.0

        # dielectric: refract-or-reflect with Schlick (src/material.h:55-71)
        ratio = jnp.where(front, 1.0 / hio, hio)
        cos_t = jnp.minimum(-(udx * nx + udy * ny + udz * nz), 1.0)
        s2 = 1.0 - cos_t * cos_t
        sin_t = jnp.sqrt(jnp.maximum(s2, 0.0))
        cannot = ratio * sin_t > 1.0
        r0s = (1.0 - ratio) / (1.0 + ratio)
        r0s = r0s * r0s
        one_m = 1.0 - cos_t
        if inject_bug == "schlick3":
            # fault injection (test fixture): wrong Schlick exponent — the
            # per-material-region statistics test must detect this
            schlick = r0s + (1.0 - r0s) * one_m * one_m * one_m
        else:
            schlick = r0s + (1.0 - r0s) * one_m * one_m * one_m * one_m * one_m
        do_refl = cannot | (schlick > _uniform(shape))
        # refract (src/vec3.h:153-158)
        perp_x = ratio * (udx + cos_t * nx)
        perp_y = ratio * (udy + cos_t * ny)
        perp_z = ratio * (udz + cos_t * nz)
        k = jnp.abs(1.0 - (perp_x * perp_x + perp_y * perp_y + perp_z * perp_z))
        spar = -jnp.sqrt(k)
        refr_x = perp_x + spar * nx
        refr_y = perp_y + spar * ny
        refr_z = perp_z + spar * nz
        die_x = jnp.where(do_refl, rfl_x, refr_x)
        die_y = jnp.where(do_refl, rfl_y, refr_y)
        die_z = jnp.where(do_refl, rfl_z, refr_z)

        is_lam = hmat == float(LAMBERTIAN)
        is_met = hmat == float(METAL)
        is_die = hmat == float(DIELECTRIC)
        sx = jnp.where(is_lam, lam_x, jnp.where(is_met, met_x, die_x))
        sy = jnp.where(is_lam, lam_y, jnp.where(is_met, met_y, die_y))
        sz = jnp.where(is_lam, lam_z, jnp.where(is_met, met_z, die_z))
        att_r = jnp.where(is_die, 1.0, har)
        att_g = jnp.where(is_die, 1.0, hag)
        att_b = jnp.where(is_die, 1.0, hab)
        # logical form, not jnp.where-on-bools (Mosaic i8->i1 truncation)
        scattered = (~is_met) | met_ok

        hit_live = alive_b & hit
        if res_refs is not None:
            # res_mask (PROBE-ONLY bisection knob, tools/kgrad.py): a False
            # entry skips that plane's stores — its output buffer holds
            # garbage, the probe only times. Production callers always
            # record all four.
            code_ref, ndx_ref, ndy_ref, ndz_ref = res_refs
            miss_live = alive_b & ~hit
            if res_mask[0]:
                # the RAW packed material slot rides out as the code plane
                # (hmatp = mat + 4*winner, exact f32 ints; +0.25 flags the
                # dielectric reflect branch — exact below 2^21). Decoding
                # (floor/divide) happens in XLA after the kernel: consuming
                # a floor-decode of the hit carry inside the bounce loop
                # collapsed the front kernel at depth 50 (KPROBES_r05
                # record_front_code_only), while storing a carried value
                # verbatim — like the direction planes — is free.
                rfl_bit = jnp.where(hit_live & is_die & do_refl, 0.25, 0.0)
                code_ref[pl.ds(dep, 1)] = jnp.where(
                    hit_live, hmatp + rfl_bit,
                    jnp.where(miss_live, -1.0, -2.0),
                )[None]
            if res_mask[1]:
                ndx_ref[pl.ds(dep, 1)] = jnp.where(hit_live, sx, 0.0)[None]
            if res_mask[2]:
                ndy_ref[pl.ds(dep, 1)] = jnp.where(hit_live, sy, 0.0)[None]
            if res_mask[3]:
                ndz_ref[pl.ds(dep, 1)] = jnp.where(hit_live, sz, 0.0)[None]
        thr_r = thr_r * jnp.where(hit_live, att_r, 1.0)
        thr_g = thr_g * jnp.where(hit_live, att_g, 1.0)
        thr_b = thr_b * jnp.where(hit_live, att_b, 1.0)
        ox = jnp.where(hit_live, px, ox)
        oy = jnp.where(hit_live, py, oy)
        oz = jnp.where(hit_live, pz, oz)
        dx = jnp.where(hit_live, sx, dx)
        dy = jnp.where(hit_live, sy, dy)
        dz = jnp.where(hit_live, sz, dz)
        alive = jnp.where(hit_live & scattered, 1.0, 0.0)
        # Park dead rays far outside every box with a fixed +diagonal
        # direction: every slab/sphere test misses them cleanly (t < 0, no
        # f32 overflow at 1e18^2), so the front culling skips subtrees that
        # only dead lanes used to point at. Radiance/state updates are
        # already masked by hit_live, so parking is invisible to the brute
        # path (bit-identical) and pure profit for the front path.
        dead = alive < 0.5
        ox = jnp.where(dead, 1e18, ox)
        oy = jnp.where(dead, 1e18, oy)
        oz = jnp.where(dead, 1e18, oz)
        dx = jnp.where(dead, 1.0, dx)
        dy = jnp.where(dead, 1.0, dy)
        dz = jnp.where(dead, 1.0, dz)
        return (ox, oy, oz, dx, dy, dz, thr_r, thr_g, thr_b,
                rad_r, rad_g, rad_b, alive) + miss_c

    carry = (ox, oy, oz, dx, dy, dz, thr_r, thr_g, thr_b,
             rad_r, rad_g, rad_b, alive) + miss0
    # Rolled depth loop (keeps kernel code size O(1) in max_depth — an
    # unrolled python loop at depth 16+ blows Mosaic compile time) as a
    # WHILE over depth: the loop condition is "depth remains AND any ray in
    # the tile is alive", so a tile whose rays all terminated exits the
    # bounce loop entirely at its death depth. (The earlier fori+cond form
    # still paid the ~460-cycle vector->scalar `any(alive)` sync for every
    # REMAINING depth iteration — at depth 16 with mean death ~2.7 that is
    # ~13 wasted syncs per tile; at depth 50, ~47.)
    def depth_cond(c):
        return (c[0] < max_depth) & (jnp.max(c[13]) > 0.5)

    def depth_body(c):
        return (c[0] + 1, *bounce(c[0], c[1:]))

    d_end, *carry = jax.lax.while_loop(
        depth_cond, depth_body, (jnp.int32(0), *carry)
    )
    carry = tuple(carry)
    if res_refs is not None:
        # Residual planes: every depth's row is written exactly once — live
        # bounces wrote real values inside bounce(); rows past the tile's
        # death depth get the DEAD row (code = 2 * DEAD = -4) in one tight
        # post-loop fill. (An upfront whole-block fill materialized a
        # [max_depth, 8, 128] constant per plane — 800 KB of VMEM stores
        # per tile at depth 50, most immediately overwritten.)
        def dead_fill(d, x):
            if res_mask[0]:
                res_refs[0][pl.ds(d, 1)] = jnp.full(
                    (1, SUB, LANES), -2.0, jnp.float32
                )
            for r, m in zip(res_refs[1:], res_mask[1:]):
                if m:
                    r[pl.ds(d, 1)] = jnp.zeros((1, SUB, LANES), jnp.float32)
            return x

        jax.lax.fori_loop(d_end, max_depth, dead_fill, 0)

    rr_ref[:] = carry[9]
    rg_ref[:] = carry[10]
    rb_ref[:] = carry[11]
    if state_out_refs is not None:
        for ref, val in zip(state_out_refs, carry[0:9] + (carry[12],)):
            ref[:] = val
    if miss_refs is not None:
        for ref, val in zip(miss_refs, carry[13:19]):
            ref[:] = val


def _split_outs(outs, record_miss):
    """(rr, rg, rb), miss_refs from a kernel's output-ref tail."""
    expected = 9 if record_miss else 3
    assert len(outs) == expected, (
        f"output-ref plane count mismatch: got {len(outs)}, expected "
        f"{expected} (record_miss={record_miss}) — a plane was added in one "
        "splitter but not the others"
    )
    if record_miss:
        return outs[:3], outs[3:9]
    return outs[:3], None


def _megakernel(
    seed_ref,  # SMEM (1, 1) int32
    sph_ref,   # SMEM (N_ROWS, N)
    *rest,     # 7 VMEM ray planes, then 3 radiance outs (+6 miss outs)
    n_spheres: int, max_depth: int, t_min: float, inject_bug=None,
    record_miss: bool = False,
):
    ray_refs = rest[:7]
    (rr_ref, rg_ref, rb_ref), miss_refs = _split_outs(rest[7:], record_miss)

    def hit(rays, shape):
        return _closest_hit_brute(sph_ref, rays, t_min, n_spheres, shape)

    _bounce_loop(seed_ref, hit, *ray_refs, rr_ref, rg_ref, rb_ref,
                 max_depth=max_depth, t_min=t_min, inject_bug=inject_bug,
                 miss_refs=miss_refs)


def _megakernel_bvh(
    seed_ref,  # SMEM (1, 1) int32
    sph_ref,   # SMEM (N_ROWS, N) — MUST be in BVH leaf order
    nf_ref,    # SMEM (6, M) float32 node boxes
    ni_ref,    # SMEM (3, M) int32 (miss, leaf_start, leaf_count)
    *rest,
    max_depth: int, t_min: float, inject_bug=None, record_miss: bool = False,
):
    ray_refs = rest[:7]
    (rr_ref, rg_ref, rb_ref), miss_refs = _split_outs(rest[7:], record_miss)

    def hit(rays, shape):
        return _closest_hit_bvh(sph_ref, nf_ref, ni_ref, rays, t_min, shape)

    _bounce_loop(seed_ref, hit, *ray_refs, rr_ref, rg_ref, rb_ref,
                 max_depth=max_depth, t_min=t_min, inject_bug=inject_bug,
                 miss_refs=miss_refs)


def _megakernel_front(
    seed_ref,  # SMEM (1, 1) int32
    sph_ref,   # SMEM (N_ROWS, Np) — front-padded table (front_tables)
    ff_ref,    # SMEM (8, F) float32 subtree boxes (min xyz, max xyz, 0, 0)
    fi_ref,    # SMEM (2, F) int32 (start, padded count)
    wf_ref,    # SMEM (8, Wp) float32 word-level union boxes
    sf_ref,    # SMEM (8, S) float32 super-word union boxes
    *rest,     # [bf_ref] 7 ray planes, 3 (+6 miss) outs, then the SMEM
    #            scratches (livew, live[, liveb])
    n_front: int, max_depth: int, t_min: float, inject_bug=None,
    record_miss: bool = False, repack: int = 1, ksub: int = 0,
    word_earlyout: bool = False,
):
    if ksub:
        bf_ref, *rest = rest
        livew_ref, live_ref, liveb_ref = rest[-3:]
        tail = rest[7:-3]
    else:
        bf_ref, liveb_ref = None, None
        livew_ref, live_ref = rest[-2:]
        tail = rest[7:-2]
    ray_refs = rest[:7]
    (rr_ref, rg_ref, rb_ref), miss_refs = _split_outs(tail, record_miss)

    def hit(rays, shape):
        return _closest_hit_front(sph_ref, ff_ref, fi_ref, wf_ref, sf_ref,
                                  livew_ref, live_ref, rays, t_min, n_front,
                                  shape, repack=repack, bf_ref=bf_ref,
                                  liveb_ref=liveb_ref, ksub=ksub,
                                  word_earlyout=word_earlyout)

    _bounce_loop(seed_ref, hit, *ray_refs, rr_ref, rg_ref, rb_ref,
                 max_depth=max_depth, t_min=t_min, inject_bug=inject_bug,
                 miss_refs=miss_refs)


class FrontTables:
    """Device tables for the front-culled megakernel (see
    _closest_hit_front). Built once per scene by `front_tables`."""

    def __init__(self, sph: jnp.ndarray, ff: jnp.ndarray, fi: jnp.ndarray,
                 wf: jnp.ndarray, sf: jnp.ndarray,
                 remap: jnp.ndarray | None = None, repack: int = 1,
                 bf: jnp.ndarray | None = None, ksub: int = 0,
                 word_earlyout: bool = False):
        self.sph = sph  # (N_ROWS, Np) front-padded sphere table
        self.ff = ff    # (8, F) f32 subtree boxes
        self.fi = fi    # (2, F) i32 (start, count)
        self.wf = wf    # (8, Wp) f32 word-level union boxes (Wp = words
        #                 padded to a WORD multiple when 3 levels are used)
        self.sf = sf    # (8, S) f32 super-word union boxes
        # (Np,) i32: padded-table column -> index into the (leaf-ordered)
        # scene arrays — maps the kernel's winner index back to scene space
        # for the path-replay residuals.
        self.remap = remap
        # static: intra-word best-t re-pack count (see _closest_hit_front);
        # pytree AUX data, so it keys the jit cache like any static arg.
        self.repack = repack
        # sub-block descent (round-5 missing #5): (8, Np/UNROLL) boxes, one
        # per 8 consecutive padded sphere columns; ksub = max sub-blocks in
        # any subtree (static pack width). None = no descent.
        self.bf = bf
        self.ksub = ksub
        # per-word best-t early-out before the word's chunk packs
        self.word_earlyout = word_earlyout

    def tree_flatten(self):
        return (self.sph, self.ff, self.fi, self.wf, self.sf, self.remap,
                self.bf), (self.repack, self.ksub, self.word_earlyout)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        repack, ksub, weo = aux
        *core, bf = leaves
        return cls(*core, repack=repack, bf=bf, ksub=ksub, word_earlyout=weo)


jax.tree_util.register_pytree_node(
    FrontTables,
    lambda t: t.tree_flatten(),
    FrontTables.tree_unflatten,
)


# SMEM budget for the scene + front tables: the hardware limit measured on
# v5e is ~1 MiB (16k-sphere tables compile, 20k fail); keep headroom for
# Mosaic's own scalar state.
SMEM_BUDGET_BYTES = 960 * 1024


# Default intra-word re-pack count for front tables (see
# _closest_hit_front): bench sweeps pick the winner per round; front_tables
# callers inherit this unless they pass repack explicitly. Round-4 sweep
# (BENCH repack 1/2/3 = 13.57/13.83/13.68 Mrays/s headline; FRONT_r04
# cover rows agree): 2 wins.
DEFAULT_REPACK = 2


def default_front_nodes(n_spheres: int) -> int:
    """Front size: ~26 spheres per subtree, in WORD multiples. The
    hierarchical kernel (words of 24 subtrees, super-words of 24 words) is
    O(1) in code size and O(live) in syncs, so the front scales with the
    scene up to the 3-level limit of 24^3 subtrees."""
    f = max(1, round(n_spheres / 26 / WORD)) * WORD
    return min(max(f, WORD), WORD * WORD * WORD)


def front_tables(scene: Scene, bvh, max_nodes: int | None = None,
                 order_point=None, repack: int | None = None,
                 sub_block: bool = False,
                 word_earlyout: bool = False) -> FrontTables:
    """Build the front-culling tables. `scene` MUST already be permuted to
    BVH leaf order (bvh.reorder_scene); `bvh` is its FlatBVH.

    Each subtree's sphere range is padded to a UNROLL multiple by repeating
    its last sphere — retesting a sphere is a no-op under the strict `<`
    best-t update, so radiance stays identical to the brute scan up to
    closest-hit tie-breaking (see _closest_hit_front).

    `order_point` (e.g. the camera position) orders subtrees near-to-far
    so stage-2's per-word best-t clamp culls far words early
    (bvh.bvh_front docstring)."""
    import numpy as np

    from raytracingproject_tpu.bvh import bvh_front

    if repack is None:
        repack = DEFAULT_REPACK
    if max_nodes is None:
        max_nodes = default_front_nodes(int(scene.radius.shape[0]))
    max_nodes = ((max_nodes + WORD - 1) // WORD) * WORD
    fr = bvh_front(bvh, max_nodes=max_nodes, order_point=order_point)
    sph = np.asarray(_scene_table(scene))

    cols = []
    remap_cols = []
    new_start = np.zeros_like(fr.start)
    new_count = np.zeros_like(fr.count)
    pos = 0
    for k in range(fr.start.shape[0]):
        s, c = int(fr.start[k]), int(fr.count[k])
        if c == 0:
            continue
        cp = ((c + UNROLL - 1) // UNROLL) * UNROLL
        block = sph[:, s : s + c]
        ids = np.arange(s, s + c, dtype=np.int32)
        if cp > c:
            block = np.concatenate(
                [block, np.repeat(block[:, -1:], cp - c, axis=1)], axis=1
            )
            ids = np.concatenate([ids, np.repeat(ids[-1:], cp - c)])
        new_start[k] = pos
        new_count[k] = cp
        cols.append(block)
        remap_cols.append(ids)
        pos += cp
    sph_pad = np.concatenate(cols, axis=1)
    remap = np.concatenate(remap_cols)
    ff = np.zeros((8, fr.fmin.shape[0]), np.float32)
    ff[0:3] = fr.fmin.T
    ff[3:6] = fr.fmax.T
    fi = np.stack([new_start, new_count]).astype(np.int32)
    # Word-level union boxes (stage-1 cull): one AABB per 24-subtree word,
    # unioned over REAL subtrees only (padding entries sit at 1e30 and would
    # blow the union up); all-padding words get the same degenerate 1e30
    # point, which the strict tf > tn slab test always misses.
    n_words = fr.fmin.shape[0] // WORD
    n_super = (n_words + WORD - 1) // WORD
    # With 3 levels the word table is padded to a WORD multiple of columns
    # so per-super packs are a static 24 boxes (padding words degenerate).
    n_words_pad = n_super * WORD if n_super > 1 else n_words
    wf = np.full((8, n_words_pad), 0.0, np.float32)
    wf[0:6] = 1e30
    for wd in range(n_words):
        sl = slice(wd * WORD, (wd + 1) * WORD)
        real = fr.count[sl] > 0
        if real.any():
            wf[0:3, wd] = fr.fmin[sl][real].min(axis=0)
            wf[3:6, wd] = fr.fmax[sl][real].max(axis=0)
            wf[6:8, wd] = 0.0
    # Super-word union boxes (only consulted when n_super > 1).
    sf = np.full((8, max(n_super, 1)), 0.0, np.float32)
    sf[0:6] = 1e30
    for sw in range(n_super):
        sl = slice(sw * WORD, min((sw + 1) * WORD, n_words))
        real = wf[0, sl] < 1e29
        if real.any():
            sf[0:3, sw] = wf[0:3, sl][:, real].min(axis=1)
            sf[3:6, sw] = wf[3:6, sl][:, real].max(axis=1)
            sf[6:8, sw] = 0.0
    bf = None
    ksub = 0
    if sub_block:
        # one box per UNROLL consecutive PADDED columns (starts are
        # UNROLL-aligned, so sub-block j of subtree k is a plain column
        # range of bf); padding repeats of the last sphere only tighten
        # nothing — the union stays exact
        c0c = sph_pad[0:3]
        c1c = c0c + sph_pad[3:6]
        rc = np.abs(sph_pad[6])
        bmin = np.minimum(c0c, c1c) - rc
        bmax = np.maximum(c0c, c1c) + rc
        nblk = sph_pad.shape[1] // UNROLL
        ksub = int(new_count.max() // UNROLL)
        assert ksub <= 31, f"subtree of {ksub * UNROLL} spheres: pack word overflow"
        # pad ksub degenerate columns: the pack is a STATIC ksub boxes from
        # each subtree's first block, so the last subtree's pack reads past
        # the real table; 1e30 boxes never set a bit
        bf = np.zeros((8, nblk + ksub), np.float32)
        bf[0:6] = 1e30
        bf[0:3, :nblk] = bmin.reshape(3, nblk, UNROLL).min(axis=2)
        bf[3:6, :nblk] = bmax.reshape(3, nblk, UNROLL).max(axis=2)
        bf[6:8, :nblk] = 0.0
    smem_bytes = 4 * (
        sph_pad.size + ff.size + fi.size + wf.size + sf.size
        + n_words_pad + 2 * WORD  # livew + live scratch
        + (bf.size + 64 if bf is not None else 0)
    )
    if smem_bytes > SMEM_BUDGET_BYTES:
        raise ValueError(
            f"front tables need {smem_bytes} B of SMEM (> {SMEM_BUDGET_BYTES} "
            f"budget): {sph_pad.shape[1]} padded spheres x {N_ROWS} rows. "
            "Scenes this large need the HBM-staged sphere table "
            "(front_tables_hbm)."
        )
    return FrontTables(
        jnp.asarray(sph_pad), jnp.asarray(ff), jnp.asarray(fi),
        jnp.asarray(wf), jnp.asarray(sf), jnp.asarray(remap), repack=repack,
        bf=None if bf is None else jnp.asarray(bf), ksub=ksub,
        word_earlyout=word_earlyout,
    )


class FrontRefresher:
    """Per-step host-side front refresh for GEOMETRY training.

    grad/fast.py's stale-bounds guard forbids passing `front` when geometry
    fields are trainable — the tables snapshot fixed geometry. This closes
    the documented-but-missing alternative (round-3 VERDICT missing #4):
    the subtree PARTITION (leaf order, subtree ranges, padded layout) is
    frozen at build time, and `refresh(params)` recomputes only the VALUES —
    the padded sphere table and exact union boxes of every subtree/word/
    super-word — from the current parameters in O(N) numpy (~100 us at
    cover scale). Culling stays exactness-preserving for ANY partition as
    long as each box bounds its spheres, which the exact per-step unions
    guarantee; only cull QUALITY decays if geometry drifts far from the
    build-time sort (rebuild a new refresher then — same table shapes means
    no recompile as long as the partition sizes match).

    Unlike front_tables, `remap` maps kernel winner columns to the
    ORIGINAL scene order (prim_order composed in), so the training scene
    and params never need reordering."""

    def __init__(self, scene: Scene, bvh, max_nodes: int | None = None,
                 order_point=None, repack: int | None = None):
        import numpy as np

        from raytracingproject_tpu.bvh import bvh_front

        # None -> the library-tuned DEFAULT_REPACK, same as front_tables:
        # geometry training previously defaulted to repack=1 and silently
        # lost the benchmarked repack-2 win when switching to the refresher
        self.repack = DEFAULT_REPACK if repack is None else repack
        n = int(scene.radius.shape[0])
        if max_nodes is None:
            max_nodes = default_front_nodes(n)
        max_nodes = ((max_nodes + WORD - 1) // WORD) * WORD
        fr = bvh_front(bvh, max_nodes=max_nodes, order_point=order_point)
        prim_order = np.asarray(bvh.prim_order)
        F = fr.start.shape[0]
        col_src = []
        new_start = np.zeros(F, np.int32)
        new_count = np.zeros(F, np.int32)
        pos = 0
        for k in range(F):
            s, c = int(fr.start[k]), int(fr.count[k])
            if c == 0:
                continue
            cp = ((c + UNROLL - 1) // UNROLL) * UNROLL
            ids = np.arange(s, s + c, dtype=np.int64)
            ids = np.concatenate([ids, np.repeat(ids[-1:], cp - c)])
            col_src.append(ids)
            new_start[k] = pos
            new_count[k] = cp
            pos += cp
        col_src_leaf = np.concatenate(col_src)
        self.col_src_orig = prim_order[col_src_leaf]
        self.fi = np.stack([new_start, new_count]).astype(np.int32)
        self.real = np.asarray(fr.count) > 0
        self.F = F
        self.n_words = F // WORD
        self.n_super = (self.n_words + WORD - 1) // WORD
        self.n_words_pad = (
            self.n_super * WORD if self.n_super > 1 else self.n_words
        )
        self.mat_type = np.asarray(scene.mat_type).astype(np.float32)
        self.seg_starts = new_start[self.real]
        self.remap = jnp.asarray(self.col_src_orig.astype(np.int32))
        smem_bytes = 4 * (
            N_ROWS * pos + 8 * F + 2 * F + 8 * self.n_words_pad
            + 8 * max(self.n_super, 1) + self.n_words + 2 * WORD
        )
        if smem_bytes > SMEM_BUDGET_BYTES:
            raise ValueError(
                f"refreshed front tables need {smem_bytes} B of SMEM "
                f"(> {SMEM_BUDGET_BYTES}); geometry training at this scale "
                "needs a smaller front or the brute recording forward"
            )

    def refresh_in_jit(self, params) -> FrontTables:
        """FrontTables for the CURRENT params, computed ON DEVICE with
        jittable ops — call INSIDE the training step's jit. The fixed
        partition becomes static gather/segment maps; the refresh is then
        a handful of fused gathers and segment reductions (~microseconds),
        with ZERO host round-trips. (The host `refresh()` costs 7+ tunnel
        RTTs per step on this backend — measured 42-250 ms, dominating the
        step; GEOM_r04 batch 1.)"""
        import numpy as np

        F = self.F
        n_words = self.n_words
        col = jnp.asarray(self.col_src_orig.astype(np.int32))
        # subtree id per padded column (static): from the fixed fi layout
        seg_np = np.zeros(self.col_src_orig.shape[0], np.int32)
        for k in range(F):
            s, c = int(self.fi[0, k]), int(self.fi[1, k])
            if c:
                seg_np[s : s + c] = k
        seg = jnp.asarray(seg_np)
        real = jnp.asarray(self.real)

        table = jnp.concatenate(
            [
                params.center0.T, params.center_delta.T,
                params.radius[None, :],
                jnp.asarray(self.mat_type)[None, :],
                params.albedo.T, params.fuzz[None, :], params.ior[None, :],
            ],
            axis=0,
        ).astype(jnp.float32)
        # rows here: 0:3 c0, 3:6 cd, 6 rad, 7 mat, 8:11 alb, 11 fuzz,
        # 12 ior — matches _scene_table's layout; pad to N_ROWS
        table = jnp.concatenate(
            [table, jnp.zeros((N_ROWS - table.shape[0], table.shape[1]),
                              jnp.float32)], axis=0
        )
        sph_pad = table[:, col]

        c0c = sph_pad[0:3]
        c1c = c0c + sph_pad[3:6]
        rc = jnp.abs(sph_pad[6])
        bmin = (jnp.minimum(c0c, c1c) - rc).T  # (Np, 3)
        bmax = (jnp.maximum(c0c, c1c) + rc).T
        fmin = jax.ops.segment_min(bmin, seg, num_segments=F,
                                   indices_are_sorted=True)
        fmax = jax.ops.segment_max(bmax, seg, num_segments=F,
                                   indices_are_sorted=True)
        fmin = jnp.where(real[:, None], fmin, 1e30)
        fmax = jnp.where(real[:, None], fmax, 1e30)
        ff = jnp.concatenate([fmin.T, fmax.T, jnp.zeros((2, F))], axis=0)

        wid = jnp.asarray(np.arange(F, dtype=np.int32) // WORD)
        # padding subtrees carry 1e30 mins (lose the min) and are masked to
        # -1e30 for the max; all-padding words fall back to the degenerate
        # 1e30 point
        wmin = jax.ops.segment_min(fmin, wid, num_segments=n_words,
                                   indices_are_sorted=True)
        wmax = jax.ops.segment_max(
            jnp.where(real[:, None], fmax, -1e30), wid,
            num_segments=n_words, indices_are_sorted=True,
        )
        word_real = jax.ops.segment_max(
            real.astype(jnp.int32), wid, num_segments=n_words,
            indices_are_sorted=True,
        ) > 0
        wmin = jnp.where(word_real[:, None], wmin, 1e30)
        wmax = jnp.where(word_real[:, None], wmax, 1e30)
        pad_w = self.n_words_pad - n_words
        if pad_w:
            wmin = jnp.concatenate([wmin, jnp.full((pad_w, 3), 1e30)])
            wmax = jnp.concatenate([wmax, jnp.full((pad_w, 3), 1e30)])
            word_real = jnp.concatenate(
                [word_real, jnp.zeros((pad_w,), bool)]
            )
        wf = jnp.concatenate(
            [wmin.T, wmax.T, jnp.zeros((2, self.n_words_pad))], axis=0
        )

        n_super = max(self.n_super, 1)
        sid = jnp.asarray(
            np.arange(self.n_words_pad, dtype=np.int32) // WORD
        )
        smin = jax.ops.segment_min(wmin, sid, num_segments=n_super,
                                   indices_are_sorted=True)
        smax = jax.ops.segment_max(
            jnp.where(word_real[:, None], wmax, -1e30), sid,
            num_segments=n_super, indices_are_sorted=True,
        )
        s_real = jax.ops.segment_max(
            word_real.astype(jnp.int32), sid, num_segments=n_super,
            indices_are_sorted=True,
        ) > 0
        smin = jnp.where(s_real[:, None], smin, 1e30)
        smax = jnp.where(s_real[:, None], smax, 1e30)
        sf = jnp.concatenate([smin.T, smax.T, jnp.zeros((2, n_super))], axis=0)

        return FrontTables(
            sph_pad, ff.astype(jnp.float32), jnp.asarray(self.fi),
            wf.astype(jnp.float32), sf.astype(jnp.float32), self.remap,
            repack=self.repack,
        )

    def refresh(self, params) -> FrontTables:
        """FrontTables for the CURRENT params (host numpy, ~O(N)).
        Prefer refresh_in_jit on tunneled backends — this version pays
        host round-trips per call."""
        import numpy as np

        p = jax.device_get(params)
        c0 = np.asarray(p.center0, np.float32)
        cd = np.asarray(p.center_delta, np.float32)
        table = np.zeros((N_ROWS, c0.shape[0]), np.float32)
        table[0:3] = c0.T
        table[3:6] = cd.T
        table[6] = np.asarray(p.radius, np.float32)
        table[7] = self.mat_type
        table[8:11] = np.asarray(p.albedo, np.float32).T
        table[11] = np.asarray(p.fuzz, np.float32)
        table[12] = np.asarray(p.ior, np.float32)
        sph_pad = table[:, self.col_src_orig]

        # exact per-column bounds incl. motion (src/sphere.h:9-28 unions)
        c0c = sph_pad[0:3]
        c1c = c0c + sph_pad[3:6]
        rc = np.abs(sph_pad[6])
        bmin = (np.minimum(c0c, c1c) - rc).T  # (Np, 3)
        bmax = (np.maximum(c0c, c1c) + rc).T
        fmin = np.full((self.F, 3), 1e30, np.float32)
        fmax = np.full((self.F, 3), 1e30, np.float32)
        if self.seg_starts.size:
            fmin[self.real] = np.minimum.reduceat(bmin, self.seg_starts, axis=0)
            fmax[self.real] = np.maximum.reduceat(bmax, self.seg_starts, axis=0)
        ff = np.zeros((8, self.F), np.float32)
        ff[0:3] = fmin.T
        ff[3:6] = fmax.T
        wf = np.zeros((8, self.n_words_pad), np.float32)
        wf[0:6] = 1e30
        for wd in range(self.n_words):
            sl = slice(wd * WORD, (wd + 1) * WORD)
            r = self.real[sl]
            if r.any():
                wf[0:3, wd] = fmin[sl][r].min(axis=0)
                wf[3:6, wd] = fmax[sl][r].max(axis=0)
                wf[6:8, wd] = 0.0
        sf = np.zeros((8, max(self.n_super, 1)), np.float32)
        sf[0:6] = 1e30
        for sw in range(self.n_super):
            sl = slice(sw * WORD, min((sw + 1) * WORD, self.n_words))
            r = wf[0, sl] < 1e29
            if r.any():
                sf[0:3, sw] = wf[0:3, sl][:, r].min(axis=1)
                sf[3:6, sw] = wf[3:6, sl][:, r].max(axis=1)
                sf[6:8, sw] = 0.0
        return FrontTables(
            jnp.asarray(sph_pad), jnp.asarray(ff), jnp.asarray(self.fi),
            jnp.asarray(wf), jnp.asarray(sf), self.remap, repack=self.repack,
        )


def _pad_flat(x, total):
    pad = total - x.shape[0]
    if pad == 0:
        return x.astype(jnp.float32)
    return jnp.concatenate([x, jnp.broadcast_to(x[:1], (pad,))]).astype(jnp.float32)


def _scene_table(scene: Scene) -> jnp.ndarray:
    rows = [
        scene.center0[:, 0], scene.center0[:, 1], scene.center0[:, 2],
        scene.center_delta[:, 0], scene.center_delta[:, 1], scene.center_delta[:, 2],
        scene.radius, scene.mat_type.astype(jnp.float32),
        scene.albedo[:, 0], scene.albedo[:, 1], scene.albedo[:, 2],
        scene.fuzz, scene.ior,
    ]
    sph = jnp.stack(rows + [jnp.zeros_like(scene.radius)] * (N_ROWS - len(rows)))
    return sph.astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("max_depth", "t_min", "interpret", "inject_bug",
                     "record_miss"),
)
def pallas_trace_paths(
    origin: jnp.ndarray,     # [R, 3]
    direction: jnp.ndarray,  # [R, 3]
    time: jnp.ndarray,       # [R]
    scene: Scene,
    seed: jnp.ndarray,       # scalar int32
    max_depth: int,
    t_min: float = T_MIN,
    interpret: bool = False,
    bvh=None,                # FlatBVH over `scene` (already in leaf order)
    front=None,              # FrontTables (wins over bvh when both given)
    inject_bug: str | None = None,  # fault injection (tests only)
    record_miss: bool = False,
) -> jnp.ndarray:
    """Radiance [R, 3] for camera rays — full path trace in one kernel.

    With `record_miss=True` the kernel does NOT add the built-in sky
    gradient; it returns (radiance, miss_dir [R, 3], miss_thr [R, 3]) where
    miss_dir/miss_thr are the ray direction and path throughput at the
    (unique) miss event, zeros for paths that never missed. The caller adds
    `miss_thr * sky(miss_dir)` — this is how environment-map lighting
    (render.sky_color with a texture) rides the megakernel.

    With `bvh` (a bvh.FlatBVH built over `scene`; the scene MUST already be
    permuted to leaf order via bvh.reorder_scene) closest-hit runs the
    tile-uniform traversal — sub-linear in sphere count for coherent tiles.

    With `front` (FrontTables from `front_tables`) closest-hit runs the
    front-culled scan — the fastest path measured (FRONT_r04: 1.7x brute
    at 488 spheres, 3.98x at 5000 with camera-distance ordering, depth-50
    forward 2.7x brute). The kernel reads the front's own padded sphere
    table, so `scene` only feeds ray generation here.
    """
    R = origin.shape[0]
    n = scene.radius.shape[0]
    r_pad = ((R + TILE - 1) // TILE) * TILE
    tiles = r_pad // TILE

    comps = [
        _pad_flat(origin[:, 0], r_pad), _pad_flat(origin[:, 1], r_pad),
        _pad_flat(origin[:, 2], r_pad), _pad_flat(direction[:, 0], r_pad),
        _pad_flat(direction[:, 1], r_pad), _pad_flat(direction[:, 2], r_pad),
        _pad_flat(time, r_pad),
    ]
    comps = [c.reshape(tiles * SUB, LANES) for c in comps]

    ray_spec = pl.BlockSpec((SUB, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.SMEM)

    scratch_shapes = []
    if front is not None and isinstance(front, FrontTablesHBM):
        n_front = front.ff.shape[1]
        kernel = functools.partial(
            _megakernel_front_hbm, n_front=n_front, max_depth=max_depth,
            t_min=t_min, inject_bug=inject_bug, record_miss=record_miss,
            word_earlyout=front.word_earlyout, ksub=front.ksub,
        )
        in_specs = [
            smem((1, 1)),
            pl.BlockSpec(memory_space=pltpu.ANY),  # sphere table stays in HBM
            smem((8, n_front)), smem((1, n_front)),
            smem(front.wf.shape), smem(front.sf.shape),
        ]
        args = (
            jnp.asarray(seed, jnp.int32).reshape(1, 1),
            front.sph, front.ff, front.fi, front.wf, front.sf,
        )
        scratch_shapes = [
            pltpu.SMEM((1, n_front // WORD), jnp.int32),
            pltpu.SMEM((2, WORD), jnp.int32),
            pltpu.SMEM((2 * N_ROWS, BLOCK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        if front.ksub:
            in_specs.append(smem(front.bf.shape))
            args = args + (front.bf,)
            scratch_shapes.append(pltpu.SMEM((1, 64), jnp.int32))
    elif front is not None:
        n_front = front.ff.shape[1]
        kernel = functools.partial(
            _megakernel_front, n_front=n_front, max_depth=max_depth,
            t_min=t_min, inject_bug=inject_bug, record_miss=record_miss,
            repack=front.repack, ksub=front.ksub,
            word_earlyout=front.word_earlyout,
        )
        in_specs = [
            smem((1, 1)), smem(front.sph.shape),
            smem((8, n_front)), smem((2, n_front)),
            smem(front.wf.shape), smem(front.sf.shape),
        ]
        args = (
            jnp.asarray(seed, jnp.int32).reshape(1, 1),
            front.sph, front.ff, front.fi, front.wf, front.sf,
        )
        scratch_shapes = [
            pltpu.SMEM((1, n_front // WORD), jnp.int32),
            pltpu.SMEM((2, WORD), jnp.int32),
        ]
        if front.ksub:
            in_specs.append(smem(front.bf.shape))
            args = args + (front.bf,)
            scratch_shapes.append(pltpu.SMEM((1, 64), jnp.int32))
    elif bvh is None:
        kernel = functools.partial(
            _megakernel, n_spheres=n, max_depth=max_depth, t_min=t_min,
            inject_bug=inject_bug, record_miss=record_miss,
        )
        in_specs = [smem((1, 1)), smem((N_ROWS, n))]
        args = (jnp.asarray(seed, jnp.int32).reshape(1, 1), _scene_table(scene))
    else:
        m = bvh.node_min.shape[0]
        nf = jnp.stack([
            bvh.node_min[:, 0], bvh.node_min[:, 1], bvh.node_min[:, 2],
            bvh.node_max[:, 0], bvh.node_max[:, 1], bvh.node_max[:, 2],
        ]).astype(jnp.float32)
        ni = jnp.stack([
            bvh.miss_link, bvh.leaf_start, bvh.leaf_count
        ]).astype(jnp.int32)
        kernel = functools.partial(
            _megakernel_bvh, max_depth=max_depth, t_min=t_min,
            inject_bug=inject_bug, record_miss=record_miss,
        )
        in_specs = [smem((1, 1)), smem((N_ROWS, n)), smem((6, m)), smem((3, m))]
        args = (jnp.asarray(seed, jnp.int32).reshape(1, 1), _scene_table(scene), nf, ni)

    n_out = 9 if record_miss else 3
    outs = pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=in_specs + [ray_spec] * 7,
        out_specs=[ray_spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((tiles * SUB, LANES), jnp.float32)]
        * n_out,
        scratch_shapes=scratch_shapes,
        # TPU interpret params (not plain interpret=True): the hardware PRNG
        # primitives only have lowering rules in the TPU interpreter.
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(*args, *comps)

    stack3 = lambda xs: jnp.stack([x.reshape(-1)[:R] for x in xs], axis=-1)
    rad = stack3(outs[:3])
    if record_miss:
        return rad, stack3(outs[3:6]), stack3(outs[6:9])
    return rad


@functools.partial(
    jax.jit, static_argnames=("max_depth", "t_min", "interpret", "res_mask")
)
def pallas_trace_record(
    origin: jnp.ndarray,     # [R, 3]
    direction: jnp.ndarray,  # [R, 3]
    time: jnp.ndarray,       # [R]
    scene: Scene,
    seed: jnp.ndarray,       # scalar int32
    max_depth: int,
    t_min: float = T_MIN,
    interpret: bool = False,
    bvh=None,
    front=None,
    res_mask: tuple = (True, True, True, True),
):
    """Like pallas_trace_paths, but also records path residuals in-kernel
    for the path-replay backward (grad/replay.py).

    Returns (radiance [R, 3], grad.replay.PathResiduals) — idx [D, R] int32
    (>=0 hit sphere in THIS scene's ordering, -1 miss, -2 dead), ndir
    [D, R, 3], refl [D, R] bool. With `front` (FrontTables) the closest hit
    is the front-culled scan; the kernel's winner index (a column of the
    front-padded table) is mapped back to scene order via front.remap."""
    from raytracingproject_tpu.grad.replay import PathResiduals

    R = origin.shape[0]
    n = scene.radius.shape[0]
    r_pad = ((R + TILE - 1) // TILE) * TILE
    tiles = r_pad // TILE

    comps = [
        _pad_flat(origin[:, 0], r_pad), _pad_flat(origin[:, 1], r_pad),
        _pad_flat(origin[:, 2], r_pad), _pad_flat(direction[:, 0], r_pad),
        _pad_flat(direction[:, 1], r_pad), _pad_flat(direction[:, 2], r_pad),
        _pad_flat(time, r_pad),
    ]
    comps = [c.reshape(tiles * SUB, LANES) for c in comps]

    ray_spec = pl.BlockSpec((SUB, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    res_spec = pl.BlockSpec(
        (max_depth, SUB, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    smem = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.SMEM)

    def wrap(kernel_core, n_in, n_scratch):
        def kernel(*refs):
            ins = refs[:n_in]
            outs = refs[n_in:len(refs) - n_scratch]
            scratch = refs[len(refs) - n_scratch:] if n_scratch else ()
            rr, rg, rb, code, ndx, ndy, ndz = outs
            kernel_core(*ins, rr, rg, rb, *scratch,
                        res_refs=(code, ndx, ndy, ndz))

        return kernel

    scratch_shapes = []
    if front is not None:
        n_front = front.ff.shape[1]

        def core(seed_ref, sph_ref, ff_ref, fi_ref, wf_ref, sf_ref, *rest,
                 res_refs):
            ray_refs = rest[:7]
            rr, rg, rb, livew_ref, live_ref = rest[7:]

            def hit(rays, shape):
                return _closest_hit_front(
                    sph_ref, ff_ref, fi_ref, wf_ref, sf_ref, livew_ref,
                    live_ref, rays, t_min, n_front, shape,
                    repack=front.repack,
                    word_earlyout=front.word_earlyout,
                )

            _bounce_loop(seed_ref, hit, *ray_refs, rr, rg, rb,
                         max_depth=max_depth, t_min=t_min, res_refs=res_refs,
                         res_mask=res_mask)

        in_specs = [
            smem((1, 1)), smem(front.sph.shape),
            smem((8, n_front)), smem((2, n_front)),
            smem(front.wf.shape), smem(front.sf.shape),
        ]
        args = (
            jnp.asarray(seed, jnp.int32).reshape(1, 1),
            front.sph, front.ff, front.fi, front.wf, front.sf,
        )
        scratch_shapes = [
            pltpu.SMEM((1, n_front // WORD), jnp.int32),
            pltpu.SMEM((2, WORD), jnp.int32),
        ]
    elif bvh is None:
        def core(seed_ref, sph_ref, *rest, res_refs):
            ray_refs, out_refs = rest[:7], rest[7:]

            def hit(rays, shape):
                return _closest_hit_brute(sph_ref, rays, t_min, n, shape)

            _bounce_loop(seed_ref, hit, *ray_refs, *out_refs,
                         max_depth=max_depth, t_min=t_min, res_refs=res_refs,
                         res_mask=res_mask)

        in_specs = [smem((1, 1)), smem((N_ROWS, n))]
        args = (jnp.asarray(seed, jnp.int32).reshape(1, 1), _scene_table(scene))
    else:
        m = bvh.node_min.shape[0]
        nf = jnp.stack([
            bvh.node_min[:, 0], bvh.node_min[:, 1], bvh.node_min[:, 2],
            bvh.node_max[:, 0], bvh.node_max[:, 1], bvh.node_max[:, 2],
        ]).astype(jnp.float32)
        ni = jnp.stack([
            bvh.miss_link, bvh.leaf_start, bvh.leaf_count
        ]).astype(jnp.int32)

        def core(seed_ref, sph_ref, nf_ref, ni_ref, *rest, res_refs):
            ray_refs, out_refs = rest[:7], rest[7:]

            def hit(rays, shape):
                return _closest_hit_bvh(sph_ref, nf_ref, ni_ref, rays, t_min, shape)

            _bounce_loop(seed_ref, hit, *ray_refs, *out_refs,
                         max_depth=max_depth, t_min=t_min, res_refs=res_refs,
                         res_mask=res_mask)

        in_specs = [smem((1, 1)), smem((N_ROWS, n)), smem((6, m)), smem((3, m))]
        args = (jnp.asarray(seed, jnp.int32).reshape(1, 1), _scene_table(scene), nf, ni)

    n_in = len(in_specs) + 7
    in_specs = in_specs + [ray_spec] * 7

    outs = pl.pallas_call(
        wrap(core, n_in, len(scratch_shapes)),
        grid=(tiles,),
        in_specs=in_specs,
        out_specs=[ray_spec] * 3 + [res_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((tiles * SUB, LANES), jnp.float32)] * 3
        + [jax.ShapeDtypeStruct((max_depth, tiles * SUB, LANES), jnp.float32)] * 4,
        scratch_shapes=scratch_shapes,
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(*args, *comps)

    rr, rg, rb, code, ndx, ndy, ndz = outs
    rad = jnp.stack(
        [rr.reshape(-1)[:R], rg.reshape(-1)[:R], rb.reshape(-1)[:R]], axis=-1
    )
    flat = lambda x: x.reshape(max_depth, -1)[:, :R]
    # winner indices are columns of the front-padded table when `front` is
    # given; remap maps back to the (leaf-ordered) scene the replay
    # differentiates.
    idx, refl = _decode_res(
        flat(code), front.remap if front is not None else None
    )
    res = PathResiduals(
        idx=idx,
        ndir=jnp.stack([flat(ndx), flat(ndy), flat(ndz)], axis=-1),
        refl=refl,
    )
    return rad, res


# ---------------------------------------------------------------------------
# Segmented deep tracing: megakernel segments + inter-segment compaction.
#
# MEASURED VERDICT (round 3, real v5e — keep this; do NOT re-enable by
# default): the design LOSES. At depth 50, 400x225x4spp, cover scene, front
# culling: monolithic kernel 5.34 Mrays/s; segmented (seg_len 8) 0.48
# Mrays/s — the per-segment state round-trips through HBM plus the
# argsort/gather compaction cost ~11x more than tile-granular early exit
# wastes (front culling makes dead-heavy tiles cheap anyway: dead rays are
# parked outside every box, so their lanes cull all subtrees). At CONFIG3's
# 1200x675x4 grid (3168 tiles) the segmented graph additionally FAULTED the
# TPU worker ("TPU worker process crashed"). Kept as an opt-in,
# interpret-tested alternative (RenderSettings.depth_segment > 0) and as
# the measured record of SURVEY §7's "stream compaction" idea at segment
# granularity — the hypothesis it encodes (one live lane drags 1024 rays
# through the depth tail) is real, but the monolithic kernel's scalar early
# exit + dead-ray parking already absorb most of it.
# ---------------------------------------------------------------------------

def _seg_plumbing(rest, record_miss, n_scratch, record=False):
    """Split a segment kernel's variadic refs into the _bounce_loop wiring.

    Input planes: 7 rays + 7 carried state (+6 miss). Output planes:
    9 state (o, d, thr) + 3 rad + alive (+6 miss) (+4 residual planes when
    `record`). Scratch refs trail."""
    n_in = 20 if record_miss else 14
    n_out = (19 if record_miss else 13) + (4 if record else 0)
    assert len(rest) == n_in + n_out + n_scratch, (
        f"segment plane count mismatch: got {len(rest)} refs, expected "
        f"{n_in} in + {n_out} out + {n_scratch} scratch "
        f"(record_miss={record_miss}, record={record}) — a plane was added "
        "in one place but not the others"
    )
    ins = rest[:n_in]
    scratch = rest[len(rest) - n_scratch:] if n_scratch else ()
    outs = rest[n_in:len(rest) - n_scratch] if n_scratch else rest[n_in:]
    ray_refs = ins[:7]
    init_refs = ins[7:14]
    miss_init_refs = ins[14:20] if record_miss else None
    state_out = outs[0:9] + outs[12:13]  # o, d, thr, alive
    rr, rg, rb = outs[9:12]
    miss_refs = outs[13:19] if record_miss else None
    res_refs = outs[-4:] if record else None
    return ray_refs, init_refs, miss_init_refs, state_out, (rr, rg, rb), \
        miss_refs, res_refs, scratch


def _megakernel_seg_brute(
    seed_ref, sph_ref, *rest,
    n_spheres: int, max_depth: int, t_min: float, record_miss: bool = False,
    record: bool = False,
):
    (ray_refs, init_refs, miss_init_refs, state_out, (rr, rg, rb),
     miss_refs, res_refs, _) = _seg_plumbing(rest, record_miss, 0, record)

    def hit(rays, shape):
        return _closest_hit_brute(sph_ref, rays, t_min, n_spheres, shape)

    _bounce_loop(
        seed_ref, hit, *ray_refs, rr, rg, rb,
        max_depth=max_depth, t_min=t_min,
        init_refs=init_refs, state_out_refs=state_out,
        miss_refs=miss_refs, miss_init_refs=miss_init_refs,
        res_refs=res_refs,
    )


def _megakernel_seg_front(
    seed_ref, sph_ref, ff_ref, fi_ref, wf_ref, sf_ref, *rest,
    n_front: int, max_depth: int, t_min: float, record_miss: bool = False,
    record: bool = False, repack: int = 1, word_earlyout: bool = False,
):
    (ray_refs, init_refs, miss_init_refs, state_out, (rr, rg, rb),
     miss_refs, res_refs, scratch) = _seg_plumbing(rest, record_miss, 2,
                                                   record)
    livew_ref, live_ref = scratch

    def hit(rays, shape):
        return _closest_hit_front(sph_ref, ff_ref, fi_ref, wf_ref, sf_ref,
                                  livew_ref, live_ref, rays, t_min, n_front,
                                  shape, repack=repack,
                                  word_earlyout=word_earlyout)

    _bounce_loop(
        seed_ref, hit, *ray_refs, rr, rg, rb,
        max_depth=max_depth, t_min=t_min,
        init_refs=init_refs, state_out_refs=state_out,
        miss_refs=miss_refs, miss_init_refs=miss_init_refs,
        res_refs=res_refs,
    )


def _segment_call(planes, scene, seed, depth, t_min, front, interpret,
                  record_miss=False, record=False):
    """One segment launch: 14 input planes [T*SUB, LANES] -> 13 outputs
    (o, d, thr, rad, alive). `planes` order: ox oy oz dx dy dz tm thr_rgb
    rad_rgb alive. With `record_miss`, 6 miss planes (mdir, mthr) ride
    along as both inputs and outputs (a path misses in exactly one
    segment). With `record`, 4 residual planes [depth, T*SUB, LANES]
    (code, ndx, ndy, ndz — see _bounce_loop) are appended to the outputs,
    rows indexed by SEGMENT-LOCAL bounce depth."""
    tiles = planes[0].shape[0] // SUB
    ray_spec = pl.BlockSpec((SUB, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.SMEM)

    n_in = 20 if record_miss else 14
    n_out = 19 if record_miss else 13
    scratch_shapes = []
    if front is not None:
        n_front = front.ff.shape[1]
        kernel = functools.partial(
            _megakernel_seg_front, n_front=n_front, max_depth=depth,
            t_min=t_min, record_miss=record_miss, record=record,
            repack=getattr(front, "repack", 1),
            word_earlyout=getattr(front, "word_earlyout", False),
        )
        in_specs = [
            smem((1, 1)), smem(front.sph.shape),
            smem((8, n_front)), smem((2, n_front)),
            smem(front.wf.shape), smem(front.sf.shape),
        ]
        args = (
            jnp.asarray(seed, jnp.int32).reshape(1, 1),
            front.sph, front.ff, front.fi, front.wf, front.sf,
        )
        scratch_shapes = [
            pltpu.SMEM((1, n_front // WORD), jnp.int32),
            pltpu.SMEM((2, WORD), jnp.int32),
        ]
    else:
        n = scene.radius.shape[0]
        kernel = functools.partial(
            _megakernel_seg_brute, n_spheres=n, max_depth=depth, t_min=t_min,
            record_miss=record_miss, record=record,
        )
        in_specs = [smem((1, 1)), smem((N_ROWS, n))]
        args = (jnp.asarray(seed, jnp.int32).reshape(1, 1), _scene_table(scene))

    out_specs = [ray_spec] * n_out
    out_shape = [
        jax.ShapeDtypeStruct((tiles * SUB, LANES), jnp.float32)
    ] * n_out
    if record:
        res_spec = pl.BlockSpec(
            (depth, SUB, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )
        out_specs += [res_spec] * 4
        out_shape += [
            jax.ShapeDtypeStruct((depth, tiles * SUB, LANES), jnp.float32)
        ] * 4

    return pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=in_specs + [ray_spec] * n_in,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(*args, *planes)


@functools.partial(
    jax.jit,
    static_argnames=("max_depth", "seg_len", "t_min", "interpret",
                     "record_miss"),
)
def pallas_trace_paths_segmented(
    origin: jnp.ndarray,     # [R, 3]
    direction: jnp.ndarray,  # [R, 3]
    time: jnp.ndarray,       # [R]
    scene: Scene,
    seed: jnp.ndarray,       # scalar int32
    max_depth: int,
    seg_len: int = 8,
    t_min: float = T_MIN,
    interpret: bool = False,
    front=None,
    record_miss: bool = False,
) -> jnp.ndarray:
    """Radiance [R, 3] via depth segments with inter-segment compaction.

    MEASURED LOSER — see the section comment above: 11x slower than the
    monolithic pallas_trace_paths at the reference's depth-50 operating
    point and worker-faulting at CONFIG3 scale. Opt-in only.

    Statistically identical to pallas_trace_paths (each segment reseeds the
    in-kernel PRNG, so individual paths differ; the estimator and its
    distributions are unchanged). Segment 1 runs every ray; before each
    later segment, rays are stably partitioned alive-first so the dead
    majority packs into all-dead tiles that the kernel's scalar early exit
    skips at ~zero cost."""
    R = origin.shape[0]
    r_pad = ((R + TILE - 1) // TILE) * TILE
    tiles = r_pad // TILE

    def pad(x, fill):
        if r_pad == R:
            return x.astype(jnp.float32)
        return jnp.concatenate(
            [x.astype(jnp.float32), jnp.full((r_pad - R,), fill, jnp.float32)]
        )

    # flat [r_pad] planes; padding rays are parked dead
    ox = pad(origin[:, 0], 1e18); oy = pad(origin[:, 1], 1e18)
    oz = pad(origin[:, 2], 1e18)
    dx = pad(direction[:, 0], 1.0); dy = pad(direction[:, 1], 1.0)
    dz = pad(direction[:, 2], 1.0)
    tm = pad(time, 0.0)
    thr_r = pad(jnp.ones((R,)), 0.0); thr_g = pad(jnp.ones((R,)), 0.0)
    thr_b = pad(jnp.ones((R,)), 0.0)
    rad_r = jnp.zeros((r_pad,), jnp.float32)
    rad_g = jnp.zeros((r_pad,), jnp.float32)
    rad_b = jnp.zeros((r_pad,), jnp.float32)
    alive = pad(jnp.ones((R,)), 0.0)
    slot = jnp.arange(r_pad, dtype=jnp.int32)  # position -> original ray

    n_segs = (max_depth + seg_len - 1) // seg_len
    state = [ox, oy, oz, dx, dy, dz, tm, thr_r, thr_g, thr_b,
             rad_r, rad_g, rad_b, alive]
    if record_miss:
        state += [jnp.zeros((r_pad,), jnp.float32) for _ in range(6)]
    for s in range(n_segs):
        depth = min(seg_len, max_depth - s * seg_len)
        seed_s = jnp.bitwise_xor(
            jnp.asarray(seed, jnp.int32), jnp.int32((s * 0x9E3779B1) & 0x7FFFFFFF)
        )
        planes = [p.reshape(tiles * SUB, LANES) for p in state]
        outs = _segment_call(planes, scene, seed_s, depth, t_min, front,
                             interpret, record_miss=record_miss)
        o_planes = [o.reshape(-1) for o in outs]
        # outputs: o(3) d(3) thr(3) rad(3) alive (+ mdir(3) mthr(3))
        state = (o_planes[0:6] + [tm] + o_planes[6:9] + o_planes[9:12]
                 + o_planes[12:])
        if s < n_segs - 1:
            order = jnp.argsort(
                (state[13] < 0.5).astype(jnp.int32), stable=True
            )
            state = [jnp.take(p, order) for p in state]
            tm = state[6]
            slot = jnp.take(slot, order)

    inv = jnp.argsort(slot)
    unperm = lambda i0: jnp.take(
        jnp.stack(state[i0 : i0 + 3], axis=-1), inv, axis=0
    )[:R]
    rad = unperm(10)
    if record_miss:
        return rad, unperm(14), unperm(17)
    return rad


def _alive_first_perm(alive):
    """Stable alive-first packing permutation at 128-ray ROW granularity.

    Returns (src, dest, n_alive) over LANE-ROWS (blocks of 128 consecutive
    rays): src[j] = original row placed at packed row j; dest[i] = packed
    position of original row i (the inverse, computed ELEMENTWISE — no
    scatter); n_alive = number of rows containing ANY live ray.

    Why rows, not rays: a per-ray permutation costs 14 element-gathers of
    the whole state (measured 5x the monolithic forward at 45k rays —
    TPU element-gathers are serial), while a row permutation is a plain
    dynamic row copy (contiguous (1, 128) vregs) over ~R/128 indices.
    Rays are fed in compact screen blocks (render._block_order), so death
    is spatially clustered and all-dead rows are common; live rows keep
    their intra-row coherence for the front culling. Two cumsums + two
    vectorized binary searches over R/128 elements; the argsort the
    segmented path used cost a device sort over R per boundary."""
    rows = (alive.reshape(-1, LANES) > 0.5).any(axis=1)
    n = rows.shape[0]
    alive_i = rows.astype(jnp.int32)
    cum = jnp.cumsum(alive_i)
    n_alive = cum[-1]
    cumd = jnp.cumsum(1 - alive_i)
    pos = jnp.arange(n, dtype=jnp.int32)
    src_live = jnp.searchsorted(cum, pos + 1, side="left").astype(jnp.int32)
    src_dead = jnp.searchsorted(
        cumd, pos + 1 - n_alive, side="left"
    ).astype(jnp.int32)
    src = jnp.where(pos < n_alive, src_live, src_dead)
    dest = jnp.where(alive_i > 0, cum - 1, n_alive + cumd - 1)
    return src, dest, n_alive


def _take_ray_rows(x, rows_idx, axis=0):
    """Permute an array's RAY axis (length Rp) by lane-row indices: the
    axis is reshaped to (Rp/128, 128) and rows are gathered — contiguous
    copies, never element gathers."""
    shape = x.shape
    n_rows = shape[axis] // LANES
    new = shape[:axis] + (n_rows, LANES) + shape[axis + 1:]
    return jnp.take(x.reshape(new), rows_idx, axis=axis).reshape(shape)


@functools.partial(
    jax.jit,
    static_argnames=("max_depth", "cuts", "t_min", "interpret",
                     "record_miss"),
)
def pallas_trace_paths_twophase(
    origin: jnp.ndarray,     # [R, 3]
    direction: jnp.ndarray,  # [R, 3]
    time: jnp.ndarray,       # [R]
    scene: Scene,
    seed: jnp.ndarray,       # scalar int32
    max_depth: int,
    cuts: tuple = (4,),
    t_min: float = T_MIN,
    interpret: bool = False,
    front=None,
    record_miss: bool = False,
) -> jnp.ndarray:
    """Death-coherent trace: short full-frame prefix, ONE compaction, then
    the depth tail on densely-packed survivor tiles.

    The monolithic kernel's early exit is TILE-granular: a tile pays the
    MAX bounce count of its 1024 rays (measured 14.8 at depth 16 on the
    cover scene) while the per-ray mean is 2.7 — 5.5x of the intersection
    budget goes to retired lanes (ROOFLINE_r04). Per-segment compaction
    (pallas_trace_paths_segmented) attacked this and LOST 11x to per-boundary
    argsorts + state round-trips. This is the one-compaction version:

      phase 1   trace bounces [0, cut) for every ray — tiles pay exactly
                `cut` bounces, no waste;
      compact   stable alive-first pack via _alive_first_perm (cumsum +
                binary search, no sort; ONE gather of the 14 state planes);
      phase 2   trace bounces [cut, max_depth) — survivors are contiguous,
                so the dead majority forms all-dead tiles that the bounce
                loop's while-exit leaves after ONE sync, and the deep tail
                is concentrated in the few leading tiles.

    `cuts` may hold several cut depths (e.g. (2, 6)) — each adds one more
    compaction; one is usually right (the first bounces kill most rays).

    Statistically identical to pallas_trace_paths (each phase reseeds the
    in-kernel PRNG; the estimator and its distributions are unchanged —
    same argument as the segmented docstring). In interpret mode the PRNG
    returns zeros, making both paths deterministic and bit-comparable
    (tests/test_pallas_megakernel.py::test_twophase_matches_monolithic).

    HBM-staged fronts (FrontTablesHBM) have no segment kernel; they fall
    back to the monolithic trace (their dead tiles already exit in one
    sync via the bounce while-loop)."""
    if isinstance(front, FrontTablesHBM):
        return pallas_trace_paths(
            origin, direction, time, scene, seed, max_depth, t_min=t_min,
            interpret=interpret, front=front, record_miss=record_miss,
        )
    R = origin.shape[0]
    r_pad = ((R + TILE - 1) // TILE) * TILE
    tiles = r_pad // TILE

    bounds = (0, *cuts, max_depth)
    assert all(
        b2 > b1 for b1, b2 in zip(bounds, bounds[1:])
    ), f"cuts {cuts} must be strictly increasing and < max_depth {max_depth}"

    def pad(x, fill):
        if r_pad == R:
            return x.astype(jnp.float32)
        return jnp.concatenate(
            [x.astype(jnp.float32), jnp.full((r_pad - R,), fill, jnp.float32)]
        )

    # flat [r_pad] planes; padding rays are parked dead (see _bounce_loop)
    state = [
        pad(origin[:, 0], 1e18), pad(origin[:, 1], 1e18),
        pad(origin[:, 2], 1e18),
        pad(direction[:, 0], 1.0), pad(direction[:, 1], 1.0),
        pad(direction[:, 2], 1.0), pad(time, 0.0),
        pad(jnp.ones((R,)), 0.0), pad(jnp.ones((R,)), 0.0),
        pad(jnp.ones((R,)), 0.0),
        jnp.zeros((r_pad,), jnp.float32), jnp.zeros((r_pad,), jnp.float32),
        jnp.zeros((r_pad,), jnp.float32), pad(jnp.ones((R,)), 0.0),
    ]
    if record_miss:
        state += [jnp.zeros((r_pad,), jnp.float32) for _ in range(6)]

    # dest_of_orig[i] = current packed position of original lane-row i
    dest_of_orig = jnp.arange(r_pad // LANES, dtype=jnp.int32)
    for s, (b0, b1) in enumerate(zip(bounds, bounds[1:])):
        seed_s = jnp.bitwise_xor(
            jnp.asarray(seed, jnp.int32),
            jnp.int32((s * 0x9E3779B1) & 0x7FFFFFFF),
        )
        planes = [p.reshape(tiles * SUB, LANES) for p in state]
        outs = _segment_call(planes, scene, seed_s, b1 - b0, t_min, front,
                             interpret, record_miss=record_miss)
        o_planes = [o.reshape(-1) for o in outs]
        tm = state[6]
        state = (o_planes[0:6] + [tm] + o_planes[6:9] + o_planes[9:12]
                 + o_planes[12:])
        if b1 < max_depth:  # compact before the next phase (row-granular)
            src, dest, _ = _alive_first_perm(state[13])
            state = [_take_ray_rows(p, src) for p in state]
            dest_of_orig = jnp.take(dest, dest_of_orig)

    unperm = lambda i0: _take_ray_rows(
        jnp.stack(state[i0 : i0 + 3], axis=-1), dest_of_orig
    )[:R]
    rad = unperm(10)
    if record_miss:
        return rad, unperm(14), unperm(17)
    return rad


def _decode_res(code, remap):
    """(idx, refl) from a raw code plane [D, Rp]: code = hmatp + 0.25*refl
    on hits (hmatp = mat + 4*winner), -1 miss, -2 dead (see _bounce_loop).
    All decoding happens HERE in XLA — the kernel stores the packed
    material slot verbatim."""
    hp = jnp.floor(code)
    refl = (code - hp) > 0.1
    packed = hp.astype(jnp.int32)
    idx = jnp.where(packed >= 0, packed >> 2, packed)  # mat in low 2 bits
    if remap is not None:
        idx = jnp.where(idx >= 0, jnp.take(remap, jnp.maximum(idx, 0)), idx)
    return idx, refl


@functools.partial(
    jax.jit, static_argnames=("max_depth", "cut", "t_min", "interpret")
)
def pallas_trace_record_twophase(
    origin: jnp.ndarray,     # [R, 3]
    direction: jnp.ndarray,  # [R, 3]
    time: jnp.ndarray,       # [R]
    scene: Scene,
    seed: jnp.ndarray,       # scalar int32
    max_depth: int,
    cut: int = 4,
    t_min: float = T_MIN,
    interpret: bool = False,
    front=None,
):
    """Two-phase trace (pallas_trace_paths_twophase, one cut) that also
    records path residuals per phase for the two-phase replay backward
    (grad/replay.replay_radiance_twophase).

    Returns (radiance [R, 3], res1, res2, src, dest, n_alive):
      res1       PathResidualsP [cut, Rp] in ORIGINAL ray order (Rp = R
                 padded to a tile multiple; padding rays are DEAD rows) —
                 PLANAR residuals: direction components stay separate
                 [D, R] planes (a stacked [D, R, 3] residual tiles its
                 size-3 axis into the 128-lane minor dim when saved for
                 the backward — a 42.7x padding blowup, compile-OOM at
                 depth 50);
      res2       PathResidualsP [max_depth - cut, Rp] in PACKED order —
                 rays alive after the cut occupy positions [0, n_alive);
      src/dest   the packing permutation and its inverse, at 128-ray
                 LANE-ROW granularity ([Rp/128] int32) — see
                 _alive_first_perm for why rows, not rays;
      n_alive    traced scalar — surviving ROW count (row positions >=
                 n_alive in res2 hold only DEAD entries).

    The packed layout is what makes an O(live-depth) backward structural:
    the replay scans res1 for every ray (cut steps) and res2 only for a
    static survivor-capacity prefix, with an exact full-width fallback
    branch when n_alive exceeds it (see replay_radiance_twophase)."""
    from raytracingproject_tpu.grad.replay import PathResidualsP

    R = origin.shape[0]
    r_pad = ((R + TILE - 1) // TILE) * TILE
    tiles = r_pad // TILE
    assert 0 < cut < max_depth, (cut, max_depth)

    def pad(x, fill):
        if r_pad == R:
            return x.astype(jnp.float32)
        return jnp.concatenate(
            [x.astype(jnp.float32), jnp.full((r_pad - R,), fill, jnp.float32)]
        )

    state = [
        pad(origin[:, 0], 1e18), pad(origin[:, 1], 1e18),
        pad(origin[:, 2], 1e18),
        pad(direction[:, 0], 1.0), pad(direction[:, 1], 1.0),
        pad(direction[:, 2], 1.0), pad(time, 0.0),
        pad(jnp.ones((R,)), 0.0), pad(jnp.ones((R,)), 0.0),
        pad(jnp.ones((R,)), 0.0),
        jnp.zeros((r_pad,), jnp.float32), jnp.zeros((r_pad,), jnp.float32),
        jnp.zeros((r_pad,), jnp.float32), pad(jnp.ones((R,)), 0.0),
    ]

    remap = front.remap if front is not None else None
    seed_i = jnp.asarray(seed, jnp.int32)
    planes = [p.reshape(tiles * SUB, LANES) for p in state]
    outs = _segment_call(planes, scene, seed_i, cut, t_min, front,
                         interpret, record=True)
    res_flat = [o.reshape(cut, -1) for o in outs[13:17]]
    idx1, refl1 = _decode_res(res_flat[0], remap)
    res1 = PathResidualsP(idx=idx1, ndx=res_flat[1], ndy=res_flat[2],
                          ndz=res_flat[3], refl=refl1)
    o_planes = [o.reshape(-1) for o in outs[:13]]
    tm = state[6]
    state = o_planes[0:6] + [tm] + o_planes[6:9] + o_planes[9:12] \
        + o_planes[12:13]

    src, dest, n_alive = _alive_first_perm(state[13])
    state = [_take_ray_rows(p, src) for p in state]

    seed2 = jnp.bitwise_xor(seed_i, jnp.int32(0x9E3779B1 & 0x7FFFFFFF))
    planes = [p.reshape(tiles * SUB, LANES) for p in state]
    outs = _segment_call(planes, scene, seed2, max_depth - cut, t_min, front,
                         interpret, record=True)
    res_flat = [o.reshape(max_depth - cut, -1) for o in outs[13:17]]
    idx2, refl2 = _decode_res(res_flat[0], remap)
    res2 = PathResidualsP(idx=idx2, ndx=res_flat[1], ndy=res_flat[2],
                          ndz=res_flat[3], refl=refl2)
    rad_packed = jnp.stack([o.reshape(-1) for o in outs[9:12]], axis=-1)
    rad = _take_ray_rows(rad_packed, dest)[:R]
    return rad, res1, res2, src, dest, n_alive


# ---------------------------------------------------------------------------
# HBM-staged front: scenes past the ~1 MiB SMEM budget (~16k spheres).
#
# The sphere table lives in HBM, laid out one 128-column block per front
# subtree (DMA slices must be 128-lane aligned); the box/index tables stay
# in SMEM (F <= 13824 boxes is KBs). Stage 2 double-buffers: while one live
# subtree's block is being scanned, the next one's (N_ROWS, 128) block
# (8 KB) is already in flight HBM -> SMEM. Per-bounce HBM traffic is
# 8 KB x live subtrees per tile — sub-linear in scene size exactly like the
# SMEM front, with an O(N) one-time build. This is the design the reference
# could never express: its GPU path capped the scene at a 200-sphere SSBO
# (src/vulkan/graphical_environment_vulkan.h:141).
# ---------------------------------------------------------------------------

BLOCK = LANES  # spheres per HBM subtree block (one aligned DMA)


class FrontTablesHBM:
    """Device tables for the HBM-staged front megakernel."""

    def __init__(self, sph: jnp.ndarray, ff: jnp.ndarray, fi: jnp.ndarray,
                 wf: jnp.ndarray, sf: jnp.ndarray,
                 remap: jnp.ndarray | None = None,
                 word_earlyout: bool = False,
                 bf: jnp.ndarray | None = None, ksub: int = 0):
        self.sph = sph  # (N_ROWS, F*BLOCK) HBM table, block k = subtree k
        self.ff = ff    # (8, F) f32 subtree boxes
        self.fi = fi    # (1, F) i32 padded counts (starts are implicit k*BLOCK)
        self.wf = wf
        self.sf = sf
        self.remap = remap  # (F*BLOCK,) i32 column -> scene index
        # static: per-word best-t early-out (see _closest_hit_front)
        self.word_earlyout = word_earlyout
        # sub-block descent: (8, F*BLOCK/UNROLL [+pad]) boxes in SMEM (the
        # box table is small even when the sphere table is not); ksub =
        # BLOCK // UNROLL sub-blocks per staged block
        self.bf = bf
        self.ksub = ksub

    def tree_flatten(self):
        return (self.sph, self.ff, self.fi, self.wf, self.sf, self.remap,
                self.bf), (self.word_earlyout, self.ksub)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        weo, ksub = aux
        *core, bf = leaves
        return cls(*core, word_earlyout=weo, bf=bf, ksub=ksub)


jax.tree_util.register_pytree_node(
    FrontTablesHBM,
    lambda t: t.tree_flatten(),
    FrontTablesHBM.tree_unflatten,
)


def front_tables_hbm(scene: Scene, bvh, max_nodes: int | None = None,
                     order_point=None,
                     word_earlyout: bool = False,
                     sub_block: bool = False) -> FrontTablesHBM:
    """Build HBM-staged front tables. `scene` MUST be in BVH leaf order.
    `order_point` orders subtrees near-to-far (see front_tables).

    `sub_block`: per-8-sphere boxes for intra-block descent — the box
    table (F*BLOCK/8 columns) stays in SMEM even when the sphere table
    cannot; pairs naturally with FEWER, BIGGER subtrees (pass a small
    max_nodes so each 8 KB staged block carries ~BLOCK real spheres
    instead of ~26)."""
    import numpy as np

    from raytracingproject_tpu.bvh import bvh_front

    n = int(scene.radius.shape[0])
    if max_nodes is None:
        max_nodes = max(1, round(n / 26 / WORD)) * WORD
        max_nodes = min(max_nodes, WORD * WORD * WORD)
    fr = bvh_front(bvh, max_nodes=max_nodes, max_count=BLOCK,
                   order_point=order_point)
    f_real = fr.start.shape[0]
    f_pad = ((f_real + WORD - 1) // WORD) * WORD
    sph = np.asarray(_scene_table(scene))

    blocks = np.zeros((N_ROWS, f_pad * BLOCK), np.float32)
    remap = np.zeros(f_pad * BLOCK, np.int32)
    counts = np.zeros(f_pad, np.int32)
    fmin = np.full((f_pad, 3), 1e30, np.float32)
    fmax = np.full((f_pad, 3), 1e30, np.float32)
    for k in range(f_real):
        s, c = int(fr.start[k]), int(fr.count[k])
        if c == 0:
            continue
        assert c <= BLOCK, f"subtree {k} holds {c} > {BLOCK} spheres"
        cp = ((c + UNROLL - 1) // UNROLL) * UNROLL
        blk = sph[:, s : s + c]
        ids = np.arange(s, s + c, dtype=np.int32)
        pad_c = cp - c
        if pad_c:
            blk = np.concatenate([blk, np.repeat(blk[:, -1:], pad_c, axis=1)], axis=1)
            ids = np.concatenate([ids, np.repeat(ids[-1:], pad_c)])
        blocks[:, k * BLOCK : k * BLOCK + cp] = blk
        remap[k * BLOCK : k * BLOCK + cp] = ids
        counts[k] = cp
        fmin[k] = fr.fmin[k]
        fmax[k] = fr.fmax[k]

    ff = np.zeros((8, f_pad), np.float32)
    ff[0:3] = fmin.T
    ff[3:6] = fmax.T
    fi = counts[None, :]

    n_words = f_pad // WORD
    n_super = (n_words + WORD - 1) // WORD
    n_words_pad = n_super * WORD if n_super > 1 else n_words
    wf = np.full((8, n_words_pad), 1e30, np.float32)
    wf[6:8] = 0.0
    for wd in range(n_words):
        sl = slice(wd * WORD, (wd + 1) * WORD)
        real = counts[sl] > 0
        if real.any():
            wf[0:3, wd] = fmin[sl][real].min(axis=0)
            wf[3:6, wd] = fmax[sl][real].max(axis=0)
    sf = np.full((8, max(n_super, 1)), 1e30, np.float32)
    sf[6:8] = 0.0
    for sw in range(n_super):
        sl = slice(sw * WORD, min((sw + 1) * WORD, n_words))
        real = wf[0, sl] < 1e29
        if real.any():
            sf[0:3, sw] = wf[0:3, sl][:, real].min(axis=1)
            sf[3:6, sw] = wf[3:6, sl][:, real].max(axis=1)
    bf = None
    ksub = 0
    if sub_block:
        c0c = blocks[0:3]
        c1c = c0c + blocks[3:6]
        rc = np.abs(blocks[6])
        bmin = np.minimum(c0c, c1c) - rc
        bmax = np.maximum(c0c, c1c) + rc
        nblk = blocks.shape[1] // UNROLL
        ksub = BLOCK // UNROLL
        bf = np.zeros((8, nblk), np.float32)
        bf[0:6] = 1e30
        # only real (count-covered) columns contribute; block k's padded
        # tail columns are zero rows -> exclude by count mask
        colmask = np.zeros(blocks.shape[1], bool)
        for k in range(f_pad):
            colmask[k * BLOCK : k * BLOCK + counts[k]] = True
        m8 = colmask.reshape(nblk, UNROLL)
        bmin_r = bmin.reshape(3, nblk, UNROLL)
        bmax_r = bmax.reshape(3, nblk, UNROLL)
        for b in range(nblk):
            mm = m8[b]
            if mm.any():
                bf[0:3, b] = bmin_r[:, b, mm].min(axis=1)
                bf[3:6, b] = bmax_r[:, b, mm].max(axis=1)
                bf[6:8, b] = 0.0
        smem_boxes = 4 * bf.size
        assert smem_boxes < SMEM_BUDGET_BYTES // 2, (
            f"HBM sub-block box table {smem_boxes} B too large; raise the "
            "subtree size (smaller max_nodes)")
    return FrontTablesHBM(
        jnp.asarray(blocks), jnp.asarray(ff), jnp.asarray(fi),
        jnp.asarray(wf), jnp.asarray(sf), jnp.asarray(remap),
        word_earlyout=word_earlyout,
        bf=None if bf is None else jnp.asarray(bf), ksub=ksub,
    )


def _closest_hit_front_hbm(sph_hbm, ff_ref, fi_ref, wf_ref, sf_ref,
                           livew_ref, live_ref, stage, sems, rays, t_min,
                           n_front, shape, word_earlyout=False,
                           bf_ref=None, liveb_ref=None, ksub=0):
    """Hierarchical front culling with the sphere table in HBM.

    Stage 1 (live word list) is identical to the SMEM front. Stage 2
    double-buffers each live subtree's (N_ROWS, BLOCK) block into SMEM
    scratch `stage` while the previous block is being scanned."""
    n_words = n_front // WORD
    n_super = (n_words + WORD - 1) // WORD
    hc = _hit_init(shape)

    if n_words == 1:
        livew_ref[0, 0] = jnp.int32(0)
        n_live_w = jnp.int32(1)
    else:
        slab_w = _slab_factory(wf_ref, rays, t_min)

        def extract_words(wword, wbase, c0):
            def extract(k, c):
                bit = jax.lax.shift_right_logical(wword, k) & 1

                @pl.when(bit > 0)
                def _():
                    livew_ref[0, c] = wbase + k

                return c + bit

            return jax.lax.fori_loop(0, WORD, extract, c0)

        if n_super == 1:
            wword = _pack_any_bits(slab_w, n_words)
            n_live_w = extract_words(wword, 0, jnp.int32(0))
        else:
            slab_s = _slab_factory(sf_ref, rays, t_min)
            sword = _pack_any_bits(slab_s, n_super)

            def super_body(sw, c):
                bit = jax.lax.shift_right_logical(sword, sw) & 1

                def live_fn(cc):
                    wword = _pack_any_bits(slab_w, WORD, base=sw * WORD)
                    return extract_words(wword, sw * WORD, cc)

                return jax.lax.cond(bit > 0, live_fn, lambda cc: cc, c)

            n_live_w = jax.lax.fori_loop(0, n_super, super_body, jnp.int32(0))

    def word_body(l, h):
        w = livew_ref[0, l]
        return _word_work(l, w, h)

    def _word_work(l, w, h):
        slab_f = _slab_factory(ff_ref, rays, t_min, bt=h[0])
        word = _pack_any_bits(slab_f, WORD, base=w * WORD)

        def extract(k, c):
            bit = jax.lax.shift_right_logical(word, k) & 1

            @pl.when(bit > 0)
            def _():
                live_ref[0, c] = w * WORD + k           # subtree id
                live_ref[1, c] = fi_ref[0, w * WORD + k]  # padded count

            return c + bit

        n_live = jax.lax.fori_loop(0, WORD, extract, jnp.int32(0))

        def dma_for(li, slot):
            sid = live_ref[0, li]
            col = pl.multiple_of(sid * BLOCK, BLOCK)
            return pltpu.make_async_copy(
                sph_hbm.at[:, pl.ds(col, BLOCK)],
                stage.at[pl.ds(slot * N_ROWS, N_ROWS), :],
                sems.at[slot],
            )

        @pl.when(n_live > 0)
        def _():
            dma_for(0, 0).start()

        def live_body(l2, hh):
            slot = jnp.bitwise_and(l2, 1)

            @pl.when(l2 + 1 < n_live)
            def _():
                dma_for(l2 + 1, 1 - slot).start()

            dma_for(l2, slot).wait()
            sid = live_ref[0, l2]
            cnt = live_ref[1, l2]

            if bf_ref is None:
                def inner(q, hhh):
                    for u in range(UNROLL):
                        s_loc = q * UNROLL + u
                        hhh = _sphere_test_ld(
                            lambda row, s_loc=s_loc: stage[slot * N_ROWS + row, s_loc],
                            sid * BLOCK + s_loc, rays, hhh, t_min,
                        )
                    return hhh

                return jax.lax.fori_loop(0, cnt // UNROLL, inner, hh)

            # SUB-BLOCK DESCENT (HBM): the block's 8-sphere boxes live in
            # SMEM (bf_ref column sid*ksub + k bounds staged columns
            # [8k, 8k+8)); pack their any-bits against the current best-t
            # (one sync) and scan only surviving chunks of the staged
            # block — the compute-side answer to BLOCK-sized subtrees.
            slab_b = _slab_factory(bf_ref, rays, t_min, bt=hh[0])
            bword = _pack_any_bits(slab_b, ksub, base=sid * ksub)

            def ext(k, c3):
                bit = jax.lax.shift_right_logical(bword, k) & 1

                @pl.when(bit > 0)
                def _():
                    liveb_ref[0, c3] = k * UNROLL

                return c3 + bit

            n_blk = jax.lax.fori_loop(0, cnt // UNROLL, ext, jnp.int32(0))

            def blk_body(q, hhh):
                base_l = liveb_ref[0, q]
                for u in range(UNROLL):
                    hhh = _sphere_test_ld(
                        lambda row, u=u, base_l=base_l: stage[
                            slot * N_ROWS + row, base_l + u],
                        sid * BLOCK + base_l + u, rays, hhh, t_min,
                    )
                return hhh

            return jax.lax.fori_loop(0, n_blk, blk_body, hh)

        return jax.lax.fori_loop(0, n_live, live_body, h)

    if word_earlyout:
        def word_body_weo(l, h):
            w = livew_ref[0, l]
            slab_w2 = _slab_factory(wf_ref, rays, t_min, bt=h[0])
            still = jnp.max(slab_w2(w)) > 0.0
            return jax.lax.cond(still, lambda hh: _word_work(l, w, hh),
                                lambda hh: hh, h)

        return jax.lax.fori_loop(0, n_live_w, word_body_weo, hc)
    return jax.lax.fori_loop(0, n_live_w, word_body, hc)


def _megakernel_front_hbm(
    seed_ref, sph_hbm, ff_ref, fi_ref, wf_ref, sf_ref,
    *rest,  # [bf] 7 ray planes, 3 (+6 miss) outs, then 4 (+1) scratches
    n_front: int, max_depth: int, t_min: float, inject_bug=None,
    record_miss: bool = False, word_earlyout: bool = False, ksub: int = 0,
):
    if ksub:
        bf_ref, *rest = rest
        livew_ref, live_ref, stage, sems, liveb_ref = rest[-5:]
        tail = rest[7:-5]
    else:
        bf_ref, liveb_ref = None, None
        livew_ref, live_ref, stage, sems = rest[-4:]
        tail = rest[7:-4]
    ray_refs = rest[:7]
    (rr_ref, rg_ref, rb_ref), miss_refs = _split_outs(tail, record_miss)

    def hit(rays, shape):
        return _closest_hit_front_hbm(
            sph_hbm, ff_ref, fi_ref, wf_ref, sf_ref, livew_ref, live_ref,
            stage, sems, rays, t_min, n_front, shape,
            word_earlyout=word_earlyout,
            bf_ref=bf_ref, liveb_ref=liveb_ref, ksub=ksub,
        )

    _bounce_loop(seed_ref, hit, *ray_refs, rr_ref, rg_ref, rb_ref,
                 max_depth=max_depth, t_min=t_min, inject_bug=inject_bug,
                 miss_refs=miss_refs)
