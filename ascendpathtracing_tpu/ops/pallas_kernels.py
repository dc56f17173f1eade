"""Pallas TPU kernels: the hand-fused render megakernel.

This is the TPU-native analogue of the reference's single fused Ascend C
kernel (src/render.cpp): the Pallas grid over ray tiles plays the role of
the per-core tile loop (render.cpp:52-59), the automatic BlockSpec
pipeline plays the TQue/TPipe double buffer (render.cpp:30-37), and VMEM
scratch plays the unified buffer + MemoryPool (src/allocator.h) — except
that here the ENTIRE bounce loop runs on a tile while it sits in VMEM, so
HBM traffic is exactly one read of the ray planes and one write of the
color planes.

Key kernel-level design choices:

- SoA [6, TILE] / [3, TILE] blocks (rays on lanes), see ops/intersect.py.
- The per-sphere loop is unrolled with a **running min** that carries the
  winning sphere's shading data (center, albedo, is-light) along with it,
  so there is no [S, N] hit matrix, no argmin, and no gather at all —
  strict ``<`` preserves the reference's lowest-index tie-break
  (rt_helper.h:183-193), and initializing the carriers with the LAST
  sphere's data reproduces the oracle's miss => wrap-to-last-sphere
  gather semantics (gen_data.py:343,390).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ascendpathtracing_tpu.ops.shade import REL_OFFSET

MISS_T = 1e20
# 4096 measured fastest on v5e for both fwd (1496 Mrays/s, r3 fit) and fwd+bwd
# replay (572 Mrays/s) at 4M rays / 8 bounces; 2048 and 8192 are slower.
DEFAULT_TILE = 4096


def _render_ref_kernel(
    rays_ref, scene_ref, out_ref, *, n_spheres, light_index, bounces, eps
):
    """One ray tile, full reference-semantics bounce loop.

    rays_ref:  [6, TILE] VMEM block (ox oy oz dx dy dz planes).
    scene_ref: [10, S] VMEM (r2 x y z ex ey ez cr cg cb planes — the
               spheres.bin layout, gen_data.py:94).
    out_ref:   [3, TILE] VMEM block (color planes).
    """
    ox = rays_ref[0, :]
    oy = rays_ref[1, :]
    oz = rays_ref[2, :]
    dx = rays_ref[3, :]
    dy = rays_ref[4, :]
    dz = rays_ref[5, :]

    f = ox.dtype
    shape = ox.shape
    tr = jnp.ones(shape, f)
    tg = jnp.ones(shape, f)
    tb = jnp.ones(shape, f)
    alive = jnp.ones(shape, jnp.bool_)

    def sphere_scalar(plane, s):
        return scene_ref[plane, s]

    for _ in range(bounces):
        # ---- intersect all spheres, running min with shading carriers ----
        tmin = jnp.full(shape, MISS_T, f)
        last = n_spheres - 1
        # miss => oracle wraps to the LAST sphere's data (gen_data.py:343).
        w_cx = jnp.full(shape, sphere_scalar(1, last), f)
        w_cy = jnp.full(shape, sphere_scalar(2, last), f)
        w_cz = jnp.full(shape, sphere_scalar(3, last), f)
        w_ar = jnp.full(shape, sphere_scalar(7, last), f)
        w_ag = jnp.full(shape, sphere_scalar(8, last), f)
        w_ab = jnp.full(shape, sphere_scalar(9, last), f)
        w_light = jnp.zeros(shape, jnp.bool_)

        for s in range(n_spheres):
            r2 = sphere_scalar(0, s)
            cx = sphere_scalar(1, s)
            cy = sphere_scalar(2, s)
            cz = sphere_scalar(3, s)
            ocx = cx - ox
            ocy = cy - oy
            ocz = cz - oz
            b = ocx * dx + ocy * dy + ocz * dz
            c = ocx * ocx + ocy * ocy + ocz * ocz - r2
            det = b * b - c
            valid = det >= 0
            sq = jnp.sqrt(jnp.where(valid, det, 0.0))
            t0 = b - sq
            t1 = b + sq
            t = jnp.where(
                valid & (t0 > eps), t0, jnp.where(valid & (t1 > eps), t1, MISS_T)
            )
            better = t < tmin  # strict < == lowest-index tie-break
            tmin = jnp.where(better, t, tmin)
            w_cx = jnp.where(better, cx, w_cx)
            w_cy = jnp.where(better, cy, w_cy)
            w_cz = jnp.where(better, cz, w_cz)
            w_ar = jnp.where(better, sphere_scalar(7, s), w_ar)
            w_ag = jnp.where(better, sphere_scalar(8, s), w_ag)
            w_ab = jnp.where(better, sphere_scalar(9, s), w_ab)
            # `s == light_index` is static; Mosaic rejects scalar-bool
            # `where`, so fold it as boolean algebra.
            if s == light_index:
                w_light = w_light | better
            else:
                w_light = w_light & jnp.logical_not(better)

        # ---- specular bounce (rt_helper.h:504-709) ----
        hx = ox + dx * tmin
        hy = oy + dy * tmin
        hz = oz + dz * tmin
        nx = hx - w_cx
        ny = hy - w_cy
        nz = hz - w_cz
        n2 = nx * nx + ny * ny + nz * nz
        # 1/sqrt (not rsqrt) for value-parity with the jit megakernel and
        # the NumPy oracle.
        inv = jnp.where(n2 > 0, 1.0 / jnp.sqrt(n2), 0.0)
        nx, ny, nz = nx * inv, ny * inv, nz * inv
        dn = dx * nx + dy * ny + dz * nz
        td = 2.0 * dn
        dx, dy, dz = dx - td * nx, dy - td * ny, dz - td * nz
        ox, oy, oz = hx, hy, hz

        # ---- throughput mask update (gen_data.py:379-390) ----
        alive = alive & jnp.logical_not(w_light)
        tr = jnp.where(alive, tr * w_ar, tr)
        tg = jnp.where(alive, tg * w_ag, tg)
        tb = jnp.where(alive, tb * w_ab, tb)

    # finalize: throughput x light emission (render.cpp:194-196)
    out_ref[0, :] = tr * scene_ref[4, light_index]
    out_ref[1, :] = tg * scene_ref[5, light_index]
    out_ref[2, :] = tb * scene_ref[6, light_index]


@functools.partial(
    jax.jit,
    static_argnames=("bounces", "eps", "tile", "light_index", "interpret"),
)
def render_reference_pallas_planes(
    rays_planes,
    scene_planes,
    *,
    light_index: int,
    bounces: int = 5,
    eps: float = 1e-4,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
):
    """Fused Pallas render over plane-layout buffers.

    Args:
      rays_planes:  [6, N] float32 (the rays.bin layout).
      scene_planes: [10, S] float32 (the spheres.bin layout).
    Returns:
      colors [3, N] float32 (the color.bin layout).
    """
    n = rays_planes.shape[1]
    s = scene_planes.shape[1]
    if n % tile:
        raise ValueError(f"ray count {n} not divisible by tile {tile}")
    grid = (n // tile,)

    kernel = functools.partial(
        _render_ref_kernel,
        n_spheres=s,
        light_index=light_index,
        bounces=bounces,
        eps=eps,
    )
    flops_per = s * 14 + 30
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((6, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((10, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, n), rays_planes.dtype),
        cost_estimate=pl.CostEstimate(
            flops=n * bounces * flops_per,
            bytes_accessed=(6 + 3) * n * 4,
            transcendentals=n * bounces * (s + 1),
        ),
        interpret=interpret,
    )(rays_planes, scene_planes)


def render_reference_pallas(
    rays, scene_planes, *, light_index, bounces=5, eps=1e-4, tile=DEFAULT_TILE,
    interpret=False,
):
    """AoS-boundary wrapper: rays [N, 6] -> colors [N, 3]; pads the ray
    count up to a tile multiple internally."""
    n = rays.shape[0]
    n_pad = -(-n // tile) * tile
    planes = jnp.transpose(rays)
    if n_pad != n:
        planes = jnp.pad(planes, ((0, 0), (0, n_pad - n)))
    colors = render_reference_pallas_planes(
        planes,
        scene_planes,
        light_index=light_index,
        bounces=bounces,
        eps=eps,
        tile=tile,
        interpret=interpret,
    )
    return jnp.transpose(colors[:, :n])


# ==========================================================================
# Full path-tracing megakernel: camera generation + RNG + bounce loop all
# in-kernel. HBM traffic is ONLY the per-pixel output (no ray input at
# all) — the speed-of-light configuration for the BASELINE config-2
# workload.
# ==========================================================================
def _render_pt_kernel(
    seed_ref,
    scene_ref,
    out_ref,
    u_scratch,
    *,
    width,
    height,
    spp4,
    tile,
    materials,
    bounces,
    rr_depth,
    eps,
    cam_consts,
    use_rng=True,  # False in interpret mode: prng_* has no CPU lowering,
                   # uniforms become exact zeros (same gate as the mesh
                   # PT kernel — the u=0 estimator is deterministic)
    debug=False,
):
    """One (pixel-tile, sample-layer) grid cell: TILE pixels, one sample
    each, accumulated into the output block across the sample-layer grid
    dimension (Pallas keeps the revisited block in VMEM).

    materials: static per-sphere tuple of (DIFF|SPEC|REFR) codes.
    cam_consts: camera constants (see render_pt_pallas).
    Sample layer a encodes (sy, sx, k): a = sy*2s + sx*s + k, matching the
    reference sample order (gen_data.py:32-36).
    debug: per-bounce alive-lane count dump on grid cell 0 (the RR/load
    diagnostic — the DEBUG-macro analogue, rt_helper.h:43-46).
    """
    f32 = jnp.float32
    b = pl.program_id(0)
    a = pl.program_id(1)
    n_layers = pl.num_programs(1)
    # seed arrives as a traced SMEM scalar so reseeding never recompiles
    if use_rng:
        pltpu.prng_seed(seed_ref[0] + b * n_layers + a)

    # All vector state is 2-D (8, L): rank-1 vectors inside a Mosaic
    # fori_loop carry hit a layout-inference check failure, and 2-D tiles
    # use all 8 sublanes by construction.
    lanes = tile // 8

    def uniforms(n_streams):
        # Mosaic has no uint32->f32 cast: take the top 24 bits, bitcast to
        # int32 (non-negative) and scale. NOTE: prng_* has no CPU lowering
        # at all — interpret mode (use_rng=False) yields exact zeros.
        if not use_rng:
            return jnp.zeros((n_streams, 8, lanes), f32)
        bits = pltpu.bitcast(
            pltpu.prng_random_bits((n_streams, 8, lanes)), jnp.uint32
        )
        i32 = pltpu.bitcast(bits >> 8, jnp.int32)
        return i32.astype(f32) * f32(1.0 / (1 << 24))

    (px, py, pz, dx0, dy0, dz0, cxx, cyx, cyy, cyz, push) = cam_consts

    s = spp4 // 4
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, lanes), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, lanes), 1)
    pix = b * tile + sub * lanes + lane
    i_idx = pix // height
    j_idx = pix % height
    sy = a // (2 * s)
    sx = (a // s) % 2

    u0 = uniforms(2)
    r1 = 2.0 * u0[0]
    r2 = 2.0 * u0[1]
    jx = jnp.where(r1 < 1, jnp.sqrt(r1) - 1, 1 - jnp.sqrt(jnp.maximum(2 - r1, 0.0)))
    jy = jnp.where(r2 < 1, jnp.sqrt(r2) - 1, 1 - jnp.sqrt(jnp.maximum(2 - r2, 0.0)))

    su = ((sx.astype(f32) + 0.5 + jx) / 2.0 + i_idx.astype(f32)) / width - 0.5
    sv = ((sy.astype(f32) + 0.5 + jy) / 2.0 + j_idx.astype(f32)) / height - 0.5
    ddx = su * cxx + sv * cyx + dx0
    ddy = sv * cyy + dy0
    ddz = sv * cyz + dz0
    ox = px + ddx * push
    oy = py + ddy * push
    oz = pz + ddz * push
    inv = jax.lax.rsqrt(ddx * ddx + ddy * ddy + ddz * ddz)
    dx, dy, dz = ddx * inv, ddy * inv, ddz * inv

    shape = dx.shape
    tr = jnp.ones(shape, f32)
    tg = jnp.ones(shape, f32)
    tb = jnp.ones(shape, f32)
    lr = jnp.zeros(shape, f32)
    lg = jnp.zeros(shape, f32)
    lb = jnp.zeros(shape, f32)
    # float mask, not bool: i1 vectors in the fori_loop carry crash the
    # Mosaic compiler (SIGABRT).
    alive_f = jnp.ones(shape, f32)

    n_spheres = len(materials)

    def sph(plane, si):
        return scene_ref[plane, si]

    def bounce(state, with_rr, u):
        ox, oy, oz, dx, dy, dz, tr, tg, tb, lr, lg, lb, alive_f = state
        alive = alive_f > 0.5

        # ---- intersect: running min with static-material carriers -----
        tmin = jnp.full(shape, MISS_T, f32)
        w_cx = jnp.zeros(shape, f32)
        w_cy = jnp.zeros(shape, f32)
        w_cz = jnp.zeros(shape, f32)
        w_ar = jnp.zeros(shape, f32)
        w_ag = jnp.zeros(shape, f32)
        w_ab = jnp.zeros(shape, f32)
        w_er = jnp.zeros(shape, f32)
        w_eg = jnp.zeros(shape, f32)
        w_eb = jnp.zeros(shape, f32)
        w_diff = jnp.zeros(shape, jnp.bool_)
        w_refr = jnp.zeros(shape, jnp.bool_)
        w_r2 = jnp.zeros(shape, f32)  # winner r^2: scale-aware offset

        for si in range(n_spheres):
            r2s = sph(0, si)
            cx = sph(1, si)
            cy = sph(2, si)
            cz = sph(3, si)
            ocx = cx - ox
            ocy = cy - oy
            ocz = cz - oz
            bq = ocx * dx + ocy * dy + ocz * dz
            c = ocx * ocx + ocy * ocy + ocz * ocz - r2s
            det = bq * bq - c
            valid = det >= 0
            sq = jnp.sqrt(jnp.where(valid, det, 0.0))
            t0 = bq - sq
            t1 = bq + sq
            t = jnp.where(
                valid & (t0 > eps), t0, jnp.where(valid & (t1 > eps), t1, MISS_T)
            )
            better = t < tmin
            tmin = jnp.where(better, t, tmin)
            w_cx = jnp.where(better, cx, w_cx)
            w_cy = jnp.where(better, cy, w_cy)
            w_cz = jnp.where(better, cz, w_cz)
            w_r2 = jnp.where(better, r2s, w_r2)
            w_ar = jnp.where(better, sph(7, si), w_ar)
            w_ag = jnp.where(better, sph(8, si), w_ag)
            w_ab = jnp.where(better, sph(9, si), w_ab)
            w_er = jnp.where(better, sph(4, si), w_er)
            w_eg = jnp.where(better, sph(5, si), w_eg)
            w_eb = jnp.where(better, sph(6, si), w_eb)
            if materials[si] == 0:  # DIFF
                w_diff = w_diff | better
            else:
                w_diff = w_diff & jnp.logical_not(better)
            if materials[si] == 2:  # REFR
                w_refr = w_refr | better
            else:
                w_refr = w_refr & jnp.logical_not(better)

        miss = tmin >= MISS_T
        live = alive & jnp.logical_not(miss)

        hx = ox + dx * tmin
        hy = oy + dy * tmin
        hz = oz + dz * tmin
        nx = hx - w_cx
        ny = hy - w_cy
        nz = hz - w_cz
        n2 = nx * nx + ny * ny + nz * nz
        ninv = jnp.where(n2 > 0, jax.lax.rsqrt(n2), 0.0)
        nx, ny, nz = nx * ninv, ny * ninv, nz * ninv
        dn = dx * nx + dy * ny + dz * nz
        into = dn < 0
        sgn = jnp.where(into, 1.0, -1.0)
        nlx, nly, nlz = nx * sgn, ny * sgn, nz * sgn

        # ---- emission accumulation -----------------------------------
        lr = jnp.where(live, lr + tr * w_er, lr)
        lg = jnp.where(live, lg + tg * w_eg, lg)
        lb = jnp.where(live, lb + tb * w_eb, lb)

        # ---- diffuse: cosine hemisphere sample -----------------------
        phi = (2.0 * 3.14159265358979) * u[0]
        r2u = u[1]
        r2sq = jnp.sqrt(r2u)
        flip = jnp.abs(nlx) > 0.1
        axx = jnp.where(flip, 0.0, 1.0)
        axy = jnp.where(flip, 1.0, 0.0)
        ux_ = axy * nlz
        uy_ = -axx * nlz
        uz_ = axx * nly - axy * nlx
        un = jax.lax.rsqrt(jnp.maximum(ux_ * ux_ + uy_ * uy_ + uz_ * uz_, 1e-20))
        ux_, uy_, uz_ = ux_ * un, uy_ * un, uz_ * un
        vx_ = nly * uz_ - nlz * uy_
        vy_ = nlz * ux_ - nlx * uz_
        vz_ = nlx * uy_ - nly * ux_
        cw = jnp.sqrt(jnp.maximum(1.0 - r2u, 0.0))
        cphi = jnp.cos(phi) * r2sq
        sphi = jnp.sin(phi) * r2sq
        ddfx = ux_ * cphi + vx_ * sphi + nlx * cw
        ddfy = uy_ * cphi + vy_ * sphi + nly * cw
        ddfz = uz_ * cphi + vz_ * sphi + nlz * cw

        # ---- specular reflect ----------------------------------------
        td = 2.0 * dn
        dsx, dsy, dsz = dx - td * nx, dy - td * ny, dz - td * nz

        # ---- refraction (Schlick) ------------------------------------
        ior = 1.5
        nnt = jnp.where(into, 1.0 / ior, ior)
        ddn = dx * nlx + dy * nly + dz * nlz
        cos2t = 1.0 - nnt * nnt * (1.0 - ddn * ddn)
        tir = cos2t < 0
        sqc = jnp.sqrt(jnp.maximum(cos2t, 0.0))
        coef = sgn * (ddn * nnt + sqc)
        tdx = dx * nnt - nx * coef
        tdy = dy * nnt - ny * coef
        tdz = dz * nnt - nz * coef
        tinv = jax.lax.rsqrt(jnp.maximum(tdx * tdx + tdy * tdy + tdz * tdz, 1e-20))
        tdx, tdy, tdz = tdx * tinv, tdy * tinv, tdz * tinv
        a_ = ior - 1.0
        b_ = ior + 1.0
        r0 = (a_ * a_) / (b_ * b_)
        cth = 1.0 - jnp.where(into, -ddn, tdx * nx + tdy * ny + tdz * nz)
        re = r0 + (1.0 - r0) * cth * cth * cth * cth * cth
        pp = 0.25 + 0.5 * re
        pick_refl = (u[0] < pp) | tir
        drx = jnp.where(pick_refl, dsx, tdx)
        dry = jnp.where(pick_refl, dsy, tdy)
        drz = jnp.where(pick_refl, dsz, tdz)
        rscale = jnp.where(
            tir, 1.0, jnp.where(pick_refl, re / pp, (1.0 - re) / (1.0 - pp))
        )

        # ---- select next direction by material -----------------------
        ndx = jnp.where(w_diff, ddfx, jnp.where(w_refr, drx, dsx))
        ndy = jnp.where(w_diff, ddfy, jnp.where(w_refr, dry, dsy))
        ndz = jnp.where(w_diff, ddfz, jnp.where(w_refr, drz, dsz))
        scl = jnp.where(w_refr, rscale, 1.0)
        tr = jnp.where(live, tr * w_ar * scl, tr)
        tg = jnp.where(live, tg * w_ag * scl, tg)
        tb = jnp.where(live, tb * w_ab * scl, tb)

        # ---- Russian roulette (static phase flag) --------------------
        if with_rr:
            pmax = jnp.clip(jnp.maximum(jnp.maximum(tr, tg), tb), 0.1, 0.95)
            survive = u[2] < pmax
            pinv = 1.0 / pmax
            tr = jnp.where(survive, tr * pinv, tr)
            tg = jnp.where(survive, tg * pinv, tg)
            tb = jnp.where(survive, tb * pinv, tb)
            alive = live & survive
        else:
            alive = live

        # scale-aware offset (shade.scaled_origin_offset rationale): the
        # f32 wall-sphere hit error is ~r * 1e-6, a fixed eps leaks paths
        off = jnp.where(
            w_refr, 0.0,
            jnp.maximum(f32(eps), f32(REL_OFFSET) * jnp.sqrt(w_r2)),
        )
        ox = jnp.where(live, hx + nlx * off, ox)
        oy = jnp.where(live, hy + nly * off, oy)
        oz = jnp.where(live, hz + nlz * off, oz)
        dx = jnp.where(live, ndx, dx)
        dy = jnp.where(live, ndy, dy)
        dz = jnp.where(live, ndz, dz)
        alive_f = jnp.where(alive, f32(1.0), f32(0.0))
        if debug:
            from ascendpathtracing_tpu.utils.debug import kernel_dump

            # gate computed at kernel top: program_id is not callable
            # inside the fori_loop body
            kernel_dump("pt_pallas alive", jnp.sum(alive_f),
                        gate=(b == 0) & (a == 0))
        return (ox, oy, oz, dx, dy, dz, tr, tg, tb, lr, lg, lb, alive_f)

    state = (ox, oy, oz, dx, dy, dz, tr, tg, tb, lr, lg, lb, alive_f)
    n_pre = min(rr_depth, bounces)
    n_rr = bounces - n_pre
    # One PRNG generation for the whole bounce loop, staged through VMEM
    # scratch (dynamic_slice of values is not lowerable; pl.ds on a ref
    # is). 3 streams per bounce.
    u_scratch[:, :, :] = uniforms(3 * bounces)
    # fori_loop (not Python unroll) keeps live VMEM to one bounce's worth
    # of vectors — the unrolled form held ~450 live values per lane and
    # OOM'd scoped VMEM beyond tile=8192.
    if n_pre:
        state = jax.lax.fori_loop(
            0, n_pre,
            lambda i, st: bounce(st, False, u_scratch[pl.ds(3 * i, 3)]),
            state,
        )
    if n_rr:
        state = jax.lax.fori_loop(
            0, n_rr,
            lambda i, st: bounce(
                st, True, u_scratch[pl.ds(3 * (n_pre + i), 3)]
            ),
            state,
        )
    lr, lg, lb = state[9], state[10], state[11]

    # ---- accumulate this sample layer into the pixel block -----------
    inv_spp = f32(1.0 / spp4)

    @pl.when(a == 0)
    def _():
        out_ref[0, 0] = lr * inv_spp
        out_ref[1, 0] = lg * inv_spp
        out_ref[2, 0] = lb * inv_spp

    @pl.when(a > 0)
    def _():
        out_ref[0, 0] = out_ref[0, 0] + lr * inv_spp
        out_ref[1, 0] = out_ref[1, 0] + lg * inv_spp
        out_ref[2, 0] = out_ref[2, 0] + lb * inv_spp


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "spp4", "materials", "bounces",
        "rr_depth", "eps", "tile", "interpret", "debug",
    ),
)
def render_pt_pallas(
    scene_planes,
    *,
    width: int,
    height: int,
    spp4: int,
    materials: tuple,
    bounces: int = 8,
    rr_depth: int = 5,
    eps: float = 1e-4,
    tile: int = 2048,
    seed=0,
    interpret: bool = False,
    debug: bool = False,
):
    """Fully-fused path trace: no ray input, per-pixel mean output [3, W*H].

    Grid = (pixel tiles, spp4 sample layers); each cell traces one sample
    for TILE pixels and accumulates into the revisited output block (which
    Pallas keeps resident in VMEM across the inner grid dimension).  The
    camera model/constants follow camera.Camera (the reference's smallpt
    camera, gen_data.py:24-29).
    """
    from ascendpathtracing_tpu.camera import Camera

    n_pix = width * height
    if tile % 1024:
        raise ValueError(f"{tile=} must be a multiple of 1024 (8 sublanes x 128 lanes)")
    if n_pix % tile:
        raise ValueError(f"pixel count {n_pix} not divisible by {tile=}")
    nb = n_pix // tile
    grid = (nb, spp4)

    pos, d0, cx, cy = Camera().basis(width, height)
    cam_consts = (
        float(pos[0]), float(pos[1]), float(pos[2]),
        float(d0[0]), float(d0[1]), float(d0[2]),
        float(cx[0]), float(cy[0]), float(cy[1]), float(cy[2]),
        float(Camera().origin_push),
    )

    kernel = functools.partial(
        _render_pt_kernel,
        width=width,
        height=height,
        spp4=spp4,
        tile=tile,
        materials=tuple(materials),
        bounces=bounces,
        rr_depth=rr_depth,
        eps=eps,
        cam_consts=cam_consts,
        use_rng=not interpret,
        debug=debug,
    )
    s = scene_planes.shape[1]
    total = n_pix * spp4
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((10, s), lambda b, a: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3, 1, 8, tile // 8), lambda b, a: (0, b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((3, nb, 8, tile // 8), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3 * bounces, 8, tile // 8), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=total * bounces * (len(materials) * 14 + 120),
            bytes_accessed=3 * n_pix * 4,
            transcendentals=total * bounces * (len(materials) + 8),
        ),
        interpret=interpret,
    )(seed_arr, scene_planes)
    # (3, nb, 8, L) row-major == pixel order b*tile + sub*L + lane
    return out.reshape(3, n_pix)


# ==========================================================================
# Forward variant that ALSO emits the per-bounce winner index planes —
# the residual that lets the backward replay the bounce products without
# re-running intersection (see _render_ref_bwd_replay_kernel).
# ==========================================================================
def _render_ref_fwd_idx_kernel(
    rays_ref, scene_ref, out_ref, idx_ref, *, n_spheres, light_index, bounces, eps
):
    """Same math as :func:`_render_ref_kernel`, plus ``idx_ref[k, :]`` =
    the bounce-k winner sphere index (``n_spheres`` encodes a miss, which
    the oracle wraps to the LAST sphere's data for shading but NOT for the
    light-termination test — the two cases must stay distinguishable)."""
    ox = rays_ref[0, :]
    oy = rays_ref[1, :]
    oz = rays_ref[2, :]
    dx = rays_ref[3, :]
    dy = rays_ref[4, :]
    dz = rays_ref[5, :]

    f = ox.dtype
    shape = ox.shape
    tr = jnp.ones(shape, f)
    tg = jnp.ones(shape, f)
    tb = jnp.ones(shape, f)
    alive = jnp.ones(shape, jnp.bool_)

    def sphere_scalar(plane, s):
        return scene_ref[plane, s]

    for k in range(bounces):
        tmin = jnp.full(shape, MISS_T, f)
        last = n_spheres - 1
        w_cx = jnp.full(shape, sphere_scalar(1, last), f)
        w_cy = jnp.full(shape, sphere_scalar(2, last), f)
        w_cz = jnp.full(shape, sphere_scalar(3, last), f)
        w_ar = jnp.full(shape, sphere_scalar(7, last), f)
        w_ag = jnp.full(shape, sphere_scalar(8, last), f)
        w_ab = jnp.full(shape, sphere_scalar(9, last), f)
        w_light = jnp.zeros(shape, jnp.bool_)
        w_idx = jnp.full(shape, last, jnp.int32)

        for s in range(n_spheres):
            r2 = sphere_scalar(0, s)
            cx = sphere_scalar(1, s)
            cy = sphere_scalar(2, s)
            cz = sphere_scalar(3, s)
            ocx = cx - ox
            ocy = cy - oy
            ocz = cz - oz
            b = ocx * dx + ocy * dy + ocz * dz
            c = ocx * ocx + ocy * ocy + ocz * ocz - r2
            det = b * b - c
            valid = det >= 0
            sq = jnp.sqrt(jnp.where(valid, det, 0.0))
            t0 = b - sq
            t1 = b + sq
            t = jnp.where(
                valid & (t0 > eps), t0, jnp.where(valid & (t1 > eps), t1, MISS_T)
            )
            better = t < tmin
            tmin = jnp.where(better, t, tmin)
            w_cx = jnp.where(better, cx, w_cx)
            w_cy = jnp.where(better, cy, w_cy)
            w_cz = jnp.where(better, cz, w_cz)
            w_ar = jnp.where(better, sphere_scalar(7, s), w_ar)
            w_ag = jnp.where(better, sphere_scalar(8, s), w_ag)
            w_ab = jnp.where(better, sphere_scalar(9, s), w_ab)
            w_idx = jnp.where(better, s, w_idx)
            if s == light_index:
                w_light = w_light | better
            else:
                w_light = w_light & jnp.logical_not(better)

        miss = tmin >= MISS_T
        idx_ref[k, :] = jnp.where(miss, n_spheres, w_idx)

        hx = ox + dx * tmin
        hy = oy + dy * tmin
        hz = oz + dz * tmin
        nx = hx - w_cx
        ny = hy - w_cy
        nz = hz - w_cz
        n2 = nx * nx + ny * ny + nz * nz
        inv = jnp.where(n2 > 0, 1.0 / jnp.sqrt(n2), 0.0)
        nx, ny, nz = nx * inv, ny * inv, nz * inv
        dn = dx * nx + dy * ny + dz * nz
        td = 2.0 * dn
        dx, dy, dz = dx - td * nx, dy - td * ny, dz - td * nz
        ox, oy, oz = hx, hy, hz

        alive = alive & jnp.logical_not(w_light)
        tr = jnp.where(alive, tr * w_ar, tr)
        tg = jnp.where(alive, tg * w_ag, tg)
        tb = jnp.where(alive, tb * w_ab, tb)

    out_ref[0, :] = tr * scene_ref[4, light_index]
    out_ref[1, :] = tg * scene_ref[5, light_index]
    out_ref[2, :] = tb * scene_ref[6, light_index]


@functools.partial(
    jax.jit,
    static_argnames=("bounces", "eps", "tile", "light_index", "interpret"),
)
def render_reference_pallas_planes_with_idx(
    rays_planes,
    scene_planes,
    *,
    light_index: int,
    bounces: int = 5,
    eps: float = 1e-4,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
):
    """Fused render that also returns the per-bounce winner-index planes
    (colors [3, N] f32, idx [bounces, N] i32) — the replay residual."""
    n = rays_planes.shape[1]
    s = scene_planes.shape[1]
    if n % tile:
        raise ValueError(f"ray count {n} not divisible by tile {tile}")
    grid = (n // tile,)

    kernel = functools.partial(
        _render_ref_fwd_idx_kernel,
        n_spheres=s,
        light_index=light_index,
        bounces=bounces,
        eps=eps,
    )
    flops_per = s * 14 + 30
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((6, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((10, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bounces, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, n), rays_planes.dtype),
            jax.ShapeDtypeStruct((bounces, n), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n * bounces * flops_per,
            bytes_accessed=(6 + 3 + bounces) * n * 4,
            transcendentals=n * bounces * (s + 1),
        ),
        interpret=interpret,
    )(rays_planes, scene_planes)


def _render_ref_bwd_replay_kernel(
    scene_ref,  # [10, S]
    idx_ref,  # [bounces, 1, 8, L] i32 winner indices (S == miss)
    g_ref,  # [3, 1, 8, L] cotangent
    out_ref,  # [10, S] accumulated scene-plane grads (SMEM)
    *,
    n_spheres,
    light_index,
    bounces,
):
    """Replay backward: no intersection, no geometry — just the albedo
    product chain reconstructed from the stored winner indices.  ~4x
    fewer vector ops per bounce than the recompute backward."""
    f32 = jnp.float32
    b_id = pl.program_id(0)
    last = n_spheres - 1

    shape = g_ref[0, 0].shape
    tr = jnp.ones(shape, f32)
    tg = jnp.ones(shape, f32)
    tb = jnp.ones(shape, f32)
    alive = jnp.ones(shape, jnp.bool_)
    dt_r = [jnp.zeros(shape, f32) for _ in range(n_spheres)]
    dt_g = [jnp.zeros(shape, f32) for _ in range(n_spheres)]
    dt_b = [jnp.zeros(shape, f32) for _ in range(n_spheres)]

    for k in range(bounces):
        idx = idx_ref[k, 0]
        # One compare per sphere, shared by the albedo select chain and
        # the product-rule pick below.  A miss (idx == n_spheres) wraps to
        # the LAST sphere's albedo (oracle gen_data.py:343,390) but is not
        # a light hit, exactly as the forward distinguishes them.
        eq = [idx == s for s in range(last)]
        eq.append((idx == last) | (idx == n_spheres))

        # A miss encodes as idx == n_spheres, so this exact compare never
        # fires for misses even when the light is the last sphere.
        alive = alive & jnp.logical_not(idx == light_index)

        w_ar = jnp.full(shape, scene_ref[7, last], f32)
        w_ag = jnp.full(shape, scene_ref[8, last], f32)
        w_ab = jnp.full(shape, scene_ref[9, last], f32)
        for s in range(last):
            w_ar = jnp.where(eq[s], scene_ref[7, s], w_ar)
            w_ag = jnp.where(eq[s], scene_ref[8, s], w_ag)
            w_ab = jnp.where(eq[s], scene_ref[9, s], w_ab)

        mr = jnp.where(alive, w_ar, 1.0)
        mg = jnp.where(alive, w_ag, 1.0)
        mb = jnp.where(alive, w_ab, 1.0)
        for s in range(n_spheres):
            pick_f = jnp.where(alive & eq[s], 1.0, 0.0)
            dt_r[s] = dt_r[s] * mr + pick_f * tr
            dt_g[s] = dt_g[s] * mg + pick_f * tg
            dt_b[s] = dt_b[s] * mb + pick_f * tb
        tr = tr * mr
        tg = tg * mg
        tb = tb * mb

    gr = g_ref[0, 0]
    gg = g_ref[1, 0]
    gb = g_ref[2, 0]
    emi_r = scene_ref[4, light_index]
    emi_g = scene_ref[5, light_index]
    emi_b = scene_ref[6, light_index]

    @pl.when(b_id == 0)
    def _():
        for p_ in range(10):
            for s_ in range(n_spheres):
                out_ref[p_, s_] = jnp.float32(0.0)

    out_ref[4, light_index] = out_ref[4, light_index] + jnp.sum(gr * tr)
    out_ref[5, light_index] = out_ref[5, light_index] + jnp.sum(gg * tg)
    out_ref[6, light_index] = out_ref[6, light_index] + jnp.sum(gb * tb)
    for s in range(n_spheres):
        out_ref[7, s] = out_ref[7, s] + jnp.sum(gr * emi_r * dt_r[s])
        out_ref[8, s] = out_ref[8, s] + jnp.sum(gg * emi_g * dt_g[s])
        out_ref[9, s] = out_ref[9, s] + jnp.sum(gb * emi_b * dt_b[s])


@functools.partial(
    jax.jit,
    static_argnames=("bounces", "tile", "light_index", "interpret"),
)
def _render_ref_bwd_replay(
    idx_planes, scene_planes, g_planes, *, light_index, bounces, tile,
    interpret=False,
):
    n = idx_planes.shape[1]
    s = scene_planes.shape[1]
    if tile % 1024:
        raise ValueError(f"{tile=} must be a multiple of 1024")
    if n % tile:
        raise ValueError(f"ray count {n} not divisible by {tile=}")
    nb = n // tile
    lanes = tile // 8
    idx4 = idx_planes.reshape(bounces, nb, 8, lanes)
    g4 = g_planes.reshape(3, nb, 8, lanes)
    kernel = functools.partial(
        _render_ref_bwd_replay_kernel,
        n_spheres=s,
        light_index=light_index,
        bounces=bounces,
    )
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((10, s), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bounces, 1, 8, lanes), lambda b: (0, b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, 1, 8, lanes), lambda b: (0, b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((10, s), lambda b: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((10, s), jnp.float32),
        interpret=interpret,
    )(scene_planes, idx4, g4)


# ==========================================================================
# Custom VJP for the reference-mode render: one recompute pass with
# product-rule accumulators.
#
# Reference-mode color_c = emission_c(light) * prod_b albedo_c(s_b) where
# the s_b are DISCRETE argmin winners, so the exact reverse-mode gradient
# is: d emission = sum_i g_i * tput_i;  d albedo[s] via the product rule
# over each ray's albedo factors; d center = d r2 = d rays = 0 exactly
# (what jax AD computes through the integer paths).  The backward kernel
# recomputes the forward per tile while carrying dtput[s]_c =
# d tput_c / d albedo[s]_c and contracts with the cotangent.
# ==========================================================================
def _render_ref_bwd_kernel(
    rays_ref,  # [6, 1, 8, L]
    scene_ref,  # [10, S]
    g_ref,  # [3, 1, 8, L] cotangent
    out_ref,  # [10, S] accumulated scene-plane grads
    *,
    n_spheres,
    light_index,
    bounces,
    eps,
):
    f32 = jnp.float32
    b_id = pl.program_id(0)

    ox = rays_ref[0, 0]
    oy = rays_ref[1, 0]
    oz = rays_ref[2, 0]
    dx = rays_ref[3, 0]
    dy = rays_ref[4, 0]
    dz = rays_ref[5, 0]
    shape = ox.shape

    tr = jnp.ones(shape, f32)
    tg = jnp.ones(shape, f32)
    tb = jnp.ones(shape, f32)
    alive = jnp.ones(shape, jnp.bool_)
    # product-rule accumulators d tput_c / d albedo[s]_c
    dt_r = [jnp.zeros(shape, f32) for _ in range(n_spheres)]
    dt_g = [jnp.zeros(shape, f32) for _ in range(n_spheres)]
    dt_b = [jnp.zeros(shape, f32) for _ in range(n_spheres)]

    def sphere_scalar(plane, s):
        return scene_ref[plane, s]

    for _ in range(bounces):
        tmin = jnp.full(shape, MISS_T, f32)
        last = n_spheres - 1
        w_cx = jnp.full(shape, sphere_scalar(1, last), f32)
        w_cy = jnp.full(shape, sphere_scalar(2, last), f32)
        w_cz = jnp.full(shape, sphere_scalar(3, last), f32)
        w_ar = jnp.full(shape, sphere_scalar(7, last), f32)
        w_ag = jnp.full(shape, sphere_scalar(8, last), f32)
        w_ab = jnp.full(shape, sphere_scalar(9, last), f32)
        w_light = jnp.zeros(shape, jnp.bool_)
        w_idx = jnp.full(shape, last, jnp.int32)

        for s in range(n_spheres):
            r2 = sphere_scalar(0, s)
            cx = sphere_scalar(1, s)
            cy = sphere_scalar(2, s)
            cz = sphere_scalar(3, s)
            ocx = cx - ox
            ocy = cy - oy
            ocz = cz - oz
            bq = ocx * dx + ocy * dy + ocz * dz
            c = ocx * ocx + ocy * ocy + ocz * ocz - r2
            det = bq * bq - c
            valid = det >= 0
            sq = jnp.sqrt(jnp.where(valid, det, 0.0))
            t0 = bq - sq
            t1 = bq + sq
            t = jnp.where(
                valid & (t0 > eps), t0, jnp.where(valid & (t1 > eps), t1, MISS_T)
            )
            better = t < tmin
            tmin = jnp.where(better, t, tmin)
            w_cx = jnp.where(better, cx, w_cx)
            w_cy = jnp.where(better, cy, w_cy)
            w_cz = jnp.where(better, cz, w_cz)
            w_ar = jnp.where(better, sphere_scalar(7, s), w_ar)
            w_ag = jnp.where(better, sphere_scalar(8, s), w_ag)
            w_ab = jnp.where(better, sphere_scalar(9, s), w_ab)
            w_idx = jnp.where(better, s, w_idx)
            if s == light_index:
                w_light = w_light | better
            else:
                w_light = w_light & jnp.logical_not(better)

        hx = ox + dx * tmin
        hy = oy + dy * tmin
        hz = oz + dz * tmin
        nx = hx - w_cx
        ny = hy - w_cy
        nz = hz - w_cz
        n2 = nx * nx + ny * ny + nz * nz
        inv = jnp.where(n2 > 0, 1.0 / jnp.sqrt(n2), 0.0)
        nx, ny, nz = nx * inv, ny * inv, nz * inv
        dn = dx * nx + dy * ny + dz * nz
        td = 2.0 * dn
        dx, dy, dz = dx - td * nx, dy - td * ny, dz - td * nz
        ox, oy, oz = hx, hy, hz

        alive = alive & jnp.logical_not(w_light)
        # the miss case multiplies by the last sphere's albedo exactly as
        # the forward does (oracle wrap semantics), so w_idx == last there.
        # Product rule: dtput[s]' = dtput[s] * m + (s == winner) * tput,
        # applied only where alive (dead rays multiply by 1).
        mr = jnp.where(alive, w_ar, 1.0)
        mg = jnp.where(alive, w_ag, 1.0)
        mb = jnp.where(alive, w_ab, 1.0)
        for s in range(n_spheres):
            pick = alive & (w_idx == s)
            pick_f = jnp.where(pick, 1.0, 0.0)
            dt_r[s] = dt_r[s] * mr + pick_f * tr
            dt_g[s] = dt_g[s] * mg + pick_f * tg
            dt_b[s] = dt_b[s] * mb + pick_f * tb
        tr = tr * mr
        tg = tg * mg
        tb = tb * mb

    gr = g_ref[0, 0]
    gg = g_ref[1, 0]
    gb = g_ref[2, 0]
    emi_r = scene_ref[4, light_index]
    emi_g = scene_ref[5, light_index]
    emi_b = scene_ref[6, light_index]

    @pl.when(b_id == 0)
    def _():
        # SMEM accepts only scalar stores: element-wise init
        for p_ in range(10):
            for s_ in range(n_spheres):
                out_ref[p_, s_] = jnp.float32(0.0)

    # d emission (only the light's row is live)
    out_ref[4, light_index] = out_ref[4, light_index] + jnp.sum(gr * tr)
    out_ref[5, light_index] = out_ref[5, light_index] + jnp.sum(gg * tg)
    out_ref[6, light_index] = out_ref[6, light_index] + jnp.sum(gb * tb)
    # d albedo rows (planes 7..9)
    for s in range(n_spheres):
        out_ref[7, s] = out_ref[7, s] + jnp.sum(gr * emi_r * dt_r[s])
        out_ref[8, s] = out_ref[8, s] + jnp.sum(gg * emi_g * dt_g[s])
        out_ref[9, s] = out_ref[9, s] + jnp.sum(gb * emi_b * dt_b[s])


@functools.partial(
    jax.jit,
    static_argnames=("bounces", "eps", "tile", "light_index", "interpret"),
)
def _render_ref_bwd(
    rays_planes, scene_planes, g_planes, *, light_index, bounces, eps, tile,
    interpret=False,
):
    n = rays_planes.shape[1]
    s = scene_planes.shape[1]
    if tile % 1024:
        raise ValueError(f"{tile=} must be a multiple of 1024")
    if n % tile:
        raise ValueError(f"ray count {n} not divisible by {tile=}")
    nb = n // tile
    lanes = tile // 8
    rays4 = rays_planes.reshape(6, nb, 8, lanes)
    g4 = g_planes.reshape(3, nb, 8, lanes)
    kernel = functools.partial(
        _render_ref_bwd_kernel,
        n_spheres=s,
        light_index=light_index,
        bounces=bounces,
        eps=eps,
    )
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((6, 1, 8, lanes), lambda b: (0, b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((10, s), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1, 8, lanes), lambda b: (0, b, 0, 0), memory_space=pltpu.VMEM),
        ],
        # scalar accumulation lands in SMEM (scalar stores to VMEM are
        # rejected by Mosaic on hardware)
        out_specs=pl.BlockSpec((10, s), lambda b: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((10, s), jnp.float32),
        interpret=interpret,
    )(rays4, scene_planes, g4)


def make_render_reference_pallas_diff(
    *, light_index, bounces=5, eps=1e-4, tile=DEFAULT_TILE, interpret=False,
    replay=True,
):
    """Differentiable fused render: fn(rays_planes [6,N], scene_planes
    [10,S]) -> colors [3,N], with a hand-written Pallas backward for the
    scene planes (rays get exact zeros — their true gradient, see module
    docstring).

    replay=True (default): the forward stores the per-bounce winner-index
    planes (i32, bounces x N — ~bounces*4 bytes/ray of HBM residual) and
    the backward replays the albedo product chain from them, skipping
    intersection + geometry entirely (~4x fewer bwd vector ops).
    replay=False: the original recompute backward (no residual beyond the
    inputs).
    """

    @jax.custom_vjp
    def render(rays_planes, scene_planes):
        return render_reference_pallas_planes(
            rays_planes, scene_planes, light_index=light_index,
            bounces=bounces, eps=eps, tile=tile, interpret=interpret,
        )

    if replay:

        def fwd(rays_planes, scene_planes):
            out, idx = render_reference_pallas_planes_with_idx(
                rays_planes, scene_planes, light_index=light_index,
                bounces=bounces, eps=eps, tile=tile, interpret=interpret,
            )
            return out, (rays_planes, scene_planes, idx)

        def bwd(res, g):
            rays_planes, scene_planes, idx = res
            d_scene = _render_ref_bwd_replay(
                idx, scene_planes, g, light_index=light_index,
                bounces=bounces, tile=tile, interpret=interpret,
            )
            return jnp.zeros_like(rays_planes), d_scene

    else:

        def fwd(rays_planes, scene_planes):
            out = render(rays_planes, scene_planes)
            return out, (rays_planes, scene_planes)

        def bwd(res, g):
            rays_planes, scene_planes = res
            d_scene = _render_ref_bwd(
                rays_planes, scene_planes, g, light_index=light_index,
                bounces=bounces, eps=eps, tile=tile, interpret=interpret,
            )
            return jnp.zeros_like(rays_planes), d_scene

    render.defvjp(fwd, bwd)
    return render
