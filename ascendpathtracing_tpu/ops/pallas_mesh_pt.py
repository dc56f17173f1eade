"""Fully-fused mesh path-tracing Pallas kernel — the flagship renderer
for combined sphere+mesh scenes (the reference's single-fused-kernel
shape, /root/reference/src/render.cpp:104-207, applied to the BVH
world).

camera generation + PRNG + sphere intersection + chunked-BVH mesh
traversal + shading + Russian roulette all run in ONE kernel per
(pixel-tile, sample-layer) grid cell; HBM traffic is exactly the
per-pixel output (plus, for huge scenes, the DMA-streamed triangle
worklist).  The XLA-loop mesh renderer (models/mesh.py) pays per-bounce
gathers and kernel-launch round trips for the same estimator; here the
only per-bounce mesh cost is the chunk-grid walk (the shared
ops/pallas_wbvh.py phases) against rays already in registers.

Everything the shading needs from the winning primitive rides in
RUNNING CARRIERS updated inside the triangle/sphere test (albedo,
emission, normal, material one-hots) — the same no-gather idiom as the
sphere kernel (ops/pallas_kernels.py docstring), extended with a
`w_tri` flag that selects triangle normals over sphere normals.

Triangle rows are the TRI_ATTR_F = 24 floats of
:func:`pallas_wbvh.attr_triangle_rows`: 13 intersection floats plus
unit normal (3), albedo (3), emission (3), and (is_diff, is_refr)
material one-hots (scalar-bool `where` is not lowerable, so materials
ride as 0/1 floats).

Scaling structure (all shared with the traversal kernel via
``compact_worklist`` / ``streamed_chunk_loop``):

- one chunk level for small scenes, superchunk gating for large ones
  (phase A costs O(supers + hit_supers * supers_per) slab tests);
- triangle residency SMEM -> VMEM -> HBM with per-chunk double-buffered
  DMA of the per-bounce compacted worklist, so 100k+-triangle scenes
  run fully fused.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ascendpathtracing_tpu.ops import pallas_wbvh as wbvh
from ascendpathtracing_tpu.ops.shade import REL_OFFSET
from ascendpathtracing_tpu.scenes import DIFF, REFR

MISS_T = 1e20
TRI_PT_F = wbvh.TRI_ATTR_F  # 24: 13 intersection + 11 shading floats


def pack_mesh_for_pt(grid: wbvh.ChunkGrid, ms) -> np.ndarray:
    """ChunkGrid + MeshScene -> [C*T, TRI_PT_F] slot-ordered rows (the
    same layout as the traversal kernel's attrs=True table)."""
    return wbvh.attr_triangle_rows(
        grid, ms.face_albedo, ms.face_emission, ms.face_material,
        diff_code=DIFF, refr_code=REFR,
    )


def mesh_pt_tables(
    ms, *, tris_per_chunk: int = 16, supers_per: int | None = None,
    supers2_per: int | None = None,
):
    """MeshScene -> everything :func:`render_pt_mesh_pallas` needs.

    Returns (scene_planes [10, S] f32, cboxes [C, 6], sboxes [Cs, 6],
    tris24 [C*T, TRI_PT_F], materials tuple, grid).  ``supers_per`` auto
    defaults like models/mesh.py: 16 once the chunk count reaches 128
    (the r3 sweep winner on divergent rays); ``supers2_per`` auto
    defaults to 16 once the SUPER count reaches 256 (the third level
    that carries phase A past ~1M triangles).  Pass ``grid.ssboxes`` /
    ``grid.supers2_per`` through to the renderer (pt_tables_kwargs
    below does it for you).
    """
    faces = np.asarray(ms.faces)
    n_ch_est = -(-faces.shape[0] // tris_per_chunk)
    if supers_per is None:
        supers_per = 16 if n_ch_est >= 128 else 0
    if supers2_per is None:
        n_s_est = -(-n_ch_est // supers_per) if supers_per else 0
        supers2_per = 16 if n_s_est >= 256 else 0
    grid = wbvh.build_chunk_grid(
        ms.vertices, faces, tris_per_chunk=tris_per_chunk,
        supers_per=supers_per, supers2_per=supers2_per,
    )
    tris24 = pack_mesh_for_pt(grid, ms)
    planes = jnp.asarray(ms.spheres.soa10())
    mats = tuple(int(m) for m in ms.spheres.material)
    return (
        planes, jnp.asarray(grid.cboxes), jnp.asarray(grid.sboxes),
        jnp.asarray(tris24), mats, grid,
    )


def pt_tables_kwargs(grid) -> dict:
    """The grid-derived kwargs for :func:`render_pt_mesh_pallas` —
    single place so call sites cannot forget the third level."""
    kw = dict(
        tris_per_chunk=grid.tris_per_chunk, supers_per=grid.supers_per,
    )
    if grid.n_supers2:
        kw["ssboxes"] = jnp.asarray(grid.ssboxes)
        kw["supers2_per"] = grid.supers2_per
    return kw


def _mesh_pt_kernel(
    *refs,
    width, height, spp4, tile, materials, bounces, rr_depth, eps,
    n_chunks, n_supers, supers_per, tris_per_chunk,
    n_supers2, supers2_per,
    tris_mode,  # "smem" | "vmem" | "hbm"
    boxes_flat,
    use_rng,  # False in interpret mode: prng_* has no CPU lowering at
              # all, so uniforms become EXACT zeros — the deterministic
              # u=0 estimator tests/test_pallas_mesh_pt.py mirrors
    debug=False,  # per-bounce worklist-k + alive-count dump on cell 0
    with_residuals=False,  # emit per-bounce replay residuals (wid, resv)
    with_camera=False,  # also emit per-sample (su, sv) screen coords
    with_stats=False,  # emit per-(cell, bounce) worklist lengths (SMEM)
):
    """Refs (in order): seed, cam (SMEM), scene planes, cboxes,
    [sboxes], tris, out, [wid_out, resv_out], [suv_out], [kstats_out
    (SMEM)], u_scratch, flags (VMEM), clist (SMEM), [slist (SMEM)],
    [tri_scratch, dma_sem] (hbm mode)."""
    f32 = jnp.float32
    T = tris_per_chunk
    it = iter(refs)
    seed_ref = next(it)
    cam_ref = next(it)
    scene_ref = next(it)
    cboxes_ref = next(it)
    sboxes_ref = next(it) if n_supers else None
    ssboxes_ref = next(it) if n_supers2 else None
    tris_ref = next(it)
    out_ref = next(it)
    wid_ref = next(it) if with_residuals else None
    resv_ref = next(it) if with_residuals else None
    suv_ref = next(it) if with_camera else None
    kstats_ref = next(it) if with_stats else None
    u_scratch = next(it)
    flags_ref = next(it)
    clist_ref = next(it)
    slist_ref = next(it) if n_supers else None
    sslist_ref = next(it) if n_supers2 else None
    tscratch_ref = next(it) if tris_mode == "hbm" else None
    dsem_ref = next(it) if tris_mode == "hbm" else None

    b = pl.program_id(0)
    a = pl.program_id(1)
    n_layers = pl.num_programs(1)
    if use_rng:
        pltpu.prng_seed(seed_ref[0] + b * n_layers + a)
    lanes = tile // 8

    if boxes_flat:
        cbox = lambda c, k: cboxes_ref[c * 6 + k]
        sbox = (lambda s, k: sboxes_ref[s * 6 + k]) if n_supers else None
        ssbox = (lambda s, k: ssboxes_ref[s * 6 + k]) if n_supers2 else None
    else:
        cbox = lambda c, k: cboxes_ref[c, k]
        sbox = (lambda s, k: sboxes_ref[s, k]) if n_supers else None
        ssbox = (lambda s, k: ssboxes_ref[s, k]) if n_supers2 else None

    def uniforms(n_streams):
        if not use_rng:
            return jnp.zeros((n_streams, 8, lanes), f32)
        bits = pltpu.bitcast(
            pltpu.prng_random_bits((n_streams, 8, lanes)), jnp.uint32
        )
        i32 = pltpu.bitcast(bits >> 8, jnp.int32)
        return i32.astype(f32) * f32(1.0 / (1 << 24))

    # camera rides as a TRACED 11-float SMEM vector (pos3, unit-dir3,
    # cx.x, cy3, origin push) so camera optimization steps do not
    # retrace/recompile the kernel (VERDICT r4 ask 3); layout =
    # diff/camera_fused.cam_vector
    (px, py, pz, dx0, dy0, dz0, cxx, cyx, cyy, cyz, push) = (
        cam_ref[ci] for ci in range(11)
    )

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
    if with_camera:
        # per-sample screen coords: with these + the bounce-0 winner id,
        # the XLA side can rebuild the primary ray DIFFERENTIABLY in the
        # camera parameters and replay the depth chain
        suv_ref[0, 0] = su
        suv_ref[1, 0] = sv

    shape = dx.shape
    tr = jnp.ones(shape, f32)
    tg = jnp.ones(shape, f32)
    tb = jnp.ones(shape, f32)
    lr = jnp.zeros(shape, f32)
    lg = jnp.zeros(shape, f32)
    lb = jnp.zeros(shape, f32)
    alive_f = jnp.ones(shape, f32)

    n_spheres = len(materials)
    sph = lambda plane, si: scene_ref[plane, si]

    def bounce(state, with_rr, u, bi=None):
        ox, oy, oz, dx, dy, dz, tr, tg, tb, lr, lg, lb, alive_f = state
        alive = alive_f > 0.5

        # ---- spheres: running min with shading carriers ---------------
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
        w_trif = jnp.zeros(shape, f32)   # 1.0 when the winner is a triangle
        w_nx = jnp.zeros(shape, f32)     # triangle unit normal carriers
        w_ny = jnp.zeros(shape, f32)
        w_nz = jnp.zeros(shape, f32)
        w_r2 = jnp.zeros(shape, f32)     # winner r^2 (scale-aware offset;
                                         # triangle winners leave it 0)
        # replay-residual carriers: sphere winner index / triangle slot
        w_sif = jnp.zeros(shape, f32) if with_residuals else None

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
            if with_residuals:
                w_sif = jnp.where(better, f32(si), w_sif)
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
            # spheres run before triangles, so w_trif stays 0 here

        # ---- mesh: chunk-grid walk (shared ops/pallas_wbvh.py phases) -
        inv_dx = 1.0 / jnp.where(dx == 0, 1e-30, dx)
        inv_dy = 1.0 / jnp.where(dy == 0, 1e-30, dy)
        inv_dz = 1.0 / jnp.where(dz == 0, 1e-30, dz)

        # dead lanes must not gate chunks in: their stale rays would keep
        # dragging chunk lists through phase B for all remaining bounces
        # (the reference drags dead rays by design, rt_helper.h:787-810 —
        # here the worklist SHRINKS as paths terminate).  Gate with -inf:
        # _slab_tmin's tnear is unclamped and can go below any finite
        # bound when a stale origin sits deep inside a box, but
        # tnear < -inf is never true (ADVICE r3 low #1).
        tmin_gate = jnp.where(alive, tmin, f32(-jnp.inf))

        def slab_bounded(box, i):
            # unlike the standalone kernel, a real tmin exists here
            # BEFORE the mesh walk (the spheres ran first): boxes
            # entered beyond the sphere/wall hit are never listed
            return wbvh._slab_tmin(
                ox, oy, oz, inv_dx, inv_dy, inv_dz,
                box(i, 0), box(i, 1), box(i, 2),
                box(i, 3), box(i, 4), box(i, 5),
                tmin_gate,
            )

        k, hs, hss = wbvh.compact_worklist(
            flags_ref, clist_ref, slist_ref, slab_bounded, cbox, sbox,
            n_chunks=n_chunks, n_supers=n_supers, supers_per=supers_per,
            sslist_ref=sslist_ref, ssbox=ssbox, n_supers2=n_supers2,
            supers2_per=supers2_per,
        )
        if with_stats:
            # per-(cell, bounce) worklist length + phase-A hit counts —
            # the phase-B load / chunk-occupancy record AND the
            # data-dependent-loop trip counts the roofline model assigns
            # (VERDICT r4 asks 1+6); bi is a python int in the unrolled
            # loop, traced in the fori path — both index the SMEM stats
            # row fine on the scalar core.  Rows: [bi] = k,
            # [bounces + bi] = hit supers, [2*bounces + bi] = hit
            # super-supers; CELLS on the minor axis (SMEM pads the minor
            # dim to 128 lanes — a [cells, 24] layout at 512x512x16spp
            # padded to 2 MB and blew the 1 MB SMEM cap on v5e).
            kstats_ref[bi, b * n_layers + a] = k
            kstats_ref[bounces + bi, b * n_layers + a] = hs
            kstats_ref[2 * bounces + bi, b * n_layers + a] = hss
        if debug:
            # per-bounce worklist length: the traversal-load diagnostic
            # (the wbvh kernel's dump, extended to every bounce here);
            # gate from the enclosing scope — program_id does not lower
            # inside the fori_loop body
            from ascendpathtracing_tpu.utils.debug import kernel_dump

            kernel_dump("mesh_pt worklist k", k, gate=(b == 0) & (a == 0))

        def tri_test(trif, tidx, slotf, carry):
            # material flags ride as 0/1 FLOATS in this carry: i1 vectors
            # in a fori_loop carry fail Mosaic legalization (LESSONS #11)
            (tmin, w_ar, w_ag, w_ab, w_er, w_eg, w_eb, w_diff_f, w_refr_f,
             w_trif, w_nx, w_ny, w_nz) = carry[:13]
            nx_ = trif(tidx, 3)
            ny_ = trif(tidx, 4)
            nz_ = trif(tidx, 5)
            nd = nx_ * dx + ny_ * dy + nz_ * dz
            no = nx_ * ox + ny_ * oy + nz_ * oz
            t = (trif(tidx, 12) - no) / nd
            wx = (ox - trif(tidx, 0)) + t * dx
            wy = (oy - trif(tidx, 1)) + t * dy
            wz = (oz - trif(tidx, 2)) + t * dz
            uu = trif(tidx, 6) * wx + trif(tidx, 7) * wy + trif(tidx, 8) * wz
            vv = trif(tidx, 9) * wx + trif(tidx, 10) * wy + trif(tidx, 11) * wz
            ok = (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0) & (t > eps)
            better = ok & (t < tmin)
            tmin = jnp.where(better, t, tmin)
            w_ar = jnp.where(better, trif(tidx, 16), w_ar)
            w_ag = jnp.where(better, trif(tidx, 17), w_ag)
            w_ab = jnp.where(better, trif(tidx, 18), w_ab)
            w_er = jnp.where(better, trif(tidx, 19), w_er)
            w_eg = jnp.where(better, trif(tidx, 20), w_eg)
            w_eb = jnp.where(better, trif(tidx, 21), w_eb)
            w_diff_f = jnp.where(better, trif(tidx, 22), w_diff_f)
            w_refr_f = jnp.where(better, trif(tidx, 23), w_refr_f)
            # with_residuals packs the winning SLOT id into the existing
            # tri flag (0 = sphere winner, slot+1 = triangle winner):
            # the replay backward gets the id with ZERO extra phase-B
            # carry (a 14th fori-carry operand measured +32% whole-kernel
            # cost from register pressure); is_tri (> 0.5) still works
            w_trif = jnp.where(
                better, slotf + 1.0 if with_residuals else f32(1.0), w_trif
            )
            w_nx = jnp.where(better, trif(tidx, 13), w_nx)
            w_ny = jnp.where(better, trif(tidx, 14), w_ny)
            w_nz = jnp.where(better, trif(tidx, 15), w_nz)
            return (tmin, w_ar, w_ag, w_ab, w_er, w_eg, w_eb, w_diff_f,
                    w_refr_f, w_trif, w_nx, w_ny, w_nz)

        def chunk_fn(trif, base, carry):
            for j in range(T):
                slotf = (base + j).astype(f32) if with_residuals else None
                carry = tri_test(trif, j, slotf, carry)
            return carry

        carry = (tmin, w_ar, w_ag, w_ab, w_er, w_eg, w_eb,
                 jnp.where(w_diff, f32(1.0), f32(0.0)),
                 jnp.where(w_refr, f32(1.0), f32(0.0)),
                 w_trif, w_nx, w_ny, w_nz)
        carry = wbvh.streamed_chunk_loop(
            k, clist_ref, chunk_fn, carry,
            tris_mode=tris_mode, tris_ref=tris_ref, tris_per_chunk=T,
            tri_stride=TRI_PT_F, tscratch_ref=tscratch_ref,
            dsem_ref=dsem_ref,
        )
        (tmin, w_ar, w_ag, w_ab, w_er, w_eg, w_eb, w_diff_f, w_refr_f,
         w_trif, w_nx, w_ny, w_nz) = carry
        w_diff = w_diff_f > 0.5
        w_refr = w_refr_f > 0.5

        miss = tmin >= MISS_T
        live = alive & jnp.logical_not(miss)

        hx = ox + dx * tmin
        hy = oy + dy * tmin
        hz = oz + dz * tmin
        # sphere normal from the center carriers; triangle normal from
        # the normal carriers, selected by w_trif
        snx = hx - w_cx
        sny = hy - w_cy
        snz = hz - w_cz
        n2 = snx * snx + sny * sny + snz * snz
        ninv = jnp.where(n2 > 0, jax.lax.rsqrt(n2), 0.0)
        is_tri = w_trif > 0.5
        nx = jnp.where(is_tri, w_nx, snx * ninv)
        ny = jnp.where(is_tri, w_ny, sny * ninv)
        nz = jnp.where(is_tri, w_nz, snz * ninv)
        dn = dx * nx + dy * ny + dz * nz
        into = dn < 0
        sgn = jnp.where(into, 1.0, -1.0)
        nlx, nly, nlz = nx * sgn, ny * sgn, nz * sgn

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

        ndx = jnp.where(w_diff, ddfx, jnp.where(w_refr, drx, dsx))
        ndy = jnp.where(w_diff, ddfy, jnp.where(w_refr, dry, dsy))
        ndz = jnp.where(w_diff, ddfz, jnp.where(w_refr, drz, dsz))
        scl = jnp.where(w_refr, rscale, 1.0)
        tr = jnp.where(live, tr * w_ar * scl, tr)
        tg = jnp.where(live, tg * w_ag * scl, tg)
        tb = jnp.where(live, tb * w_ab * scl, tb)

        if with_rr:
            pmax = jnp.clip(jnp.maximum(jnp.maximum(tr, tg), tb), 0.1, 0.95)
            survive = u[2] < pmax
            pinv = 1.0 / pmax
            tr = jnp.where(survive, tr * pinv, tr)
            tg = jnp.where(survive, tg * pinv, tg)
            tb = jnp.where(survive, tb * pinv, tb)
            alive = live & survive
            scl_res = scl * jnp.where(survive, pinv, f32(1.0))
        else:
            alive = live
            scl_res = scl

        if with_residuals:
            # replay residuals (see diff/mesh_fused.py): winner code
            # (sphere index | S + slot | -1 when not live), winner
            # albedo/emission values, and the detached scalar multiplier
            # (glass rscale x RR weight).  Values, not ids, for the
            # attributes: the backward cannot gather per-lane from the
            # slot tables.  The slot id rides in w_trif as slot+1.
            widf = jnp.where(
                live,
                jnp.where(
                    is_tri, f32(n_spheres) + (w_trif - 1.0), w_sif
                ),
                f32(-1.0),
            )
            wid_ref[bi, 0] = widf
            for j6, v in enumerate(
                (w_ar, w_ag, w_ab, w_er, w_eg, w_eb, scl_res)
            ):
                resv_ref[bi, j6, 0] = v

        # scale-aware offset (shade.scaled_origin_offset rationale): the
        # f32 wall-sphere hit error is ~r * 1e-6, a fixed eps leaks
        # paths; triangle winners (scene-scale geometry) keep the eps
        # floor via w_r2 = 0
        r2_eff = jnp.where(is_tri, f32(0.0), w_r2)
        off = jnp.where(
            w_refr, 0.0,
            jnp.maximum(f32(eps), f32(REL_OFFSET) * jnp.sqrt(r2_eff)),
        )
        ox = jnp.where(live, hx + nlx * off, ox)
        oy = jnp.where(live, hy + nly * off, oy)
        oz = jnp.where(live, hz + nlz * off, oz)
        dx = jnp.where(live, ndx, dx)
        dy = jnp.where(live, ndy, dy)
        dz = jnp.where(live, ndz, dz)
        alive_f = jnp.where(alive, f32(1.0), f32(0.0))
        if debug:
            # per-bounce alive-lane count: THE RR/load diagnostic
            from ascendpathtracing_tpu.utils.debug import kernel_dump

            kernel_dump("mesh_pt alive", jnp.sum(alive_f),
                        gate=(b == 0) & (a == 0))
        return (ox, oy, oz, dx, dy, dz, tr, tg, tb, lr, lg, lb, alive_f)

    state = (ox, oy, oz, dx, dy, dz, tr, tg, tb, lr, lg, lb, alive_f)
    n_pre = min(rr_depth, bounces)
    n_rr = bounces - n_pre
    u_scratch[:, :, :] = uniforms(3 * bounces)
    if with_residuals:
        # Python-unrolled bounce loop: residual stores get STATIC bounce
        # indices (a dynamic leading index on the VMEM residual block
        # lowers to a masked slow path — measured +25% whole-kernel cost)
        for i in range(bounces):
            state = bounce(
                state, i >= n_pre, u_scratch[pl.ds(3 * i, 3)], i
            )
    else:
        if n_pre:
            state = jax.lax.fori_loop(
                0, n_pre,
                lambda i, st: bounce(st, False, u_scratch[pl.ds(3 * i, 3)],
                                     i),
                state,
            )
        if n_rr:
            state = jax.lax.fori_loop(
                0, n_rr,
                lambda i, st: bounce(
                    st, True, u_scratch[pl.ds(3 * (n_pre + i), 3)],
                    n_pre + i,
                ),
                state,
            )
    lr, lg, lb = state[9], state[10], state[11]

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
        "width", "height", "spp4", "materials", "tris_per_chunk",
        "supers_per", "supers2_per", "bounces", "rr_depth", "eps", "tile",
        "residency", "interpret", "debug", "with_residuals", "with_camera",
        "with_stats",
    ),
)
def render_pt_mesh_pallas(
    scene_planes,  # [10, S] f32 sphere planes
    cboxes,  # [C, 6] f32
    sboxes,  # [Cs, 6] f32 (Cs == 0: single level)
    tris24,  # [C*T, TRI_PT_F] f32 (attr_triangle_rows layout)
    ssboxes=None,  # [Css, 6] f32 (third level; None/empty disables)
    *,
    width: int,
    height: int,
    spp4: int,
    materials: tuple,
    tris_per_chunk: int = 32,
    supers_per: int = 0,
    supers2_per: int = 0,
    bounces: int = 8,
    rr_depth: int = 5,
    eps: float = 1e-4,
    tile: int = 2048,
    seed=0,
    cam=None,  # [11] f32 camera vector (diff/camera_fused.cam_vector);
               # None = the default smallpt camera.  TRACED input: camera
               # steps re-render without recompiling.
    residency: str = "auto",  # auto | smem | vmem | hbm
    interpret: bool = False,
    debug: bool = False,  # per-bounce worklist + alive dumps (cell 0)
    with_residuals: bool = False,
    with_camera: bool = False,  # also emit per-sample (su, sv) coords
    with_stats: bool = False,  # also emit per-(cell, bounce) worklist k
):
    """Fully-fused sphere+mesh path trace: per-pixel mean output [3, W*H].

    Same grid/accumulation scheme as render_pt_pallas; mesh tables ride
    in SMEM when they fit (scalar loads are native), then field-minor
    VMEM, then HBM with per-chunk double-buffered DMA of each bounce's
    compacted worklist (``residency="auto"`` picks; the thresholds and
    the packing match ops/pallas_wbvh.py).

    ``with_residuals=True`` additionally returns the per-bounce replay
    residuals for the custom-VJP backward (diff/mesh_fused.py):
    ``wid [bounces, nb*spp4, 8, tile//8]`` f32 winner codes (sphere
    index, S + slot for triangles, -1 when the lane took no bounce) and
    ``resv [bounces, 7, nb*spp4, 8, tile//8]`` f32 winner
    albedo/emission values + the detached scalar multiplier — 32
    bytes/bounce/sample of HBM, the index-replay discipline of the
    sphere kernel extended with attribute VALUES (a per-lane gather from
    the slot tables is not lowerable in the backward).
    """
    from ascendpathtracing_tpu.camera import Camera

    n_pix = width * height
    if tile % 1024:
        raise ValueError(f"{tile=} must be a multiple of 1024")
    if n_pix % tile:
        raise ValueError(f"pixel count {n_pix} not divisible by {tile=}")
    nb = n_pix // tile
    grid = (nb, spp4)
    c = cboxes.shape[0]
    cs = sboxes.shape[0]
    if ssboxes is None:
        ssboxes = jnp.zeros((0, 6), jnp.float32)
    css = ssboxes.shape[0]
    ct = tris24.shape[0]
    if cs and cs * supers_per != c:
        raise ValueError("sboxes/supers_per inconsistent with chunk count")
    if css and (not cs or css * supers2_per != cs):
        raise ValueError("ssboxes/supers2_per inconsistent with super count")
    # scan_group's 128-lane iota silently skips boxes 128+ of a group —
    # reject oversized groups from externally built tables (ADVICE r4
    # low #1, mirroring build_chunk_grid's guards)
    if cs and supers_per > 128:
        raise ValueError("supers_per must be <= 128 (one flags register block)")
    if css and supers2_per > 128:
        raise ValueError("supers2_per must be <= 128 (one flags register block)")
    if tris24.shape[1] != TRI_PT_F:
        raise ValueError(f"tris24 must be [C*T, {TRI_PT_F}] attr rows")

    if cam is None:
        pos, d0, cx, cy = Camera().basis(width, height)
        cam = jnp.asarray(
            [pos[0], pos[1], pos[2], d0[0], d0[1], d0[2],
             cx[0], cy[0], cy[1], cy[2], Camera().origin_push],
            jnp.float32,
        )
    else:
        cam = jnp.asarray(cam, jnp.float32)
        if cam.shape != (11,):
            raise ValueError("cam must be an 11-float camera vector")
    if with_camera and not with_residuals:
        raise ValueError("with_camera requires with_residuals (the "
                         "camera backward replays from wid[0])")

    box_bytes = (c + cs + css) * 6 * 4
    tri_bytes = ct * TRI_PT_F * 4
    if residency == "auto":
        # smem when the tables fit, else the hbm SMEM-landing DMA ring.
        # vmem residency is DOMINATED since the r5 ring change: phase B
        # reads tris as scalar loads, and dynamic-index scalar loads
        # from VMEM lower to a slow path — s4 measured smem 1322 /
        # vmem 2366 / hbm-ring 1406 ms on identical work (roofline r5).
        # "vmem" stays selectable for tests.
        if box_bytes + tri_bytes <= 512 * 1024:
            residency = "smem"
        elif tris_per_chunk * TRI_PT_F <= 1024:
            residency = "hbm"
        else:  # wide chunk rows cannot ride the one-tile-per-chunk DMA
            residency = "vmem"
    boxes_flat = box_bytes <= 512 * 1024

    kernel = functools.partial(
        _mesh_pt_kernel,
        width=width, height=height, spp4=spp4, tile=tile,
        materials=tuple(materials), bounces=bounces, rr_depth=rr_depth,
        eps=eps, n_chunks=c, n_supers=cs,
        supers_per=supers_per, tris_per_chunk=tris_per_chunk,
        n_supers2=css, supers2_per=supers2_per,
        tris_mode=residency, boxes_flat=boxes_flat, use_rng=not interpret,
        debug=debug, with_residuals=with_residuals,
        with_camera=with_camera, with_stats=with_stats,
    )
    s = scene_planes.shape[1]

    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    inputs = [seed_arr, cam, scene_planes]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((10, s), lambda b, a: (0, 0), memory_space=pltpu.VMEM),
    ]
    if boxes_flat:
        inputs.append(cboxes.reshape(c * 6))
        in_specs.append(
            pl.BlockSpec((c * 6,), lambda b, a: (0,), memory_space=pltpu.SMEM)
        )
        if cs:
            inputs.append(sboxes.reshape(cs * 6))
            in_specs.append(
                pl.BlockSpec((cs * 6,), lambda b, a: (0,),
                             memory_space=pltpu.SMEM)
            )
        if css:
            inputs.append(ssboxes.reshape(css * 6))
            in_specs.append(
                pl.BlockSpec((css * 6,), lambda b, a: (0,),
                             memory_space=pltpu.SMEM)
            )
    else:
        inputs.append(cboxes)
        in_specs.append(
            pl.BlockSpec((c, 6), lambda b, a: (0, 0), memory_space=pltpu.VMEM)
        )
        if cs:
            inputs.append(sboxes)
            in_specs.append(
                pl.BlockSpec((cs, 6), lambda b, a: (0, 0),
                             memory_space=pltpu.VMEM)
            )
        if css:
            inputs.append(ssboxes)
            in_specs.append(
                pl.BlockSpec((css, 6), lambda b, a: (0, 0),
                             memory_space=pltpu.VMEM)
            )
    if residency == "smem":
        inputs.append(tris24.reshape(ct * TRI_PT_F))
        in_specs.append(
            pl.BlockSpec((ct * TRI_PT_F,), lambda b, a: (0,),
                         memory_space=pltpu.SMEM)
        )
    elif residency == "vmem":
        inputs.append(tris24)
        in_specs.append(
            pl.BlockSpec((ct, TRI_PT_F), lambda b, a: (0, 0),
                         memory_space=pltpu.VMEM)
        )
    else:
        # one chunk per (8, 128) tile (see streamed_chunk_loop docstring)
        row = tris_per_chunk * TRI_PT_F
        if row > 1024:
            raise ValueError(
                f"hbm residency needs tris_per_chunk*{TRI_PT_F} <= 1024, "
                f"got {row}"
            )
        tris_rows = tris24.reshape(c, row)
        if row != 1024:
            tris_rows = jnp.pad(tris_rows, ((0, 0), (0, 1024 - row)))
        inputs.append(tris_rows.reshape(c, 8, 128))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))

    top = css if css else (cs if cs else c)
    flags_lanes = -(-max(top, 128) // 128) * 128
    scratch = [
        pltpu.VMEM((3 * bounces, 8, tile // 8), jnp.float32),
        pltpu.VMEM((8, flags_lanes), jnp.float32),
        pltpu.SMEM((c,), jnp.int32),
    ]
    if cs:
        scratch.append(pltpu.SMEM((cs,), jnp.int32))
    if css:
        scratch.append(pltpu.SMEM((css,), jnp.int32))
    if residency == "hbm":
        # SMEM landing ring (see pallas_wbvh.streamed_chunk_loop): the
        # dynamic-index VMEM scratch reads were the hbm path's 1.8x tax
        scratch.append(
            pltpu.SMEM((wbvh.DMA_DEPTH, 8, 128), jnp.float32))
        scratch.append(pltpu.SemaphoreType.DMA((wbvh.DMA_DEPTH,)))

    total = n_pix * spp4
    lanes = tile // 8
    out_specs = [
        pl.BlockSpec(
            (3, 1, 8, lanes), lambda b, a: (0, b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    out_shapes = [jax.ShapeDtypeStruct((3, nb, 8, lanes), jnp.float32)]
    if with_residuals:
        cells = nb * spp4
        out_specs.append(
            pl.BlockSpec(
                (bounces, 1, 8, lanes),
                lambda b, a: (0, b * spp4 + a, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shapes.append(
            jax.ShapeDtypeStruct((bounces, cells, 8, lanes), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec(
                (bounces, 7, 1, 8, lanes),
                lambda b, a: (0, 0, b * spp4 + a, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shapes.append(
            jax.ShapeDtypeStruct((bounces, 7, cells, 8, lanes), jnp.float32)
        )
    if with_camera:
        out_specs.append(
            pl.BlockSpec(
                (2, 1, 8, lanes), lambda b, a: (0, b * spp4 + a, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shapes.append(
            jax.ShapeDtypeStruct((2, cells, 8, lanes), jnp.float32)
        )
    if with_stats:
        all_cells = nb * spp4
        out_specs.append(
            pl.BlockSpec((3 * bounces, all_cells), lambda b, a: (0, 0),
                         memory_space=pltpu.SMEM)
        )
        out_shapes.append(
            jax.ShapeDtypeStruct((3 * bounces, all_cells), jnp.int32)
        )
    many_outs = with_residuals or with_stats
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs) if many_outs else out_specs[0],
        out_shape=tuple(out_shapes) if many_outs else out_shapes[0],
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=total * bounces * (len(materials) * 14 + c * 25 + 120),
            bytes_accessed=(3 * n_pix + (total * bounces * 8 if
                                         with_residuals else 0)) * 4,
            transcendentals=total * bounces * (len(materials) + 8),
        ),
        interpret=interpret,
    )(*inputs)
    if not many_outs:
        return outs.reshape(3, n_pix)
    outs = list(outs)
    res = [outs.pop(0).reshape(3, n_pix)]
    if with_residuals:
        res += [outs.pop(0), outs.pop(0)]  # wid, resv
    if with_camera:
        res.append(outs.pop(0))  # suv
    if with_stats:
        res.append(outs.pop(0))  # kstats [3*bounces, cells] i32
    return tuple(res)
