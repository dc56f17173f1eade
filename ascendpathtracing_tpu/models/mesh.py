"""Triangle-mesh scenes and the combined sphere+mesh path tracer
(BASELINE config 3: "Triangle-mesh scene with flattened BVH, stackless
traversal kernel").

A MeshScene is the reference's sphere world (walls/light stay the smallpt
spheres) plus a triangle mesh with per-face attributes, intersected
through the flattened BVH (accel/bvh.py) or brute force (for small F or
as the correctness oracle).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ascendpathtracing_tpu.accel import bvh as bvh_mod
from ascendpathtracing_tpu.accel import tri as tri_mod
from ascendpathtracing_tpu.ops import pallas_bvh as pallas_bvh_mod
from ascendpathtracing_tpu.ops import pallas_wbvh as wbvh_mod
from ascendpathtracing_tpu.ops import sort as sort_mod
from ascendpathtracing_tpu.models import megakernel
from ascendpathtracing_tpu.models.megakernel import select_by_id
from ascendpathtracing_tpu.ops import shade
from ascendpathtracing_tpu.ops.intersect import MISS_T
from ascendpathtracing_tpu.scenes import DIFF, REFR, SphereScene, get_scene


class StaticConf(NamedTuple):
    """Hashable non-traced traversal config carried in the device dict
    (stripped before jit and passed as a static argument)."""

    traversal: str  # chunks | lockstep | jnp | brute
    max_leaf: int
    tris_per_chunk: int
    supers_per: int
    # diff=True: differentiable mode — hit distance recomputed in jnp
    # from the winner's plane equation and attributes gathered from the
    # (traced) slot planes, so AD reaches vertices/attributes.
    # diff=False: fast mode — the kernel itself emits the winner's
    # shading attributes via in-kernel carriers (1-D gathers of 4M
    # indices cost ~35 ms EACH on v5e; carriers make the whole render
    # gather-free).
    diff: bool = False
    supers2_per: int = 0  # third phase-A level (>=1M-tri scenes)


@dataclasses.dataclass
class MeshScene:
    """Spheres (enclosure + light) + one triangle soup with per-face
    attributes."""

    spheres: SphereScene
    vertices: np.ndarray  # [V, 3]
    faces: np.ndarray  # [F, 3]
    face_albedo: np.ndarray  # [F, 3]
    face_emission: np.ndarray  # [F, 3]
    face_material: np.ndarray  # [F] int32

    @staticmethod
    def cornell_with_mesh(
        vertices, faces, albedo=(0.75, 0.75, 0.75), emission=(0, 0, 0),
        material=DIFF, base_scene: str = "smallpt9",
    ) -> "MeshScene":
        f = np.asarray(faces).shape[0]
        return MeshScene(
            spheres=get_scene(base_scene),
            vertices=np.asarray(vertices, np.float64),
            faces=np.asarray(faces, np.int64),
            face_albedo=np.tile(np.asarray(albedo, np.float64), (f, 1)),
            face_emission=np.tile(np.asarray(emission, np.float64), (f, 1)),
            face_material=np.full((f,), material, np.int32),
        )


def mesh_scene_to_device(
    ms: MeshScene, dtype=jnp.float32, use_bvh=True, max_leaf=None,
    pallas_bvh_kernel=False, pallas_kernel: str = "chunks",
    tris_per_chunk: int = 16, diff: bool = False,
):
    """MeshScene -> device pytree + static traversal config.

    ``pallas_bvh_kernel=True`` selects a Pallas traversal kernel
    (forward-only hit queries; TPU or interpret mode):

    - ``pallas_kernel="chunks"`` (default): the wide-node chunk-grid
      kernel (ops/pallas_wbvh.py) — 2-4x the lockstep kernel, scales to
      HBM-streamed 100k+ tri scenes.  Triangles and face attributes are
      laid out in SLOT order (chunk-major, padded) so the kernel's hit
      slot indexes them directly with no extra indirection.
    - ``pallas_kernel="lockstep"``: the skip-cursor binary-BVH kernel
      (ops/pallas_bvh.py), kept for comparison; leaf-ordered layout.

    Otherwise hits come from the jnp while_loop BVH traversal
    (``use_bvh=True``; gather-bound, fine on CPU/f64 oracles) or brute
    force (``use_bvh=False``).  The static (non-traced) config rides in
    dev["static"]; wrappers strip it before jit.
    """
    np_dtype = np.float64 if dtype == jnp.float64 else np.float32
    sph = megakernel.scene_to_device(ms.spheres, dtype)
    v = np.asarray(ms.vertices, np_dtype)
    f = np.asarray(ms.faces)

    if pallas_bvh_kernel and pallas_kernel == "chunks":
        # T=16 + 16-chunk superchunk gating measured fastest on sorted
        # divergent rays (r3 sweep: 93 vs 74-89 Mrays/s for the other
        # (T, supers) corners at 5k tris); supers kick in once phase A's
        # single-level slab unroll stops being trivial
        n_ch_est = -(-f.shape[0] // tris_per_chunk)
        supers_per = 16 if n_ch_est >= 128 else 0
        # third level once the super count reaches 256 (same rule as
        # pallas_mesh_pt.mesh_pt_tables — carries phase A past ~1M tris)
        n_s_est = -(-n_ch_est // supers_per) if supers_per else 0
        supers2_per = 16 if n_s_est >= 256 else 0
        grid = wbvh_mod.build_chunk_grid(
            v, f, tris_per_chunk=tris_per_chunk, supers_per=supers_per,
            supers2_per=supers2_per,
        )
        cb, sb, _t13, _fos = wbvh_mod.chunk_grid_to_device(grid)
        ssb = (jnp.asarray(grid.ssboxes) if grid.n_supers2
               else jnp.zeros((0, 6), jnp.float32))
        t24 = jnp.asarray(wbvh_mod.attr_triangle_rows(
            grid, ms.face_albedo, ms.face_emission, ms.face_material,
            diff_code=DIFF, refr_code=REFR,
        ))
        live = grid.cboxes[:, 0] <= grid.cboxes[:, 3]
        lo = jnp.asarray(grid.cboxes[live, 0:3].min(0))
        hi = jnp.asarray(grid.cboxes[live, 3:6].max(0))
        # slot-ordered geometry + attributes (pads: zeros / material 0)
        perm = lambda a, pad=0: wbvh_mod.permute_face_attrib(grid, a, pad)
        tri = v[f]
        v0n = perm(tri[:, 0])
        e1n = perm(tri[:, 1] - tri[:, 0])
        e2n = perm(tri[:, 2] - tri[:, 0])
        fn = np.cross(e1n, e2n)
        fn /= np.maximum(np.linalg.norm(fn, axis=1, keepdims=True), 1e-30)
        alb = perm(np.asarray(ms.face_albedo, np_dtype))
        emi = perm(np.asarray(ms.face_emission, np_dtype))
        mat = perm(np.asarray(ms.face_material, np.int32))
        return {
            "spheres": sph,
            "v0": tuple(jnp.asarray(v0n[:, i], dtype) for i in range(3)),
            "e1": tuple(jnp.asarray(e1n[:, i], dtype) for i in range(3)),
            "e2": tuple(jnp.asarray(e2n[:, i], dtype) for i in range(3)),
            "fnormal": tuple(jnp.asarray(fn[:, i], dtype) for i in range(3)),
            "f_albedo": tuple(jnp.asarray(alb[:, i], dtype) for i in range(3)),
            "f_emission": tuple(jnp.asarray(emi[:, i], dtype) for i in range(3)),
            "f_material": jnp.asarray(mat, jnp.int32),
            "bvh": None,
            "pallas_bvh": None,
            "wbvh": (cb, sb, t24, ssb),
            "wbvh_bounds": (lo, hi),
            "face_of_slot": jnp.asarray(grid.face_of_slot),
            "static": StaticConf("chunks", 0, grid.tris_per_chunk,
                                 grid.supers_per, diff,
                                 grid.supers2_per),
            "max_leaf": 0,  # back-compat key, stripped before jit
        }

    if max_leaf is None:
        # The lockstep Pallas kernel is fastest with fat leaves (shallow
        # tree, fewer per-node scalar steps); the unrolled jnp traversal
        # wants small ones.
        max_leaf = 64 if pallas_bvh_kernel else 4
    if use_bvh:
        bvh = bvh_mod.build_bvh(v, f, max_leaf=max_leaf)
        order = bvh.tri_order
        bvh_dev = bvh_mod.bvh_to_device(bvh, dtype)
    else:
        bvh = None
        order = np.arange(f.shape[0])
        bvh_dev = None
    planes = tri_mod.triangle_planes(v, f, dtype=np_dtype)
    v0, e1, e2 = (tuple(jnp.asarray(p[order]) for p in t) for t in planes)
    # geometric face normals (normalize(e1 x e2)), in leaf order
    e1n = np.stack([np.asarray(c) for c in e1], 1)
    e2n = np.stack([np.asarray(c) for c in e2], 1)
    fn = np.cross(e1n, e2n)
    fn /= np.maximum(np.linalg.norm(fn, axis=1, keepdims=True), 1e-30)
    traversal = "lockstep" if (use_bvh and pallas_bvh_kernel) else (
        "jnp" if use_bvh else "brute")
    del diff  # non-chunks paths are differentiable as-is
    return {
        "spheres": sph,
        "v0": v0,
        "e1": e1,
        "e2": e2,
        "fnormal": tuple(jnp.asarray(fn[:, i], dtype) for i in range(3)),
        "f_albedo": tuple(jnp.asarray(ms.face_albedo[order][:, i], dtype) for i in range(3)),
        "f_emission": tuple(jnp.asarray(ms.face_emission[order][:, i], dtype) for i in range(3)),
        "f_material": jnp.asarray(ms.face_material[order], jnp.int32),
        "bvh": bvh_dev,
        "pallas_bvh": (
            pallas_bvh_mod.pack_bvh_for_pallas(
                bvh,
                tuple(tuple(np.asarray(p[order], np.float32) for p in t) for t in planes),
            )
            if (use_bvh and pallas_bvh_kernel)
            else None
        ),
        "static": StaticConf(traversal, max_leaf if use_bvh else 0, 0, 0,
                             traversal in ("jnp", "brute")),
        "max_leaf": max_leaf if use_bvh else 0,
    }


# Ray-sorting pays past ~128k rays on v5e: the fused key/value sorts cost
# a fixed ~10 ms while the traversal saving scales with n (1.9x at 1M
# incoherent rays). Below this, tiles are few and the sort dominates.
_SORT_MIN_N = 131072


def _split_static(dev):
    static = dev["static"]
    return {k: v for k, v in dev.items() if k not in ("static", "max_leaf")}, static


def _mesh_hit(o3, d3, dev, eps, static: StaticConf, sort=True):
    """Nearest triangle hit via the chunked Pallas kernel, the lockstep
    Pallas kernel, the jnp while_loop traversal, or brute force.

    Returns (tmin, hit, miss, attrs) where attrs is None except in
    chunks fast mode (static.diff False): an 11-tuple of winner planes
    (nx ny nz ar ag ab er eg eb is_diff is_refr) carried out of the
    kernel so the renderer never gathers.

    sort=True reorders rays by the 6-D direction+origin Morton key
    (ops/sort.py) before a Pallas kernel and scatters results back —
    per-ray results are exactly unchanged (traversal is per-lane exact),
    but tiles become coherent, which the O(union-of-visited-work) kernels
    convert into measured 2-4x throughput on bounced rays."""
    interpret = jax.devices()[0].platform != "tpu"
    if static.traversal in ("chunks", "lockstep"):
        n = o3[0].shape[0]
        o3_orig, d3_orig = o3, d3  # caller order, for the recompute below
        with_attrs = static.traversal == "chunks" and not static.diff
        ridx = None
        if sort and n >= _SORT_MIN_N:
            if static.traversal == "chunks":
                lo, hi = dev["wbvh_bounds"]
            else:
                lo = dev["pallas_bvh"][0][0, 0:3]
                hi = dev["pallas_bvh"][0][0, 3:6]
            keys = sort_mod.ray_sort_keys_6d(o3, d3, lo, hi)
            # multi-operand sort carries the ray planes + original index
            # along with the key — 1-D gathers/scatters are serialized on
            # TPU (measured 16 ms for 65k rays vs ~2 ms for fused sort)
            ridx = jnp.arange(n, dtype=jnp.int32)
            _, ox_, oy_, oz_, dx_, dy_, dz_, ridx = jax.lax.sort(
                (keys, *o3, *d3, ridx), num_keys=1
            )
            o3 = (ox_, oy_, oz_)
            d3 = (dx_, dy_, dz_)
        tile = 2048 if n >= 2048 else 1024
        n_pad = -(-n // tile) * tile
        # the kernel only produces DETACHED decisions (pallas_call has no
        # AD rule); bounce-updated ray positions carry tangents from the
        # differentiable recompute below, so stop them at the kernel edge
        rp = jax.lax.stop_gradient(jnp.stack([*o3, *d3], axis=0))
        if n_pad != n:
            rp = jnp.pad(rp, ((0, 0), (0, n_pad - n)))
        attrs = None
        if static.traversal == "chunks":
            cb, sb, t24, ssb = dev["wbvh"]
            out = wbvh_mod.intersect_chunks_pallas(
                rp.astype(jnp.float32), cb, sb, t24, ssb,
                tris_per_chunk=static.tris_per_chunk,
                supers_per=static.supers_per,
                supers2_per=static.supers2_per, eps=eps, tile=tile,
                attrs=with_attrs, interpret=interpret,
            )
            if with_attrs:
                tmin, hit, attrs = out
            else:
                tmin, hit = out
        else:
            nodesf, nodesi, tris9 = dev["pallas_bvh"]
            tmin, hit = pallas_bvh_mod.intersect_bvh_pallas(
                rp.astype(jnp.float32), nodesf, nodesi, tris9,
                max_leaf=static.max_leaf, eps=eps, tile=tile, jump_every=8,
                interpret=interpret,
            )
        tmin = tmin[:n].astype(o3[0].dtype)
        hit = hit[:n]
        if attrs is not None:
            attrs = tuple(a[:n].astype(o3[0].dtype) for a in attrs)
        if ridx is not None:
            # restore caller order with a second fused sort (by ridx)
            if attrs is not None:
                out = jax.lax.sort((ridx, tmin, hit, *attrs), num_keys=1)
                tmin, hit, attrs = out[1], out[2], out[3:]
            else:
                _, tmin, hit = jax.lax.sort((ridx, tmin, hit), num_keys=1)
        miss = tmin >= jnp.asarray(MISS_T, tmin.dtype)
        if static.traversal == "chunks" and static.diff:
            # Detach-discrete, differentiate-continuous (SURVEY §7 phase
            # 4 applied to meshes): the kernel's WINNER INDEX is the
            # discrete decision (stopped); the reported t is recomputed
            # from the winner's plane equation in jnp — the same formula
            # the kernel uses, so forward values agree to rounding, while
            # gradients flow to the slot v0/e1/e2 planes (and through
            # them to traced vertices, diff/mesh.py).  Gather-based, so
            # reserved for the differentiable path (gathers cost ~35 ms
            # per 4M rays on v5e).
            idx = jax.lax.stop_gradient(hit)
            smiss = jax.lax.stop_gradient(miss)
            v0g = tuple(p[idx] for p in dev["v0"])
            e1g = tuple(p[idx] for p in dev["e1"])
            e2g = tuple(p[idx] for p in dev["e2"])
            nx = e1g[1] * e2g[2] - e1g[2] * e2g[1]
            ny = e1g[2] * e2g[0] - e1g[0] * e2g[2]
            nz = e1g[0] * e2g[1] - e1g[1] * e2g[0]
            d0 = nx * v0g[0] + ny * v0g[1] + nz * v0g[2]
            no = nx * o3_orig[0] + ny * o3_orig[1] + nz * o3_orig[2]
            nd = nx * d3_orig[0] + ny * d3_orig[1] + nz * d3_orig[2]
            # double-where: missed lanes carry garbage slots whose nd can
            # be 0 — guard the denominator so no nan reaches the grad
            nd = jnp.where(smiss, jnp.ones_like(nd), nd)
            t_re = (d0 - no) / nd
            tmin = jnp.where(smiss, jnp.asarray(MISS_T, tmin.dtype), t_re)
        return tmin, hit, miss, attrs
    if static.traversal == "jnp":
        tmin, hit, miss = bvh_mod.intersect_bvh(
            o3, d3, dev["bvh"], (dev["v0"], dev["e1"], dev["e2"]), eps,
            static.max_leaf,
        )
        return tmin, hit, miss, None
    ts = tri_mod.intersect_triangles_brute(
        o3, d3, dev["v0"], dev["e1"], dev["e2"], eps
    )
    tmin = jnp.min(ts, axis=0)
    hit = jnp.argmin(ts, axis=0).astype(jnp.int32)
    return tmin, hit, tmin >= jnp.asarray(MISS_T, tmin.dtype), None


def first_hit_mesh_impl(rays, dev, *, eps=1e-4, static=StaticConf("brute", 0, 0, 0)):
    """Debug/oracle render: first-hit t and kind (0=miss, 1=sphere,
    2=triangle). Used to validate BVH-in-renderer against brute force."""
    o3, d3 = megakernel.rays_to_soa(rays)
    st, sh, sm = megakernel.default_hit_fn(o3, d3, dev["spheres"], eps)
    tt, th, tm, _ = _mesh_hit(o3, d3, dev, eps, static, sort=False)
    tri_closer = tt < st
    kind = jnp.where(
        tri_closer, jnp.where(tm, 0, 2), jnp.where(sm, 0, 1)
    )
    tmin = jnp.minimum(st, tt)
    return tmin, kind, jnp.where(tri_closer, th, sh)


# re-exported for callers that found it here first; the shared
# implementation lives beside the sphere estimator
indexed_uniforms = megakernel.indexed_uniforms


def render_pt_mesh_impl(
    key, rays, dev, *, bounces: int = 8, rr_depth: int = 5, eps: float = 1e-4,
    static: StaticConf = StaticConf("brute", 0, 0, 0), uniforms=None,
    sort_per_bounce: bool = False, global_idx=None,
):
    """smallpt estimator over spheres + mesh. Same structure as
    megakernel.render_pt_impl with a two-way nearest-hit combine.

    ``uniforms`` ([bounces, 3, N], optional) replaces the in-loop
    ``jax.random`` draws with a caller-supplied stream — what makes the
    DP-sharded render (parallel/sharded.py) BIT-EQUAL to this one: the
    stream is drawn once at global size and sharded with the rays, so
    shard boundaries cannot perturb the samples.

    ``global_idx`` ([N] i32, optional) switches to the INDEXED
    counter-based stream (:func:`indexed_uniforms`) — the production
    bitwise-sharding mode: no materialized stream, each shard passes its
    global ray indices."""
    o3, d3 = megakernel.rays_to_soa(rays)
    n = o3[0].shape[0]
    dtype = o3[0].dtype
    sph = dev["spheres"]

    cx = sph["center"][:, 0]
    cy = sph["center"][:, 1]
    cz = sph["center"][:, 2]
    sax, say, saz = (sph["albedo"][:, i] for i in range(3))
    sex, sey, sez = (sph["emission"][:, i] for i in range(3))
    smat = sph["material"]

    zeros = jnp.zeros((n,), dtype)
    ones = jnp.ones((n,), dtype)
    rad = (zeros, zeros, zeros)
    tput = (ones, ones, ones)
    alive = jnp.ones((n,), bool)

    def gather_f(planes, idx):
        return tuple(p[idx] for p in planes)

    def body(depth, state):
        key, o3, d3, rad, tput, alive = state
        if global_idx is not None:
            u = indexed_uniforms(key, depth, global_idx, dtype)
        elif uniforms is None:
            key, k1 = jax.random.split(key)
            u = jax.random.uniform(k1, (3, n), dtype=dtype)
        else:
            u = uniforms[depth].astype(dtype)

        st, shit, smiss = megakernel.default_hit_fn(o3, d3, sph, eps)
        # sort_per_bounce trades one fused multi-operand sort per bounce
        # for coherent traversal tiles.  On DIVERGENT bounced rays the
        # traversal dominates (r3 measured ~100 ms per 4M-ray bounce at
        # 5k tris, not the ~10 ms an earlier coherent-ray measurement
        # suggested), so sorting can pay — benchmark per workload
        # (bench.py --renderer xla-mesh)
        tt, thit, tmiss, tattrs = _mesh_hit(
            o3, d3, dev, eps, static, sort=sort_per_bounce
        )
        use_tri = tt < st
        tmin = jnp.where(use_tri, tt, st)
        miss = smiss & tmiss
        live = alive & ~miss
        shit = jnp.where(smiss, 0, shit)

        hp = (o3[0] + d3[0] * tmin, o3[1] + d3[1] * tmin, o3[2] + d3[2] * tmin)
        # sphere normal
        s_chit = (select_by_id(shit, cx), select_by_id(shit, cy), select_by_id(shit, cz))
        s_nrm = shade.v3_normalize(shade.v3_sub(hp, s_chit))
        if tattrs is not None:
            # fast mode: the traversal kernel carried the winner's
            # shading attributes out — no gathers anywhere
            t_nrm = tattrs[0:3]
            t_alb = tattrs[3:6]
            t_emi = tattrs[6:9]
            t_is_diff = tattrs[9] > 0.5
            t_is_refr = tattrs[10] > 0.5
        else:
            # differentiable mode: gather from the (traced) slot planes
            t_nrm = gather_f(dev["fnormal"], thit)
            t_alb = gather_f(dev["f_albedo"], thit)
            t_emi = gather_f(dev["f_emission"], thit)
            t_is_diff = dev["f_material"][thit] == DIFF
            t_is_refr = dev["f_material"][thit] == REFR
        nrm = shade.v3_where(use_tri, t_nrm, s_nrm)
        dn = shade.v3_dot(d3, nrm)
        into = dn < 0
        nl = shade.v3_scale(nrm, jnp.where(into, 1.0, -1.0))

        emit_s = (select_by_id(shit, sex), select_by_id(shit, sey), select_by_id(shit, sez))
        emit = shade.v3_where(use_tri, t_emi, emit_s)
        rad = shade.v3_where(
            live,
            shade.v3_add(rad, (tput[0] * emit[0], tput[1] * emit[1], tput[2] * emit[2])),
            rad,
        )

        alb_s = (select_by_id(shit, sax), select_by_id(shit, say), select_by_id(shit, saz))
        alb = shade.v3_where(use_tri, t_alb, alb_s)
        s_mat = select_by_id(shit, smat)
        is_diff = jnp.where(use_tri, t_is_diff, s_mat == DIFF)
        is_refr = jnp.where(use_tri, t_is_refr, s_mat == REFR)

        d_diff = shade.cosine_sample_hemisphere(nl, u[0], u[1])
        d_spec = shade.reflect(d3, nrm)
        d_refr, refr_scale = shade.refract_or_reflect(d3, nrm, into, u[0])

        new_d = shade.v3_where(is_diff, d_diff, shade.v3_where(is_refr, d_refr, d_spec))
        scale = jnp.where(is_refr, refr_scale, 1.0)
        tput2 = shade.v3_where(
            live,
            (tput[0] * alb[0] * scale, tput[1] * alb[1] * scale, tput[2] * alb[2] * scale),
            tput,
        )

        tput_rr, survive = shade.russian_roulette(tput2, u[2])
        do_rr = depth >= rr_depth
        tput2 = shade.v3_where(do_rr, tput_rr, tput2)
        alive2 = live & jnp.where(do_rr, survive, True)

        # scale-aware offset for sphere winners (wall spheres: f32 hit
        # error ~r * 1e-6 — see shade.scaled_origin_offset); triangle
        # winners are scene-scale, keep the eps floor via r2 = 0
        r2w = jnp.where(use_tri, 0.0, select_by_id(shit, sph["r2"]))
        off = jnp.where(is_refr, 0.0, shade.scaled_origin_offset(r2w, eps))
        new_o = shade.v3_add(hp, shade.v3_scale(nl, off))
        o3 = shade.v3_where(live, new_o, o3)
        d3 = shade.v3_where(live, new_d, d3)
        return key, o3, d3, rad, tput2, alive2

    body_ckpt = jax.checkpoint(lambda depth, st: body(depth, st))
    state = (key, o3, d3, rad, tput, alive)
    state = jax.lax.fori_loop(0, bounces, body_ckpt, state, unroll=True)
    return jnp.stack(state[3], axis=1)


_render_pt_mesh_jit = jax.jit(
    render_pt_mesh_impl,
    static_argnames=("bounces", "rr_depth", "eps", "static",
                     "sort_per_bounce"),
)
_first_hit_mesh_jit = jax.jit(
    first_hit_mesh_impl, static_argnames=("eps", "static")
)


def render_pt_mesh(key, rays, dev, **kw):
    """Jitted combined-scene path trace; strips the static traversal
    config out of the device pytree."""
    traced, static = _split_static(dev)
    return _render_pt_mesh_jit(key, rays, traced, static=static, **kw)


def first_hit_mesh(rays, dev, **kw):
    """Jitted first-hit query (see first_hit_mesh_impl)."""
    traced, static = _split_static(dev)
    return _first_hit_mesh_jit(rays, traced, static=static, **kw)
