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

import jax
import jax.numpy as jnp
import numpy as np

from ascendpathtracing_tpu.accel import bvh as bvh_mod
from ascendpathtracing_tpu.accel import tri as tri_mod
from ascendpathtracing_tpu.ops import pallas_bvh as pallas_bvh_mod
from ascendpathtracing_tpu.ops import sort as sort_mod
from ascendpathtracing_tpu.models import megakernel
from ascendpathtracing_tpu.models.megakernel import select_by_id
from ascendpathtracing_tpu.ops import shade
from ascendpathtracing_tpu.ops.intersect import MISS_T
from ascendpathtracing_tpu.scenes import DIFF, REFR, SphereScene, get_scene


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
    pallas_bvh_kernel=False,
):
    """MeshScene -> device pytree. Triangles are permuted into BVH leaf
    order so leaves index contiguously; face attributes follow.

    ``pallas_bvh_kernel=True`` additionally packs the BVH for the Pallas
    stackless traversal kernel (ops/pallas_bvh.py) and makes the
    renderers use it — forward-only (pallas_call has no autodiff), TPU or
    interpret mode. The jnp while_loop traversal is gather-bound and
    effectively unusable on real TPU hardware (measured ~1000x slower).
    """
    if max_leaf is None:
        # The lockstep Pallas kernel is fastest with fat leaves (shallow
        # tree, fewer per-node scalar steps; measured 63 Mrays/s at 64 vs
        # 32 at 4 on v5e); the unrolled jnp traversal wants small ones.
        max_leaf = 64 if pallas_bvh_kernel else 4
    np_dtype = np.float64 if dtype == jnp.float64 else np.float32
    sph = megakernel.scene_to_device(ms.spheres, dtype)
    v = np.asarray(ms.vertices, np_dtype)
    f = np.asarray(ms.faces)
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
        # static (non-traced) config; stripped before jit by the wrappers
        "max_leaf": max_leaf if use_bvh else 0,
    }


# Ray-sorting pays past ~128k rays on v5e: the fused key/value sorts cost
# a fixed ~10 ms while the traversal saving scales with n (1.9x at 1M
# incoherent rays). Below this, tiles are few and the sort dominates.
_SORT_MIN_N = 131072


def _split_static(dev):
    ml = dev["max_leaf"]
    return {k: v for k, v in dev.items() if k != "max_leaf"}, ml


def _mesh_hit(o3, d3, dev, eps, max_leaf, sort=True):
    """Nearest triangle hit via the Pallas traversal kernel, the jnp
    while_loop traversal, or brute force (in that priority).

    sort=True reorders rays by a direction-octant + origin-Morton key
    before the lockstep kernel (ops/sort.py) and scatters results back —
    per-ray results are exactly unchanged (traversal is per-lane exact),
    but tiles become coherent, which the O(union-of-visited-nodes) kernel
    converts into measured 3-4x throughput on bounced rays."""
    if dev.get("pallas_bvh") is not None:
        nodesf, nodesi, tris9 = dev["pallas_bvh"]
        n = o3[0].shape[0]
        ridx = None
        if sort and n >= _SORT_MIN_N:
            # root node bbox == scene bounds for the quantization grid
            lo = nodesf[0, 0:3]
            hi = nodesf[0, 3:6]
            keys = sort_mod.ray_sort_keys(o3, d3, lo, hi)
            # multi-operand sort carries the ray planes + original index
            # along with the key — 1-D gathers/scatters are serialized on
            # TPU (measured 16 ms for 65k rays vs ~2 ms for fused sort)
            ridx = jnp.arange(n, dtype=jnp.int32)
            _, ox_, oy_, oz_, dx_, dy_, dz_, ridx = jax.lax.sort(
                (keys, *o3, *d3, ridx), num_keys=1
            )
            o3 = (ox_, oy_, oz_)
            d3 = (dx_, dy_, dz_)
        # 4096 balances vector-op width against per-tile node-union size
        # (measured fastest on v5e with fat leaves; tiny inputs keep 1024
        # to bound pad)
        tile = 4096 if n >= 4096 else 1024
        n_pad = -(-n // tile) * tile
        rp = jnp.stack([*o3, *d3], axis=0)
        if n_pad != n:
            rp = jnp.pad(rp, ((0, 0), (0, n_pad - n)))
        tmin, hit = pallas_bvh_mod.intersect_bvh_pallas(
            rp.astype(jnp.float32), nodesf, nodesi, tris9,
            max_leaf=max_leaf, eps=eps, tile=tile, jump_every=8,
            interpret=(jax.devices()[0].platform != "tpu"),
        )
        tmin = tmin[:n].astype(o3[0].dtype)
        hit = hit[:n]
        if ridx is not None:
            # restore caller order with a second fused sort (by ridx)
            _, tmin, hit = jax.lax.sort((ridx, tmin, hit), num_keys=1)
        return tmin, hit, tmin >= jnp.asarray(MISS_T, tmin.dtype)
    if dev["bvh"] is not None:
        return bvh_mod.intersect_bvh(
            o3, d3, dev["bvh"], (dev["v0"], dev["e1"], dev["e2"]), eps,
            max_leaf,
        )
    ts = tri_mod.intersect_triangles_brute(
        o3, d3, dev["v0"], dev["e1"], dev["e2"], eps
    )
    tmin = jnp.min(ts, axis=0)
    hit = jnp.argmin(ts, axis=0).astype(jnp.int32)
    return tmin, hit, tmin >= jnp.asarray(MISS_T, tmin.dtype)


def first_hit_mesh_impl(rays, dev, *, eps=1e-4, max_leaf=4):
    """Debug/oracle render: first-hit t and kind (0=miss, 1=sphere,
    2=triangle). Used to validate BVH-in-renderer against brute force."""
    o3, d3 = megakernel.rays_to_soa(rays)
    st, sh, sm = megakernel.default_hit_fn(o3, d3, dev["spheres"], eps)
    tt, th, tm = _mesh_hit(o3, d3, dev, eps, max_leaf)
    tri_closer = tt < st
    kind = jnp.where(
        tri_closer, jnp.where(tm, 0, 2), jnp.where(sm, 0, 1)
    )
    tmin = jnp.minimum(st, tt)
    return tmin, kind, jnp.where(tri_closer, th, sh)


def render_pt_mesh_impl(
    key, rays, dev, *, bounces: int = 8, rr_depth: int = 5, eps: float = 1e-4,
    max_leaf: int = 4,
):
    """smallpt estimator over spheres + mesh. Same structure as
    megakernel.render_pt_impl with a two-way nearest-hit combine."""
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
        key, k1 = jax.random.split(key)
        u = jax.random.uniform(k1, (3, n), dtype=dtype)

        st, shit, smiss = megakernel.default_hit_fn(o3, d3, sph, eps)
        tt, thit, tmiss = _mesh_hit(o3, d3, dev, eps, max_leaf)
        use_tri = tt < st
        tmin = jnp.where(use_tri, tt, st)
        miss = smiss & tmiss
        live = alive & ~miss
        shit = jnp.where(smiss, 0, shit)

        hp = (o3[0] + d3[0] * tmin, o3[1] + d3[1] * tmin, o3[2] + d3[2] * tmin)
        # sphere normal
        s_chit = (select_by_id(shit, cx), select_by_id(shit, cy), select_by_id(shit, cz))
        s_nrm = shade.v3_normalize(shade.v3_sub(hp, s_chit))
        # triangle normal (gathered; static geometry so fwd gather is fine)
        t_nrm = gather_f(dev["fnormal"], thit)
        nrm = shade.v3_where(use_tri, t_nrm, s_nrm)
        dn = shade.v3_dot(d3, nrm)
        into = dn < 0
        nl = shade.v3_scale(nrm, jnp.where(into, 1.0, -1.0))

        emit_s = (select_by_id(shit, sex), select_by_id(shit, sey), select_by_id(shit, sez))
        emit_t = gather_f(dev["f_emission"], thit)
        emit = shade.v3_where(use_tri, emit_t, emit_s)
        rad = shade.v3_where(
            live,
            shade.v3_add(rad, (tput[0] * emit[0], tput[1] * emit[1], tput[2] * emit[2])),
            rad,
        )

        alb_s = (select_by_id(shit, sax), select_by_id(shit, say), select_by_id(shit, saz))
        alb_t = gather_f(dev["f_albedo"], thit)
        alb = shade.v3_where(use_tri, alb_t, alb_s)
        mat = jnp.where(use_tri, dev["f_material"][thit], select_by_id(shit, smat))
        is_diff = mat == DIFF
        is_refr = mat == REFR

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

        off = jnp.where(is_refr, 0.0, eps)
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
    static_argnames=("bounces", "rr_depth", "eps", "max_leaf"),
)
_first_hit_mesh_jit = jax.jit(
    first_hit_mesh_impl, static_argnames=("eps", "max_leaf")
)


def render_pt_mesh(key, rays, dev, **kw):
    """Jitted combined-scene path trace; strips the static leaf-size
    config out of the device pytree."""
    traced, max_leaf = _split_static(dev)
    return _render_pt_mesh_jit(key, rays, traced, max_leaf=max_leaf, **kw)


def first_hit_mesh(rays, dev, **kw):
    """Jitted first-hit query (see first_hit_mesh_impl)."""
    traced, max_leaf = _split_static(dev)
    return _first_hit_mesh_jit(rays, traced, max_leaf=max_leaf, **kw)
