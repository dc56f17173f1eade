"""Experiment: SMEM-resident node/tri tables for the BVH traversal kernel."""
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from ascendpathtracing_tpu.accel import bvh as bvh_mod
from ascendpathtracing_tpu.accel import meshes, tri
from ascendpathtracing_tpu.ops import pallas_bvh, sort as rs

MISS_T = 1e20


def _traverse_kernel_smem(
    nodesf_ref,  # SMEM [M, 6]
    nodesi_ref,  # SMEM [M, 3]
    tris_ref,    # SMEM [F, 9]
    rays_ref,    # VMEM [6, 1, 8, L]
    tmin_ref,
    hit_ref,
    *,
    n_nodes,
    max_leaf,
    eps,
    jump_every,
):
    f32 = jnp.float32
    ox = rays_ref[0, 0]
    oy = rays_ref[1, 0]
    oz = rays_ref[2, 0]
    dx = rays_ref[3, 0]
    dy = rays_ref[4, 0]
    dz = rays_ref[5, 0]
    shape = ox.shape

    inv_dx = 1.0 / jnp.where(dx == 0, 1e-30, dx)
    inv_dy = 1.0 / jnp.where(dy == 0, 1e-30, dy)
    inv_dz = 1.0 / jnp.where(dz == 0, 1e-30, dz)

    def tri_test(tidx, valid, tmin, hit):
        ax = tris_ref[tidx, 0]
        ay = tris_ref[tidx, 1]
        az = tris_ref[tidx, 2]
        e1x = tris_ref[tidx, 3]
        e1y = tris_ref[tidx, 4]
        e1z = tris_ref[tidx, 5]
        e2x = tris_ref[tidx, 6]
        e2y = tris_ref[tidx, 7]
        e2z = tris_ref[tidx, 8]
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        parallel = jnp.abs(det) < 1e-12
        invd = jnp.where(parallel, 0.0, 1.0 / jnp.where(parallel, 1.0, det))
        tx, ty, tz = ox - ax, oy - ay, oz - az
        u = (tx * px + ty * py + tz * pz) * invd
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * invd
        t = (e2x * qx + e2y * qy + e2z * qz) * invd
        ok = (
            valid
            & jnp.logical_not(parallel)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > eps)
        )
        better = ok & (t < tmin)
        tmin2 = jnp.where(better, t, tmin)
        hit2 = jnp.where(better, tidx, hit)
        return tmin2, hit2

    def body(i, step, st):
        skip, tmin, hit = st
        bminx = nodesf_ref[i, 0]
        bminy = nodesf_ref[i, 1]
        bminz = nodesf_ref[i, 2]
        bmaxx = nodesf_ref[i, 3]
        bmaxy = nodesf_ref[i, 4]
        bmaxz = nodesf_ref[i, 5]
        first = nodesi_ref[i, 0]
        count = nodesi_ref[i, 1]
        miss = nodesi_ref[i, 2]

        active = skip <= i
        t1x = (bminx - ox) * inv_dx
        t2x = (bmaxx - ox) * inv_dx
        t1y = (bminy - oy) * inv_dy
        t2y = (bmaxy - oy) * inv_dy
        t1z = (bminz - oz) * inv_dz
        t2z = (bmaxz - oz) * inv_dz
        tnear = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        tfar = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        box_hit = active & (tfar >= jnp.maximum(tnear, 0.0)) & (tnear < tmin)

        is_leaf = count > 0
        miss_v = jnp.full(shape, miss, jnp.int32)
        desc = box_hit & jnp.logical_not(jnp.full(shape, is_leaf))
        nxt = jnp.where(desc, jnp.full(shape, i + 1, jnp.int32), miss_v)
        skip = jnp.where(active, nxt, skip)

        def do_tris(args2):
            tmin, hit = args2
            for k in range(max_leaf):
                valid = box_hit & (k < jnp.full(shape, count))
                tmin, hit = tri_test(first + k, valid, tmin, hit)
            return tmin, hit

        tmin, hit = jax.lax.cond(
            is_leaf & jnp.any(box_hit), do_tris, lambda a: a, (tmin, hit)
        )
        if jump_every <= 1:
            i_next = jnp.maximum(i + 1, jnp.min(skip))
        else:
            i_next = jax.lax.cond(
                step % jump_every == 0,
                lambda: jnp.maximum(i + 1, jnp.min(skip)),
                lambda: i + 1,
            )
        return i_next, (skip, tmin, hit)

    def cond_fn(carry):
        i, _step, _ = carry
        return i < n_nodes

    def body_fn(carry):
        i, step, st = carry
        i_next, st = body(i, step, st)
        return i_next, step + 1, st

    skip = jnp.zeros(shape, jnp.int32)
    tmin = jnp.full(shape, MISS_T, f32)
    hit = jnp.zeros(shape, jnp.int32)
    _, _, (skip, tmin, hit) = jax.lax.while_loop(
        cond_fn, body_fn, (jnp.int32(0), jnp.int32(0), (skip, tmin, hit))
    )
    tmin_ref[0] = tmin
    hit_ref[0] = hit


@functools.partial(
    jax.jit, static_argnames=("max_leaf", "eps", "tile", "jump_every")
)
def intersect_bvh_smem(
    rays_planes, nodesf, nodesi, tris9, *,
    max_leaf=4, eps=1e-4, tile=4096, jump_every=8,
):
    n = rays_planes.shape[1]
    m = nodesf.shape[0]
    nb = n // tile
    lanes = tile // 8
    rays4 = rays_planes.reshape(6, nb, 8, lanes)
    kernel = functools.partial(
        _traverse_kernel_smem, n_nodes=m, max_leaf=max_leaf, eps=eps,
        jump_every=jump_every,
    )
    tmin, hit = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((m, 6), lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((m, 3), lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (tris9.shape[0], 9), lambda b: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (6, 1, 8, lanes), lambda b: (0, b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec((1, 8, lanes), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, lanes), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, 8, lanes), jnp.float32),
            jax.ShapeDtypeStruct((nb, 8, lanes), jnp.int32),
        ),
    )(nodesf, nodesi, tris9, rays4)
    return tmin.reshape(n), hit.reshape(n)


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--rays", type=int, default=1 << 20)
    p.add_argument("--subdiv", type=int, default=3)
    p.add_argument("--tile", type=int, default=4096)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--max-leaf", type=int, default=64)
    p.add_argument("--jump-every", type=int, default=8)
    args = p.parse_args()

    v, f = meshes.icosphere(radius=1.0, subdivisions=args.subdiv)
    v32 = np.asarray(v, np.float32)
    bvh = bvh_mod.build_bvh(v32, f, max_leaf=args.max_leaf)
    planes = tri.triangle_planes(v32, f, dtype=np.float32)
    ordered = tuple(
        tuple(np.asarray(c)[bvh.tri_order] for c in plane) for plane in planes
    )
    nodesf, nodesi, tris9 = pallas_bvh.pack_bvh_for_pallas(bvh, ordered)

    n = args.rays
    rng = np.random.RandomState(0)
    t_ = rng.rand(2, n).astype(np.float32)
    du = (t_[0] - 0.5) * 0.8
    dv = (t_[1] - 0.5) * 0.8
    d = np.stack([du, dv, -np.ones(n, np.float32)], 0)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    o = np.tile(np.array([[0.0], [0.0], [4.0]], np.float32), (1, n))
    lo = np.asarray(v32.min(0), np.float32)
    hi = np.asarray(v32.max(0), np.float32)

    o2 = rng.randn(3, n).astype(np.float32)
    o2 /= np.linalg.norm(o2, axis=0, keepdims=True)
    o2 *= 3.0
    d2 = rng.randn(3, n).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=0, keepdims=True)

    def run(o3, d3, label, sort):
        rays = jnp.asarray(np.concatenate([o3, d3], 0))
        if sort:
            os_, ds_, _ = rs.sort_rays_for_traversal(
                (rays[0], rays[1], rays[2]), (rays[3], rays[4], rays[5]),
                jnp.asarray(lo), jnp.asarray(hi),
            )
            rays = jnp.stack(list(os_) + list(ds_), 0)

        @jax.jit
        def step(r):
            return intersect_bvh_smem(
                r, nodesf, nodesi, tris9, max_leaf=args.max_leaf,
                tile=args.tile, jump_every=args.jump_every,
            )

        out = step(rays)
        jax.block_until_ready(out)
        # correctness vs existing kernel
        ref = pallas_bvh.intersect_bvh_pallas(
            rays, nodesf, nodesi, tris9, max_leaf=args.max_leaf, tile=args.tile
        )
        assert np.array_equal(np.asarray(out[0]), np.asarray(ref[0])), "tmin mismatch"
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = step(rays)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({
            "label": label, "Mrays/s": round(n / dt / 1e6, 2),
            "ms": round(dt * 1e3, 2),
        }))

    run(o, d, "coherent", False)
    run(o, d, "coherent+sort", True)
    run(o2, d2, "incoherent", False)
    run(o2, d2, "incoherent+sort", True)


if __name__ == "__main__":
    main()
