"""Pallas stackless BVH traversal kernel.

TPU has no per-lane gather from VMEM, so the classic per-ray
pointer-chasing traversal cannot vectorize.  Instead this kernel walks
the flattened DFS node array in LOCKSTEP — a scalar ``fori_loop`` over
nodes, with all node/triangle fetches at scalar indices (free on TPU) —
and keeps per-ray divergence in a vector ``skip`` cursor:

  - a ray is active at node i iff skip <= i;
  - active ray misses the bbox     -> skip = miss_link[i]  (skips subtree)
  - active ray hits an inner node  -> skip = i + 1         (descend)
  - leaf (for every DFS layout)    -> next node == miss_link[i]

Leaf triangle tests run under a scalar ``lax.cond`` so their cost is only
paid at leaves.  Complexity is O(nodes) vector-ops per ray tile — each
node costs ~20 VPU lanes-wide ops regardless of how many rays care — in
exchange for zero gathers and perfect lane utilization; the win over
brute force grows with triangle count (every non-visited *triangle* is
still skipped).

The node/triangle tables are scalar-read-only, so they live flattened in
SMEM (the scalar-core memory, 1 MiB on v5e) when they fit — scalar
dynamic loads are native there — and fall back to VMEM for bigger
scenes (HBM-resident streaming is a follow-up for multi-MB scenes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MISS_T = 1e20


def _traverse_kernel(
    nodesf_ref,  # [M, 6] f32 (VMEM) or flat [M*6] f32 (SMEM)
    nodesi_ref,  # [M, 3] i32 (VMEM) or flat [M*3] i32 (SMEM)
    tris_ref,    # [F, 9] f32 (VMEM) or flat [F*9] f32 (SMEM), leaf order
    # VMEM layouts are field-minor: Mosaic only allows dynamic
    # single-element indexing on the sublane axis (lane-axis indices must
    # be static / 128-aligned), so the dynamic node/tri index is dim 0.
    # SMEM layouts are FLAT 1-D: SMEM pads every 2-D row to 512 B, so a
    # [F, 9] table would waste 93% of the 1 MiB SMEM; a 1-D buffer packs
    # tight and scalar dynamic indexing is native there.
    rays_ref,    # [6, 1, 8, L] block
    tmin_ref,    # [1, 8, L] block
    hit_ref,     # [1, 8, L] block (i32)
    *,
    n_nodes,
    max_leaf,
    eps,
    jump_every,
    flat_tables,
):
    f32 = jnp.float32

    if flat_tables:
        nodef = lambda i, k: nodesf_ref[i * 6 + k]
        nodei = lambda i, k: nodesi_ref[i * 3 + k]
        trif = lambda t, k: tris_ref[t * 9 + k]
    else:
        nodef = lambda i, k: nodesf_ref[i, k]
        nodei = lambda i, k: nodesi_ref[i, k]
        trif = lambda t, k: tris_ref[t, k]
    ox = rays_ref[0, 0]
    oy = rays_ref[1, 0]
    oz = rays_ref[2, 0]
    dx = rays_ref[3, 0]
    dy = rays_ref[4, 0]
    dz = rays_ref[5, 0]
    shape = ox.shape

    big = f32(1e30)
    inv_dx = 1.0 / jnp.where(dx == 0, 1e-30, dx)
    inv_dy = 1.0 / jnp.where(dy == 0, 1e-30, dy)
    inv_dz = 1.0 / jnp.where(dz == 0, 1e-30, dz)
    del big

    def tri_test(tidx, valid, tmin, hit):
        ax = trif(tidx, 0)
        ay = trif(tidx, 1)
        az = trif(tidx, 2)
        e1x = trif(tidx, 3)
        e1y = trif(tidx, 4)
        e1z = trif(tidx, 5)
        e2x = trif(tidx, 6)
        e2y = trif(tidx, 7)
        e2z = trif(tidx, 8)
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
        bminx = nodef(i, 0)
        bminy = nodef(i, 1)
        bminz = nodef(i, 2)
        bmaxx = nodef(i, 3)
        bmaxy = nodef(i, 4)
        bmaxz = nodef(i, 5)
        first = nodei(i, 0)
        count = nodei(i, 1)
        miss = nodei(i, 2)

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

        # Unified skip update (no leaf/inner branch): a descending ray
        # goes to i+1 only at an inner node it box-hits; everywhere else
        # (leaf, or box miss) it goes to the miss link.
        is_leaf = count > 0
        miss_v = jnp.full(shape, miss, jnp.int32)
        desc = box_hit & jnp.logical_not(jnp.full(shape, is_leaf))
        nxt = jnp.where(desc, jnp.full(shape, i + 1, jnp.int32), miss_v)
        skip = jnp.where(active, nxt, skip)

        # Tri tests only at a leaf some ray actually box-hits: a leaf is
        # often *visited* (a skip cursor lands here) while no ray
        # overlaps its box — the max_leaf tri-test block (the most
        # expensive code in the kernel) is then skipped by one scalar
        # branch.
        def do_tris(args2):
            tmin, hit = args2
            for k in range(max_leaf):
                valid = box_hit & (k < jnp.full(shape, count))
                tmin, hit = tri_test(first + k, valid, tmin, hit)
            return tmin, hit

        # Nested cond so the full-tile any() reduce is only paid at leaf
        # nodes — inner nodes (half of all visits) skip it entirely.
        tmin, hit = jax.lax.cond(
            is_leaf,
            lambda a: jax.lax.cond(jnp.any(box_hit), do_tris, lambda b: b, a),
            lambda a: a,
            (tmin, hit),
        )
        # Global skip-jump: the next node anyone needs is min(skip); for
        # coherent ray tiles this leaps over whole subtrees (the lockstep
        # analogue of per-ray traversal skipping).  The full-tile min
        # reduce has a real per-node cost, so it can be amortized to
        # every `jump_every`-th step (i+1 in between is conservative —
        # never skips a node a ray still needs).
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
    jax.jit, static_argnames=("max_leaf", "eps", "tile", "interpret", "jump_every")
)
def intersect_bvh_pallas(
    rays_planes,  # [6, N] f32
    nodesf,  # [M, 6] f32
    nodesi,  # [M, 3] i32 (first, count, miss)
    tris9,  # [F, 9] f32, leaf order
    *,
    max_leaf: int = 4,
    eps: float = 1e-4,
    tile: int = 4096,
    interpret: bool = False,
    jump_every: int = 8,
):
    """Stackless BVH traversal over ray tiles.

    Returns (tmin [N] f32, hit [N] i32 — index into the LEAF-ORDERED
    triangle arrays, like accel.bvh.intersect_bvh).
    """
    n = rays_planes.shape[1]
    m = nodesf.shape[0]
    f = tris9.shape[0]
    if tile % 1024:
        raise ValueError(f"{tile=} must be a multiple of 1024")
    if n % tile:
        raise ValueError(f"ray count {n} not divisible by {tile=}")
    nb = n // tile
    lanes = tile // 8

    # All node/tri reads are scalar (broadcast to the ray tile), so the
    # tables belong in SMEM, the scalar-core memory, where dynamic scalar
    # loads are native — measured ~10% whole-kernel win over VMEM scalar
    # reads.  SMEM is 1 MiB on v5e; fall back to VMEM for bigger scenes.
    table_bytes = m * 9 * 4 + f * 9 * 4
    use_smem = table_bytes <= 640 * 1024

    kernel = functools.partial(
        _traverse_kernel, n_nodes=m, max_leaf=max_leaf, eps=eps,
        jump_every=jump_every, flat_tables=use_smem,
    )
    if use_smem:
        space = pltpu.SMEM
        nodesf_in = nodesf.reshape(m * 6)
        nodesi_in = nodesi.reshape(m * 3)
        tris_in = tris9.reshape(f * 9)
        table_specs = [
            pl.BlockSpec((m * 6,), lambda b: (0,), memory_space=space),
            pl.BlockSpec((m * 3,), lambda b: (0,), memory_space=space),
            pl.BlockSpec((f * 9,), lambda b: (0,), memory_space=space),
        ]
    else:
        space = pltpu.VMEM
        nodesf_in, nodesi_in, tris_in = nodesf, nodesi, tris9
        table_specs = [
            pl.BlockSpec((m, 6), lambda b: (0, 0), memory_space=space),
            pl.BlockSpec((m, 3), lambda b: (0, 0), memory_space=space),
            pl.BlockSpec((f, 9), lambda b: (0, 0), memory_space=space),
        ]

    rays4 = rays_planes.reshape(6, nb, 8, lanes)
    tmin, hit = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=table_specs + [
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
        interpret=interpret,
    )(nodesf_in, nodesi_in, tris_in, rays4)
    return tmin.reshape(n), hit.reshape(n)


def pack_bvh_for_pallas(bvh, tri_planes_ordered):
    """FlatBVH + ordered (v0, e1, e2) planes -> (nodesf, nodesi, tris9)
    device arrays for :func:`intersect_bvh_pallas`."""
    import numpy as np

    nodesf = np.stack(
        [
            bvh.bmin[:, 0], bvh.bmin[:, 1], bvh.bmin[:, 2],
            bvh.bmax[:, 0], bvh.bmax[:, 1], bvh.bmax[:, 2],
        ],
        axis=1,
    ).astype(np.float32)
    nodesi = np.stack([bvh.first, bvh.count, bvh.miss], axis=1).astype(np.int32)
    v0, e1, e2 = tri_planes_ordered
    tris9 = np.stack(
        [np.asarray(c, np.float32) for t in (v0, e1, e2) for c in t],
        axis=1,
    )
    return jnp.asarray(nodesf), jnp.asarray(nodesi), jnp.asarray(tris9)
