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

MISS_T = 1e20
DEFAULT_TILE = 2048


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
