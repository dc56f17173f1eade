"""Moller-Trumbore ray-triangle intersection, SoA-vectorized.

The triangle analogue of the reference's vectorized sphere quadratic
(``SphereHitInfo``, rt_helper.h:255-370): branch-free, miss -> the same
1e20 sentinel, strict lowest-index tie-break downstream.
"""

from __future__ import annotations

import jax.numpy as jnp

MISS_T = 1e20


def intersect_triangles_brute(o3, d3, v0, e1, e2, eps):
    """Intersect N rays against F triangles, brute force.

    Args:
      o3, d3: (x, y, z) tuples of [N] ray planes.
      v0, e1, e2: (x, y, z) tuples of [F] planes — first vertex and the
        two edge vectors (v1-v0, v2-v0), precomputed host-side.
      eps: minimum hit distance (the reference's EPSILON, common.h:9).

    Returns t: [F, N]; 1e20 where missed (backface culling OFF — both
    orientations hit, like smallpt's spheres).
    """
    ox, oy, oz = o3
    dx, dy, dz = d3
    # pvec = d x e2
    px = dy[None, :] * e2[2][:, None] - dz[None, :] * e2[1][:, None]
    py = dz[None, :] * e2[0][:, None] - dx[None, :] * e2[2][:, None]
    pz = dx[None, :] * e2[1][:, None] - dy[None, :] * e2[0][:, None]
    det = e1[0][:, None] * px + e1[1][:, None] * py + e1[2][:, None] * pz
    # |det| ~ 0 => parallel
    parallel = jnp.abs(det) < 1e-12
    inv_det = jnp.where(parallel, 0.0, 1.0 / jnp.where(parallel, 1.0, det))
    # tvec = o - v0
    tx = ox[None, :] - v0[0][:, None]
    ty = oy[None, :] - v0[1][:, None]
    tz = oz[None, :] - v0[2][:, None]
    u = (tx * px + ty * py + tz * pz) * inv_det
    # qvec = tvec x e1
    qx = ty * e1[2][:, None] - tz * e1[1][:, None]
    qy = tz * e1[0][:, None] - tx * e1[2][:, None]
    qz = tx * e1[1][:, None] - ty * e1[0][:, None]
    v = (dx[None, :] * qx + dy[None, :] * qy + dz[None, :] * qz) * inv_det
    t = (e2[0][:, None] * qx + e2[1][:, None] * qy + e2[2][:, None] * qz) * inv_det
    hit = (
        (~parallel)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > eps)
    )
    return jnp.where(hit, t, jnp.asarray(MISS_T, t.dtype))


def triangle_planes(vertices, faces, dtype=None):
    """Host-side: vertices [V,3], faces [F,3] -> (v0, e1, e2) plane tuples
    ready for :func:`intersect_triangles_brute` (each a tuple of [F])."""
    import numpy as np

    vertices = np.asarray(vertices)
    if dtype is not None:
        vertices = vertices.astype(dtype)
    faces = np.asarray(faces, np.int64)
    a = vertices[faces[:, 0]]
    b = vertices[faces[:, 1]]
    c = vertices[faces[:, 2]]
    e1 = b - a
    e2 = c - a
    return (
        (a[:, 0], a[:, 1], a[:, 2]),
        (e1[:, 0], e1[:, 1], e1[:, 2]),
        (e2[:, 0], e2[:, 1], e2[:, 2]),
    )
