"""Ray-sphere intersection ops (jax.numpy; VPU-mapped by XLA).

TPU-native re-design of the reference's intersection stack
(rt_helper.h:255-502): one batched [N, S] expression replaces the
per-sphere ``SphereHitInfo`` loop (rt_helper.h:457-474), the scalar-gather
``Transpose`` (rt_helper.h:372-395) and the ``ReduceMinInfo``
BlockReduceMin/Brcb/bitmask dance (rt_helper.h:397-451).

Miss semantics (load-bearing, SURVEY §7 hard-part 2): the reference takes
sqrt of a negative discriminant, yielding NaN, and both NaN and t <= eps
collapse to the 1e20 sentinel via NaN-compare-is-false
(rt_helper.h:324-364).  We compute identical *values* branch-free with a
validity mask instead of manufacturing NaNs, which keeps reverse-mode
gradients finite (the NaN would otherwise poison grads through
``jnp.where``).
"""

from __future__ import annotations

import jax.numpy as jnp

MISS_T = 1e20


def intersect_spheres(o, d, centers, r2, eps):
    """Intersect N rays against S spheres.

    Args:
      o, d: [N, 3] ray origins / unit directions.
      centers: [S, 3]; r2: [S] squared radii (the stored layout,
        gen_data.py:109).
      eps: self-intersection epsilon (common.h:9).

    Returns:
      t: [N, S] hit distance per (ray, sphere); 1e20 where missed.
    """
    ocx = centers[None, :, 0] - o[:, None, 0]
    ocy = centers[None, :, 1] - o[:, None, 1]
    ocz = centers[None, :, 2] - o[:, None, 2]
    b = ocx * d[:, None, 0] + ocy * d[:, None, 1] + ocz * d[:, None, 2]
    c = ocx * ocx + ocy * ocy + ocz * ocz - r2[None, :]
    det = b * b - c
    valid = det >= 0
    sq = jnp.sqrt(jnp.where(valid, det, 0.0))
    t0 = b - sq
    t1 = b + sq
    miss = jnp.asarray(MISS_T, t0.dtype)
    t = jnp.where(valid & (t0 > eps), t0, jnp.where(valid & (t1 > eps), t1, miss))
    return t


def reduce_hit(t):
    """Per-ray nearest hit: t [N, S] -> (tmin [N], hit [N] int32, miss [N] bool).

    ``jnp.argmin`` returns the first minimal index, matching the
    reference's lowest-index tie-break (rt_helper.h:183-193
    ConvertBitToValue; gen_data.py:313-321 strict '<' scan).
    """
    hit = jnp.argmin(t, axis=1).astype(jnp.int32)
    tmin = jnp.min(t, axis=1)
    miss = tmin >= MISS_T
    return tmin, hit, miss
