"""Camera gradients through the FUSED mesh-PT flagship (VERDICT r4
ask 3 — closes SURVEY Phase 4's "albedo/emission/camera" triple for the
fused path).

The fused kernel (ops/pallas_mesh_pt.py) generates primary rays
IN-KERNEL from a traced 11-float camera vector, so camera optimization
steps re-render without recompiling.  Gradients follow the repo's
detach-discrete / differentiate-continuous discipline (SURVEY §7
hard-part 5), exactly as vertex gradients do on the XLA mesh path
(diff/mesh.py, models/mesh.py:299-324 recompute):

- the kernel emits, per sample, the bounce-0 WINNER code (``wid[0]`` of
  the replay residuals) and the screen coordinates ``(su, sv)``
  (``with_camera=True``);
- the XLA side rebuilds the primary ray DIFFERENTIABLY in the camera
  parameters (the same d = su*cx + sv*cy + dir chain as
  diff/camera.camera_rays, gen_data.py:41-46) and replays the
  primary-hit depth from the detached winner's geometry — the
  plane-equation recompute for triangle winners, the sphere quadratic
  for sphere winners;
- camera-pose/fov gradients flow through this depth AOV (continuous in
  the camera away from silhouettes — FD-gateable); the radiance itself
  is piecewise-constant in the camera under detached decisions (albedo/
  emission are per-face constants and the BSDF draws are importance-
  weighted), so the depth chain carries ALL the continuous signal, the
  same scoping as the XLA camera gate (tests/test_grad.py
  test_camera_gradients).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ascendpathtracing_tpu.camera import ORIGIN_PUSH

MISS_T = 1e20


def cam_vector(params, width: int, height: int, origin_push=ORIGIN_PUSH,
               dtype=jnp.float32):
    """CameraParams pytree (diff/camera.CameraParams) -> the fused
    kernel's 11-float camera vector (pos3, unit-dir3, cx.x, cy3, push),
    differentiably.  Mirrors Camera.basis (camera.py / gen_data.py:24-29):
    cx is axis-aligned by the smallpt model, so only its x component
    rides in the vector (the kernel's ray build assumes cx.y = cx.z = 0).
    """
    pos = params["pos"].astype(dtype)
    raw = params["raw_dir"].astype(dtype)
    fov = params["fov"].astype(dtype)
    dirn = raw / jnp.linalg.norm(raw)
    cxx = width * fov / height
    cx = jnp.stack([cxx, jnp.zeros_like(cxx), jnp.zeros_like(cxx)])
    cross = jnp.cross(cx, dirn)
    cy = cross / jnp.linalg.norm(cross) * fov
    return jnp.concatenate([
        pos, dirn, cxx[None], cy, jnp.asarray([origin_push], dtype)
    ]).astype(dtype)


def primary_depth(params, wid0, suv, geom16, scene_planes, *,
                  n_spheres: int, width: int, height: int, eps=1e-4,
                  origin_push=ORIGIN_PUSH):
    """Differentiable bounce-0 depth per sample.

    ``wid0``: [cells, 8, L] f32 winner code of bounce 0 (sphere index,
    n_spheres + slot, or -1 = primary miss) — DETACHED discrete
    decision from the fused forward.  ``suv``: [2, cells, 8, L] screen
    coords from the same forward.  ``geom16``: [CT, 16] slot rows (the
    13 intersection floats; only n (3:6) and d0 (12) are used).
    ``scene_planes``: [10, S] sphere planes.  Returns [cells, 8, L]
    depth along the normalized primary direction, 0 for primary misses
    — differentiable in the camera params (and in geom16/scene_planes,
    for free).

    The t formulas are the kernel's own (pallas_mesh_pt.py tri_test /
    the sphere quadratic), so forward values agree to f32 rounding; the
    t0-vs-t1 root pick and the winner id stay frozen (detached).
    """
    dtype = params["pos"].dtype
    cam = cam_vector(params, width, height, origin_push, dtype=dtype)
    su = suv[0].astype(dtype)
    sv = suv[1].astype(dtype)
    ddx = su * cam[6] + sv * cam[7] + cam[3]
    ddy = sv * cam[8] + cam[4]
    ddz = sv * cam[9] + cam[5]
    ox = cam[0] + ddx * cam[10]
    oy = cam[1] + ddy * cam[10]
    oz = cam[2] + ddz * cam[10]
    inv = jax.lax.rsqrt(ddx * ddx + ddy * ddy + ddz * ddz)
    dx, dy, dz = ddx * inv, ddy * inv, ddz * inv

    code = jax.lax.stop_gradient(wid0)
    miss = code < 0.0
    is_tri = code >= float(n_spheres)
    idx = jnp.clip(code.astype(jnp.int32), 0, None)
    slot = jnp.where(is_tri, idx - n_spheres, 0)
    si = jnp.where(is_tri, 0, idx)

    # triangle winners: t = (d0 - n.o) / (n.d) — guarded like the
    # models/mesh.py recompute (double-where so no nan reaches grads)
    g = geom16.astype(dtype)
    nx = g[slot, 3]
    ny = g[slot, 4]
    nz = g[slot, 5]
    d0 = g[slot, 12]
    nd = nx * dx + ny * dy + nz * dz
    nd = jnp.where(is_tri & ~miss, nd, jnp.ones_like(nd))
    t_tri = (d0 - (nx * ox + ny * oy + nz * oz)) / nd

    # sphere winners: the kernel's quadratic with the root pick frozen
    sp = scene_planes.astype(dtype)
    r2 = sp[0, si]
    cx_ = sp[1, si]
    cy_ = sp[2, si]
    cz_ = sp[3, si]
    ocx = cx_ - ox
    ocy = cy_ - oy
    ocz = cz_ - oz
    bq = ocx * dx + ocy * dy + ocz * dz
    c = ocx * ocx + ocy * ocy + ocz * ocz - r2
    det = bq * bq - c
    det = jnp.where(is_tri | miss, jnp.ones_like(det), det)
    sq = jnp.sqrt(jnp.maximum(det, 0.0))
    t0 = bq - sq
    t1 = bq + sq
    pick_t0 = jax.lax.stop_gradient(t0 > eps)  # frozen root choice
    t_sph = jnp.where(pick_t0, t0, t1)

    t = jnp.where(is_tri, t_tri, t_sph)
    return jnp.where(miss, jnp.zeros_like(t), t)


def render_with_camera(params, scene_planes, cboxes, sboxes, tris24,
                       **kw):
    """Fused flagship render with a differentiable camera: returns
    ``(image [3, n_pix], depth [cells, 8, L], (wid, resv, suv))``.
    ``image`` carries NO camera gradient (the kernel is the detached
    forward); ``depth`` is differentiable in ``params`` via
    :func:`primary_depth`.  Camera losses combine the two, e.g.
    ``mean((depth - target_depth)**2)`` (the test_grad.py camera-gate
    shape).  kw = render_pt_mesh_pallas kwargs (width/height/spp4/...).
    """
    from ascendpathtracing_tpu.ops import pallas_mesh_pt as mpt

    width = kw["width"]
    height = kw["height"]
    cam = jax.lax.stop_gradient(
        cam_vector(params, width, height).astype(jnp.float32)
    )
    out, wid, resv, suv = mpt.render_pt_mesh_pallas(
        scene_planes, cboxes, sboxes, tris24, cam=cam,
        with_residuals=True, with_camera=True, **kw,
    )
    depth = primary_depth(
        params, wid[0], suv, tris24[:, :16], scene_planes,
        n_spheres=len(kw["materials"]), width=width, height=height,
        eps=kw.get("eps", 1e-4),
    )
    return out, depth, (wid, resv, suv)
