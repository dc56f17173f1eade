"""Camera gradients through the fused mesh-PT flagship
(diff/camera_fused.py, VERDICT r4 ask 3) — interpret-mode gates.

The fused kernel's camera is a TRACED 11-float vector; with
``with_camera=True`` the forward also emits per-sample (su, sv) and the
bounce-0 winner rides in wid[0].  The XLA side rebuilds the primary ray
differentiably and replays the depth chain from the detached winner —
the detach-discrete / differentiate-continuous split used for vertex
gradients (models/mesh.py:299-324), now reaching the camera.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ascendpathtracing_tpu.accel import meshes  # noqa: E402
from ascendpathtracing_tpu.camera import Camera  # noqa: E402
from ascendpathtracing_tpu.diff import camera_fused as dcf  # noqa: E402
from ascendpathtracing_tpu.diff.camera import CameraParams  # noqa: E402
from ascendpathtracing_tpu.models import mesh as mesh_mod  # noqa: E402
from ascendpathtracing_tpu.ops import pallas_mesh_pt as mpt  # noqa: E402

W = H = 32  # tile = W*H = 1024, the kernel's minimum tile
SPP4 = 4


@pytest.fixture(scope="module")
def setup():
    v, f = meshes.icosphere(center=(50, 40, 60), radius=14.0,
                            subdivisions=2)
    ms = mesh_mod.MeshScene.cornell_with_mesh(
        v, f, albedo=(0.85, 0.55, 0.2), base_scene="smallpt9"
    )
    planes, cb, sb, t24, mats, grid = mpt.mesh_pt_tables(
        ms, tris_per_chunk=16
    )
    kw = dict(width=W, height=H, spp4=SPP4, materials=mats,
              bounces=2, rr_depth=2, tile=W * H, interpret=True,
              **mpt.pt_tables_kwargs(grid))
    return ms, planes, cb, sb, t24, kw, grid


def test_cam_vector_matches_camera_basis():
    """The differentiable cam_vector reproduces Camera.basis exactly at
    the default parameters (so cam=None and cam=cam_vector(defaults)
    render identically)."""
    p = CameraParams(dtype=jnp.float64)
    vec = np.asarray(dcf.cam_vector(p, W, H, dtype=jnp.float64))
    pos, d0, cx, cy = Camera().basis(W, H)
    expect = np.concatenate([pos, d0, [cx[0]], cy, [140.0]])
    np.testing.assert_allclose(vec, expect, rtol=1e-12)


def test_traced_cam_default_bitwise_and_shifted_cam_differs(setup):
    """cam=None == cam=default vector BITWISE (the traced-SMEM refactor
    changed no math); a shifted camera changes the image."""
    ms, planes, cb, sb, t24, kw, grid = setup
    base = mpt.render_pt_mesh_pallas(planes, cb, sb, t24, **kw)
    # the default path builds the basis in f64 and casts — mirror that
    p = CameraParams(dtype=jnp.float64)
    vec = dcf.cam_vector(p, W, H, dtype=jnp.float64).astype(jnp.float32)
    same = mpt.render_pt_mesh_pallas(planes, cb, sb, t24, cam=vec, **kw)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same))
    vec2 = vec.at[0].add(5.0)  # move the camera 5 units in x
    moved = mpt.render_pt_mesh_pallas(planes, cb, sb, t24, cam=vec2, **kw)
    assert np.abs(np.asarray(moved) - np.asarray(base)).max() > 1e-3


def test_primary_depth_matches_oracle_first_hit(setup):
    """The XLA depth replay (frozen kernel winners + differentiable ray
    rebuild) agrees with an independent f64 brute-force first hit on the
    same primary rays — forward-value consistency of the recompute."""
    ms, planes, cb, sb, t24, kw, grid = setup
    p = CameraParams()
    out, depth, (wid, resv, suv) = dcf.render_with_camera(
        p, planes, cb, sb, t24, **kw,
    )
    depth = np.asarray(depth).reshape(-1)  # cells*8*L, cell-major

    # brute f64 first hit over the same rays (rebuilt from suv)
    mdev = mesh_mod.mesh_scene_to_device(ms, dtype=jnp.float64,
                                         use_bvh=False)
    p64 = CameraParams(dtype=jnp.float64)
    cam = np.asarray(dcf.cam_vector(p64, W, H, dtype=jnp.float64))
    su = np.asarray(suv[0], np.float64).reshape(-1)
    sv = np.asarray(suv[1], np.float64).reshape(-1)
    dd = np.stack([
        su * cam[6] + sv * cam[7] + cam[3],
        sv * cam[8] + cam[4],
        sv * cam[9] + cam[5],
    ], 1)
    o = cam[0:3][None] + dd * cam[10]
    d = dd / np.linalg.norm(dd, axis=1, keepdims=True)
    rays = jnp.asarray(np.concatenate([o, d], 1))
    tmin, kind, hid = mesh_mod.first_hit_mesh(rays, mdev)
    tmin = np.asarray(tmin)
    kind = np.asarray(kind)
    hid = np.asarray(hid)

    # compare only rays whose f32 kernel winner == f64 brute winner
    # (near-silhouette decision flips pick a different primitive with a
    # different — still correct for ITS winner — depth)
    code = np.asarray(wid[0]).reshape(-1)
    n_s = len(kw["materials"])
    is_tri = code >= n_s
    slot = np.where(is_tri, code.astype(np.int64) - n_s, 0)
    face = grid.face_of_slot[slot]
    agree = np.where(
        code < 0,
        kind == 0,
        np.where(is_tri, (kind == 2) & (face == hid),
                 (kind == 1) & (code.astype(np.int64) == hid)),
    )
    assert agree.mean() > 0.97, f"winner agreement only {agree.mean():.3f}"
    hit = (kind > 0) & agree
    assert hit.mean() > 0.9  # enclosed scene: nearly everything hits
    # f32 plane-equation error amplifies as 1/cos(incidence) (the
    # kernel's own t carries the same error — the recompute reproduces
    # the KERNEL, the f64 brute is the truth): gate non-grazing hits
    # tight, everything at a loose backstop
    rows = np.asarray(t24, np.float64)
    nrm = rows[slot, 13:16]  # unit normals
    cosi = np.abs(np.einsum("ij,ij->i", nrm, d))
    steep = hit & is_tri & (cosi > 0.1)
    assert steep.sum() > 100  # icosphere covers a small screen fraction
    np.testing.assert_allclose(depth[steep], tmin[steep], rtol=2e-3)
    # sphere winners: the 1e5-radius walls carry the kernel's own f32
    # quadratic cancellation (~r * 2^-23 ~ 0.01-0.06 absolute — the
    # BASELINE r4 estimator-correction scale); small spheres are tight
    r2w = np.asarray(planes)[0][np.clip(code.astype(np.int64), 0, n_s - 1)]
    sph_small = hit & ~is_tri & (r2w < 1e6)
    sph_wall = hit & ~is_tri & (r2w >= 1e6)
    assert sph_small.sum() > 100 and sph_wall.sum() > 100
    np.testing.assert_allclose(depth[sph_small], tmin[sph_small], rtol=2e-3)
    np.testing.assert_allclose(depth[sph_wall], tmin[sph_wall], atol=0.25,
                               rtol=2e-3)
    np.testing.assert_allclose(depth[hit], tmin[hit], rtol=5e-2, atol=0.25)
    assert (depth[code < 0] == 0).all()


def test_camera_gradients_match_fd(setup):
    """FD gate (the test_grad.py camera-gate shape, on the fused path):
    with the kernel's discrete decisions frozen, the depth loss is
    smooth in the camera parameters — central FD must match AD
    tightly in f64."""
    ms, planes, cb, sb, t24, kw, grid = setup
    p32 = CameraParams()
    _out, _depth, (wid, resv, suv) = dcf.render_with_camera(
        p32, planes, cb, sb, t24, **kw,
    )
    wid0 = jax.lax.stop_gradient(wid[0])
    suv = jax.lax.stop_gradient(suv)
    t24_64 = jnp.asarray(np.asarray(t24), jnp.float64)
    planes64 = jnp.asarray(np.asarray(planes), jnp.float64)

    def loss(p):
        dep = dcf.primary_depth(
            p, wid0, suv, t24_64[:, :16], planes64,
            n_spheres=len(kw["materials"]), width=W, height=H,
        )
        return jnp.mean(dep * dep) * 1e-4

    params = CameraParams(dtype=jnp.float64)
    g = jax.grad(loss)(params)
    h = 1e-6
    checked = 0
    for name in ("pos", "raw_dir", "fov"):
        arr = np.asarray(g[name])
        assert np.isfinite(arr).all(), name
        flat = np.atleast_1d(arr).ravel()
        base = np.atleast_1d(np.asarray(params[name], np.float64))
        shape = np.shape(np.asarray(params[name]))
        for ci in range(flat.size):
            e = np.zeros_like(base)
            e[ci] = h
            lp = float(loss(
                {**params, name: jnp.asarray((base + e).reshape(shape))}
            ))
            lm = float(loss(
                {**params, name: jnp.asarray((base - e).reshape(shape))}
            ))
            fd = (lp - lm) / (2 * h)
            np.testing.assert_allclose(flat[ci], fd, rtol=1e-4,
                                       atol=1e-10, err_msg=f"{name}[{ci}]")
            checked += 1
    assert checked == 7  # pos3 + raw_dir3 + fov
    assert max(np.abs(np.asarray(g[k])).max() for k in g) > 0
