"""Fused sphere+mesh PT kernel — interpret-mode correctness.

The Pallas TPU interpreter stubs ``prng_random_bits`` to zeros, which
makes the whole estimator DETERMINISTIC: camera jitter is exactly -1
(tent filter at u=0), the diffuse cosine sample degenerates to the
shading normal (phi=0, r2=0 -> d' = nl), glass always takes the
reflect branch scaled by re/pp, and Russian roulette always survives
scaled by 1/pmax.  ``_oracle_u0`` mirrors that math in float64 numpy
over the same triangle rows, giving a real end-to-end parity gate for
the camera, the sphere tests, the chunk-grid mesh traversal, the
carrier plumbing and the shading — everything except the RNG itself
(covered on hardware by tests/test_pallas_mesh_pt_tpu.py).

Hardware-independent invariants checked here too: residency modes
(smem/vmem/hbm-DMA) and super-chunk gating must be bitwise-identical.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ascendpathtracing_tpu import scenes  # noqa: E402
from ascendpathtracing_tpu.accel import meshes  # noqa: E402
from ascendpathtracing_tpu.camera import Camera  # noqa: E402
from ascendpathtracing_tpu.models import mesh as mesh_mod  # noqa: E402
from ascendpathtracing_tpu.ops import pallas_mesh_pt as mpt  # noqa: E402
from ascendpathtracing_tpu.scenes import DIFF, REFR, SPEC  # noqa: E402

MISS_T = 1e20


def _scene():
    v, f = meshes.icosphere(center=(50, 40, 60), radius=14.0, subdivisions=2)
    ms = mesh_mod.MeshScene.cornell_with_mesh(
        v, f, albedo=(0.85, 0.55, 0.2), base_scene="smallpt9"
    )
    # mixed face materials + a couple of emissive faces: exercise every
    # carrier the kernel transports
    nf = ms.faces.shape[0]
    ms.face_material[: nf // 3] = SPEC
    ms.face_material[nf // 3 : nf // 2] = REFR
    ms.face_emission[:4] = (0.0, 2.0, 0.5)
    return ms


def _oracle_u0(ms, tris24, materials, w, h, spp4, bounces, rr_depth, eps=1e-4):
    """float64 numpy mirror of _mesh_pt_kernel with all uniforms == 0."""
    planes = np.asarray(ms.spheres.soa10(), np.float64)  # [10, S]
    rows = np.asarray(tris24, np.float64)  # [CT, 24]
    n = w * h
    pos, d0, cx, cy = Camera().basis(w, h)
    push = float(Camera().origin_push)
    pix = np.arange(n)
    i_idx = pix // h
    j_idx = pix % h
    s = spp4 // 4
    acc = np.zeros((3, n))
    for a in range(spp4):
        sy = a // (2 * s)
        sx = (a // s) % 2
        jx = jy = -1.0  # tent filter at u = 0
        su = ((sx + 0.5 + jx) / 2.0 + i_idx) / w - 0.5
        sv = ((sy + 0.5 + jy) / 2.0 + j_idx) / h - 0.5
        dd = (
            su * cx[0] + sv * cy[0] + d0[0],
            sv * cy[1] + d0[1],
            sv * cy[2] + d0[2],
        )
        o = np.stack([pos[k] + dd[k] * push for k in range(3)])
        d = np.stack(dd)
        d /= np.sqrt((d * d).sum(0, keepdims=True))
        tput = np.ones((3, n))
        rad = np.zeros((3, n))
        alive = np.ones(n, bool)
        for depth in range(bounces):
            # spheres: running min with carriers
            tmin = np.full(n, MISS_T)
            win = {k: np.zeros(n) for k in
                   ("cx", "cy", "cz", "ar", "ag", "ab", "er", "eg", "eb",
                    "nx", "ny", "nz", "trif", "r2")}
            w_diff = np.zeros(n, bool)
            w_refr = np.zeros(n, bool)
            for si in range(planes.shape[1]):
                r2s, cxs, cys, czs = planes[0, si], planes[1, si], planes[2, si], planes[3, si]
                oc = np.stack([cxs - o[0], cys - o[1], czs - o[2]])
                bq = (oc * d).sum(0)
                cc = (oc * oc).sum(0) - r2s
                det = bq * bq - cc
                valid = det >= 0
                sq = np.sqrt(np.where(valid, det, 0.0))
                t0, t1 = bq - sq, bq + sq
                t = np.where(valid & (t0 > eps), t0,
                             np.where(valid & (t1 > eps), t1, MISS_T))
                better = t < tmin
                tmin = np.where(better, t, tmin)
                for k, val in (("cx", cxs), ("cy", cys), ("cz", czs),
                               ("ar", planes[7, si]), ("ag", planes[8, si]),
                               ("ab", planes[9, si]), ("er", planes[4, si]),
                               ("eg", planes[5, si]), ("eb", planes[6, si]),
                               ("r2", r2s)):
                    win[k] = np.where(better, val, win[k])
                w_diff = (w_diff | better) if materials[si] == DIFF else (w_diff & ~better)
                w_refr = (w_refr | better) if materials[si] == REFR else (w_refr & ~better)
            # triangles: brute force over every row (pads self-reject: n=0
            # -> t = nan -> all compares False)
            with np.errstate(divide="ignore", invalid="ignore"):
                for ti in range(rows.shape[0]):
                    r = rows[ti]
                    nd = r[3] * d[0] + r[4] * d[1] + r[5] * d[2]
                    no = r[3] * o[0] + r[4] * o[1] + r[5] * o[2]
                    t = (r[12] - no) / nd
                    wx = (o[0] - r[0]) + t * d[0]
                    wy = (o[1] - r[1]) + t * d[1]
                    wz = (o[2] - r[2]) + t * d[2]
                    uu = r[6] * wx + r[7] * wy + r[8] * wz
                    vv = r[9] * wx + r[10] * wy + r[11] * wz
                    ok = (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & (t > eps)
                    better = ok & (t < tmin)
                    tmin = np.where(better, t, tmin)
                    for k, val in (("ar", r[16]), ("ag", r[17]), ("ab", r[18]),
                                   ("er", r[19]), ("eg", r[20]), ("eb", r[21]),
                                   ("nx", r[13]), ("ny", r[14]), ("nz", r[15])):
                        win[k] = np.where(better, val, win[k])
                    w_diff = np.where(better, r[22] > 0.5, w_diff)
                    w_refr = np.where(better, r[23] > 0.5, w_refr)
                    win["trif"] = np.where(better, 1.0, win["trif"])
                    win["r2"] = np.where(better, 0.0, win["r2"])
            miss = tmin >= MISS_T
            live = alive & ~miss
            hp = o + d * tmin
            sn = np.stack([hp[0] - win["cx"], hp[1] - win["cy"], hp[2] - win["cz"]])
            n2 = (sn * sn).sum(0)
            ninv = np.where(n2 > 0, 1.0 / np.sqrt(np.maximum(n2, 1e-300)), 0.0)
            is_tri = win["trif"] > 0.5
            nrm = np.stack([
                np.where(is_tri, win["nx"], sn[0] * ninv),
                np.where(is_tri, win["ny"], sn[1] * ninv),
                np.where(is_tri, win["nz"], sn[2] * ninv),
            ])
            dn = (d * nrm).sum(0)
            into = dn < 0
            sgn = np.where(into, 1.0, -1.0)
            nl = nrm * sgn
            emi = np.stack([win["er"], win["eg"], win["eb"]])
            rad = np.where(live, rad + tput * emi, rad)
            # u = 0 everywhere: diffuse -> nl; glass -> reflect * re/pp
            d_spec = d - 2.0 * dn * nrm
            ior = 1.5
            nnt = np.where(into, 1.0 / ior, ior)
            ddn = (d * nl).sum(0)
            cos2t = 1.0 - nnt * nnt * (1.0 - ddn * ddn)
            tir = cos2t < 0
            sqc = np.sqrt(np.maximum(cos2t, 0.0))
            coef = sgn * (ddn * nnt + sqc)
            tdir = d * nnt - nrm * coef
            tdir /= np.sqrt(np.maximum((tdir * tdir).sum(0), 1e-20))
            r0 = ((ior - 1.0) ** 2) / ((ior + 1.0) ** 2)
            cth = 1.0 - np.where(into, -ddn, (tdir * nrm).sum(0))
            re = r0 + (1.0 - r0) * cth**5
            pp_ = 0.25 + 0.5 * re
            rscale = np.where(tir, 1.0, re / pp_)  # pick_refl always
            new_d = np.where(w_diff, nl, d_spec)  # diffuse at u=0 is nl
            scl = np.where(w_refr, rscale, 1.0)
            alb = np.stack([win["ar"], win["ag"], win["ab"]])
            tput = np.where(live, tput * alb * scl, tput)
            if depth >= rr_depth:
                pmax = np.clip(np.maximum(np.maximum(tput[0], tput[1]), tput[2]),
                               0.1, 0.95)
                tput = tput / pmax  # survive always at u=0
                alive = live
            else:
                alive = live
            # mirror of the kernel's scale-aware offset
            # (shade.scaled_origin_offset): f32 math in f64 mirror
            off_s = np.maximum(
                np.float32(eps),
                np.float32(1e-6) * np.sqrt(win["r2"].astype(np.float32)),
            ).astype(np.float64)
            off = np.where(w_refr, 0.0, off_s)
            o = np.where(live, hp + nl * off, o)
            d = np.where(live, new_d, d)
        acc += rad / spp4
    return acc


@pytest.fixture(scope="module")
def setup():
    ms = _scene()
    planes, cb, sb, t24, mats, grid = mpt.mesh_pt_tables(
        ms, tris_per_chunk=8, supers_per=0
    )
    return ms, planes, cb, sb, t24, mats, grid


W = H = 32
SPP4 = 4
BOUNCES = 4
RR_DEPTH = 2


def _render(planes, cb, sb, t24, mats, grid, **kw):
    args = dict(
        width=W, height=H, spp4=SPP4, materials=mats,
        tris_per_chunk=grid.tris_per_chunk, supers_per=grid.supers_per,
        bounces=BOUNCES, rr_depth=RR_DEPTH, tile=1024, interpret=True,
    )
    args.update(kw)
    return np.asarray(
        mpt.render_pt_mesh_pallas(
            planes.astype(jnp.float32), cb, sb, t24, **args
        )
    )


def test_interpret_matches_u0_oracle_shallow(setup):
    """1 bounce: BITWISE-EXACT against the f64 oracle (measured max err
    0.0 — every f32 rounding in camera/intersection/emission lands on
    the same value); 2 bounces: <1e-6.  The strongest gate on the
    camera, both intersectors, the carrier plumbing and the emission
    path."""
    ms, planes, cb, sb, t24, mats, grid = setup
    for bounces, tol in ((1, 0.0), (2, 1e-6)):
        img = _render(planes, cb, sb, t24, mats, grid,
                      bounces=bounces, rr_depth=bounces)
        exp = _oracle_u0(ms, t24, mats, W, H, SPP4, bounces, bounces)
        err = np.abs(img - exp).max()
        assert err <= tol, (bounces, err)


def test_interpret_matches_u0_oracle_deep(setup):
    """4 bounces with RR: the f32 kernel's discrete hit decisions flip
    vs the f64 oracle on a small set of edge rays, and a flip is
    chaotic from then on (the documented multi-bounce property,
    BASELINE.md config-1 note) — gate the non-flipped fraction."""
    ms, planes, cb, sb, t24, mats, grid = setup
    img = _render(planes, cb, sb, t24, mats, grid)
    exp = _oracle_u0(ms, t24, mats, W, H, SPP4, BOUNCES, RR_DEPTH)
    assert np.isfinite(img).all()
    err = np.abs(img - exp)
    frac_close = (err.max(0) < 1e-3).mean()
    assert frac_close > 0.95, frac_close
    assert abs(np.median(img) - np.median(exp)) < 1e-3


def test_residencies_bitwise_equal(setup):
    ms, planes, cb, sb, t24, mats, grid = setup
    base = _render(planes, cb, sb, t24, mats, grid, residency="smem")
    for res in ("vmem", "hbm"):
        other = _render(planes, cb, sb, t24, mats, grid, residency=res)
        np.testing.assert_array_equal(base, other, err_msg=res)


def test_superchunk_gating_bitwise_equal(setup):
    ms = setup[0]
    flat = mpt.mesh_pt_tables(ms, tris_per_chunk=8, supers_per=0)
    gated = mpt.mesh_pt_tables(ms, tris_per_chunk=8, supers_per=8)
    img_flat = _render(*flat[:5], flat[5])
    img_gated = _render(*gated[:5], gated[5])
    np.testing.assert_array_equal(img_flat, img_gated)


def test_pack_mesh_for_pt_matches_attr_rows(setup):
    ms, _, _, _, _, _, grid = setup
    rows = mpt.pack_mesh_for_pt(grid, ms)
    assert rows.shape == (grid.tris.shape[0], mpt.TRI_PT_F)
    np.testing.assert_array_equal(rows[:, :13], grid.tris)
