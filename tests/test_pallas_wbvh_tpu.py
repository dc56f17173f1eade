"""Chunked wide-BVH traversal — hardware-only tests (run with
``APT_TPU_TESTS=1 python -m pytest tests/ -q -k tpu`` on the bench
machine).  Interpret mode (tests/test_pallas_wbvh.py) checks the same
invariants but does NOT exercise Mosaic lowering, the SMEM scalar loads
with traced indices, or the real double-buffered HBM DMA — this does.
"""

import numpy as np
import pytest

import jax


def _tpu_available():
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False


pytestmark = pytest.mark.skipif(not _tpu_available(), reason="needs real TPU")


def _scene(subdivisions=3):
    from ascendpathtracing_tpu.accel import meshes

    v, f = meshes.icosphere(subdivisions=subdivisions)
    return np.asarray(v, np.float32), f


def _rays(n=8192, seed=1):
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    o = rng.randn(3, n).astype(np.float32)
    o /= np.linalg.norm(o, axis=0)
    o *= 3.0
    d = rng.randn(3, n).astype(np.float32)
    d /= np.linalg.norm(d, axis=0)
    return jnp.asarray(np.concatenate([o, d], 0))


def _brute(v32, f, rays):
    import jax.numpy as jnp

    from ascendpathtracing_tpu.accel import tri

    planes = tri.triangle_planes(v32, f, dtype=np.float32)
    ts = tri.intersect_triangles_brute(
        (rays[0], rays[1], rays[2]), (rays[3], rays[4], rays[5]),
        tuple(jnp.asarray(c) for c in planes[0]),
        tuple(jnp.asarray(c) for c in planes[1]),
        tuple(jnp.asarray(c) for c in planes[2]), 1e-4,
    )
    return np.asarray(jnp.min(ts, 0)), np.asarray(jnp.argmin(ts, 0))


@pytest.mark.parametrize("supers_per", [0, 4])
@pytest.mark.parametrize("residency", ["smem", "vmem", "hbm"])
def test_chunked_traversal_matches_brute_on_chip(supers_per, residency):
    from ascendpathtracing_tpu.ops import pallas_wbvh as W

    v32, f = _scene()
    rays = _rays()
    bt, bh = _brute(v32, f, rays)
    hitm = bt < 1e19
    assert hitm.any()

    grid = W.build_chunk_grid(v32, f, tris_per_chunk=32, supers_per=supers_per)
    cb, sb, t13, _ = W.chunk_grid_to_device(grid)
    tmin, hit = W.intersect_chunks_pallas(
        rays, cb, sb, t13, tris_per_chunk=32, supers_per=supers_per,
        tile=1024, residency=residency,
    )
    tmin = np.asarray(tmin)
    fids = grid.face_of_slot[np.asarray(hit)]
    np.testing.assert_array_equal(tmin >= 1e19, ~hitm)
    assert (fids[hitm] == bh[hitm]).all()
    np.testing.assert_allclose(tmin[hitm], bt[hitm], rtol=1e-4, atol=1e-5)


def test_attrs_carriers_on_chip():
    """attrs=True carriers (the gather-free shading path the mesh
    renderer rides) must report the winning face's attributes on real
    hardware."""
    import jax.numpy as jnp

    from ascendpathtracing_tpu.ops import pallas_wbvh as W

    v32, f = _scene()
    rays = _rays(4096)
    nf = f.shape[0]
    alb = np.stack([np.arange(nf), np.arange(nf) * 2, np.arange(nf) * 3],
                   1).astype(np.float64)
    emi = alb * 0.5
    mat = (np.arange(nf) % 3).astype(np.int32)

    grid = W.build_chunk_grid(v32, f, tris_per_chunk=32)
    cb, sb, _, _ = W.chunk_grid_to_device(grid)
    t24 = jnp.asarray(W.attr_triangle_rows(grid, alb, emi, mat))
    tmin, hit, attrs = W.intersect_chunks_pallas(
        rays, cb, sb, t24, tris_per_chunk=32, tile=1024, attrs=True,
    )
    hitm = np.asarray(tmin) < 1e19
    fids = grid.face_of_slot[np.asarray(hit)][hitm]
    got_alb = np.stack([np.asarray(a)[hitm] for a in attrs[3:6]], 1)
    np.testing.assert_allclose(got_alb, alb[fids], rtol=1e-6)
    got_diff = np.asarray(attrs[9])[hitm] > 0.5
    np.testing.assert_array_equal(got_diff, mat[fids] == 0)


def test_vmem_boxes_on_chip():
    from ascendpathtracing_tpu.ops import pallas_wbvh as W

    v32, f = _scene()
    rays = _rays(4096)
    bt, _ = _brute(v32, f, rays)

    grid = W.build_chunk_grid(v32, f, tris_per_chunk=32, supers_per=4)
    cb, sb, t13, _ = W.chunk_grid_to_device(grid)
    tmin, _ = W.intersect_chunks_pallas(
        rays, cb, sb, t13, tris_per_chunk=32, supers_per=4,
        tile=1024, residency="vmem", boxes_residency="vmem",
    )
    hitm = bt < 1e19
    tmin = np.asarray(tmin)
    np.testing.assert_array_equal(tmin >= 1e19, ~hitm)
    np.testing.assert_allclose(tmin[hitm], bt[hitm], rtol=1e-4, atol=1e-5)


def test_three_level_matches_brute_on_chip():
    """The r4 super-superchunk level through REAL Mosaic (the benches
    exercise subdiv 8; this pins a small forced-3-level config as a
    pytest gate): hits/tmin must match brute force and the 2-level run
    bitwise."""
    import jax.numpy as jnp

    from ascendpathtracing_tpu.ops import pallas_wbvh as W

    v32, f = _scene()
    rays = _rays()
    bt, bh = _brute(v32, f, rays)
    hitm = bt < 1e19

    g2 = W.build_chunk_grid(v32, f, tris_per_chunk=8, supers_per=4)
    g3 = W.build_chunk_grid(v32, f, tris_per_chunk=8, supers_per=4,
                            supers2_per=4)
    assert g3.n_supers2 > 0

    t2 = W.intersect_chunks_pallas(
        rays, jnp.asarray(g2.cboxes), jnp.asarray(g2.sboxes),
        jnp.asarray(g2.tris), tris_per_chunk=8, supers_per=4, tile=1024,
    )
    t3 = W.intersect_chunks_pallas(
        rays, jnp.asarray(g3.cboxes), jnp.asarray(g3.sboxes),
        jnp.asarray(g3.tris), jnp.asarray(g3.ssboxes),
        tris_per_chunk=8, supers_per=4, supers2_per=4, tile=1024,
    )
    tmin2, tmin3 = np.asarray(t2[0]), np.asarray(t3[0])
    f2 = g2.face_of_slot[np.asarray(t2[1])]
    f3 = g3.face_of_slot[np.asarray(t3[1])]
    np.testing.assert_array_equal(tmin2, tmin3)
    np.testing.assert_array_equal(
        np.where(tmin2 < 1e19, f2, -1), np.where(tmin3 < 1e19, f3, -1)
    )
    np.testing.assert_array_equal(tmin3 >= 1e19, ~hitm)
    assert (f3[hitm] == bh[hitm]).all()
