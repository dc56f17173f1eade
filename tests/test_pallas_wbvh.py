"""Chunked wide-BVH traversal (ops/pallas_wbvh.py): builder invariants
and interpret-mode agreement with the brute-force oracle across every
residency mode (SMEM / VMEM / HBM-streamed) and both phase-A levels.
Hardware timing is covered by benchmarks/bvh_traversal.py."""

import jax.numpy as jnp
import numpy as np
import pytest

from ascendpathtracing_tpu.accel import meshes, tri
from ascendpathtracing_tpu.ops import pallas_wbvh as W


def _scene():
    v, f = meshes.icosphere(subdivisions=2)
    return np.asarray(v, np.float32), f


def _rays(n=2048, seed=1):
    rng = np.random.RandomState(seed)
    o = rng.randn(3, n).astype(np.float32)
    o /= np.linalg.norm(o, axis=0)
    o *= 3.0
    d = rng.randn(3, n).astype(np.float32)
    d /= np.linalg.norm(d, axis=0)
    return jnp.asarray(np.concatenate([o, d], 0))


def _brute(v32, f, rays):
    planes = tri.triangle_planes(v32, f, dtype=np.float32)
    ts = tri.intersect_triangles_brute(
        (rays[0], rays[1], rays[2]), (rays[3], rays[4], rays[5]),
        tuple(jnp.asarray(c) for c in planes[0]),
        tuple(jnp.asarray(c) for c in planes[1]),
        tuple(jnp.asarray(c) for c in planes[2]), 1e-4,
    )
    return np.asarray(jnp.min(ts, 0)), np.asarray(jnp.argmin(ts, 0))


def test_builder_partition_invariants():
    v32, f = _scene()
    grid = W.build_chunk_grid(v32, f, tris_per_chunk=16, supers_per=4)
    # every face appears exactly once among live slots
    live = grid.face_of_slot[grid.face_of_slot >= 0]
    assert sorted(live.tolist()) == list(range(f.shape[0]))
    # chunk boxes contain their triangles
    tri_v = v32[np.asarray(f)]
    T = grid.tris_per_chunk
    for ci in range(grid.n_chunks):
        ids = grid.face_of_slot[ci * T : (ci + 1) * T]
        ids = ids[ids >= 0]
        if ids.size == 0:
            continue
        pts = tri_v[ids].reshape(-1, 3)
        assert (pts.min(0) >= grid.cboxes[ci, 0:3] - 1e-5).all()
        assert (pts.max(0) <= grid.cboxes[ci, 3:6] + 1e-5).all()
    # superchunk boxes contain their chunks
    S = grid.supers_per
    for si in range(grid.n_supers):
        grp = grid.cboxes[si * S : (si + 1) * S]
        real = grp[:, 0] <= grp[:, 3]
        if real.any():
            assert (grp[real, 0:3].min(0) >= grid.sboxes[si, 0:3] - 1e-6).all()
            assert (grp[real, 3:6].max(0) <= grid.sboxes[si, 3:6] + 1e-6).all()


def test_permute_face_attrib_roundtrip():
    v32, f = _scene()
    grid = W.build_chunk_grid(v32, f, tris_per_chunk=16)
    attr = np.arange(f.shape[0] * 3, dtype=np.float32).reshape(-1, 3)
    slot_attr = W.permute_face_attrib(grid, attr, pad_value=-1.0)
    live = grid.face_of_slot >= 0
    np.testing.assert_array_equal(slot_attr[live], attr[grid.face_of_slot[live]])
    assert (slot_attr[~live] == -1.0).all()


@pytest.mark.parametrize("supers_per", [0, 4])
@pytest.mark.parametrize("residency", ["smem", "vmem", "hbm"])
def test_chunked_traversal_matches_brute(supers_per, residency):
    v32, f = _scene()
    rays = _rays()
    bt, bh = _brute(v32, f, rays)
    hitm = bt < 1e19

    grid = W.build_chunk_grid(v32, f, tris_per_chunk=32, supers_per=supers_per)
    cb, sb, t13, _ = W.chunk_grid_to_device(grid)
    tmin, hit = W.intersect_chunks_pallas(
        rays, cb, sb, t13, tris_per_chunk=32, supers_per=supers_per,
        tile=1024, residency=residency, interpret=True,
    )
    tmin = np.asarray(tmin)
    fids = grid.face_of_slot[np.asarray(hit)]

    # same hit/miss set; same winning face; t equal to the brute-force
    # Moller-Trumbore t up to the f32 noise of the precomputed-plane form
    np.testing.assert_array_equal(tmin >= 1e19, ~hitm)
    assert (fids[hitm] == bh[hitm]).all()
    np.testing.assert_allclose(tmin[hitm], bt[hitm], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("supers_per", [0, 4])
def test_vmem_boxes_path_matches_brute(supers_per):
    """boxes_residency='vmem' forces the [*, 6]-VMEM box reads with
    traced row indices (the >21k-chunk large-scene path, normally
    unreachable from small scenes) — must agree with brute force like
    the SMEM-flat path does."""
    v32, f = _scene()
    rays = _rays()
    bt, bh = _brute(v32, f, rays)
    hitm = bt < 1e19

    grid = W.build_chunk_grid(v32, f, tris_per_chunk=32, supers_per=supers_per)
    cb, sb, t13, _ = W.chunk_grid_to_device(grid)
    tmin, hit = W.intersect_chunks_pallas(
        rays, cb, sb, t13, tris_per_chunk=32, supers_per=supers_per,
        tile=1024, residency="vmem", boxes_residency="vmem", interpret=True,
    )
    tmin = np.asarray(tmin)
    fids = grid.face_of_slot[np.asarray(hit)]
    np.testing.assert_array_equal(tmin >= 1e19, ~hitm)
    assert (fids[hitm] == bh[hitm]).all()
    np.testing.assert_allclose(tmin[hitm], bt[hitm], rtol=1e-4, atol=1e-5)


def test_ray_sort_keys_6d_groups_direction():
    # rays at one origin with two opposite directions must sort into two
    # contiguous groups (the octant key would too); rays with slightly
    # different directions in the same octant must still subgroup
    from ascendpathtracing_tpu.ops import sort as rs

    n = 256
    rng = np.random.RandomState(0)
    o = tuple(jnp.zeros((n,), jnp.float32) for _ in range(3))
    half = n // 2
    dx = np.where(np.arange(n) < half, 1.0, -1.0).astype(np.float32)
    dy = (rng.rand(n) * 0.1).astype(np.float32)
    d = (jnp.asarray(dx), jnp.asarray(dy), jnp.zeros((n,), jnp.float32))
    lo = jnp.asarray([-1.0, -1.0, -1.0])
    hi = jnp.asarray([1.0, 1.0, 1.0])
    keys = np.asarray(rs.ray_sort_keys_6d(o, d, lo, hi))
    assert keys[:half].max() != keys[half:].max()
    order = np.argsort(keys)
    groups = (np.arange(n)[order] < half)
    # one transition between the two direction groups
    assert np.abs(np.diff(groups.astype(int))).sum() == 1


def test_three_level_matches_flat_and_builder_invariants():
    """The super-superchunk third level (VERDICT r3 ask 2) must be a
    pure phase-A optimization: first-hit FACES and tmin identical to the
    flat scan, and the builder's ss grouping covers every live slot."""
    v, f = meshes.icosphere(subdivisions=3)  # 1280 tris
    v32 = np.asarray(v, np.float32)
    rays = _rays(1024)
    g_flat = W.build_chunk_grid(v32, f, tris_per_chunk=8, supers_per=0)
    g3 = W.build_chunk_grid(v32, f, tris_per_chunk=8, supers_per=4,
                            supers2_per=4)
    assert g3.n_supers2 == -(-g3.n_supers // 4)
    assert g3.n_chunks == g3.n_supers * 4
    live = g3.face_of_slot[g3.face_of_slot >= 0]
    assert sorted(live.tolist()) == list(range(f.shape[0]))

    outs = []
    for g in (g_flat, g3):
        tmin, hit = W.intersect_chunks_pallas(
            rays, jnp.asarray(g.cboxes), jnp.asarray(g.sboxes),
            jnp.asarray(g.tris),
            jnp.asarray(g.ssboxes) if g.n_supers2 else None,
            tris_per_chunk=8, supers_per=g.supers_per,
            supers2_per=g.supers2_per, tile=1024, interpret=True,
        )
        tmin = np.asarray(tmin)
        face = np.where(tmin < 1e19, g.face_of_slot[np.asarray(hit)], -1)
        outs.append((tmin, face))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])


def test_three_level_ragged_ss_padding():
    """A super count NOT divisible by supers2_per exercises the builder's
    inverted-box padding of sboxes AND the chunk/tris extension."""
    v, f = meshes.icosphere(subdivisions=2)  # 320 tris
    v32 = np.asarray(v, np.float32)
    g = W.build_chunk_grid(v32, f, tris_per_chunk=8, supers_per=4,
                           supers2_per=8)
    # supers padded to a multiple of 8; chunks/tris extended to match
    assert g.n_supers % 8 == 0
    assert g.n_chunks == g.n_supers * 4
    assert g.tris.shape[0] == g.n_chunks * 8
    rays = _rays(1024)
    tmin3, hit3 = W.intersect_chunks_pallas(
        rays, jnp.asarray(g.cboxes), jnp.asarray(g.sboxes),
        jnp.asarray(g.tris), jnp.asarray(g.ssboxes),
        tris_per_chunk=8, supers_per=4, supers2_per=8, tile=1024,
        interpret=True,
    )
    bt, _ = _brute(v32, f, rays)
    tmin3 = np.asarray(tmin3)
    hitm = bt < 1e19
    assert ((tmin3 >= 1e19) == ~hitm).all()
    if hitm.any():
        assert np.abs(tmin3[hitm] - bt[hitm]).max() < 1e-3
