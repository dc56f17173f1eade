"""BVH builder + stackless traversal tests: traversal must agree with
brute-force triangle intersection exactly (float64 for decision
stability)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ascendpathtracing_tpu.accel import bvh as bvh_mod
from ascendpathtracing_tpu.accel import meshes, tri


def _random_rays(n, rng, spread=4.0):
    o = rng.randn(n, 3) * spread
    d = rng.randn(n, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (
        (jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2])),
        (jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2])),
    )


def _brute(o3, d3, v, f, eps=1e-6):
    planes = tri.triangle_planes(v, f, dtype=np.float64)
    planes = tuple(tuple(jnp.asarray(p) for p in t) for t in planes)
    ts = tri.intersect_triangles_brute(o3, d3, *planes, eps)
    tmin = jnp.min(ts, axis=0)
    hit = jnp.argmin(ts, axis=0)
    return np.asarray(tmin), np.asarray(hit)


@pytest.mark.parametrize("mesh_fn,kwargs", [
    (meshes.cube, {}),
    (meshes.icosphere, {"subdivisions": 2}),
])
def test_bvh_structure_valid(mesh_fn, kwargs):
    v, f = mesh_fn(**kwargs)
    bvh = bvh_mod.build_bvh_numpy(v, f)
    m = bvh.n_nodes
    assert sorted(bvh.tri_order.tolist()) == list(range(len(f)))
    assert (bvh.miss > np.arange(m)).all(), "miss links must move forward"
    assert (bvh.miss <= m).all()
    leaves = bvh.count > 0
    assert bvh.count[leaves].sum() == len(f)
    assert (bvh.count[leaves] <= bvh.max_leaf).all()
    # bbox containment: each leaf's triangles inside its bbox
    tri_v = np.asarray(v)[np.asarray(f)]
    for i in np.nonzero(leaves)[0][:50]:
        ids = bvh.tri_order[bvh.first[i] : bvh.first[i] + bvh.count[i]]
        tv = tri_v[ids]
        assert (tv.min(axis=(0, 1)) >= bvh.bmin[i] - 1e-4).all()
        assert (tv.max(axis=(0, 1)) <= bvh.bmax[i] + 1e-4).all()


@pytest.mark.parametrize("mesh_fn,kwargs,n_rays", [
    (meshes.cube, {}, 512),
    (meshes.icosphere, {"subdivisions": 2}, 1024),
    (meshes.icosphere, {"subdivisions": 3}, 512),
])
def test_traversal_matches_brute_force(mesh_fn, kwargs, n_rays):
    rng = np.random.RandomState(0)
    v, f = mesh_fn(**kwargs)
    o3, d3 = _random_rays(n_rays, rng)
    bt, bh = _brute(o3, d3, v, f)

    bvh = bvh_mod.build_bvh_numpy(v, f)
    dev = bvh_mod.bvh_to_device(bvh, dtype=jnp.float64)
    planes = tri.triangle_planes(np.asarray(v), np.asarray(f), dtype=np.float64)
    # permute triangles into leaf order
    ordered = tuple(
        tuple(jnp.asarray(p[bvh.tri_order]) for p in t) for t in planes
    )
    tmin, hitid, miss = bvh_mod.intersect_bvh(
        o3, d3, dev, ordered, 1e-6, bvh.max_leaf
    )
    tmin = np.asarray(tmin)
    np.testing.assert_allclose(tmin, bt, rtol=1e-12, atol=1e-12)
    # hit ids map back through tri_order; compare original ids where hit
    hit_orig = bvh.tri_order[np.asarray(hitid)]
    hits = bt < 1e19
    # ids can differ only when two triangles tie at identical t (shared
    # edges); accept ties by comparing t values instead of ids there.
    same = hit_orig[hits] == bh[hits]
    assert same.mean() > 0.99
    assert (np.asarray(miss) == ~hits).all()


def test_bvh_vs_brute_inside_geometry():
    """Rays from inside the icosphere (all should hit)."""
    rng = np.random.RandomState(1)
    v, f = meshes.icosphere(radius=2.0, subdivisions=2)
    n = 256
    o = rng.randn(n, 3) * 0.1
    d = rng.randn(n, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o3 = tuple(jnp.asarray(o[:, i]) for i in range(3))
    d3 = tuple(jnp.asarray(d[:, i]) for i in range(3))
    bt, _ = _brute(o3, d3, v, f)
    assert (bt < 1e19).all()

    bvh = bvh_mod.build_bvh_numpy(v, f)
    dev = bvh_mod.bvh_to_device(bvh, dtype=jnp.float64)
    planes = tri.triangle_planes(np.asarray(v), np.asarray(f), dtype=np.float64)
    ordered = tuple(tuple(jnp.asarray(p[bvh.tri_order]) for p in t) for t in planes)
    tmin, _, miss = bvh_mod.intersect_bvh(o3, d3, dev, ordered, 1e-6, bvh.max_leaf)
    assert not np.asarray(miss).any()
    np.testing.assert_allclose(np.asarray(tmin), bt, rtol=1e-12)
