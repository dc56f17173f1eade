"""Pallas stackless-BVH traversal: interpret-mode equality with the jnp
while_loop traversal (hardware timing covered by scripts/bench)."""

import jax.numpy as jnp
import numpy as np

from ascendpathtracing_tpu.accel import bvh as bvh_mod, meshes, tri
from ascendpathtracing_tpu.ops import pallas_bvh


def test_pallas_traversal_matches_jnp():
    rng = np.random.RandomState(0)
    v, f = meshes.icosphere(subdivisions=2)
    v32 = np.asarray(v, np.float32)
    bvh = bvh_mod.build_bvh_numpy(v32, f)
    planes = tri.triangle_planes(v32, f, dtype=np.float32)
    ordered = tuple(tuple(p[bvh.tri_order] for p in t) for t in planes)
    nodesf, nodesi, tris9 = pallas_bvh.pack_bvh_for_pallas(bvh, ordered)

    n = 2048
    o = (rng.randn(n, 3) * 3).astype(np.float32)
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rp = jnp.asarray(np.concatenate([o, d], 1).T.copy())
    t_p, h_p = pallas_bvh.intersect_bvh_pallas(
        rp, nodesf, nodesi, tris9, max_leaf=bvh.max_leaf, eps=1e-5,
        tile=1024, interpret=True,
    )

    o3 = tuple(jnp.asarray(o[:, i]) for i in range(3))
    d3 = tuple(jnp.asarray(d[:, i]) for i in range(3))
    dev = bvh_mod.bvh_to_device(bvh, dtype=jnp.float32)
    ojn = tuple(tuple(jnp.asarray(p) for p in t) for t in ordered)
    t_j, h_j, _ = bvh_mod.intersect_bvh(o3, d3, dev, ojn, 1e-5, bvh.max_leaf)

    np.testing.assert_array_equal(np.asarray(t_p), np.asarray(t_j))
    hits = np.asarray(t_j) < 1e19
    assert (np.asarray(h_p)[hits] == np.asarray(h_j)[hits]).all()


def test_mesh_hit_sorted_equals_unsorted():
    """Morton-sorting rays before the lockstep kernel must not change any
    per-ray result (traversal is per-lane exact; sorting only regroups
    tiles). Exercises the scatter-back path in models/mesh._mesh_hit."""
    from ascendpathtracing_tpu.models import mesh as mesh_mod

    rng = np.random.RandomState(1)
    v, f = meshes.icosphere(subdivisions=2)
    ms = mesh_mod.MeshScene.cornell_with_mesh(v * 10 + 50, f)
    dev = mesh_mod.mesh_scene_to_device(ms, pallas_bvh_kernel=True)

    n = 4096
    o = (rng.randn(n, 3) * 20 + 50).astype(np.float32)
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o3 = tuple(jnp.asarray(o[:, i]) for i in range(3))
    d3 = tuple(jnp.asarray(d[:, i]) for i in range(3))

    saved = mesh_mod._SORT_MIN_N
    mesh_mod._SORT_MIN_N = 0  # force the sort path at test-size n
    try:
        t_s, h_s, m_s, _ = mesh_mod._mesh_hit(
            o3, d3, dev, 1e-4, dev["static"], sort=True
        )
    finally:
        mesh_mod._SORT_MIN_N = saved
    t_u, h_u, m_u, _ = mesh_mod._mesh_hit(o3, d3, dev, 1e-4, dev["static"], sort=False)
    np.testing.assert_array_equal(np.asarray(t_s), np.asarray(t_u))
    np.testing.assert_array_equal(np.asarray(m_s), np.asarray(m_u))
    hits = np.asarray(t_u) < 1e19
    assert (np.asarray(h_s)[hits] == np.asarray(h_u)[hits]).all()
