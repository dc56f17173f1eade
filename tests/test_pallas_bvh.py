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
