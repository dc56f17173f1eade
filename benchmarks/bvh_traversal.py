"""BVH traversal micro-benchmark: coherent vs incoherent vs Morton-sorted.

The lockstep traversal kernel's cost is the union of nodes a tile's rays
visit (ops/pallas_bvh.py), so throughput is coherence-bound.  This
measures all three regimes on whatever device JAX finds and prints one
JSON line per regime.

Usage: python benchmarks/bvh_traversal.py [--rays N] [--subdiv K] [--tile T]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None) -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    p = argparse.ArgumentParser()
    p.add_argument("--rays", type=int, default=1 << 20)
    p.add_argument("--subdiv", type=int, default=3, help="icosphere subdivisions")
    # 4096 measured best-balanced on v5e with fat leaves (max_leaf=64):
    # smaller tiles shrink the per-tile node union, larger ones amortize
    # the per-node-step scalar walk over lanes.
    p.add_argument("--tile", type=int, default=4096)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--max-leaf", type=int, default=64)
    p.add_argument("--jump-every", type=int, default=8)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ascendpathtracing_tpu.accel import bvh as bvh_mod
    from ascendpathtracing_tpu.accel import meshes, tri
    from ascendpathtracing_tpu.ops import pallas_bvh, sort as rs

    v, f = meshes.icosphere(radius=1.0, subdivisions=args.subdiv)
    v32 = np.asarray(v, np.float32)
    bvh = bvh_mod.build_bvh(v32, f, max_leaf=args.max_leaf)
    planes = tri.triangle_planes(v32, f, dtype=np.float32)
    ordered = tuple(
        tuple(np.asarray(c)[bvh.tri_order] for c in plane) for plane in planes
    )
    nodesf, nodesi, tris9 = pallas_bvh.pack_bvh_for_pallas(bvh, ordered)

    n = args.rays
    rng = np.random.RandomState(0)

    # coherent: camera-style bundle from one point toward the sphere
    t_ = rng.rand(2, n).astype(np.float32)
    du = (t_[0] - 0.5) * 0.8
    dv = (t_[1] - 0.5) * 0.8
    d = np.stack([du, dv, -np.ones(n, np.float32)], 0)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    o = np.tile(np.array([[0.0], [0.0], [4.0]], np.float32), (1, n))
    coherent = (o.copy(), d.astype(np.float32))

    # incoherent: random origins on a shell, random directions
    o2 = rng.randn(3, n).astype(np.float32)
    o2 /= np.linalg.norm(o2, axis=0, keepdims=True)
    o2 *= 3.0
    d2 = rng.randn(3, n).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=0, keepdims=True)
    incoherent = (o2, d2)

    lo = np.asarray(v32.min(0), np.float32)
    hi = np.asarray(v32.max(0), np.float32)

    def run(o3, d3, label, sort):
        rays = jnp.asarray(np.concatenate([o3, d3], 0))
        if sort:
            os_, ds_, _ = rs.sort_rays_for_traversal(
                (rays[0], rays[1], rays[2]), (rays[3], rays[4], rays[5]),
                jnp.asarray(lo), jnp.asarray(hi),
            )
            rays = jnp.stack(list(os_) + list(ds_), 0)

        @jax.jit
        def step(r):
            return pallas_bvh.intersect_bvh_pallas(
                r, nodesf, nodesi, tris9, max_leaf=args.max_leaf,
                tile=args.tile, jump_every=args.jump_every,
            )

        out = step(rays)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = step(rays)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        hit_frac = float(jnp.mean((out[0] < 1e19).astype(jnp.float32)))
        print(json.dumps({
            "metric": f"BVH traversal Mrays/s ({label})",
            "value": round(n / dt / 1e6, 2),
            "unit": "Mrays/s",
            "detail": {
                "backend": jax.default_backend(), "tris": int(bvh.n_tris),
                "nodes": int(bvh.n_nodes), "ms": round(dt * 1e3, 3),
                "hit_frac": round(hit_frac, 4), "tile": args.tile,
            },
        }))

    run(*coherent, "coherent camera bundle", sort=False)
    run(*coherent, "coherent + morton sort", sort=True)
    run(*incoherent, "incoherent", sort=False)
    run(*incoherent, "incoherent + morton sort", sort=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
