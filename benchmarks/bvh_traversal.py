"""BVH traversal micro-benchmark: lockstep vs chunked kernel, sort modes.

Two Pallas traversal kernels exist:
  - ``lockstep``: skip-cursor walk over a deep binary BVH
    (ops/pallas_bvh.py) — per-node scalar-core overhead, fat leaves.
  - ``chunks``: wide-node chunk grid with scalar-core compaction
    (ops/pallas_wbvh.py) — straight-line vector slab tests, one
    vector->scalar sync, tri tests only for listed chunks.

Both are coherence-bound (cost = union of work a tile's rays need), so
each case is measured raw and ray-sorted.  Prints one JSON line per
(kernel, case).

Usage: python benchmarks/bvh_traversal.py [--rays N] [--subdiv K]
       [--kernels lockstep,chunks] [--iters I]
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
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--kernels", default="lockstep,chunks")
    # lockstep tuning (fat leaves, measured on v5e)
    p.add_argument("--tile", type=int, default=4096)
    p.add_argument("--max-leaf", type=int, default=64)
    p.add_argument("--jump-every", type=int, default=8)
    # chunked tuning (see the round-2 scan in BASELINE.md)
    p.add_argument("--chunk-tris", type=int, default=16)
    p.add_argument("--chunk-tile", type=int, default=1024)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ascendpathtracing_tpu.accel import bvh as bvh_mod
    from ascendpathtracing_tpu.accel import meshes, tri
    from ascendpathtracing_tpu.ops import pallas_bvh, pallas_wbvh, sort as rs

    v, f = meshes.icosphere(radius=1.0, subdivisions=args.subdiv)
    v32 = np.asarray(v, np.float32)

    n = args.rays
    rng = np.random.RandomState(0)

    # coherent: camera-style bundle from one point toward the sphere
    t_ = rng.rand(2, n).astype(np.float32)
    du = (t_[0] - 0.5) * 0.8
    dv = (t_[1] - 0.5) * 0.8
    d = np.stack([du, dv, -np.ones(n, np.float32)], 0)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    o = np.tile(np.array([[0.0], [0.0], [4.0]], np.float32), (1, n))
    coherent = np.concatenate([o, d], 0)

    # incoherent: random origins on a shell, random directions
    o2 = rng.randn(3, n).astype(np.float32)
    o2 /= np.linalg.norm(o2, axis=0, keepdims=True)
    o2 *= 3.0
    d2 = rng.randn(3, n).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=0, keepdims=True)
    incoherent = np.concatenate([o2, d2], 0)

    lo = jnp.asarray(v32.min(0))
    hi = jnp.asarray(v32.max(0))

    @jax.jit
    def sort6(r):
        keys = rs.ray_sort_keys_6d((r[0], r[1], r[2]), (r[3], r[4], r[5]), lo, hi)
        out = jax.lax.sort((keys, r[0], r[1], r[2], r[3], r[4], r[5]), num_keys=1)
        return jnp.stack(out[1:], 0)

    from ascendpathtracing_tpu.utils import profiling

    def bench(step, rays, label, detail):
        # fetch-fenced timing: block_until_ready is a no-op on tunneled
        # TPUs (utils/profiling.py docstring)
        out = step(rays)
        profiling.device_fence(out)
        rtt = profiling.fetch_rtt()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = step(rays)
        profiling.device_fence(out)
        dt = max(time.perf_counter() - t0 - rtt, 1e-9) / args.iters
        hit_frac = float(jnp.mean((out[0] < 1e19).astype(jnp.float32)))
        print(json.dumps({
            "metric": f"BVH traversal Mrays/s ({label})",
            "value": round(n / dt / 1e6, 2),
            "unit": "Mrays/s",
            "detail": {
                "backend": jax.default_backend(),
                "ms": round(dt * 1e3, 3), "hit_frac": round(hit_frac, 4),
                **detail,
            },
        }), flush=True)

    cases = [("coherent", jnp.asarray(coherent)), ("incoherent", jnp.asarray(incoherent))]
    sorted_cases = [(f"{nm} + 6d sort", jax.block_until_ready(sort6(r)))
                    for nm, r in cases]

    kernels = args.kernels.split(",")
    if "lockstep" in kernels:
        bvh = bvh_mod.build_bvh(v32, f, max_leaf=args.max_leaf)
        planes = tri.triangle_planes(v32, f, dtype=np.float32)
        ordered = tuple(
            tuple(np.asarray(c)[bvh.tri_order] for c in plane) for plane in planes
        )
        nodesf, nodesi, tris9 = pallas_bvh.pack_bvh_for_pallas(bvh, ordered)

        @jax.jit
        def step_lock(r):
            return pallas_bvh.intersect_bvh_pallas(
                r, nodesf, nodesi, tris9, max_leaf=args.max_leaf,
                tile=args.tile, jump_every=args.jump_every,
            )

        det = {"kernel": "lockstep", "tris": int(bvh.n_tris),
               "nodes": int(bvh.n_nodes), "tile": args.tile}
        for nm, r in cases + sorted_cases:
            bench(step_lock, r, f"lockstep, {nm}", det)

    if "chunks" in kernels:
        grid = pallas_wbvh.build_chunk_grid(v32, f, tris_per_chunk=args.chunk_tris)
        cb, sb, t13, _fos = pallas_wbvh.chunk_grid_to_device(grid)

        @jax.jit
        def step_chunks(r):
            return pallas_wbvh.intersect_chunks_pallas(
                r, cb, sb, t13, tris_per_chunk=args.chunk_tris,
                supers_per=grid.supers_per, tile=args.chunk_tile,
            )

        det = {"kernel": "chunks", "tris": int(f.shape[0]),
               "chunks": grid.n_chunks, "tile": args.chunk_tile}
        for nm, r in cases + sorted_cases:
            bench(step_chunks, r, f"chunks, {nm}", det)

    return 0


if __name__ == "__main__":
    sys.exit(main())
