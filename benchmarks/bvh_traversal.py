"""BVH traversal micro-benchmark: lockstep vs chunked kernel, sort modes.

Two Pallas traversal kernels exist:
  - ``lockstep``: skip-cursor walk over a deep binary BVH
    (ops/pallas_bvh.py) — per-node scalar-core overhead, fat leaves.
  - ``chunks``: wide-node chunk grid with scalar-core compaction
    (ops/pallas_wbvh.py) — straight-line vector slab tests, one
    vector->scalar sync, tri tests only for listed chunks; superchunk
    gating (``--supers-per``) and HBM-DMA residency for large scenes.

Both are coherence-bound (cost = union of work a tile's rays need), so
each case is measured raw and ray-sorted.  Sorted rows REPORT THE SORT
COST SEPARATELY (``sort_ms`` in the detail; the headline value excludes
it — a renderer reusing one sort across bounces amortizes it, so neither
including nor excluding is universally honest; both numbers are there).

Every (kernel, case) row cross-checks a 512-ray subsample against the
float64 brute-force oracle IN-RUN (``oracle_ok``/``oracle_max_err``),
so a number from a silently-broken traversal cannot be reported.

Timing uses utils/profiling.benchmark_fit: batches of k and 3k
dispatches, slope = per-step time with fixed dispatch overhead fitted
out, repeated until two consecutive slopes agree within 5%.

Usage: python benchmarks/bvh_traversal.py [--rays N] [--subdiv K]
       [--kernels lockstep,chunks] [--iters I] [--supers-per S|auto]
       [--residency auto|smem|vmem|hbm]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None) -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    p = argparse.ArgumentParser()
    p.add_argument("--rays", type=int, default=1 << 20)
    p.add_argument("--subdiv", type=int, default=3,
                   help="icosphere subdivisions (tris = 20*4^s: 3 -> 1280, "
                   "5 -> 20480, 6 -> 81920, 7 -> 327680)")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--kernels", default="lockstep,chunks")
    # lockstep tuning (fat leaves, measured on v5e)
    p.add_argument("--tile", type=int, default=4096)
    p.add_argument("--max-leaf", type=int, default=64)
    p.add_argument("--jump-every", type=int, default=8)
    # chunked tuning (defaults match models/mesh.py's auto choices)
    p.add_argument("--chunk-tris", type=int, default=16)
    p.add_argument("--chunk-tile", type=int, default=1024)
    p.add_argument("--supers-per", default="auto",
                   help="superchunk group size; 'auto' = 16 once the "
                   "chunk count reaches 128 (the models/mesh.py and "
                   "mesh_pt_tables production rule), 0 disables")
    p.add_argument("--supers2-per", default="auto",
                   help="super-superchunk group size (third level); "
                   "'auto' = 16 once the super count reaches 256 "
                   "(mesh_pt_tables rule), 0 disables")
    p.add_argument("--residency", default="auto",
                   choices=["auto", "smem", "vmem", "hbm"])
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ascendpathtracing_tpu.accel import bvh as bvh_mod
    from ascendpathtracing_tpu.accel import meshes, tri
    from ascendpathtracing_tpu.ops import pallas_bvh, pallas_wbvh, sort as rs
    from ascendpathtracing_tpu.utils import profiling

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

    # ---- the in-run correctness oracle (512-ray f64 subsample) --------
    sub_idx = rng.choice(n, size=512, replace=False)
    tri64 = v.astype(np.float64)[np.asarray(f)]

    def oracle_check(rays_np, tmin_np, face_np):
        """Brute-force f64 Moller-style hit for the subsample; returns
        (ok, max_rel_err) on shared hits and set equality.  Chunked over
        FACES with a running (min, argmin) carrier: the unchunked form
        materialized an [F, 3, 512] f64 temp — 16 GB at subdiv 8."""
        o_s = rays_np[0:3, sub_idx].astype(np.float64)
        d_s = rays_np[3:6, sub_idx].astype(np.float64)
        n_sub = o_s.shape[1]
        bt = np.full((n_sub,), 1e20)
        bh = np.zeros((n_sub,), np.int64)
        FB = 65536
        for f0 in range(0, tri64.shape[0], FB):
            tb = tri64[f0 : f0 + FB]
            v0 = tb[:, 0][:, :, None]
            nrm = np.cross(tb[:, 1] - tb[:, 0], tb[:, 2] - tb[:, 0])
            with np.errstate(divide="ignore", invalid="ignore"):
                nd = np.einsum("fk,kn->fn", nrm, d_s)
                no = np.einsum("fk,kn->fn", nrm, o_s)
                d0 = np.einsum("fk,fk->f", nrm, tb[:, 0])
                t = (d0[:, None] - no) / nd
                w = (o_s[None] - v0) + t[:, None, :] * d_s[None]
                # barycentric via the same s1/s2 axes the kernels use
                e2xn = np.cross(tb[:, 2] - tb[:, 0], nrm)
                e1xn = np.cross(tb[:, 1] - tb[:, 0], nrm)
                den1 = np.einsum("fk,fk->f", tb[:, 1] - tb[:, 0], e2xn)
                den2 = np.einsum("fk,fk->f", tb[:, 2] - tb[:, 0], e1xn)
                s1 = e2xn / np.where(den1 == 0, 1, den1)[:, None]
                s2 = e1xn / np.where(den2 == 0, 1, den2)[:, None]
                uu = np.einsum("fk,fkn->fn", s1, w)
                vv = np.einsum("fk,fkn->fn", s2, w)
                ok = (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & (t > 1e-4)
                t = np.where(ok, t, 1e20)
            bt_b = t.min(0)
            bh_b = t.argmin(0) + f0
            better = bt_b < bt
            bt = np.where(better, bt_b, bt)
            bh = np.where(better, bh_b, bh)
        kt = tmin_np[sub_idx]
        hitm = bt < 1e19
        same_set = bool(((kt >= 1e19) == ~hitm).all())
        if not hitm.any():
            return same_set, 0.0
        rel = np.abs(kt[hitm] - bt[hitm]) / np.maximum(bt[hitm], 1e-9)
        faces_ok = True
        if face_np is not None:
            faces_ok = bool((face_np[sub_idx][hitm] == bh[hitm]).all())
        return same_set and faces_ok and float(rel.max()) < 1e-3, float(rel.max())

    def bench(step, rays, label, detail, rays_np, face_of=None, sort_ms=None):
        out = step(rays)
        tmin_np = np.asarray(out[0])
        face_np = None
        if face_of is not None:
            face_np = face_of[np.asarray(out[1])]
        ok, maxrel = oracle_check(rays_np, tmin_np, face_np)
        fit = profiling.benchmark_fit(lambda i: step(rays), iters=args.iters)
        dt = fit["step_s"]
        hit_frac = float((tmin_np < 1e19).mean())
        d = {
            "backend": jax.default_backend(),
            "ms": round(dt * 1e3, 3), "hit_frac": round(hit_frac, 4),
            "oracle_ok": ok, "oracle_max_rel": round(maxrel, 8),
            "overhead_ms": round(fit["overhead_s"] * 1e3, 2),
            "fit_rel_spread": (round(fit["rel_spread"], 4)
                               if fit["rel_spread"] is not None else None),
            "fit_ok": fit["fit_ok"],
            **detail,
        }
        if sort_ms is not None:
            d["sort_ms"] = round(sort_ms, 3)
            d["mrays_incl_sort"] = round(n / (dt + sort_ms / 1e3) / 1e6, 2)
        print(json.dumps({
            "metric": f"BVH traversal Mrays/s ({label})",
            "value": round(n / dt / 1e6, 2),
            "unit": "Mrays/s",
            "detail": d,
        }), flush=True)

    cases = [("coherent", jnp.asarray(coherent)),
             ("incoherent", jnp.asarray(incoherent))]
    sort_fit = None
    sorted_cases = []
    for nm, r in cases:
        rs_sorted = sort6(r)
        profiling.device_fence(rs_sorted)
        if sort_fit is None:
            sort_fit = profiling.benchmark_fit(lambda i: sort6(r), iters=4)
        sorted_cases.append((f"{nm} + 6d sort", rs_sorted))
    sort_ms = sort_fit["step_s"] * 1e3

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
        lock_face = np.asarray(bvh.tri_order, np.int64)
        for (nm, r), (rnp, sms) in zip(
            cases + sorted_cases,
            [(coherent, None), (incoherent, None),
             (np.asarray(sorted_cases[0][1]), sort_ms),
             (np.asarray(sorted_cases[1][1]), sort_ms)],
        ):
            bench(step_lock, r, f"lockstep, {nm}", det, rnp,
                  face_of=lock_face, sort_ms=sms)

    if "chunks" in kernels:
        if args.supers_per == "auto":
            # same rule as the production default (models/mesh.py and
            # pallas_mesh_pt.mesh_pt_tables): 16 once chunks reach 128
            n_ch_est = -(-f.shape[0] // args.chunk_tris)
            supers_per = 16 if n_ch_est >= 128 else 0
        else:
            supers_per = int(args.supers_per)
        if args.supers2_per == "auto":
            # third level once the super count reaches 256 (the
            # mesh_pt_tables rule) — carries phase A past ~1M tris
            n_s_est = (-(-(-(-f.shape[0] // args.chunk_tris)) //
                         supers_per) if supers_per else 0)
            supers2_per = 16 if n_s_est >= 256 else 0
        else:
            supers2_per = int(args.supers2_per)
        grid = pallas_wbvh.build_chunk_grid(
            v32, f, tris_per_chunk=args.chunk_tris, supers_per=supers_per,
            supers2_per=supers2_per,
        )
        cb, sb, t13, _fos = pallas_wbvh.chunk_grid_to_device(grid)
        ssb = jnp.asarray(grid.ssboxes) if grid.n_supers2 else None

        @jax.jit
        def step_chunks(r):
            return pallas_wbvh.intersect_chunks_pallas(
                r, cb, sb, t13, ssb, tris_per_chunk=args.chunk_tris,
                supers_per=grid.supers_per, supers2_per=grid.supers2_per,
                tile=args.chunk_tile, residency=args.residency,
            )

        det = {"kernel": "chunks", "tris": int(f.shape[0]),
               "chunks": grid.n_chunks, "supers": grid.n_supers,
               "supers2": grid.n_supers2,
               "tile": args.chunk_tile, "residency": args.residency}
        for (nm, r), (rnp, sms) in zip(
            cases + sorted_cases,
            [(coherent, None), (incoherent, None),
             (np.asarray(sorted_cases[0][1]), sort_ms),
             (np.asarray(sorted_cases[1][1]), sort_ms)],
        ):
            bench(step_chunks, r, f"chunks, {nm}", det, rnp,
                  face_of=grid.face_of_slot, sort_ms=sms)

    return 0


if __name__ == "__main__":
    sys.exit(main())
