"""Per-face slot-gradient scatter strategies, measured on REAL replay
residuals (VERDICT r4 ask 2 / missing #2).

The fused mesh backward (diff/mesh_fused.replay_backward) must fold
~33.5M gradient rows (bounces x samples) into n_slots per-face
accumulators.  Three strategies exist (ops/pallas_histogram.py):

  scatter  XLA row-payload segment-sum — count-proportional (~10 ns/row
           on v5e), slot-count-independent;
  flat     one-hot x MXU histogram — O(N * n_slots) compares, wins only
           at small slot counts;
  paged    occupancy-gated histogram — the full accumulator rides VMEM,
           each sample block pays ONLY for the slot blocks its rows
           touch (the traversal kernel's phase-A worklist idiom applied
           to gradient binning).

This harness renders the residual-emitting fused forward once per
config (icosphere-in-Cornell at the BASELINE scales), then two-point
fits the FULL replay_backward under each strategy, and separately runs
the paged kernel alone to record its occupancy distribution (how many
of the n_slots/128 slot blocks each 2048-row sample block touched —
the locality that makes paging count-proportional in practice).

Usage (TPU):
  python benchmarks/histogram_bench.py --subdivs 4 6 \
      --out benchmarks/artifacts/histogram_r5.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--subdivs", type=int, nargs="+", default=[4, 6])
    p.add_argument("--spp", type=int, default=16)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--bounces", type=int, default=8)
    p.add_argument("--tile", type=int, default=1024)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--modes", nargs="+",
                   default=["scatter", "flat", "paged"])
    p.add_argument("--out", default="benchmarks/artifacts/histogram_r5.json")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ascendpathtracing_tpu.accel import meshes
    from ascendpathtracing_tpu.diff import mesh_fused as dmf
    from ascendpathtracing_tpu.models import mesh as mesh_mod
    from ascendpathtracing_tpu.ops import pallas_histogram as ph
    from ascendpathtracing_tpu.ops import pallas_mesh_pt as mpt
    from ascendpathtracing_tpu.utils import profiling

    w = h = args.size
    rows = []
    for subdiv in args.subdivs:
        v, f = meshes.icosphere(center=(50, 40, 60), radius=14.0,
                                subdivisions=subdiv)
        ms = mesh_mod.MeshScene.cornell_with_mesh(
            v, f, albedo=(0.85, 0.55, 0.2), base_scene="smallpt9"
        )
        planes, cb, sb, t24, mats, grid = mpt.mesh_pt_tables(
            ms, tris_per_chunk=16
        )
        n_slots = int(t24.shape[0])
        out, wid, resv = mpt.render_pt_mesh_pallas(
            planes, cb, sb, t24, width=w, height=h, spp4=args.spp,
            materials=mats, bounces=args.bounces, rr_depth=5,
            tile=args.tile, seed=7, with_residuals=True,
            **mpt.pt_tables_kwargs(grid),
        )
        wid, resv = jax.block_until_ready((wid, resv))
        g = jnp.ones((3, w * h), jnp.float32)
        n_rows = wid.size  # one 6-wide (albedo+emission) row per (bounce, sample)

        row = {
            "subdiv": subdiv, "tris": int(f.shape[0]), "n_slots": n_slots,
            "samples": w * h * args.spp, "bounces": args.bounces,
            "grad_rows": int(n_rows), "modes": {},
        }

        base_fit = None
        for mode in ["off"] + list(args.modes):
            if mode == "flat" and n_slots + 1 > 32768:
                row["modes"][mode] = {
                    "skipped": "O(N*n_slots) compares — measured "
                    "prohibitive well below this slot count"
                }
                continue
            if mode == "paged" and n_slots + 1 > dmf._PAGED_MAX_SLOTS:
                row["modes"][mode] = {
                    "skipped": f"accumulator exceeds VMEM budget "
                    f"(max {dmf._PAGED_MAX_SLOTS} slots)"
                }
                continue

            def step(i, mode=mode):
                return replay(mode)

            def replay(mode):
                if mode == "off":
                    return dmf.replay_backward(
                        wid, resv, g, n_spheres=len(mats), n_slots=n_slots,
                        spp4=args.spp, tile=args.tile, with_slots=False,
                    )
                return dmf.replay_backward(
                    wid, resv, g, n_spheres=len(mats), n_slots=n_slots,
                    spp4=args.spp, tile=args.tile, slot_mode=mode,
                )

            fit = profiling.benchmark_fit(step, iters=args.iters, warmup=2)
            ms_step = fit["step_s"] * 1e3
            entry = {"bwd_ms": round(ms_step, 2), "fit_ok": fit["fit_ok"],
                     "fit_rel_spread": (round(fit["rel_spread"], 4)
                                        if fit["rel_spread"] is not None
                                        else None)}
            if mode == "off":
                base_fit = ms_step
            elif base_fit is not None:
                entry["slot_grad_ms"] = round(ms_step - base_fit, 2)
            row["modes"][mode] = entry
            print(f"subdiv {subdiv} ({n_slots} slots) {mode}: "
                  f"{ms_step:.1f} ms", file=sys.stderr)

        # occupancy distribution of the paged kernel on this stream
        if n_slots + 1 > 8192 and n_slots + 1 <= dmf._PAGED_MAX_SLOTS:
            seg, vals = _extract_stream(dmf, wid, resv, g, len(mats),
                                        n_slots, args.spp, args.tile)
            sbk = 128  # the tuned default (benchmarks/histogram_sweep.py)
            _acc, kocc = ph.segment_rows_paged(seg, vals, n_slots=n_slots,
                                               slot_block=sbk)
            kocc = np.asarray(jax.block_until_ready(kocc))
            n_jb = -(-n_slots // sbk)
            row["paged_occupancy"] = {
                "slot_blocks_total": int(n_jb),
                "occupied_mean": round(float(kocc.mean()), 2),
                "occupied_p50": int(np.percentile(kocc, 50)),
                "occupied_p95": int(np.percentile(kocc, 95)),
                "occupied_max": int(kocc.max()),
                "locality_win": round(n_jb / max(float(kocc.mean()), 1e-9), 1),
            }
        rows.append(row)

    artifact = {
        "backend": jax.default_backend(),
        "config": {"size": args.size, "spp": args.spp,
                   "bounces": args.bounces, "tile": args.tile},
        "rows": rows,
        "note": (
            "bwd_ms = full replay_backward step (two-point fit); "
            "slot_grad_ms = that minus the with_slots=False baseline = "
            "the per-face scatter cost in isolation.  paged_occupancy "
            "records how many slot blocks each 2048-row sample "
            "block touched — chunk-major replay order + spatially "
            "sorted slot ids keep it far below the total."
        ),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps(artifact))
    return 0


def _extract_stream(dmf, wid, resv, g, n_spheres, n_slots, spp4, tile):
    """Rebuild the (seg, vals) row stream exactly as replay_backward's
    hist path does (one pass, forced hist ys), for the standalone
    occupancy probe."""
    import jax
    import jax.numpy as jnp

    # run the scan with slot_mode="paged" but intercept via a small
    # reimplementation: easiest faithful route is to call the private
    # chunk pipeline with use_hist semantics — instead we re-derive the
    # stream from wid/resv directly (same math as chunk_fn's ys).
    f32 = jnp.float32
    bounces, cells, _, lanes = wid.shape
    nb = cells // spp4
    g_cell = jnp.broadcast_to(
        g.reshape(3, nb, 1, 8, lanes) * f32(1.0 / spp4),
        (3, nb, spp4, 8, lanes),
    ).reshape(3, cells, 8, lanes)
    a3 = resv[:, 0:3]
    e3 = resv[:, 3:6]
    s = resv[:, 6]
    livef = (wid >= 0.0).astype(f32)[:, None]
    m = jnp.where(livef > 0, a3 * s[:, None], f32(1.0))
    eL = e3 * livef
    tput_prev = []
    t = jnp.ones_like(m[0])
    for b in range(bounces):
        tput_prev.append(t)
        t = t * m[b]
    T = [None] * bounces
    T[bounces - 1] = jnp.zeros_like(m[0])
    for b in range(bounces - 2, -1, -1):
        T[b] = eL[b + 1] + m[b + 1] * T[b + 1]
    ge = jnp.stack([g_cell * livef[b] * tput_prev[b] for b in range(bounces)])
    ga = jnp.stack([
        g_cell * livef[b] * s[b][None] * tput_prev[b] * T[b]
        for b in range(bounces)
    ])
    tri = wid >= float(n_spheres)
    seg = jnp.where(tri, wid.astype(jnp.int32) - n_spheres, n_slots)
    # one 6-wide row per (bounce, sample): albedo + emission share a row
    rows6 = jnp.concatenate([
        jnp.moveaxis(ga, 1, -1).reshape(-1, 3),
        jnp.moveaxis(ge, 1, -1).reshape(-1, 3),
    ], axis=1)
    # match the scan's chunk-major emission order: [nchunks, B, cc, 8, L]
    cc = min(128, cells)
    nchunks = cells // cc
    seg_c = seg.reshape(bounces, nchunks, cc, 8, lanes).swapaxes(0, 1)
    rows_c = rows6.reshape(bounces, cells, 8, lanes, 6).reshape(
        bounces, nchunks, cc, 8, lanes, 6
    ).swapaxes(0, 1)
    return seg_c.reshape(-1), rows_c.reshape(-1, 6).T


if __name__ == "__main__":
    sys.exit(main())
