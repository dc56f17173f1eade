"""(slot_block, sample_block) sweep for the paged histogram on a real
replay stream — picks the auto-select defaults (VERDICT r4 ask 2).

Smaller slot blocks cut the per-active-pair MXU dot cost
(O(SB * NB) MACs) but raise the pair count sublinearly (finer blocks
are more selective); larger sample blocks amortize occupancy scans.
This measures the standalone kernel on the stream extracted from one
fused forward at the given subdiv.

Usage (TPU): python benchmarks/histogram_sweep.py --subdiv 6
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--subdiv", type=int, default=6)
    p.add_argument("--spp", type=int, default=16)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--bounces", type=int, default=8)
    p.add_argument("--tile", type=int, default=1024)
    p.add_argument("--slot-blocks", type=int, nargs="+",
                   default=[128, 256, 512, 1024])
    p.add_argument("--sample-blocks", type=int, nargs="+",
                   default=[2048, 4096, 8192])
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--out", default=None)
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
    from benchmarks.histogram_bench import _extract_stream

    w = h = args.size
    v, f = meshes.icosphere(center=(50, 40, 60), radius=14.0,
                            subdivisions=args.subdiv)
    ms = mesh_mod.MeshScene.cornell_with_mesh(
        v, f, albedo=(0.85, 0.55, 0.2), base_scene="smallpt9"
    )
    planes, cb, sb, t24, mats, grid = mpt.mesh_pt_tables(ms, tris_per_chunk=16)
    n_slots = int(t24.shape[0])
    out, wid, resv = mpt.render_pt_mesh_pallas(
        planes, cb, sb, t24, width=w, height=h, spp4=args.spp,
        materials=mats, bounces=args.bounces, rr_depth=5, tile=args.tile,
        seed=7, with_residuals=True, **mpt.pt_tables_kwargs(grid),
    )
    g = jnp.ones((3, w * h), jnp.float32)
    seg, vals = _extract_stream(dmf, wid, resv, g, len(mats), n_slots,
                                args.spp, args.tile)
    seg, vals = jax.block_until_ready((seg, vals))

    rows = []
    for sbk in args.slot_blocks:
        n_jb = (-(-n_slots // sbk))
        if n_jb * 8 * sbk * 4 > 8 * 1024 * 1024:
            continue
        for nb in args.sample_blocks:
            def step(i):
                return ph.segment_rows_paged(
                    seg, vals, n_slots=n_slots, slot_block=sbk,
                    sample_block=nb,
                )
            try:
                fit = profiling.benchmark_fit(step, iters=args.iters,
                                              warmup=2)
            except Exception as e:
                rows.append({"slot_block": sbk, "sample_block": nb,
                             "error": f"{type(e).__name__}: {e}"[:200]})
                continue
            _acc, kocc = step(0)
            kocc = np.asarray(jax.block_until_ready(kocc))
            rows.append({
                "slot_block": sbk, "sample_block": nb,
                "ms": round(fit["step_s"] * 1e3, 2),
                "fit_ok": fit["fit_ok"],
                "occ_mean": round(float(kocc.mean()), 1),
                "occ_total": int(-(-n_slots // sbk)),
            })
            print(rows[-1], file=sys.stderr)

    result = {"backend": jax.default_backend(), "subdiv": args.subdiv,
              "n_slots": n_slots, "rows": rows}
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
