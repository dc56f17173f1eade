"""Gradient-allreduce / backward-overlap EVIDENCE harness (VERDICT r2
item 5 — the claim in parallel/sharded.py must point at artifacts, not
assertions).

What can and cannot be evidenced on this machine: one physical TPU chip
means no real ICI collectives, so hardware overlap cannot be *timed*
here.  What CAN be shown, and what this script writes to a committed
JSON artifact:

1. The GSPMD-sharded train step's OPTIMIZED HLO contains the gradient
   ``all-reduce`` (the collective exists and is compiler-inserted, not
   hand-rolled), counted per backward pass.
2. Whether the schedule uses ASYNC collective pairs
   (``all-reduce-start``/``all-reduce-done``) and how many instructions
   the scheduler placed between start and done — the overlap window.
   On the CPU backend XLA typically lowers collectives synchronously;
   the artifact records whatever is true for the backend it ran on.
3. The libtpu flags that enable async collectives + latency-hiding on
   real TPU pods (``parallel/distributed.py:TPU_ASYNC_FLAGS``;
   ``distributed.initialize`` appends them to LIBTPU_INIT_ARGS before
   backend start — they must NOT go in XLA_FLAGS, where non-TPU plugins
   fatal on the unknown names).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python benchmarks/overlap_evidence.py --out benchmarks/artifacts/overlap_r3.json
Optionally ``--trace DIR`` captures a jax.profiler trace of the step.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

# The canonical flag set lives in the library
# (parallel/distributed.py:TPU_ASYNC_FLAGS, applied by
# distributed.initialize on pod launches); re-exported here for the
# artifact.
from ascendpathtracing_tpu.parallel.distributed import (  # noqa: E402
    TPU_ASYNC_FLAGS,
)


def main(argv=None) -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="benchmarks/artifacts/overlap_r3.json")
    p.add_argument("--trace", default=None, help="also capture a profiler trace")
    p.add_argument("--bounces", type=int, default=5)
    p.add_argument("--rays", type=int, default=1 << 14)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ascendpathtracing_tpu import camera, scenes
    from ascendpathtracing_tpu.models import megakernel
    from ascendpathtracing_tpu.parallel import (
        make_mesh, make_train_step, shard_rays, split_scene_params,
    )

    n_dev = len(jax.devices())
    if n_dev < 2:
        print(json.dumps({"error": f"need >=2 devices, found {n_dev}; run "
                          "with the virtual-device XLA_FLAGS"}))
        return 1

    n = args.rays
    w = h = int(np.sqrt(n / 4))
    rays = jnp.asarray(
        camera.generate_rays_numpy(w, h, 1, seed=0).astype(np.float32)
    )
    scene = megakernel.scene_to_device(scenes.cornell8())
    params, aux = split_scene_params(scene)
    params = jax.tree.map(jnp.array, params)
    target = jnp.zeros((rays.shape[0], 3), rays.dtype)

    mesh = make_mesh(n_dev, model_parallel=1)
    rays_sh = shard_rays(rays, mesh)
    target_sh = shard_rays(target, mesh)
    step = make_train_step(mesh, bounces=args.bounces, learning_rate=1e-3)

    lowered = step.lower(params, aux, rays_sh, target_sh)
    compiled = lowered.compile()
    hlo = compiled.as_text()

    # collect collective evidence from the optimized, scheduled module
    n_allreduce = len(re.findall(r"all-reduce(?:-start)?\(", hlo))
    starts = [m.start() for m in re.finditer(r"all-reduce-start", hlo)]
    dones = [m.start() for m in re.finditer(r"all-reduce-done", hlo)]
    async_pairs = min(len(starts), len(dones))
    # instructions between each start and its done = the overlap window
    windows = []
    lines = hlo.splitlines()
    start_lines = [i for i, ln in enumerate(lines) if "all-reduce-start" in ln]
    for si in start_lines:
        for j in range(si + 1, min(si + 4000, len(lines))):
            if "all-reduce-done" in lines[j]:
                windows.append(j - si - 1)
                break
    mean_window = (sum(windows) / len(windows)) if windows else 0

    if args.trace:
        from ascendpathtracing_tpu.utils import profiling

        with profiling.trace(args.trace):
            loss, params2 = step(params, aux, rays_sh, target_sh)
            jax.block_until_ready(loss)
    else:
        loss, params2 = step(params, aux, rays_sh, target_sh)
        jax.block_until_ready(loss)

    # what this run PROVED (the schema distinguishes existence from
    # overlap — VERDICT r3 ask 6): on a multi-chip TPU backend the async
    # start/done pairs with compute between them ARE the overlap claim,
    # so their absence there is a FAILURE, not a footnote.  On CPU (or
    # one chip) XLA legitimately lowers the collective synchronously and
    # the artifact can only prove the collective exists.
    on_multichip_tpu = jax.default_backend() == "tpu" and n_dev >= 2
    if on_multichip_tpu:
        proved = (
            "overlap" if (async_pairs > 0 and mean_window > 0)
            else "NOTHING — async pairs expected on this backend"
        )
        ok = n_allreduce > 0 and async_pairs > 0 and mean_window > 0
    else:
        proved = "existence"
        ok = n_allreduce > 0

    artifact = {
        "backend": jax.default_backend(),
        "devices": n_dev,
        "bounces": args.bounces,
        "rays": int(rays.shape[0]),
        "grad_allreduce_count": n_allreduce,
        "async_start_done_pairs": async_pairs,
        "mean_instructions_in_overlap_window": round(mean_window, 1),
        "collective_is_compiler_inserted": n_allreduce > 0,
        "loss_finite": bool(np.isfinite(float(loss))),
        "tpu_async_flags": TPU_ASYNC_FLAGS,
        "proved": proved,
        "ok": ok,
        "note": (
            "proved='existence': a CPU/1-chip run can only show the "
            "GSPMD all-reduce in the optimized module (XLA lowers it "
            "synchronously there).  proved='overlap' requires a "
            "multi-chip TPU run with async start/done pairs and "
            "instructions scheduled inside the window; on such a "
            "backend ok=false if overlap never materialized.  "
            "parallel.distributed.initialize appends tpu_async_flags to "
            "LIBTPU_INIT_ARGS on pods."
        ),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps(artifact))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
