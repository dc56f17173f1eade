"""Scaling-efficiency harness (BASELINE config 5).

Measures the sharded render + train step at 1/2/4/8 devices and reports
parallel efficiency.  On a real pod slice run it as-is per host (after
``parallel.distributed.initialize``); on a dev box it runs on virtual CPU
devices (set ``XLA_FLAGS=--xla_force_host_platform_device_count=8
JAX_PLATFORMS=cpu``), which validates the sharding code paths and
measures *overhead*, not ICI scaling.

Usage: python benchmarks/scaling.py [--rays 262144] [--bounces 5]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    # allow running as `python benchmarks/scaling.py` from the repo root
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    p = argparse.ArgumentParser()
    p.add_argument("--rays", type=int, default=1 << 18)
    p.add_argument("--bounces", type=int, default=5)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--train", action="store_true", help="measure the train step too")
    p.add_argument("--out", default=None,
                   help="also write the summary JSON to this path")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ascendpathtracing_tpu import camera, scenes
    from ascendpathtracing_tpu.models import megakernel
    from ascendpathtracing_tpu.parallel import (
        make_mesh,
        make_train_step,
        render_reference_sharded,
        shard_rays,
        split_scene_params,
    )

    n_dev = len(jax.devices())
    n = args.rays
    w = h = int(np.sqrt(n / 4))
    rays = jnp.asarray(camera.generate_rays_numpy(w, h, 1, seed=0).astype(np.float32))
    scene = megakernel.scene_to_device(scenes.cornell8())

    results = []
    base = None
    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= n_dev]
    for c in counts:
        mesh = make_mesh(c, model_parallel=1)
        rays_sh = shard_rays(rays, mesh)

        def run():
            return render_reference_sharded(
                rays_sh, scene, mesh, bounces=args.bounces
            )

        out = run()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = run()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        mrays = rays.shape[0] / dt / 1e6
        if base is None:
            base = mrays
        eff = mrays / (base * c)
        entry = {
            "devices": c,
            "mrays_per_s": round(mrays, 2),
            "speedup": round(mrays / base, 3),
            "efficiency": round(eff, 3),
        }
        if args.train:
            params, aux = split_scene_params(scene)
            params = jax.tree.map(jnp.array, params)
            target = jnp.zeros((rays.shape[0], 3), rays.dtype)
            step = make_train_step(mesh, bounces=args.bounces)
            t_sh = shard_rays(target, mesh)
            loss, params = step(params, aux, rays_sh, t_sh)
            jax.block_until_ready(loss)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                loss, params = step(params, aux, rays_sh, t_sh)
            jax.block_until_ready(loss)
            entry["train_step_ms"] = round(
                (time.perf_counter() - t0) / args.iters * 1e3, 2
            )
        results.append(entry)
        print(json.dumps(entry), flush=True)

    summary = {"backend": jax.default_backend(), "n_rays": int(rays.shape[0]),
               "bounces": args.bounces, "scaling": results,
               "note": ("virtual CPU devices measure sharding OVERHEAD "
                        "(code-path validation), not ICI scaling"
                        if jax.default_backend() == "cpu" else
                        "real-device scaling")}
    print(json.dumps(summary))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as fh:
            json.dump(summary, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
