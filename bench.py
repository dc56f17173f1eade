"""Benchmark harness — the BASELINE.json headline metric.

Measures forward+backward throughput of the differentiable renderer at
8 bounces on the Cornell scene, in primary Mrays/s per chip, on whatever
device JAX finds (the real TPU under the driver).  Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}

``vs_baseline`` is relative to the BASELINE.json north-star target of
100 Mrays/s/chip fwd+bwd @ 8 bounces (the reference itself publishes no
performance numbers — BASELINE.md).

Usage: python bench.py [--rays N] [--iters K] [--bounces B] [--mode pt|reference]
"""

from __future__ import annotations

import argparse
import json
import sys
import time



def _measure(run, iters, warmup):
    """Compile-excluded steady-state step time.

    ``jax.block_until_ready`` is a NO-OP on the remote-dispatch axon TPU
    runtime (utils/profiling.py docstring) — fence by fetching a scalar
    reduction of the last output, dispatch all iters back-to-back (they
    serialize on the one chip), and subtract the scalar-fetch RTT.
    """
    import time as _time

    from ascendpathtracing_tpu.utils import profiling

    out = None
    for i in range(max(warmup, 1)):
        out = run(i)
    profiling.device_fence(out)
    rtt = profiling.fetch_rtt()
    t0 = _time.perf_counter()
    for i in range(iters):
        out = run(1000 + i)
    profiling.device_fence(out)
    total = _time.perf_counter() - t0
    return max(total - rtt, 1e-9) / iters, out


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    # Defaults define the BASELINE.json headline metric: fwd+bwd at 8
    # bounces on the Cornell scene, 4M rays/step.
    p.add_argument("--rays", type=int, default=1 << 22, help="primary rays per step")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--bounces", type=int, default=8)
    p.add_argument("--mode", choices=["pt", "reference"], default="reference")
    p.add_argument(
        "--renderer", choices=["auto", "jit", "pallas", "pallas-pt", "wavefront"],
        default="auto",
        help="pallas = hand-fused VMEM megakernel (reference mode, fwd "
        "only); wavefront = compaction renderer (pt mode, full frame)",
    )
    p.add_argument("--pool", type=int, default=1 << 19, help="wavefront ray pool")
    p.add_argument("--spp", type=int, default=64, help="wavefront samples/pixel")
    p.add_argument("--tile", type=int, default=4096, help="pallas ray tile")
    p.add_argument("--fwd-only", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ascendpathtracing_tpu import camera, scenes
    from ascendpathtracing_tpu.models import megakernel
    from ascendpathtracing_tpu.parallel.sharded import split_scene_params

    if args.renderer == "auto":
        # Best honest headline path: the custom-VJP Pallas renderer on
        # TPU; the XLA jit renderer elsewhere (Mosaic needs hardware).
        args.renderer = (
            "pallas" if (jax.default_backend() == "tpu" and args.mode == "reference")
            else "jit"
        )

    n = args.rays
    # Square-ish image covering n rays (n = w*h*4 with samples=1).
    w = h = int(np.sqrt(n / 4))
    n = w * h * 4

    rays = jnp.asarray(
        camera.generate_rays_numpy(w, h, 1, seed=0).astype(np.float32)
    )
    scene_name = "cornell8" if args.mode == "reference" else "smallpt9"
    scene = megakernel.scene_to_device(scenes.get_scene(scene_name))
    params, aux = split_scene_params(scene)
    key = jax.random.PRNGKey(0)

    if args.renderer == "pallas-pt":
        from ascendpathtracing_tpu.ops import pallas_kernels

        w = h = int(np.sqrt(n / 4))
        spp4 = args.spp
        total = w * h * spp4
        scene_obj = scenes.get_scene("cornell8")
        planes = jnp.asarray(scene_obj.soa10())
        mats = tuple(int(m) for m in scene_obj.material)

        def run(seed):
            return pallas_kernels.render_pt_pallas(
                planes, width=w, height=h, spp4=spp4, materials=mats,
                bounces=args.bounces, rr_depth=5, tile=args.tile, seed=seed,
            )

        dt, out = _measure(run, args.iters, args.warmup)
        mrays = total / dt / 1e6
        print(json.dumps({
            "metric": f"Mrays/s/chip fwd (pallas-pt fused, {args.bounces}b RR, "
                      f"{w}x{h}x{spp4}spp)",
            "value": round(mrays, 3),
            "unit": "Mrays/s",
            "vs_baseline": round(mrays / 100.0, 4),
            "detail": {"backend": jax.default_backend(), "samples": total,
                       "step_ms": round(dt * 1e3, 3), "tile": args.tile,
                       "out_mean": float(jnp.mean(out))},
        }))
        return 0

    if args.renderer == "wavefront":
        from ascendpathtracing_tpu.models import wavefront

        w = h = int(np.sqrt(n / 4))
        spp4 = args.spp
        total = w * h * spp4
        key = jax.random.PRNGKey(0)
        sc = megakernel.scene_to_device(scenes.get_scene("cornell8"))

        def run(i):
            return wavefront.render_wavefront(
                jax.random.fold_in(key, i), sc, width=w, height=h, spp4=spp4,
                pool=args.pool, bounces=args.bounces, rr_depth=5,
            )

        dt, out = _measure(run, args.iters, args.warmup)
        mrays = total / dt / 1e6
        print(json.dumps({
            "metric": f"Mrays/s/chip fwd (wavefront, {args.bounces}b RR, "
                      f"{w}x{h}x{spp4}spp)",
            "value": round(mrays, 3),
            "unit": "Mrays/s",
            "vs_baseline": round(mrays / 100.0, 4),
            "detail": {"backend": jax.default_backend(), "pool": args.pool,
                       "samples": total, "step_ms": round(dt * 1e3, 3)},
        }))
        return 0

    if args.renderer == "pallas":
        if args.mode != "reference":
            print("note: pallas renderer implies --mode reference",
                  file=sys.stderr)
        from ascendpathtracing_tpu.ops import pallas_kernels

        scene_obj = scenes.get_scene("cornell8")
        planes = jnp.asarray(scene_obj.soa10())
        rays_planes = jnp.transpose(rays)

        if args.fwd_only:

            def pallas_step(planes):
                return pallas_kernels.render_reference_pallas_planes(
                    rays_planes, planes, light_index=scene_obj.light_index,
                    bounces=args.bounces, tile=args.tile,
                )

            step = jax.jit(pallas_step)
        else:
            render = pallas_kernels.make_render_reference_pallas_diff(
                light_index=scene_obj.light_index, bounces=args.bounces,
                tile=args.tile,
            )
            step = jax.jit(
                jax.value_and_grad(lambda p: jnp.sum(render(rays_planes, p)))
            )
        dt, out = _measure(lambda i: step(planes), args.iters, args.warmup)
        mrays = n / dt / 1e6
        tag2 = "fwd" if args.fwd_only else "fwd+bwd"
        print(json.dumps({
            "metric": f"Mrays/s/chip {tag2} @ {args.bounces} bounces (cornell8, pallas)",
            "value": round(mrays, 3),
            "unit": "Mrays/s",
            "vs_baseline": round(mrays / 100.0, 4),
            "detail": {"backend": jax.default_backend(),
                       "rays_per_step": n, "step_ms": round(dt * 1e3, 3),
                       "tile": args.tile, "renderer": "pallas"},
        }))
        return 0

    if args.mode == "pt":
        mats_static = tuple(int(m) for m in scenes.get_scene(scene_name).material)

        def fwd(params, key):
            sc = {**params, **aux}
            return megakernel.render_pt_impl(
                key, rays, sc, bounces=args.bounces,
                materials_static=mats_static,
            )

    else:

        def fwd(params, key):
            sc = {**params, **aux}
            return megakernel.render_reference_impl(rays, sc, bounces=args.bounces)

    if args.fwd_only:
        step = jax.jit(lambda p, k: jnp.sum(fwd(p, k)))
        tag = "fwd"
    else:
        step = jax.jit(jax.value_and_grad(lambda p, k: jnp.sum(fwd(p, k))))
        tag = "fwd+bwd"

    dt, out = _measure(
        lambda i: step(params, jax.random.fold_in(key, i)),
        args.iters, args.warmup,
    )

    mrays = n / dt / 1e6
    result = {
        "metric": f"Mrays/s/chip {tag} @ {args.bounces} bounces ({scene_name})",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 4),
        "detail": {
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "rays_per_step": n,
            "step_ms": round(dt * 1e3, 3),
            "iters": args.iters,
            "mode": args.mode,
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
