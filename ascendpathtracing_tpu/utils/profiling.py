"""Profiling / observability.

The reference's only observability is a per-tile progress printf
(render.cpp:53-54) and simulator waveforms (SURVEY §5).  Here:

- :func:`trace` — contextmanager around ``jax.profiler`` producing a
  TensorBoard/XProf trace directory.
- :func:`benchmark` — compile-excluded steady-state timing with
  ``block_until_ready`` fencing.
- :func:`mrays` — the BASELINE throughput metric helper.
- :func:`roofline` — quick arithmetic-intensity estimate for a render
  config (documented assumptions; used in docs/BASELINE notes).
"""

from __future__ import annotations

import contextlib
import statistics
import time


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in xprof/TensorBoard."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def benchmark(fn, *args, iters: int = 10, warmup: int = 2, **kwargs):
    """Steady-state timing. Returns dict with mean/median/min seconds."""
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return {
        "mean_s": statistics.fmean(times),
        "median_s": statistics.median(times),
        "min_s": min(times),
        "iters": iters,
    }


def mrays(n_rays: int, seconds: float) -> float:
    """Primary Mrays/s (the BASELINE.json metric counts primary rays)."""
    return n_rays / max(seconds, 1e-12) / 1e6


def roofline(n_rays: int, bounces: int, n_spheres: int = 8):
    """Back-of-envelope FLOPs/bytes for the sphere megakernel:
    ~14 VPU flops per ray-sphere quadratic + ~30 for shading per bounce;
    HBM traffic is 24B in + 12B out per ray (everything else stays in
    VMEM/registers in the Pallas kernel)."""
    flops = n_rays * bounces * (n_spheres * 14 + 30)
    bytes_ = n_rays * (24 + 12)
    return {
        "flops": flops,
        "bytes": bytes_,
        "arithmetic_intensity": flops / bytes_,
    }
