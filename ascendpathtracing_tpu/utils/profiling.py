"""Profiling / observability.

The reference's only observability is a per-tile progress printf
(render.cpp:53-54) and simulator waveforms (SURVEY §5).  Here:

- :func:`trace` — contextmanager around ``jax.profiler`` producing a
  TensorBoard/XProf trace directory.
- :func:`device_fence` — a sync that provably waits for device work.
- :func:`benchmark` — compile-excluded steady-state timing with
  value-fetch fencing (see below).
- :func:`mrays` — the BASELINE throughput metric helper.
- :func:`roofline` — quick arithmetic-intensity estimate for a render
  config (documented assumptions; used in docs/BASELINE notes).

TIMING ON TUNNELED TPUS (axon): ``jax.block_until_ready`` is a NO-OP on
the remote-dispatch axon runtime — a 60 ms render "completes" in 0.1 ms
by that fence, and fetching a full output buffer instead adds the whole
transfer (~20 s for 64 MB) to the measurement.  The only sound fence is
fetching a tiny on-device REDUCTION of the output.  :func:`benchmark`
therefore dispatches all ``iters`` steps asynchronously (they serialize
on the one chip), fences once on ``float(sum(out))``, and subtracts the
separately-measured scalar-fetch round-trip (~30 ms over the tunnel).
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


def device_fence(out) -> float:
    """Wait until `out` (array or pytree) is actually computed, by
    fetching a scalar reduction of its first array leaf.  Returns the
    fetched scalar (so the call cannot be optimized away)."""
    import jax
    import jax.numpy as jnp

    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype") and hasattr(x, "sum")]
    if not leaves:
        jax.block_until_ready(out)
        return 0.0
    x = leaves[0]
    if x.dtype == bool:
        x = x.astype(jnp.int32)
    return float(x.sum())


def fetch_rtt(iters: int = 5) -> float:
    """Measured round-trip of one scalar fetch (the fencing overhead to
    subtract from async-dispatch timings; ~30 ms on a tunneled chip,
    ~0.1 ms locally)."""
    import jax
    import jax.numpy as jnp

    one = jnp.ones((8,), jnp.float32)
    f = jax.jit(lambda a: jnp.sum(a))
    float(f(one))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f(one))
    return (time.perf_counter() - t0) / iters


def benchmark(fn, *args, iters: int = 10, warmup: int = 2, **kwargs):
    """Steady-state timing. Returns dict with mean/min-style seconds.

    Dispatches ``iters`` calls back-to-back (they serialize on-device),
    fences ONCE on a scalar reduction of the last output, and subtracts
    the scalar-fetch round-trip — the only methodology that is correct
    both locally and on remote-dispatch (axon) runtimes where
    ``block_until_ready`` does not block.
    """
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args, **kwargs)
    device_fence(out)
    rtt = fetch_rtt()

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    device_fence(out)
    total = time.perf_counter() - t0
    mean = max(total - rtt, 1e-9) / iters
    return {
        "mean_s": mean,
        "median_s": mean,
        "min_s": mean,
        "iters": iters,
        "fence_rtt_s": rtt,
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
