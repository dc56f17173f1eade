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
    """Steady-state timing (single batch). Returns ``mean_s`` only —
    the async-dispatch methodology fences once per batch, so no per-call
    distribution exists to report (an earlier version fabricated
    median/min keys from the same mean; they are gone).

    Dispatches ``iters`` calls back-to-back (they serialize on-device),
    fences ONCE on a scalar reduction of the last output, and subtracts
    the scalar-fetch round-trip — correct both locally and on
    remote-dispatch (axon) runtimes where ``block_until_ready`` does not
    block.  The residual fixed overhead (first-dispatch latency etc.) is
    NOT removed here; for headline numbers use :func:`benchmark_fit`,
    which fits it out.
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
        "iters": iters,
        "fence_rtt_s": rtt,
    }


def benchmark_fit(
    fn,
    iters: int = 8,
    warmup: int = 2,
    agree: float = 0.05,
    max_rounds: int = 4,
    max_seconds: float = 180.0,
):
    """Two-point-fit timing: separates the TRUE per-step device time from
    the fixed per-batch overhead (fence RTT + first-dispatch latency +
    tunnel turnaround — measured ~18-30 ms on axon, enough to skew a
    4 ms step by 2x at small ``iters``).

    ``fn(i)`` dispatches step ``i`` (the argument lets callers vary a
    seed so the compiler cannot cache across calls).  Batches of ``k``
    and ``3k`` dispatches are each fenced once and timed; the slope
    ``(t2 - t1) / (3k - k)`` is the per-step time with ALL fixed costs
    cancelled, and the intercept is the overhead.  The pair measurement
    repeats until two consecutive slope estimates agree within
    ``agree`` (default 5% — the VERDICT r2 reproducibility gate),
    doubling ``k`` on disagreement; the result is their mean.

    ``max_seconds`` bounds the total measuring time: once exceeded, the
    current pair's estimate is returned (rel_spread reports whatever
    agreement was reached) instead of doubling again — slow steps
    (multi-second renders) would otherwise grow the pair geometrically.

    A round whose slope comes out non-positive (timing noise made
    ``t2 <= t1``) is INVALID: it is discarded and the pair size doubles
    — a clamped 1e-12 slope must never become a headline number.  If the
    loop exhausts without two consecutive slopes agreeing, ``fit_ok`` is
    False and the result falls back to the last valid slope, or — when
    no round ever produced a valid slope — to the conservative
    single-batch estimate ``t2 / (3k)`` (which still contains the
    per-batch overhead, i.e. an upper bound on the step time).

    Returns dict: step_s, overhead_s, rel_spread, iters, rounds,
    fit_ok, fenced_batches (list of (k, seconds) actually measured).
    """
    out = None
    step_i = 0
    for _ in range(max(warmup, 1)):
        out = fn(step_i)
        step_i += 1

    device_fence(out)

    def batch(k):
        nonlocal step_i, out
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(step_i)
            step_i += 1
        device_fence(out)
        return time.perf_counter() - t0

    k = max(int(iters), 2)
    batches = []
    prev_slope = None
    slope = None
    overhead = 0.0
    rel = float("inf")
    rounds = 0
    fit_ok = False
    last_t2 = last_k = None
    t_begin = time.perf_counter()
    for rounds in range(1, max_rounds + 1):
        t1 = batch(k)
        t2 = batch(3 * k)
        batches += [(k, t1), (3 * k, t2)]
        last_t2, last_k = t2, k
        raw = (t2 - t1) / (2 * k)
        if raw <= 0.0:
            # noise made t2 <= t1: this round proves nothing — discard it
            # and retry with a larger pair (ADVICE r3 medium #1)
            k *= 2
            if time.perf_counter() - t_begin > max_seconds:
                break
            continue
        overhead = max(t1 - k * raw, 0.0)
        if prev_slope is not None:
            rel = abs(raw - prev_slope) / max(raw, prev_slope)
            if rel <= agree:
                slope = (raw + prev_slope) / 2.0
                fit_ok = True
                break
            k *= 2
        slope = raw
        prev_slope = raw
        if time.perf_counter() - t_begin > max_seconds:
            break
    if slope is None:
        # every round was invalid: conservative upper bound (contains the
        # per-batch overhead) rather than a fabricated slope
        slope = last_t2 / (3 * last_k)
    return {
        "step_s": slope,
        "overhead_s": overhead,
        "rel_spread": rel if rel != float("inf") else None,
        "iters": k,
        "rounds": rounds,
        "fit_ok": fit_ok,
        "fenced_batches": batches,
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
