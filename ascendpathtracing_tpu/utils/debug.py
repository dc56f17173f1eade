"""Debug guards: NaN/Inf checking for render outputs.

The reference's closest analogues are the CPU-debug allocator warnings
and ASSERTs (allocator.h:261-284, render.cpp:68-73).  Here NaN handling
is load-bearing by design (the miss path is branch-free, see
ops/intersect.py), so the guard is a cheap post-condition check plus an
optional checkify pass over a jitted function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class NonFiniteRenderError(RuntimeError):
    pass


def assert_finite(x, name="output"):
    """Host-side post-condition; raises with basic stats on failure."""
    import numpy as np

    arr = np.asarray(x)
    bad = ~np.isfinite(arr)
    if bad.any():
        raise NonFiniteRenderError(
            f"{name}: {bad.sum()} non-finite of {arr.size} "
            f"(nan={np.isnan(arr).sum()}, inf={np.isinf(arr).sum()})"
        )
    return x


def checkify_render(fn):
    """Wrap a render function with jax.experimental.checkify so in-graph
    NaN/div checks surface as errors instead of silent propagation.
    Returns wrapped(fn) -> output (raises on check failure)."""
    from jax.experimental import checkify

    checked = checkify.checkify(fn, errors=checkify.float_checks)

    def run(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return run
