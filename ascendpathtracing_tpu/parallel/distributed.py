"""Multi-host utilities.

Thin, test-friendly wrappers around ``jax.distributed`` and per-host data
placement (the reference is strictly single-process, SURVEY §2.5; this is
the BASELINE config-5 scaffolding).  On a pod slice:

    initialize()                       # once per process, from env
    mesh = make_global_mesh()          # ('data','model') over all chips
    rays = host_local_rays(cfg, mesh)  # each host feeds its shard

Gradient all-reduce then rides ICI within a slice and DCN across slices
exactly as XLA lays the mesh out (parallel/sharded.py).
"""

from __future__ import annotations

import os
import warnings

import jax
import numpy as np


# Async collectives + the latency-hiding scheduler on real TPU slices.
# These are what "grad all-reduce overlapped with backward" concretely
# means: the collective lowers to a start/done pair and the scheduler
# hoists independent backward compute between them.  They are LIBTPU
# flags and must ride LIBTPU_INIT_ARGS — putting TPU-only flags in
# XLA_FLAGS is a FATAL parse error on non-TPU plugins (measured:
# "Unknown flags in XLA_FLAGS" crash on the CPU client).
# Evidence harness: benchmarks/overlap_evidence.py.
TPU_ASYNC_FLAGS = (
    "--xla_tpu_enable_async_collective_fusion=true "
    "--xla_tpu_enable_async_collective_fusion_fuse_all_gather=true "
    "--xla_tpu_enable_async_collective_fusion_multiple_steps=true"
)


def apply_async_collective_flags() -> bool:
    """Append :data:`TPU_ASYNC_FLAGS` to ``LIBTPU_INIT_ARGS`` — what
    lets the scheduler overlap the gradient all-reduce with backward
    compute on real slices.  Must run BEFORE libtpu initializes; returns
    False (with a warning) when the backend is already up.  Idempotent;
    a no-op for non-TPU runs (libtpu never reads the variable there)."""
    cur = os.environ.get("LIBTPU_INIT_ARGS", "")
    if "xla_tpu_enable_async_collective_fusion" in cur:
        return True
    backend_up = jax._src.xla_bridge._backends  # noqa: SLF001
    if backend_up:
        warnings.warn(
            "XLA backend already initialized; async-collective flags not "
            "applied — call initialize() before the first jax computation",
            stacklevel=2,
        )
        return False
    os.environ["LIBTPU_INIT_ARGS"] = (cur + " " + TPU_ASYNC_FLAGS).strip()
    return True


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize jax.distributed (no-op when single-process or already
    initialized). Args default to the standard env-var autodetection.

    Also applies the async-collective XLA flags when the backend has not
    started yet (see :func:`apply_async_collective_flags`)."""
    apply_async_collective_flags()
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # single-process run (tests, one host) — nothing to do
        pass


def make_global_mesh(model_parallel=None):
    """('data','model') mesh over every device in the job (all hosts)."""
    from ascendpathtracing_tpu.parallel.mesh import make_mesh

    return make_mesh(len(jax.devices()), model_parallel=model_parallel)


def host_local_rays(rays_global: np.ndarray, mesh):
    """Build a globally-sharded ray array from per-host NumPy data.

    Each process passes the FULL logical array (cheap at these sizes);
    ``jax.make_array_from_process_local_data`` with an explicit
    ``global_shape`` slices out and transfers only this host's shard.
    (Without global_shape the API treats the input as the LOCAL portion
    and a 2-process job silently doubled the ray axis — caught by the
    first real multi-process run, tests/test_multiprocess.py.)
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(("data", "model"), None))
    return jax.make_array_from_process_local_data(
        sharding, rays_global, global_shape=rays_global.shape
    )


def process_info():
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
