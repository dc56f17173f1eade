"""Pipeline parallelism over the bounce dimension — a systolic RING.

The bounce loop is a depth-wise chain of identical stages, so it
pipelines like layers of a network.  Rather than GPipe's inject/drain
schedule (which kept the full ray array replicated on every stage — the
round-1 version's flaw), rays are SHARDED across the 'stage' axis
(``in_specs=P('stage')``) and the ray STATE rotates around the ring with
``lax.ppermute``: at step s every device applies its ``bounces/S``-bounce
chunk to whichever shard currently resides, then passes the state to the
next stage.  After S steps each shard has passed every stage exactly once
and is back on its home device, so outputs come out sharded ``P('stage')``
with no gather.

Per-device memory is N/S ray states + N/S outputs — PP genuinely bounds
the working set (the "giant scene per stage" use case: each stage holds
1/S of the scene tables and applies only its own chunk).  There is no
pipeline bubble: stages are busy every step because every shard is always
somewhere in the ring (the classic bubble exists only when microbatches
must enter serially through stage 0).

Semantics are bit-identical to the single-device megakernel: every shard
receives the same ``bounces`` applications of the same bounce body, and
with identical per-stage scene tables the visit ORDER is immaterial
(verified bit-for-bit in float64 by tests/test_pipeline.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ascendpathtracing_tpu.models.megakernel import (
    default_hit_fn,
    rays_to_soa,
    select_by_id,
)
from ascendpathtracing_tpu.ops import shade


def _bounce_chunk(state, scene, n_bounces, eps):
    """Apply ``n_bounces`` reference-semantics bounces to SoA ray state
    (o3, d3, tput, alive) — same math as megakernel.reference_bounce_loop."""
    s = scene["r2"].shape[0]
    light = scene["light_index"]
    cx, cy, cz = (scene["center"][:, i] for i in range(3))
    ax, ay, az = (scene["albedo"][:, i] for i in range(3))

    def body(_, st):
        o3, d3, tput, alive = st
        tmin, hit, miss = default_hit_fn(o3, d3, scene, eps)
        gid = jnp.where(miss, s - 1, hit)
        center_hit = (select_by_id(gid, cx), select_by_id(gid, cy), select_by_id(gid, cz))
        o3n, d3n = shade.specular_bounce(o3, d3, tmin, center_hit)
        hit_light = (hit == light) & ~miss
        alive2 = alive & ~hit_light
        mult = (select_by_id(gid, ax), select_by_id(gid, ay), select_by_id(gid, az))
        tput2 = shade.v3_where(
            alive2, (tput[0] * mult[0], tput[1] * mult[1], tput[2] * mult[2]), tput
        )
        return o3n, d3n, tput2, alive2

    return lax.fori_loop(0, n_bounces, body, state, unroll=True)


def render_reference_pipelined(
    rays,
    scene: dict,
    mesh: Mesh,
    *,
    bounces: int = 8,
    eps: float = 1e-4,
    axis: str = "stage",
    microbatches: int | None = None,  # accepted for CLI/back-compat; unused
):
    """Reference-mode render ring-pipelined over a 1-D ('stage',) mesh.

    rays [N, 6]; N must divide by the stage count (the shards), bounces
    must divide by the stage count. Returns colors [N, 3], sharded
    P('stage') over the same mesh.
    """
    n = rays.shape[0]
    n_stages = mesh.shape[axis]
    if bounces % n_stages:
        raise ValueError(f"{bounces=} not divisible by {n_stages=} stages")
    if n % n_stages:
        raise ValueError(f"{n=} rays not divisible by {n_stages=} stages")
    per_stage = bounces // n_stages
    dtype = rays.dtype

    def body(rays_sh, scene):
        o3, d3 = rays_to_soa(rays_sh)
        m = o3[0].shape[0]
        ones = jnp.ones((m,), dtype)
        state = (o3, d3, (ones, ones, ones), jnp.ones((m,), bool))
        fwd = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def step(_s, st):
            st = _bounce_chunk(st, scene, per_stage, eps)
            # hand the ray state to the next stage over ICI; after
            # n_stages rotations every shard is home again
            return jax.tree.map(lambda x: lax.ppermute(x, axis, fwd), st)

        state = lax.fori_loop(0, n_stages, step, state)
        emi = scene["emission"][scene["light_index"]]
        tput = state[2]
        return jnp.stack(
            [tput[0] * emi[0], tput[1] * emi[1], tput[2] * emi[2]], axis=1
        )

    f = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(f)(rays, scene)
