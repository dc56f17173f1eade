"""Pipeline parallelism over the bounce dimension (GPipe over depth).

The bounce loop is a depth-wise chain of identical stages, so it
pipelines exactly like layers of a network: stage k (one device on the
'stage' mesh axis) applies bounces [k*B/S, (k+1)*B/S) to a microbatch of
rays and forwards the ray state to stage k+1 over ICI with
``lax.ppermute``.  With M microbatches the schedule runs M + S - 1 steps
(the classic bubble).

This is the structural analogue of "scale the big axis" the reference
cannot express (its cores share nothing, SURVEY §2.5): rays stream
through a *chain* of devices instead of being split across them — useful
when per-device HBM cannot hold the full working set (giant scenes per
stage) and as the framework's PP reference implementation.

Semantics are bit-identical to the single-device megakernel: the same
bounce body runs B times in total (verified in float64 by tests).
"""

from __future__ import annotations

from functools import partial

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
    microbatches: int = 8,
    eps: float = 1e-4,
    axis: str = "stage",
):
    """Reference-mode render pipelined over a 1-D ('stage',) mesh.

    rays [N, 6] (replicated); N must divide by ``microbatches``; bounces
    must divide by the stage count. Returns colors [N, 3] (replicated).
    """
    n = rays.shape[0]
    n_stages = mesh.shape[axis]
    if bounces % n_stages:
        raise ValueError(f"{bounces=} not divisible by {n_stages=} stages")
    if n % microbatches:
        raise ValueError(f"{n=} rays not divisible by {microbatches=}")
    per_stage = bounces // n_stages
    mb = n // microbatches
    m_total = microbatches
    dtype = rays.dtype

    def body(rays_rep, scene):
        stage = lax.axis_index(axis)
        rays_mb = rays_rep.reshape(m_total, mb, 6)

        def empty_state():
            z = jnp.zeros((mb,), dtype)
            o = jnp.ones((mb,), dtype)
            return ((z, z, z), (z, z, z), (o, o, o), jnp.zeros((mb,), bool))

        def inject(t):
            t_c = jnp.clip(t, 0, m_total - 1)
            r = lax.dynamic_index_in_dim(rays_mb, t_c, 0, keepdims=False)
            o3, d3 = rays_to_soa(r)
            ones = jnp.ones((mb,), dtype)
            return (o3, d3, (ones, ones, ones), jnp.ones((mb,), bool))

        emi = scene["emission"][scene["light_index"]]

        def finalize(st):
            tput = st[2]
            return jnp.stack(
                [tput[0] * emi[0], tput[1] * emi[1], tput[2] * emi[2]], axis=1
            )

        out = jnp.zeros((m_total, mb, 3), dtype)
        state = empty_state()
        fwd = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def step(t, carry):
            state, out = carry
            is_first = stage == 0
            injected = inject(t)
            state = jax.tree.map(
                lambda a, b: jnp.where(is_first, a, b), injected, state
            )
            state = _bounce_chunk(state, scene, per_stage, eps)
            # last stage completes microbatch m = t - (S-1)
            m = t - (n_stages - 1)
            color = finalize(state)
            write = (stage == n_stages - 1) & (m >= 0)
            m_c = jnp.clip(m, 0, m_total - 1)
            cur = lax.dynamic_index_in_dim(out, m_c, 0, keepdims=False)
            new = jnp.where(write, color, cur)
            out = lax.dynamic_update_index_in_dim(out, new, m_c, 0)
            # forward ray state to the next stage over ICI
            state = jax.tree.map(
                lambda x: lax.ppermute(x, axis, fwd), state
            )
            return state, out

        state, out = lax.fori_loop(0, m_total + n_stages - 1, step, (state, out))
        # only the last stage holds real outputs (which it has just
        # ppermuted AWAY from itself — note we wrote `out` BEFORE the
        # rotate, so stage S-1 holds them); broadcast to all stages.
        keep = (stage == n_stages - 1).astype(dtype)
        out = lax.psum(out * keep, axis)
        return out.reshape(n, 3)

    f = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(f)(rays, scene)
