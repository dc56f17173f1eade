"""The jit megakernel renderer.

TPU-native re-design of the reference's fused Ascend C kernel
(src/render.cpp): the CopyIn/Compute/CopyOut tile pipeline
(render.cpp:52-59) and the manual UB allocator (src/allocator.h) disappear
— the whole render is one traced XLA program over [N]-ray arrays; XLA
handles fusion, tiling and memory.  The fixed ``while depth < 5`` bounce
loop (render.cpp:141-188) becomes a ``lax.fori_loop`` with static trip
count (unrolled by XLA when profitable).

Two render modes (config.mode):

- :func:`render_reference` — bit-level parity with the reference kernel /
  oracle semantics (specular-only, light-mask on the light sphere,
  throughput x emission finalize; see oracle.py for the contract).
- :func:`render_pt` — the full smallpt Monte-Carlo estimator (DIFF /
  SPEC / REFR materials, emission accumulated every bounce, Russian
  roulette) — the BASELINE north-star path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ascendpathtracing_tpu.ops.intersect import MISS_T, intersect_spheres, reduce_hit
from ascendpathtracing_tpu.ops import shade
from ascendpathtracing_tpu.scenes import DIFF, REFR, SPEC, SphereScene


def scene_to_device(scene: SphereScene, dtype=jnp.float32) -> dict:
    """SphereScene -> pytree of device arrays.

    ``r2`` (not radius) is the stored parameter, matching the on-disk /
    reference layout (gen_data.py:109).  All float leaves are
    differentiable; ``material`` and ``light_index`` ride along as static
    metadata.
    """
    return {
        "r2": jnp.asarray(scene.r2, dtype),
        "center": jnp.asarray(scene.center, dtype),
        "emission": jnp.asarray(scene.emission, dtype),
        "albedo": jnp.asarray(scene.color, dtype),
        "material": jnp.asarray(scene.material, jnp.int32),
        "light_index": int(scene.light_index),
    }


# ------------------------------------------------------------------------
# Reference-parity mode
# ------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("bounces", "eps"))
def render_reference(rays, scene: dict, *, bounces: int = 5, eps: float = 1e-4):
    """Render with exact reference-kernel semantics.

    Args:
      rays: [N, 6] float32 (ox oy oz dx dy dz).
      scene: pytree from :func:`scene_to_device`.

    Returns colors [N, 3] float32 = throughput * light emission
    (render.cpp:194-196).
    """
    o = rays[:, 0:3]
    d = rays[:, 3:6]
    n = o.shape[0]
    s = scene["r2"].shape[0]
    light = scene["light_index"]

    throughput = jnp.ones((n, 3), rays.dtype)
    alive = jnp.ones((n,), bool)

    def body(_, state):
        o, d, throughput, alive = state
        t = intersect_spheres(o, d, scene["center"], scene["r2"], eps)
        tmin, hit, miss = reduce_hit(t)
        # Miss => sphere_id -1 in the oracle, which wrap-indexes to the
        # last sphere in gathers (gen_data.py:343,390). jnp gather clamps
        # instead, so make it explicit.
        gather_id = jnp.where(miss, s - 1, hit)
        centers_hit = scene["center"][gather_id]
        o2, d2 = shade.specular_bounce(o, d, tmin, centers_hit)
        # Mask update BEFORE throughput multiply (gen_data.py:379-390).
        hit_light = (hit == light) & ~miss
        alive2 = alive & ~hit_light
        mult = scene["albedo"][gather_id]
        throughput2 = jnp.where(alive2[:, None], throughput * mult, throughput)
        return o2, d2, throughput2, alive2

    o, d, throughput, alive = jax.lax.fori_loop(
        0, bounces, body, (o, d, throughput, alive), unroll=True
    )
    return throughput * scene["emission"][light][None, :]


# ------------------------------------------------------------------------
# Full physically-based mode (north star)
# ------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("bounces", "rr_depth", "eps"))
def render_pt(
    key,
    rays,
    scene: dict,
    *,
    bounces: int = 8,
    rr_depth: int = 5,
    eps: float = 1e-4,
):
    """Full smallpt estimator: L = sum over bounces of throughput *
    emission(hit), with cosine-weighted diffuse, mirror and dielectric
    BSDFs and Russian roulette from ``rr_depth``.

    ``key``: a PRNG key; per-bounce subkeys are folded in, and per-ray
    streams are independent via the [N]-shaped draws (sharding-stable when
    the caller derives ``key`` from global ray indices).
    """
    o = rays[:, 0:3]
    d = rays[:, 3:6]
    n = o.shape[0]

    radiance = jnp.zeros((n, 3), rays.dtype)
    throughput = jnp.ones((n, 3), rays.dtype)
    alive = jnp.ones((n,), bool)

    centers = scene["center"]
    r2 = scene["r2"]
    albedo = scene["albedo"]
    emission = scene["emission"]
    material = scene["material"]

    def body(depth, state):
        key, o, d, radiance, throughput, alive = state
        key, k1 = jax.random.split(key)
        u = jax.random.uniform(k1, (n, 3), dtype=rays.dtype)

        t = intersect_spheres(o, d, centers, r2, eps)
        tmin, hit, miss = reduce_hit(t)
        live = alive & ~miss

        hitpos = o + d * tmin[:, None]
        ch = centers[hit]
        normal = shade.normalize(hitpos - ch)
        # Oriented normal (against the incoming ray).
        into = jnp.sum(normal * d, axis=-1, keepdims=True) < 0
        nl = jnp.where(into, normal, -normal)

        emit = emission[hit]
        radiance = radiance + jnp.where(
            live[:, None], throughput * emit, 0.0
        )

        alb = albedo[hit]
        mat = material[hit]

        # --- candidate next directions for each material ---------------
        d_diff = shade.cosine_sample_hemisphere(nl, u[:, 0], u[:, 1])
        d_spec = shade.reflect(d, normal)
        d_refr, refr_scale = shade.refract_or_reflect(d, normal, nl, u[:, 0])

        is_diff = mat == DIFF
        is_spec = mat == SPEC
        is_refr = mat == REFR
        new_d = jnp.where(
            is_diff[:, None], d_diff, jnp.where(is_spec[:, None], d_spec, d_refr)
        )
        scale = jnp.where(is_refr, refr_scale, 1.0)
        throughput = jnp.where(
            live[:, None], throughput * alb * scale[:, None], throughput
        )

        # Russian roulette after rr_depth (unbiased).
        def rr(args):
            throughput, alive = args
            tp, survive = shade.russian_roulette(throughput, u[:, 2])
            return tp, alive & survive

        throughput, alive_rr = jax.lax.cond(
            depth >= rr_depth, rr, lambda a: a, (throughput, live)
        )
        alive = live & alive_rr

        new_o = hitpos + nl[:, 0:3] * eps * jnp.where(is_refr, -1.0, 1.0)[:, None]
        # Offset along the oriented normal to avoid self-intersection;
        # refractive rays may cross the surface so keep origin on hitpos.
        new_o = jnp.where(is_refr[:, None], hitpos, new_o)
        o = jnp.where(live[:, None], new_o, o)
        d = jnp.where(live[:, None], new_d, d)
        return key, o, d, radiance, throughput, alive

    state = (key, o, d, radiance, throughput, alive)
    state = jax.lax.fori_loop(0, bounces, body, state)
    return state[3]
