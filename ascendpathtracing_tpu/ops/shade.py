"""Shading ops: reflection, diffuse sampling, refraction, Russian roulette.

The reference implements pure specular reflection only
(``GenerateNewRays``, rt_helper.h:689-703 — no RNG on device, see the Q&A
comment at rt_helper.h:683-687).  The ``"pt"`` mode adds the full smallpt
BSDF set: cosine-weighted diffuse, mirror, and dielectric refraction with
Schlick-approximated Fresnel, sampled with ``jax.random`` (on-device
threefry; per-ray keys derive from global ray index so results are
sharding-invariant).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(v, axis=-1, eps=0.0):
    """Safe normalize: returns 0 where the norm is 0/inf (the reference's
    float32 overflow path on missed rays: |v| ~ 1e20 -> norm^2 = inf ->
    v/inf = 0, leaving the direction unchanged downstream)."""
    n2 = jnp.sum(v * v, axis=axis, keepdims=True)
    inv = jnp.where(n2 > eps, jax.lax.rsqrt(n2), 0.0)
    return v * inv


def reflect(d, n):
    """Mirror reflect: d' = d - 2 (d.n) n (rt_helper.h:689-703)."""
    dn = jnp.sum(d * n, axis=-1, keepdims=True)
    return d - 2.0 * dn * n


def specular_bounce(o, d, tmin, centers_hit):
    """The reference's bounce: hitPos = o + d*t; normal = normalize(hitPos
    - center); reflect (rt_helper.h:504-709). Component order mirrors the
    NumPy oracle for float32 parity."""
    hx = o[..., 0] + d[..., 0] * tmin
    hy = o[..., 1] + d[..., 1] * tmin
    hz = o[..., 2] + d[..., 2] * tmin
    nx = hx - centers_hit[..., 0]
    ny = hy - centers_hit[..., 1]
    nz = hz - centers_hit[..., 2]
    n2 = nx * nx + ny * ny + nz * nz
    inv = jnp.where(n2 > 0, 1.0 / jnp.sqrt(n2), 0.0)
    nx, ny, nz = nx * inv, ny * inv, nz * inv
    dn = d[..., 0] * nx + d[..., 1] * ny + d[..., 2] * nz
    two_dn = 2.0 * dn
    new_d = jnp.stack(
        [d[..., 0] - two_dn * nx, d[..., 1] - two_dn * ny, d[..., 2] - two_dn * nz],
        axis=-1,
    )
    new_o = jnp.stack([hx, hy, hz], axis=-1)
    return new_o, new_d


def cosine_sample_hemisphere(n, u1, u2):
    """Cosine-weighted direction about unit normal n (smallpt's
    w/u/v frame construction). u1, u2 in [0,1)."""
    r1 = 2.0 * jnp.pi * u1
    r2 = u2
    r2s = jnp.sqrt(r2)
    w = n
    # Build tangent frame: pick the axis least aligned with w.
    flip = jnp.abs(w[..., 0]) > 0.1
    a = jnp.stack(
        [jnp.where(flip, 0.0, 1.0), jnp.where(flip, 1.0, 0.0), jnp.zeros_like(w[..., 0])],
        axis=-1,
    )
    u = normalize(jnp.cross(a, w))
    v = jnp.cross(w, u)
    d = (
        u * (jnp.cos(r1) * r2s)[..., None]
        + v * (jnp.sin(r1) * r2s)[..., None]
        + w * jnp.sqrt(jnp.maximum(1.0 - r2, 0.0))[..., None]
    )
    return normalize(d)


def refract_or_reflect(d, n, outward, u, ior=1.5):
    """smallpt REFR: dielectric with Schlick Fresnel; returns (new_d,
    throughput_scale). ``outward`` = the geometric normal oriented against
    d; ``u`` uniform [0,1) decides reflect-vs-refract branch."""
    into = jnp.sum(n * outward, axis=-1, keepdims=True) > 0
    nnt = jnp.where(into[..., 0], 1.0 / ior, ior)
    ddn = jnp.sum(d * outward, axis=-1)
    cos2t = 1.0 - nnt * nnt * (1.0 - ddn * ddn)
    refl = reflect(d, n)
    # Total internal reflection when cos2t < 0.
    sqrt_c = jnp.sqrt(jnp.maximum(cos2t, 0.0))
    tdir = normalize(
        d * nnt[..., None]
        - n * (jnp.where(into[..., 0], 1.0, -1.0) * (ddn * nnt + sqrt_c))[..., None]
    )
    a = ior - 1.0
    b = ior + 1.0
    r0 = (a * a) / (b * b)
    c = 1.0 - jnp.where(into[..., 0], -ddn, jnp.sum(tdir * n, axis=-1))
    re = r0 + (1.0 - r0) * c**5
    tr = 1.0 - re
    p = 0.25 + 0.5 * re
    pick_refl = (u < p) | (cos2t < 0)
    new_d = jnp.where(pick_refl[..., None], refl, tdir)
    scale = jnp.where(
        cos2t < 0,
        1.0,
        jnp.where(pick_refl, re / p, tr / (1.0 - p)),
    )
    return new_d, scale


def russian_roulette(throughput, u, p_min=0.1):
    """Continue with probability p = clamp(max component); survivors get
    throughput / p (unbiased). Returns (new_throughput, alive_mask)."""
    p = jnp.clip(jnp.max(throughput, axis=-1), p_min, 0.95)
    survive = u < p
    scaled = throughput / p[..., None]
    return jnp.where(survive[..., None], scaled, throughput), survive
