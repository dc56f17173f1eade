"""Custom-VJP fused renderer: hand-written Pallas backward vs jax AD of
the jit megakernel (interpret mode; hardware throughput via bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ascendpathtracing_tpu import camera, scenes
from ascendpathtracing_tpu.models import megakernel
from ascendpathtracing_tpu.ops import pallas_kernels as pk


@pytest.fixture(scope="module")
def setup():
    scene = scenes.cornell8()
    planes = jnp.asarray(scene.soa10())
    rays = camera.generate_rays_numpy(16, 16, 1, seed=0).astype(np.float32)
    dev = megakernel.scene_to_device(scene)
    return scene, planes, rays, dev


def _ad_grads(dev, rays, bounces):
    def loss(alb, emi):
        sc = dict(dev, albedo=alb, emission=emi)
        return jnp.sum(
            megakernel.render_reference_impl(jnp.asarray(rays), sc, bounces=bounces)
        )

    ga, ge = jax.grad(loss, argnums=(0, 1))(dev["albedo"], dev["emission"])
    return np.asarray(ga), np.asarray(ge)


@pytest.mark.parametrize("replay", [False, True])
@pytest.mark.parametrize("bounces", [1, 5])
def test_custom_vjp_matches_ad(setup, bounces, replay):
    scene, planes, rays, dev = setup
    rp = jnp.asarray(rays.T.copy())
    render = pk.make_render_reference_pallas_diff(
        light_index=7, bounces=bounces, tile=1024, interpret=True, replay=replay
    )
    gp = np.asarray(jax.grad(lambda p: jnp.sum(render(rp, p)))(planes))
    ga, ge = _ad_grads(dev, rays, bounces)
    np.testing.assert_allclose(gp[7:10].T, ga, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(gp[4:7].T, ge, rtol=1e-4, atol=1e-3)
    # geometry + ray grads are exactly zero (discrete-only dependence)
    assert np.abs(gp[0:4]).max() == 0.0


@pytest.mark.parametrize("bounces", [1, 5])
def test_replay_bwd_bitwise_matches_recompute_bwd(setup, bounces):
    """Given the same cotangent, the replay backward reproduces the
    recompute backward to ~1 ULP (the accumulators are reconstructed
    bitwise from stored winner indices, but the final tile contraction is
    a jnp.sum whose reduction split XLA chooses per-program — in interpret
    mode the two different HLO programs may reassociate it)."""
    _, planes, rays, _ = setup
    rp = jnp.asarray(rays.T.copy())
    n = rays.shape[0]
    g = jnp.asarray(
        np.arange(3 * n, dtype=np.float32).reshape(3, n)
    )  # non-trivial cotangent: weight each ray/channel differently
    d_re = pk._render_ref_bwd(
        rp, planes, g, light_index=7, bounces=bounces, eps=1e-4, tile=1024,
        interpret=True,
    )
    _, idx = pk.render_reference_pallas_planes_with_idx(
        rp, planes, light_index=7, bounces=bounces, tile=1024, interpret=True
    )
    d_rp = pk._render_ref_bwd_replay(
        idx, planes, g, light_index=7, bounces=bounces, tile=1024,
        interpret=True,
    )
    d_re, d_rp = np.asarray(d_re), np.asarray(d_rp)
    np.testing.assert_allclose(d_re, d_rp, rtol=1e-6)
    # structural zeros (r2/center planes: discrete-only dependence) exact
    assert np.abs(d_rp[0:4]).max() == 0.0
    np.testing.assert_array_equal(d_re[0:4], d_rp[0:4])

    grads = []
    for replay in (False, True):
        render = pk.make_render_reference_pallas_diff(
            light_index=7, bounces=bounces, tile=1024, interpret=True,
            replay=replay,
        )

        def loss(p, render=render):
            out = render(rp, p)
            w = jnp.arange(out.size, dtype=out.dtype).reshape(out.shape)
            return jnp.sum(out * w)

        grads.append(np.asarray(jax.grad(loss)(planes)))
    np.testing.assert_allclose(grads[0], grads[1], rtol=1e-6)


def test_fwd_idx_values_and_indices(setup):
    """colors from the idx-emitting forward == plain forward bitwise; the
    stored indices agree with the jit megakernel's winner/miss semantics
    at bounce 0 (first hit)."""
    scene, planes, rays, dev = setup
    rp = jnp.asarray(rays.T.copy())
    colors, idx = pk.render_reference_pallas_planes_with_idx(
        rp, planes, light_index=7, bounces=5, tile=1024, interpret=True
    )
    plain = pk.render_reference_pallas_planes(
        rp, planes, light_index=7, bounces=5, tile=1024, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(colors), np.asarray(plain))
    assert idx.shape == (5, rays.shape[0]) and idx.dtype == np.int32
    # all entries in [0, S]; S encodes a miss
    i0 = np.asarray(idx)
    assert i0.min() >= 0 and i0.max() <= 8


def test_custom_vjp_forward_value_unchanged(setup):
    scene, planes, rays, dev = setup
    rp = jnp.asarray(rays.T.copy())
    render = pk.make_render_reference_pallas_diff(
        light_index=7, bounces=5, tile=1024, interpret=True
    )
    plain = pk.render_reference_pallas_planes(
        rp, planes, light_index=7, bounces=5, tile=1024, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(render(rp, planes)), np.asarray(plain))


def test_custom_vjp_zero_ray_grads(setup):
    _, planes, rays, _ = setup
    rp = jnp.asarray(rays.T.copy())
    render = pk.make_render_reference_pallas_diff(
        light_index=7, bounces=3, tile=1024, interpret=True
    )
    dr = jax.grad(lambda r: jnp.sum(render(r, planes)))(rp)
    assert np.abs(np.asarray(dr)).max() == 0.0
