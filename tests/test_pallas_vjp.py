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


@pytest.mark.parametrize("bounces", [1, 5])
def test_custom_vjp_matches_ad(setup, bounces):
    scene, planes, rays, dev = setup
    rp = jnp.asarray(rays.T.copy())
    render = pk.make_render_reference_pallas_diff(
        light_index=7, bounces=bounces, tile=1024, interpret=True
    )
    gp = np.asarray(jax.grad(lambda p: jnp.sum(render(rp, p)))(planes))
    ga, ge = _ad_grads(dev, rays, bounces)
    np.testing.assert_allclose(gp[7:10].T, ga, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(gp[4:7].T, ge, rtol=1e-4, atol=1e-3)
    # geometry + ray grads are exactly zero (discrete-only dependence)
    assert np.abs(gp[0:4]).max() == 0.0


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
