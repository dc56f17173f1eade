"""Pallas fused-megakernel tests (interpreter mode on CPU; the same kernel
compiles for real TPU via Mosaic — exercised by bench/CLI on hardware)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ascendpathtracing_tpu import camera, oracle, scenes
from ascendpathtracing_tpu.models import megakernel
from ascendpathtracing_tpu.ops import pallas_kernels


def _scene_planes(dtype=np.float32):
    scene = scenes.cornell8()
    return scene, jnp.asarray(scene.soa10(), dtype)


def test_pallas_matches_oracle_one_bounce_bitwise():
    scene, planes = _scene_planes()
    rays = camera.generate_rays_numpy(32, 32, 1, seed=0).astype(np.float32)
    expect = oracle.render_reference_numpy(rays, scene, bounces=1)
    got = np.asarray(
        pallas_kernels.render_reference_pallas(
            jnp.asarray(rays), planes, light_index=7, bounces=1, tile=1024,
            interpret=True,
        )
    )
    np.testing.assert_array_equal(expect, got)


def test_pallas_matches_megakernel_float64_full_depth():
    """Stable full-logic gate: float64 interpret-mode Pallas vs the jit
    megakernel must agree to float64 noise at 5 bounces."""
    scene = scenes.cornell8()
    planes = jnp.asarray(scene.soa10(dtype=np.float64))
    rays = camera.generate_rays_numpy(32, 32, 1, seed=0)
    dev = megakernel.scene_to_device(scene, dtype=jnp.float64)
    expect = np.asarray(megakernel.render_reference(rays, dev, bounces=5))
    got = np.asarray(
        pallas_kernels.render_reference_pallas(
            jnp.asarray(rays), planes, light_index=7, bounces=5, tile=1024,
            interpret=True,
        )
    )
    np.testing.assert_allclose(expect, got, rtol=1e-12, atol=1e-12)


def test_pallas_pads_ragged_ray_count():
    scene, planes = _scene_planes()
    rays = camera.generate_rays_numpy(16, 10, 1, seed=1).astype(np.float32)  # 640 rays
    got = np.asarray(
        pallas_kernels.render_reference_pallas(
            jnp.asarray(rays), planes, light_index=7, bounces=2, tile=512,
            interpret=True,
        )
    )
    assert got.shape == (640, 3)
    assert np.isfinite(got).all()


def test_pallas_statistical_vs_megakernel_f32():
    scene, planes = _scene_planes()
    rays = camera.generate_rays_numpy(32, 32, 1, seed=2).astype(np.float32)
    dev = megakernel.scene_to_device(scene)
    expect = np.asarray(megakernel.render_reference(rays, dev, bounces=5))
    got = np.asarray(
        pallas_kernels.render_reference_pallas(
            jnp.asarray(rays), planes, light_index=7, bounces=5, tile=1024,
            interpret=True,
        )
    )
    diff = np.abs(expect - got).max(1)
    # f32 multi-bounce chaos envelope (see test_reference_parity.py).
    assert (diff == 0).mean() >= 0.6
