"""Pipeline-parallelism (GPipe over bounces) gates: must equal the
single-device megakernel bit for bit (float64)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ascendpathtracing_tpu import camera, scenes
from ascendpathtracing_tpu.models import megakernel
from ascendpathtracing_tpu.parallel.pipeline import render_reference_pipelined


@pytest.fixture(scope="module")
def setup():
    rays = jnp.asarray(camera.generate_rays_numpy(16, 16, 1, seed=0))
    scene = megakernel.scene_to_device(scenes.cornell8(), dtype=jnp.float64)
    expect = np.asarray(megakernel.render_reference(rays, scene, bounces=8))
    return rays, scene, expect


@pytest.mark.parametrize("stages,microbatches", [(2, 4), (4, 8), (8, 16)])
def test_pipelined_equals_megakernel(setup, stages, microbatches):
    if len(jax.devices()) < stages:
        pytest.skip("not enough devices")
    rays, scene, expect = setup
    mesh = Mesh(np.asarray(jax.devices()[:stages]), ("stage",))
    got = np.asarray(
        render_reference_pipelined(
            rays, scene, mesh, bounces=8, microbatches=microbatches
        )
    )
    np.testing.assert_array_equal(expect, got)


def test_pipelined_validates_divisibility(setup):
    rays, scene, _ = setup
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("stage",))
    with pytest.raises(ValueError, match="not divisible"):
        render_reference_pipelined(rays, scene, mesh, bounces=6, microbatches=8)
    with pytest.raises(ValueError, match="not divisible"):
        render_reference_pipelined(rays, scene, mesh, bounces=8, microbatches=7)
