"""Pipeline-parallelism (ring pipeline over bounces) gates: must equal
the single-device megakernel bit for bit (float64), with rays sharded
P('stage') so per-device memory is N/stages."""

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


@pytest.mark.parametrize("stages", [2, 4, 8])
def test_pipelined_equals_megakernel(setup, stages):
    if len(jax.devices()) < stages:
        pytest.skip("not enough devices")
    rays, scene, expect = setup
    mesh = Mesh(np.asarray(jax.devices()[:stages]), ("stage",))
    got = np.asarray(render_reference_pipelined(rays, scene, mesh, bounces=8))
    np.testing.assert_array_equal(expect, got)


def test_pipelined_output_is_stage_sharded(setup):
    """PP must BOUND memory: outputs (and ray state) stay sharded over
    the stage axis — the round-1 version replicated both."""
    rays, scene, _ = setup
    stages = min(4, len(jax.devices()))
    mesh = Mesh(np.asarray(jax.devices()[:stages]), ("stage",))
    out = render_reference_pipelined(rays, scene, mesh, bounces=8)
    assert len(out.sharding.device_set) == stages
    shard_rows = {sh.data.shape[0] for sh in out.addressable_shards}
    assert shard_rows == {rays.shape[0] // stages}


def test_pipelined_validates_divisibility(setup):
    rays, scene, _ = setup
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("stage",))
    with pytest.raises(ValueError, match="not divisible"):
        render_reference_pipelined(rays, scene, mesh, bounces=6)
    with pytest.raises(ValueError, match="not divisible"):
        render_reference_pipelined(rays[:1023], scene, mesh, bounces=8)
