"""Wavefront renderers — hardware-only smoke + energy tests (run with
``APT_TPU_TESTS=1 python -m pytest tests/ -q -k tpu``).

Exists because of an r3 regression class the CPU suite cannot catch:
the sphere wavefront's argsort+gather compaction CRASHED the TPU worker
process at every pool size (jax.errors.JaxRuntimeError UNAVAILABLE)
while passing every CPU test — the fix (fused multi-operand lax.sort
compaction) is only provably safe by executing the program on the chip.
"""

import numpy as np
import pytest

import jax


def _tpu_available():
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False


pytestmark = pytest.mark.skipif(not _tpu_available(), reason="needs real TPU")


def test_wavefront_sphere_runs_on_chip():
    from ascendpathtracing_tpu import scenes
    from ascendpathtracing_tpu.models import megakernel, wavefront as wf

    scene = megakernel.scene_to_device(scenes.cornell8())
    out = np.asarray(
        wf.render_wavefront(
            jax.random.PRNGKey(0), scene, width=32, height=32, spp4=32,
            pool=1 << 12, bounces=8, rr_depth=5,
        )
    )
    assert np.isfinite(out).all() and out.std() > 0
    # energy parity vs the jit megakernel estimator
    import jax.numpy as jnp

    from ascendpathtracing_tpu import camera

    rays = camera.generate_rays_numpy(32, 32, 8, seed=0).astype(np.float32)
    ref = np.asarray(
        megakernel.render_pt(
            jax.random.PRNGKey(1), jnp.asarray(rays), scene, bounces=8
        )
    ).reshape(32 * 32, 32, 3).mean(1)
    ratio = out.mean() / max(ref.mean(), 1e-9)
    assert 0.9 < ratio < 1.1, ratio


def test_wavefront_mesh_runs_on_chip():
    from ascendpathtracing_tpu.accel import meshes as mesh_lib
    from ascendpathtracing_tpu.models import mesh as mesh_mod, wavefront as wf

    v, f = mesh_lib.icosphere(center=(50, 40, 60), radius=14.0, subdivisions=3)
    ms = mesh_mod.MeshScene.cornell_with_mesh(v, f, albedo=(0.85, 0.55, 0.2))
    mdev = mesh_mod.mesh_scene_to_device(ms, pallas_bvh_kernel=True)
    out = np.asarray(
        wf.render_wavefront_mesh(
            jax.random.PRNGKey(0), mdev, width=32, height=32, spp4=16,
            pool=2048, bounces=6, rr_depth=4,
        )
    )
    assert np.isfinite(out).all() and out.std() > 0
