"""Multi-device sharding tests on the 8-virtual-CPU-device mesh
(conftest.py sets --xla_force_host_platform_device_count=8 — the analogue
of the reference's tikicpulib CPU-sim of its 8 cores, SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ascendpathtracing_tpu import camera, scenes
from ascendpathtracing_tpu.models import megakernel
from ascendpathtracing_tpu.parallel import (
    make_mesh,
    render_reference_sharded,
    shard_rays,
)
from ascendpathtracing_tpu.parallel.sharded import make_train_step, split_scene_params


@pytest.fixture(scope="module", autouse=True)
def _need_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


def _rays64(w=32, h=32):
    # float64 for stable (chaos-free) cross-topology comparison — see
    # test_reference_parity.py docstring.
    return camera.generate_rays_numpy(w, h, 1, seed=0)


def test_mesh_construction():
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh1 = make_mesh(8, model_parallel=1)
    assert mesh1.shape == {"data": 8, "model": 1}


@pytest.mark.parametrize("model_parallel", [1, 2, 4])
def test_sharded_render_matches_single_device(model_parallel):
    """DP x TP sharded render must equal the single-device render exactly
    (float64; includes the TP tie-break path)."""
    mesh = make_mesh(8, model_parallel=model_parallel)
    rays = _rays64()
    dev = megakernel.scene_to_device(scenes.cornell8(), dtype=jnp.float64)
    expect = np.asarray(megakernel.render_reference(rays, dev, bounces=5))
    rays_sh = shard_rays(rays, mesh)
    got = np.asarray(render_reference_sharded(rays_sh, dev, mesh, bounces=5))
    np.testing.assert_array_equal(expect, got)


@pytest.mark.parametrize("traversal", ["brute", "jnp"])
def test_sharded_mesh_render_matches_single_device(traversal):
    """DP-sharded mesh PT render (VERDICT r2 item 3) must equal the
    single-device render BITWISE: bit_equal mode draws the uniform
    stream once at global size and shards it with the rays."""
    from ascendpathtracing_tpu.accel import meshes as mesh_lib
    from ascendpathtracing_tpu.models import mesh as mesh_mod
    from ascendpathtracing_tpu.parallel import render_pt_mesh_sharded

    v, f = mesh_lib.cube(center=(50, 30, 60), size=25.0)
    ms = mesh_mod.MeshScene.cornell_with_mesh(v, f, albedo=(0.8, 0.5, 0.2))
    mdev = mesh_mod.mesh_scene_to_device(
        ms, dtype=jnp.float64, use_bvh=(traversal == "jnp")
    )
    rays = jnp.asarray(_rays64(16, 16))
    key = jax.random.PRNGKey(3)
    expect = np.asarray(mesh_mod.render_pt_mesh(key, rays, mdev, bounces=4))

    mesh = make_mesh(8)
    got = np.asarray(
        render_pt_mesh_sharded(key, rays, mdev, mesh, bounces=4)
    )
    np.testing.assert_array_equal(expect, got)


def test_sharded_mesh_render_indexed_rng_bitwise():
    """The PRODUCTION bitwise mode (VERDICT r3 weak 7): counter-based
    uniforms keyed by global ray index — sharded == single-device
    BITWISE with no materialized [bounces, 3, N] stream (the bit_equal
    =True mode's memory cost made it unusable at production size)."""
    from ascendpathtracing_tpu.accel import meshes as mesh_lib
    from ascendpathtracing_tpu.models import mesh as mesh_mod
    from ascendpathtracing_tpu.parallel import render_pt_mesh_sharded

    v, f = mesh_lib.icosphere(center=(50, 30, 60), radius=14.0,
                              subdivisions=1)
    ms = mesh_mod.MeshScene.cornell_with_mesh(v, f, albedo=(0.8, 0.5, 0.2))
    mdev = mesh_mod.mesh_scene_to_device(ms, dtype=jnp.float64,
                                         use_bvh=True)
    rays = jnp.asarray(_rays64(16, 16))
    key = jax.random.PRNGKey(3)
    n = rays.shape[0]
    expect = np.asarray(mesh_mod.render_pt_mesh(
        key, rays, mdev, bounces=4,
        global_idx=jnp.arange(n, dtype=jnp.int32),
    ))

    mesh = make_mesh(8)
    got = np.asarray(render_pt_mesh_sharded(
        key, rays, mdev, mesh, bounces=4, bit_equal="indexed"
    ))
    np.testing.assert_array_equal(expect, got)


def test_sharded_mesh_render_chunks_kernel_bitwise():
    """The flagship Pallas CHUNKS traversal kernel composed under
    shard_map (VERDICT r4 ask 8 — the one composition with no coverage
    anywhere): interpret-mode pallas_call inside each shard of the
    8-virtual-device DP mesh, indexed counter-based RNG.  Per-lane
    traversal is exact regardless of tile composition, so the sharded
    render must be BITWISE-equal to the single-device render through
    the same kernel."""
    from ascendpathtracing_tpu.accel import meshes as mesh_lib
    from ascendpathtracing_tpu.models import mesh as mesh_mod
    from ascendpathtracing_tpu.parallel import render_pt_mesh_sharded

    v, f = mesh_lib.icosphere(center=(50, 30, 60), radius=14.0,
                              subdivisions=1)
    ms = mesh_mod.MeshScene.cornell_with_mesh(v, f, albedo=(0.8, 0.5, 0.2))
    mdev = mesh_mod.mesh_scene_to_device(
        ms, dtype=jnp.float32, pallas_bvh_kernel=True, tris_per_chunk=16
    )
    assert mdev["static"].traversal == "chunks"
    rays = jnp.asarray(_rays64(16, 16).astype(np.float32))
    key = jax.random.PRNGKey(3)
    n = rays.shape[0]
    expect = np.asarray(mesh_mod.render_pt_mesh(
        key, rays, mdev, bounces=3,
        global_idx=jnp.arange(n, dtype=jnp.int32),
    ))

    mesh = make_mesh(8)
    got = np.asarray(render_pt_mesh_sharded(
        key, rays, mdev, mesh, bounces=3, bit_equal="indexed"
    ))
    assert np.isfinite(got).all()
    np.testing.assert_array_equal(expect, got)


def test_sphere_pt_indexed_rng_is_split_stable():
    """The sphere PT estimator with global_idx is SPLIT-STABLE: rendering
    any contiguous piece with its global indices reproduces the full
    render's slice bitwise — the property that makes indexed RNG the
    production sharding mode (megakernel.indexed_uniforms)."""
    rays = jnp.asarray(_rays64(16, 16))
    dev = megakernel.scene_to_device(scenes.smallpt9(), dtype=jnp.float64)
    mats = tuple(int(m) for m in scenes.smallpt9().material)
    key = jax.random.PRNGKey(5)
    n = rays.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    full = np.asarray(megakernel.render_pt(
        key, rays, dev, bounces=4, materials_static=mats, global_idx=idx
    ))
    h = n // 2
    lo = np.asarray(megakernel.render_pt(
        key, rays[:h], dev, bounces=4, materials_static=mats,
        global_idx=idx[:h],
    ))
    hi = np.asarray(megakernel.render_pt(
        key, rays[h:], dev, bounces=4, materials_static=mats,
        global_idx=idx[h:],
    ))
    np.testing.assert_array_equal(full, np.concatenate([lo, hi], 0))


def test_sharded_mesh_render_independent_rng_energy():
    """bit_equal=False (per-shard folded keys, the production-size mode)
    renders the same scene at statistically consistent energy."""
    from ascendpathtracing_tpu.accel import meshes as mesh_lib
    from ascendpathtracing_tpu.models import mesh as mesh_mod
    from ascendpathtracing_tpu.parallel import render_pt_mesh_sharded

    v, f = mesh_lib.cube(center=(50, 30, 60), size=25.0)
    ms = mesh_mod.MeshScene.cornell_with_mesh(v, f, albedo=(0.8, 0.5, 0.2))
    mdev = mesh_mod.mesh_scene_to_device(ms, dtype=jnp.float64, use_bvh=False)
    rays = jnp.asarray(_rays64(32, 32))
    key = jax.random.PRNGKey(3)
    ref = np.asarray(mesh_mod.render_pt_mesh(key, rays, mdev, bounces=4))

    mesh = make_mesh(8)
    got = np.asarray(
        render_pt_mesh_sharded(key, rays, mdev, mesh, bounces=4,
                               bit_equal=False)
    )
    assert np.isfinite(got).all()
    rel = abs(got.mean() - ref.mean()) / max(ref.mean(), 1e-9)
    assert rel < 0.1, (got.mean(), ref.mean())


def test_train_step_runs_and_reduces_loss():
    mesh = make_mesh(8)
    rays = _rays64(16, 16)
    scene = megakernel.scene_to_device(scenes.cornell8(), dtype=jnp.float64)
    target = megakernel.render_reference(rays, scene, bounces=3)
    params, aux = split_scene_params(scene)
    # Perturb albedo; training should pull the loss down.
    params = dict(params, albedo=params["albedo"] + 0.05)
    step = make_train_step(mesh, bounces=3, learning_rate=0.02)
    rays_sh = shard_rays(jnp.asarray(rays), mesh)
    target_sh = shard_rays(target, mesh)

    losses = []
    for _ in range(10):
        loss, params = step(params, aux, rays_sh, target_sh)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_sharded_grads_match_single_device():
    """GSPMD-sharded gradient == single-device gradient (float64 exact-ish)."""
    rays = jnp.asarray(_rays64(16, 16))
    scene = megakernel.scene_to_device(scenes.cornell8(), dtype=jnp.float64)
    target = megakernel.render_reference(rays, scene, bounces=3)
    params, aux = split_scene_params(scene)
    params = dict(params, albedo=params["albedo"] + 0.03)

    step1 = make_train_step(None, bounces=3, learning_rate=1.0)
    loss1, new1 = step1({k: v.copy() for k, v in params.items()}, aux, rays, target)

    mesh = make_mesh(8)
    stepn = make_train_step(mesh, bounces=3, learning_rate=1.0)
    loss_n, new_n = stepn(
        {k: v.copy() for k, v in params.items()},
        aux,
        shard_rays(rays, mesh),
        shard_rays(target, mesh),
    )
    assert np.isclose(float(loss1), float(loss_n), rtol=1e-12)
    for k in new1:
        np.testing.assert_allclose(
            np.asarray(new1[k]), np.asarray(new_n[k]), rtol=1e-9, atol=1e-12
        )


def test_async_collective_flags_refuse_after_backend_up(monkeypatch):
    """LIBTPU_INIT_ARGS can only help before libtpu starts; once the
    backend is up the helper must warn and refuse rather than silently
    'apply' flags that cannot take effect.  (The flags ride
    LIBTPU_INIT_ARGS, never XLA_FLAGS — unknown names there are a FATAL
    parse error on non-TPU plugins.)"""
    from ascendpathtracing_tpu.parallel import distributed

    monkeypatch.delenv("LIBTPU_INIT_ARGS", raising=False)
    with pytest.warns(UserWarning, match="already initialized"):
        assert distributed.apply_async_collective_flags() is False
    # idempotence: with the flags already present it reports success
    monkeypatch.setenv("LIBTPU_INIT_ARGS", distributed.TPU_ASYNC_FLAGS)
    assert distributed.apply_async_collective_flags() is True
