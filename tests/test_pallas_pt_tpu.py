"""Fully-fused pt Pallas kernel — hardware-only tests (the Pallas TPU
interpreter stubs prng_random_bits to zeros, so RNG-dependent output is
only meaningful on a real chip; these skip on CPU)."""

import numpy as np
import pytest

import jax


def _tpu_available():
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False


pytestmark = pytest.mark.skipif(not _tpu_available(), reason="needs real TPU")


def test_pt_pallas_energy_matches_megakernel():
    import jax.numpy as jnp

    from ascendpathtracing_tpu import camera, scenes
    from ascendpathtracing_tpu.models import megakernel
    from ascendpathtracing_tpu.ops import pallas_kernels as pk

    sc = scenes.cornell8()
    w = h = 32
    spp4 = 64
    img = np.asarray(
        pk.render_pt_pallas(
            jnp.asarray(sc.soa10()), width=w, height=h, spp4=spp4,
            materials=tuple(int(m) for m in sc.material), bounces=6,
            rr_depth=4, tile=1024,
        )
    )
    assert np.isfinite(img).all() and img.min() >= 0

    rays = camera.generate_rays_numpy(w, h, spp4 // 4, seed=0).astype(np.float32)
    dev = megakernel.scene_to_device(sc)
    ref = np.asarray(
        megakernel.render_pt(
            jax.random.PRNGKey(5), jnp.asarray(rays), dev, bounces=6, rr_depth=4
        )
    ).reshape(w * h, spp4, 3).mean(1).T
    corr = np.corrcoef(img.reshape(-1), ref.reshape(-1))[0, 1]
    ratio = img.mean() / ref.mean()
    assert corr > 0.9, corr
    assert 0.9 < ratio < 1.1, ratio
