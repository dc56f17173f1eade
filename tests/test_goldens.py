"""Golden PPM regression (the formalized version of the reference's
committed Pystd-color.ppm golden, SURVEY §4.3): the NumPy oracle render
of fixed configs must reproduce the committed images exactly.

The oracle is pure elementwise NumPy (no BLAS reductions), so its float32
output is machine-stable; the decoded uint8 PPM is the committed
artifact. Regenerate with the snippet in this file's history if the
*semantics* intentionally change."""

import os

import numpy as np
import pytest

from ascendpathtracing_tpu import camera, oracle, scenes
from ascendpathtracing_tpu.utils import io

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.mark.parametrize(
    "w,h,s,b,name",
    [
        (16, 16, 1, 5, "cornell8_16x16_b5"),  # the reference's shipped config
        (64, 64, 1, 5, "cornell8_64x64_b5"),  # the golden-image size (Pystd-color.ppm)
    ],
)
def test_oracle_matches_golden(w, h, s, b, name):
    scene = scenes.cornell8()
    rays = camera.generate_rays_numpy(w, h, s, seed=0).astype(np.float32)
    colors = oracle.render_reference_numpy(rays, scene, bounces=b)
    img = io.decode_color(colors, w, h, s)
    golden = io.read_ppm(os.path.join(GOLDEN_DIR, f"{name}.ppm"))
    np.testing.assert_array_equal(img, golden)


def test_renderer_close_to_golden():
    """The jit renderer vs the committed golden: bounded by the f32 chaos
    envelope (bitwise gates live in test_reference_parity.py)."""
    from ascendpathtracing_tpu.models import megakernel

    w = h = 16
    scene = scenes.cornell8()
    rays = camera.generate_rays_numpy(w, h, 1, seed=0).astype(np.float32)
    dev = megakernel.scene_to_device(scene)
    colors = np.asarray(megakernel.render_reference(rays, dev, bounces=5))
    img = io.decode_color(colors, w, h, 1)
    golden = io.read_ppm(os.path.join(GOLDEN_DIR, "cornell8_16x16_b5.ppm"))
    equal = (img == golden).all(axis=-1).mean()
    assert equal > 0.3, f"only {equal:.1%} pixels equal"
    mean_diff = np.abs(img.astype(float) - golden.astype(float)).mean()
    assert mean_diff < 35.0, mean_diff
