"""Renderers — the framework's "model zoo".

- ``megakernel``        — single fused jit render step (the TPU-native
  re-design of the reference's one fused Ascend C kernel,
  src/render.cpp:104-207): the whole bounce loop is one XLA program.
- ``pallas_megakernel`` — the same loop as a hand-fused Pallas TPU kernel:
  ray tiles live in VMEM across all bounces, HBM traffic is just the
  output image (the role UB tiles + TQue double-buffering play in
  render.cpp:30-37,52-59 is played by the Pallas grid pipeline).
- ``wavefront``         — per-bounce passes with ray compaction (the
  north-star upgrade over the reference's carry-dead-rays masking,
  rt_helper.h:787-810).
"""

from ascendpathtracing_tpu.models.megakernel import (
    render_reference,
    render_pt,
    scene_to_device,
)

__all__ = ["render_reference", "render_pt", "scene_to_device"]
