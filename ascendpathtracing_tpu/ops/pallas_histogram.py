"""TPU-native segment-sum: scatter-add rebuilt as one-hot x MXU matmul.

XLA lowers ``segment_sum`` to a scatter-add, which serializes on TPU —
measured ~10 ns per row update (324 ms for the mesh backward's 33.5M
slot-gradient rows).  The TPU-native shape for "accumulate rows into
segments" is the embedding-gradient pattern: build the one-hot
membership matrix ON-CHIP in VMEM (never materialized to HBM) and feed
the systolic array:

    d[r, s] += vals[r, n] @ onehot[s, n]^T     per (slot-block, sample-block)

Cost is O(N * n_slots) compares + MAC — bandwidth-free but
segment-count-proportional, so it wins below a few thousand segments
and loses to the count-proportional scatter beyond (the mesh backward
auto-selects; crossover measured around ~16k slots on v5e).

Layout notes (the reasons this kernel looks the way it does):
- the one-hot is (SB, NB) from an iota COLUMN vs the segment-id ROW —
  both broadcast-friendly orientations;
- the dot contracts the MINOR dims of both operands (A @ B^T, the
  attention-QK^T form Mosaic lowers natively), giving (8, SB) with a
  128-multiple minor;
- values ride as 8 sublane rows (6 live + 2 zero pads);
- the output block is revisited across the INNER sample-block grid
  dimension, so accumulation stays in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hist_kernel(seg_ref, vals_ref, out_ref, *, sb, nb8):
    j = pl.program_id(0)  # slot block (outer)
    i = pl.program_id(1)  # sample block (inner; out block resident)
    slot0 = j * sb
    iota = jax.lax.broadcasted_iota(jnp.int32, (sb, 1), 0) + slot0
    # seg rides as (8, NB/8) — (1, NB) rows violate the (8, 128) block
    # tiling rule — so the one-hot matmul runs as 8 sublane-row dots
    contrib = jnp.zeros((8, sb), jnp.float32)
    vals = vals_ref[0]                       # (8, NB)
    for sub in range(8):
        seg_row = seg_ref[0, sub : sub + 1, :]          # (1, NB8)
        oh = (iota == seg_row).astype(jnp.float32)      # (SB, NB8)
        contrib = contrib + jax.lax.dot_general(
            vals[:, sub * nb8 : (sub + 1) * nb8], oh,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (8, SB)

    @pl.when(i == 0)
    def _():
        out_ref[0] = contrib

    @pl.when(i > 0)
    def _():
        out_ref[0] = out_ref[0] + contrib


@functools.partial(
    jax.jit, static_argnames=("n_slots", "slot_block", "sample_block",
                              "interpret"),
)
def segment_rows_matmul(
    seg,      # [N] i32 segment ids (out of range -> dropped)
    vals,     # [R, N] f32 rows to accumulate, R <= 8
    *,
    n_slots: int,
    slot_block: int = 512,
    sample_block: int = 2048,
    interpret: bool = False,
):
    """Returns [n_slots, R]: sum of vals[:, n] over seg[n] == s."""
    r, n = vals.shape
    if r > 8:
        raise ValueError("R must be <= 8 (one sublane block)")
    nb = sample_block
    sbk = slot_block
    n_pad = -(-n // nb) * nb
    s_pad = -(-n_slots // sbk) * sbk
    seg = jnp.pad(seg.astype(jnp.int32), (0, n_pad - n),
                  constant_values=-1)
    vals = jnp.pad(vals.astype(jnp.float32), ((0, 8 - r), (0, n_pad - n)))
    n_sb = n_pad // nb
    nb8 = nb // 8
    seg2 = seg.reshape(n_sb, 8, nb8)
    vals3 = vals.reshape(8, n_sb, nb).swapaxes(0, 1)  # [n_sb, 8, NB]
    n_jb = s_pad // sbk

    out = pl.pallas_call(
        functools.partial(_hist_kernel, sb=sbk, nb8=nb8),
        grid=(n_jb, n_sb),
        in_specs=[
            pl.BlockSpec((1, 8, nb8), lambda j, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, nb), lambda j, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, sbk), lambda j, i: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_jb, 8, sbk), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 8 * n_pad * s_pad,
            bytes_accessed=(n_pad * (4 + 32)) * n_jb + s_pad * 8 * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(seg2, vals3)
    # [n_jb, 8, SB] -> [s_pad, 8]: slot j*SB + k lives at [j, :, k]
    return out.transpose(0, 2, 1).reshape(s_pad, 8)[:n_slots, :r]
