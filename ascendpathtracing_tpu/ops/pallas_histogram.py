"""TPU-native segment-sum: scatter-add rebuilt as one-hot x MXU matmul.

XLA lowers ``segment_sum`` to a scatter-add, which serializes on TPU —
measured ~10 ns per row update (324 ms for the mesh backward's 33.5M
slot-gradient rows).  The TPU-native shape for "accumulate rows into
segments" is the embedding-gradient pattern: build the one-hot
membership matrix ON-CHIP in VMEM (never materialized to HBM) and feed
the systolic array:

    d[r, s] += vals[r, n] @ onehot[s, n]^T     per (slot-block, sample-block)

The FLAT kernel (:func:`segment_rows_matmul`) pays O(N * n_slots)
compares + MAC — bandwidth-free but segment-count-proportional (146 ms
at 33.5M rows / 5.1k slots vs the scatter's 324; doubles per slot-count
doubling, crossing the scatter by ~16k slots).  The PAGED kernel
(:func:`segment_rows_paged`, VERDICT r4 ask 2) keeps the MXU shape but
pays only for OCCUPIED (sample-block, slot-block) pairs, and beats both
at every measured scale (r5, real replay streams on v5e: 112 ms at 5.1k
slots, 222 ms at 82k where the scatter takes 527 — slot_block=128/
sample_block=2048 sweep winner, benchmarks/histogram_sweep.py); the
mesh backward auto-selects paged up to the VMEM accumulator bound
(~256k slots) and the count-proportional scatter beyond.  The flat
kernel is kept as the zero-overhead dense case + comparison target.

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


# --------------------------------------------------------------- paged -----
def _paged_kernel(seg_ref, vals_ref, out_ref, kocc_ref, flags_ref,
                  blist_ref, *, sb, nb8, n_jb, log2_sb):
    """Occupancy-gated variant for large slot counts: the FULL
    [n_jb, 8, SB] accumulator stays VMEM-resident across the whole
    (sample-block-only) grid, and each sample block first compacts the
    list of slot blocks its rows actually touch — the traversal
    kernel's phase A + scalar-core compaction (ops/pallas_wbvh.py
    compact_worklist), applied to gradient binning — then runs the
    one-hot/MXU dot ONLY for listed blocks, accumulating at a dynamic
    leading index.  Worst case (every block occupied) equals the flat
    kernel's always-case; replay-residual streams are chunk-major and
    slot ids are spatially sorted, so real occupancy is far lower."""
    i = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    seg = seg_ref[0]                                  # (8, NB8) i32
    coarse = jax.lax.shift_right_arithmetic(seg, jnp.int32(log2_sb))
    vals = vals_ref[0]                                # (8, NB)

    # ---- occupancy scan -> flags (scan_static idiom) ------------------
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    for g in range(0, n_jb, 128):
        acc = jnp.zeros((8, 128), f32)
        for bl in range(min(128, n_jb - g)):
            m = jnp.max((coarse == (g + bl)).astype(f32), axis=1,
                        keepdims=True)
            acc = jnp.where(lane == bl, m, acc)
        flags_ref[:, g : g + 128] = acc
    flags_ref[0:1, :] = jnp.max(flags_ref[:, :], axis=0, keepdims=True)

    # ---- scalar-core compaction -> blist ------------------------------
    k = jnp.int32(0)
    for c in range(n_jb):
        hit = flags_ref[0, c] > 0.0
        blist_ref[k] = jnp.int32(c)
        k = k + jnp.where(hit, 1, 0).astype(jnp.int32)
    kocc_ref[i] = k  # whole array SMEM-resident; dynamic scalar store

    # ---- MXU dots for occupied blocks only ----------------------------
    iota = jax.lax.broadcasted_iota(jnp.int32, (sb, 1), 0)

    def block_body(ci, _):
        c = blist_ref[ci]
        slot0 = c * sb
        contrib = jnp.zeros((8, sb), f32)
        for sub in range(8):
            seg_row = seg_ref[0, sub : sub + 1, :]          # (1, NB8)
            oh = ((iota + slot0) == seg_row).astype(f32)    # (SB, NB8)
            contrib = contrib + jax.lax.dot_general(
                vals[:, sub * nb8 : (sub + 1) * nb8], oh,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out_ref[pl.ds(c, 1)] = out_ref[pl.ds(c, 1)] + contrib[None]
        return 0

    jax.lax.fori_loop(0, k, block_body, 0)


@functools.partial(
    jax.jit, static_argnames=("n_slots", "slot_block", "sample_block",
                              "interpret"),
)
def segment_rows_paged(
    seg,      # [N] i32 segment ids (out of range -> dropped)
    vals,     # [R, N] f32 rows to accumulate, R <= 8
    *,
    n_slots: int,
    slot_block: int = 128,
    sample_block: int = 2048,
    interpret: bool = False,
):
    """Occupancy-gated one-hot/MXU segment-sum for LARGE slot counts
    (count-proportional in occupied pairs, VERDICT r4 ask 2).  Returns
    ([n_slots, R] sums, [n_sample_blocks] i32 per-block occupied
    slot-block counts — the load diagnostic; sum(occ)/blocks vs
    n_slots/slot_block is the locality win)."""
    r, n = vals.shape
    if r > 8:
        raise ValueError("R must be <= 8 (one sublane block)")
    sbk = slot_block
    if sbk & (sbk - 1):
        raise ValueError("slot_block must be a power of two")
    nb = sample_block
    n_pad = -(-n // nb) * nb
    s_pad = -(-n_slots // sbk) * sbk
    n_jb = s_pad // sbk
    acc_bytes = n_jb * 8 * sbk * 4
    if acc_bytes > 8 * 1024 * 1024:
        raise ValueError(
            f"accumulator {acc_bytes/2**20:.1f} MB exceeds the 8 MB VMEM "
            f"budget (~{8 * 2**20 // (8 * 4)} slots max); use the "
            "count-proportional segment-sum for larger slot counts"
        )
    seg = jnp.pad(seg.astype(jnp.int32), (0, n_pad - n), constant_values=-1)
    vals = jnp.pad(vals.astype(jnp.float32), ((0, 8 - r), (0, n_pad - n)))
    n_sb = n_pad // nb
    nb8 = nb // 8
    seg2 = seg.reshape(n_sb, 8, nb8)
    vals3 = vals.reshape(8, n_sb, nb).swapaxes(0, 1)  # [n_sb, 8, NB]
    flags_lanes = -(-max(n_jb, 128) // 128) * 128

    out, kocc = pl.pallas_call(
        functools.partial(
            _paged_kernel, sb=sbk, nb8=nb8, n_jb=n_jb,
            log2_sb=sbk.bit_length() - 1,
        ),
        grid=(n_sb,),
        in_specs=[
            pl.BlockSpec((1, 8, nb8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, nb), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n_jb, 8, sbk), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_sb,), lambda i: (0,), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_jb, 8, sbk), jnp.float32),
            jax.ShapeDtypeStruct((n_sb,), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, flags_lanes), jnp.float32),
            pltpu.SMEM((n_jb,), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 8 * n_pad * sbk * 8,  # assumes ~8 occupied blocks
            bytes_accessed=n_pad * (4 + 32) + s_pad * 8 * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(seg2, vals3)
    return out.transpose(0, 2, 1).reshape(s_pad, 8)[:n_slots, :r], kocc
