"""One-hot/MXU segment-sum kernel (ops/pallas_histogram.py) — the
TPU-native scatter replacement used by the fused mesh backward's
per-face gradients (2.2x the XLA scatter-add at 33.5M rows / 5.1k
slots, measured on v5e)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ascendpathtracing_tpu.ops.pallas_histogram import (  # noqa: E402
    segment_rows_matmul,
    segment_rows_paged,
)


@pytest.mark.parametrize("n,s,r", [(10000, 700, 6), (4096, 513, 3),
                                   (2048, 2048, 8)])
def test_matches_masked_sum(n, s, r):
    rng = np.random.RandomState(n + s)
    seg = rng.randint(-1, s, size=n).astype(np.int32)  # -1 = dropped
    vals = rng.randn(r, n).astype(np.float32)
    got = np.asarray(segment_rows_matmul(
        jnp.asarray(seg), jnp.asarray(vals), n_slots=s, interpret=True
    ))
    exp = np.zeros((s, r), np.float32)
    for si in range(s):
        exp[si] = vals[:, seg == si].sum(1)
    assert got.shape == (s, r)
    np.testing.assert_allclose(got, exp, atol=2e-5 * max(np.abs(exp).max(), 1))


def test_out_of_range_ids_dropped():
    seg = jnp.asarray(np.array([0, 5, 100, -3, 2], np.int32))
    vals = jnp.ones((2, 5), jnp.float32)
    got = np.asarray(segment_rows_matmul(seg, vals, n_slots=6,
                                         interpret=True))
    # ids 100 and -3 out of [0, 6): dropped; 0, 5, 2 each get one row
    exp = np.zeros((6, 2), np.float32)
    exp[[0, 5, 2]] = 1.0
    np.testing.assert_array_equal(got, exp)


def test_matches_segment_sum_on_backward_shapes():
    """The exact call shape the mesh backward makes."""
    rng = np.random.RandomState(0)
    n, s = 1 << 16, 5121
    seg = rng.randint(0, s + 200, size=n).astype(np.int32)  # some out-of-range
    vals = rng.randn(6, n).astype(np.float32)
    got = np.asarray(segment_rows_matmul(
        jnp.asarray(seg), jnp.asarray(vals), n_slots=s, interpret=True
    ))
    exp = np.asarray(jax.ops.segment_sum(
        jnp.asarray(vals).T, jnp.minimum(jnp.asarray(seg), s),
        num_segments=s + 1,
    ))[:s]
    np.testing.assert_allclose(got, exp, atol=2e-4)


# ------------------------------------------------------------ paged -------
@pytest.mark.parametrize("n,s,r", [(20000, 20000, 6), (4096, 9000, 3)])
def test_paged_matches_masked_sum(n, s, r):
    """Occupancy-gated kernel == dense reference at >8k slot counts
    (the sizes the flat kernel's auto-select hands to paging)."""
    rng = np.random.RandomState(n + s)
    # clustered ids (the chunk-major replay stream's shape) + strays
    seg = (rng.randint(0, 20, n) * (s // 20)
           + rng.randint(0, s // 40, n)).astype(np.int32)
    seg[: n // 100] = -1
    seg[n // 100 : n // 50] = s + 7  # out of range -> dropped
    vals = rng.randn(r, n).astype(np.float32)
    got, kocc = segment_rows_paged(
        jnp.asarray(seg), jnp.asarray(vals), n_slots=s, interpret=True
    )
    got = np.asarray(got)
    exp = np.zeros((s, r), np.float32)
    ok = (seg >= 0) & (seg < s)
    np.add.at(exp, seg[ok], vals[:, ok].T)
    assert got.shape == (s, r)
    np.testing.assert_allclose(got, exp, atol=3e-5 * max(np.abs(exp).max(), 1))
    # occupancy: clustered ids touch far fewer than all slot blocks
    kocc = np.asarray(kocc)
    n_jb = -(-s // 128)  # the tuned default slot_block
    assert (kocc >= 1).all() and (kocc <= n_jb).all()


def test_paged_matches_flat_kernel():
    """paged == flat on a shared stream (both drop out-of-range ids)."""
    rng = np.random.RandomState(3)
    n, s = 1 << 14, 6000
    seg = rng.randint(-5, s + 100, size=n).astype(np.int32)
    vals = rng.randn(6, n).astype(np.float32)
    flat = np.asarray(segment_rows_matmul(
        jnp.asarray(seg), jnp.asarray(vals), n_slots=s, interpret=True
    ))
    paged, _ = segment_rows_paged(
        jnp.asarray(seg), jnp.asarray(vals), n_slots=s, interpret=True
    )
    np.testing.assert_allclose(np.asarray(paged), flat, atol=2e-5)


def test_paged_rejects_oversized_accumulator():
    with pytest.raises(ValueError, match="VMEM budget"):
        segment_rows_paged(
            jnp.zeros((8,), jnp.int32), jnp.zeros((6, 8), jnp.float32),
            n_slots=1 << 20, interpret=True,
        )
