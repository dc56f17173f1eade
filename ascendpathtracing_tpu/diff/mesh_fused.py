"""Custom-VJP backward for the fused sphere+mesh PT Pallas kernel —
the last quadrant of {sphere,mesh} x {fwd,bwd} (VERDICT r3 ask 1).

The model is the sphere kernel's index-replay backward
(ops/pallas_kernels.py:1089-1127): the forward stores per-bounce WINNER
residuals, and the backward replays the albedo/emission product chain
from them — no intersection, no BVH traversal (the ~44%-of-frame cost
the recompute backward would pay twice).

Estimator (per sample, per channel c):

    L_c = sum_b [live_b] tput_{b-1,c} e_{b,c}
    tput_{b,c} = tput_{b-1,c} * m_{b,c};  m_{b,c} = live_b ? a_{b,c} s_b : 1

where a = winner albedo, e = winner emission, and s = the detached
scalar multiplier (glass rscale and the Russian-roulette 1/pmax weight).
Exact reverse-mode gradients of L w.r.t. the a/e leaves with discrete
decisions (winner ids, RR survival, refract-vs-reflect picks) DETACHED
(SURVEY §7 hard-part 5; the BASELINE north star's reparameterized
scope):

    dL/de_{b,c} = g_c * live_b * tput_{b-1,c}
    dL/da_{b,c} = g_c * live_b * s_b * tput_{b-1,c} * T_{b,c}
    T_{b,c} = live_{b+1} e_{b+1,c} + m_{b+1,c} T_{b+1,c};  T_{B,c} = 0

Detachment is EXACT for bounces <= rr_depth (s is albedo-independent:
rscale depends only on geometry); with RR active the 1/pmax weight's
albedo dependence is dropped, the standard detached-RR gradient
estimator (FD gates therefore pin bounces <= rr_depth).

The per-bounce residuals ride in HBM as plain arrays (wid: winner code,
resv: a3/e3/s — 32 B/bounce/sample), so this backward is pure
bandwidth-bound elementwise XLA over them plus one segment-sum for the
per-face grads; XLA fuses the chain into a few passes, and the cost is
small against the forward's traversal.  Residual layout documented in
ops/pallas_mesh_pt.render_pt_mesh_pallas(with_residuals=True).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# largest slot count whose padded [s_pad/512, 8, 512] f32 accumulator
# fits the paged kernel's 8 MB VMEM budget (pallas_histogram.py)
_PAGED_MAX_SLOTS = 8 * 2 ** 20 // (8 * 4)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_spheres", "n_slots", "spp4", "tile", "with_slots", "cell_chunk",
        "slot_mode",
    ),
)
def replay_backward(
    wid,   # [bounces, cells, 8, L] f32 winner code: si | S+slot | -1
    resv,  # [bounces, 7, cells, 8, L] f32: ar ag ab er eg eb s
    g,     # [3, n_pix] cotangent of the per-pixel mean image
    *,
    n_spheres: int,
    n_slots: int,
    spp4: int,
    tile: int,
    with_slots: bool = True,
    cell_chunk: int = 128,
    slot_mode: str = "auto",  # auto | scatter | flat | paged (bench override)
):
    """Replay the product chain from the residuals; returns
    (d_scene_planes [10, S], d_slot_albedo [CT, 3], d_slot_emission
    [CT, 3]) — the latter two zero-shaped when ``with_slots=False``.

    The replay runs as a ``lax.scan`` over blocks of ``cell_chunk`` grid
    cells: the per-bounce temporaries (tput prefix products, T suffix
    sums, grad planes) exist only at chunk scale (~tens of MB), so a
    4M-sample frame's backward never materializes the bounces x samples
    x channels tensor that would otherwise OOM HBM."""
    f32 = jnp.float32
    bounces, cells, _, lanes = wid.shape
    nb = cells // spp4
    S = n_spheres

    # per-sample cotangent: out = sum_layers contrib / spp4; layers of
    # one pixel tile share the cotangent block (kernel pixel order:
    # pix = b*tile + sub*lanes + lane; cell = b*spp4 + a)
    g_cell = jnp.broadcast_to(
        g.reshape(3, nb, 1, 8, lanes) * f32(1.0 / spp4),
        (3, nb, spp4, 8, lanes),
    ).reshape(3, cells, 8, lanes)

    # slot-grad scatter strategy (ops/pallas_histogram.py; r5 measured
    # on real replay streams, benchmarks/artifacts/histogram_r5.json):
    # - up to _PAGED_MAX_SLOTS: the PAGED occupancy-gated one-hot/MXU
    #   histogram — each sample block pays only for the slot blocks its
    #   rows touch (replay streams are chunk-major and slots spatially
    #   sorted, so occupancy stays low), full accumulator VMEM-resident.
    #   Beats the scatter 2.8x at 5.1k slots (112 vs 318 ms) and 2.4x
    #   at 82k (222 vs 527), and the flat kernel everywhere (fewer data
    #   restreams);
    # - beyond (the [s_pad, 8] f32 accumulator outgrows VMEM): the
    #   count-proportional row-payload segment-sum.
    # Histogram paths materialize the (rows, seg) stream from the scan
    # (one N x 7 f32-equivalent HBM pass).
    hist_kind = None
    if with_slots:
        if slot_mode == "auto":
            if (jax.default_backend() == "tpu"
                    and n_slots + 1 <= _PAGED_MAX_SLOTS):
                hist_kind = "paged"
        elif slot_mode in ("flat", "paged"):
            hist_kind = slot_mode
        elif slot_mode != "scatter":
            raise ValueError(f"unknown {slot_mode=}")
    use_hist = hist_kind is not None

    cc = min(cell_chunk, cells)
    if cells % cc:
        pad = cc - cells % cc
        wid = jnp.pad(wid, ((0, 0), (0, pad), (0, 0), (0, 0)),
                      constant_values=-1.0)
        resv = jnp.pad(resv, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
        g_cell = jnp.pad(g_cell, ((0, 0), (0, pad), (0, 0), (0, 0)))
        cells += pad
    nchunks = cells // cc
    wid_c = wid.reshape(bounces, nchunks, cc, 8, lanes).swapaxes(0, 1)
    resv_c = resv.reshape(
        bounces, 7, nchunks, cc, 8, lanes
    ).transpose(2, 0, 1, 3, 4, 5)
    g_c = g_cell.reshape(3, nchunks, cc, 8, lanes).swapaxes(0, 1)

    def chunk_fn(carry, xs):
        d_planes, d_slots = carry
        widc, resvc, gc = xs          # [B,cc,8,L], [B,7,cc,8,L], [3,cc,8,L]
        a3 = resvc[:, 0:3]
        e3 = resvc[:, 3:6]
        s = resvc[:, 6]
        livef = (widc >= 0.0).astype(f32)[:, None]
        m = jnp.where(livef > 0, a3 * s[:, None], f32(1.0))
        eL = e3 * livef

        tput_prev = []
        t = jnp.ones_like(m[0])
        for b in range(bounces):
            tput_prev.append(t)
            t = t * m[b]
        T = [None] * bounces
        T[bounces - 1] = jnp.zeros_like(m[0])
        for b in range(bounces - 2, -1, -1):
            T[b] = eL[b + 1] + m[b + 1] * T[b + 1]

        ge = jnp.stack([gc * livef[b] * tput_prev[b] for b in range(bounces)])
        ga = jnp.stack([
            gc * livef[b] * s[b][None] * tput_prev[b] * T[b]
            for b in range(bounces)
        ])  # [B, 3, cc, 8, L]

        d_emi = jnp.zeros((3, S), f32)
        d_alb = jnp.zeros((3, S), f32)
        for si in range(S):
            msk = (widc == float(si)).astype(f32)[:, None]
            d_emi = d_emi.at[:, si].add(jnp.sum(ge * msk, axis=(0, 2, 3, 4)))
            d_alb = d_alb.at[:, si].add(jnp.sum(ga * msk, axis=(0, 2, 3, 4)))
        dp = jnp.concatenate([jnp.zeros((4, S), f32), d_emi, d_alb], 0)

        ys = None
        if with_slots:
            tri = widc >= float(S)
            seg = jnp.where(tri, widc.astype(jnp.int32) - S, n_slots)
            seg = seg.reshape(-1)
            rows = jnp.concatenate(
                [
                    jnp.moveaxis(ga, 1, -1).reshape(-1, 3),
                    jnp.moveaxis(ge, 1, -1).reshape(-1, 3),
                ],
                axis=1,
            )
            if use_hist:
                ys = (rows, seg)
            else:
                # ONE row-payload segment-sum per chunk: 6-wide rows
                # (albedo + emission together) — scatter cost scales
                # with the update COUNT, not bytes
                d_slots = d_slots + jax.ops.segment_sum(
                    rows, seg, num_segments=n_slots + 1
                )
        return (d_planes + dp, d_slots), ys

    slots0 = jnp.zeros(
        (n_slots + 1, 6) if (with_slots and not use_hist) else (0, 6), f32
    )
    (d_planes, d_slots), ys = jax.lax.scan(
        chunk_fn, (jnp.zeros((10, S), f32), slots0), (wid_c, resv_c, g_c)
    )
    if not with_slots:
        z = jnp.zeros((0, 3), f32)
        return d_planes, z, z
    if use_hist:
        from ascendpathtracing_tpu.ops import pallas_histogram as ph

        rows_all = ys[0].reshape(-1, 6)
        seg_all = ys[1].reshape(-1)  # dump id n_slots is out of range
        if hist_kind == "flat":
            acc = ph.segment_rows_matmul(seg_all, rows_all.T, n_slots=n_slots)
        else:
            acc, _occ = ph.segment_rows_paged(
                seg_all, rows_all.T, n_slots=n_slots
            )
        return d_planes, acc[:, 0:3], acc[:, 3:6]
    return d_planes, d_slots[:n_slots, 0:3], d_slots[:n_slots, 3:6]


def slot_grads_to_face(grid, d_slot):
    """Slot-ordered gradient rows [CT, 3] -> per-face [F, 3] via
    ChunkGrid.face_of_slot (each face occupies exactly one slot; pad
    slots are dropped)."""
    d_slot = np.asarray(d_slot)
    fos = np.asarray(grid.face_of_slot)
    n_faces = int(fos.max()) + 1 if (fos >= 0).any() else 0
    out = np.zeros((n_faces, 3), d_slot.dtype)
    liv = fos >= 0
    out[fos[liv]] = d_slot[liv]
    return out


def make_render_pt_mesh_pallas_diff(
    cboxes,
    sboxes,
    geom16,  # [CT, 16] f32: the 13 intersection floats + unit normal
    mat2,    # [CT, 2] f32: (is_diff, is_refr) one-hots
    *,
    width: int,
    height: int,
    spp4: int,
    materials: tuple,
    tris_per_chunk: int,
    supers_per: int = 0,
    ssboxes=None,
    supers2_per: int = 0,
    bounces: int = 8,
    rr_depth: int = 5,
    eps: float = 1e-4,
    tile: int = 1024,
    seed=0,
    residency: str = "auto",
    interpret: bool = False,
    grads: str = "scene+slots",  # "scene" skips the per-face segment-sum
):
    """Differentiable fused mesh render:
    ``fn(scene_planes [10,S], slot_albedo [CT,3], slot_emission [CT,3])
    -> image [3, W*H]`` with the index-replay Pallas-forward /
    XLA-replay backward.  Slot-ordered attribute rows come from
    ``pallas_wbvh.permute_face_attrib``; convert slot grads back with
    :func:`slot_grads_to_face`.

    Geometry (cboxes/sboxes/geom16) and materials are closure constants:
    d(vertices) flows through the depth-AOV path (diff/mesh.py), exactly
    like the XLA mesh renderer's split.
    """
    from ascendpathtracing_tpu.ops import pallas_mesh_pt as mpt

    n_slots = int(geom16.shape[0])
    kw = dict(
        width=width, height=height, spp4=spp4, materials=tuple(materials),
        tris_per_chunk=tris_per_chunk, supers_per=supers_per,
        ssboxes=ssboxes, supers2_per=supers2_per,
        bounces=bounces, rr_depth=rr_depth, eps=eps, tile=tile, seed=seed,
        residency=residency, interpret=interpret,
    )

    def assemble(slot_albedo, slot_emission):
        return jnp.concatenate(
            [geom16, slot_albedo, slot_emission, mat2], axis=1
        )

    @jax.custom_vjp
    def render(scene_planes, slot_albedo, slot_emission):
        return mpt.render_pt_mesh_pallas(
            scene_planes, cboxes, sboxes, assemble(slot_albedo, slot_emission),
            **kw,
        )

    def fwd(scene_planes, slot_albedo, slot_emission):
        out, wid, resv = mpt.render_pt_mesh_pallas(
            scene_planes, cboxes, sboxes, assemble(slot_albedo, slot_emission),
            with_residuals=True, **kw,
        )
        return out, (wid, resv)

    def bwd(res, g):
        wid, resv = res
        d_planes, d_sa, d_se = replay_backward(
            wid, resv, g, n_spheres=len(materials), n_slots=n_slots,
            spp4=spp4, tile=tile, with_slots=(grads == "scene+slots"),
        )
        if grads != "scene+slots":
            d_sa = jnp.zeros((n_slots, 3), jnp.float32)
            d_se = jnp.zeros((n_slots, 3), jnp.float32)
        return d_planes, d_sa, d_se

    render.defvjp(fwd, bwd)
    return render
