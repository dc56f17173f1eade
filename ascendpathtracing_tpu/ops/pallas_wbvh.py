"""Wide-node chunked BVH traversal with scalar-core compaction.

The lockstep skip-cursor kernel (ops/pallas_bvh.py) pays ~0.25 us of
scalar-core overhead per *node step* (branches + vector->scalar syncs),
which forces fat leaves and makes the per-tile cost the union of visited
nodes times that overhead.  This kernel restructures traversal the TPU
way, as the reference restructured its hot loop around the vector unit
(/root/reference/src/render.cpp:141-188 runs 8 sphere tests lanes-wide
with no divergence):

  Phase A  slab-test chunk AABBs as straight-line unrolled vector code
           (no conds, no syncs), accumulating per-chunk hit flags in an
           (8, 128) register block via iota-select (narrow VMEM column
           stores are slow masked ops — avoided);
  Sync     ONE sublane reduce turns the flags into per-chunk scalars —
           the only vector->scalar sync per level;
  Compact  the scalar core walks the flags and packs hit chunk ids into
           an SMEM worklist (branchless: unconditional store +
           conditional increment);
  Phase B  a fori_loop over the worklist intersects each hit chunk's
           (padded, fixed-size) triangle block, carrying running
           (tmin, slot-id) minima — no gathers, reference-style carriers.

A "chunk" is a wide BVH leaf: `tris_per_chunk` triangles from a median
split, padded with degenerate (all-zero) triangles that can never hit
(normal == 0 -> t = 0*inf = nan -> every IEEE compare False).  One level
of C chunks covers small/medium scenes; a second superchunk level
(`supers_per` consecutive chunks, exploiting the builder's DFS spatial
order) gates groups for large ones, so phase A costs
O(supers + hit_supers * supers_per) slab tests instead of O(C).

Triangle residency auto-scales: SMEM (scalar loads are native) ->
VMEM (field-minor table) -> HBM with per-chunk double-buffered DMA of
the compacted worklist (the scene-side analogue of the reference's
GM->UB tile streaming, /root/reference/src/render.cpp:52-59,82-101 —
except the DMA schedule here is computed per tile at runtime).

Intersection uses a precomputed-plane form instead of Moller-Trumbore:
per triangle store (v0, n = e1 x e2, s1, s2, d0 = n.v0) — 13 floats —
then  t = (d0 - n.o) / (n.d),  w = (o - v0) + t d,  u = s1.w,  v = s2.w:
~41 VPU ops per (ray tile, triangle) vs ~57 for guarded Moller-Trumbore,
measured ~1.3x kernel throughput.

Returned hit ids are SLOT indices (chunk-ordered, padded); map to
original faces with ``ChunkGrid.face_of_slot`` or permute per-face
attribute arrays with :func:`permute_face_attrib` so slot ids index them
directly (what models/mesh.py does).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MISS_T = 1e20
TRI_F = 13  # floats per triangle row: v0 xyz, n xyz, s1 xyz, s2 xyz, d0
# attr rows append: unit normal (3), albedo (3), emission (3),
# (is_diff, is_refr) one-hot floats -> 24 total, padded to 24
TRI_ATTR_F = 24


# ------------------------------------------------------------------ builder --
@dataclasses.dataclass
class ChunkGrid:
    """Flat chunked scene for :func:`intersect_chunks_pallas`.

    cboxes:  [C, 6]  chunk AABBs (minx miny minz maxx maxy maxz)
    sboxes:  [Cs, 6] superchunk AABBs over groups of `supers_per` chunks
             (Cs == 0 disables the super level)
    ssboxes: [Css, 6] super-superchunk AABBs over groups of
             `supers2_per` superchunks (Css == 0 disables the third
             level; it is what takes phase A past ~1M triangles —
             O(Css + hit*16 + hit*16) slab tests instead of O(Cs))
    tris:    [C*T, TRI_F] precomputed-plane rows in chunk order, 0-padded
    face_of_slot: [C*T] i32 original face index per slot (-1 for pads)
    """

    cboxes: np.ndarray
    sboxes: np.ndarray
    tris: np.ndarray
    face_of_slot: np.ndarray
    tris_per_chunk: int
    supers_per: int
    ssboxes: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 6), np.float32)
    )
    supers2_per: int = 0

    @property
    def n_chunks(self) -> int:
        return int(self.cboxes.shape[0])

    @property
    def n_supers(self) -> int:
        return int(self.sboxes.shape[0])

    @property
    def n_supers2(self) -> int:
        return int(self.ssboxes.shape[0])


def triangle_rows(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """[F, TRI_F] precomputed-plane rows (float32, built in float64)."""
    v = np.asarray(vertices, np.float64)
    f = np.asarray(faces, np.int64)
    tri = v[f]
    v0 = tri[:, 0]
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    n = np.cross(e1, e2)
    # barycentric axes: u = s1.(p - v0), v = s2.(p - v0) for p in-plane
    e2xn = np.cross(e2, n)
    e1xn = np.cross(e1, n)
    den1 = np.einsum("ij,ij->i", e1, e2xn)
    den2 = np.einsum("ij,ij->i", e2, e1xn)
    safe1 = np.where(den1 == 0, 1.0, den1)[:, None]
    safe2 = np.where(den2 == 0, 1.0, den2)[:, None]
    s1 = np.where(den1[:, None] == 0, 0.0, e2xn / safe1)
    s2 = np.where(den2[:, None] == 0, 0.0, e1xn / safe2)
    d0 = np.einsum("ij,ij->i", n, v0)
    return np.concatenate([v0, n, s1, s2, d0[:, None]], axis=1).astype(np.float32)


def build_chunk_grid(
    vertices,
    faces,
    *,
    tris_per_chunk: int = 32,
    supers_per: int = 0,
    supers2_per: int = 0,
) -> ChunkGrid:
    """Median-split triangle partition into fixed-size chunks.

    Recursive largest-centroid-extent median split (the same spatial
    heuristic as the binned-SAH builder's fallback, accel/bvh.py) down to
    `tris_per_chunk`; splits land on chunk-size multiples so chunks stay
    full (measured better than SAH leaves here: SAH leaves average T/2
    occupancy, doubling chunk count and slab/loop overhead).  Chunks come
    out in DFS order, so consecutive chunks are spatial neighbours —
    which is what makes the superchunk grouping (each `supers_per`
    consecutive chunks) tight.
    """
    v = np.asarray(vertices, np.float64)
    f = np.asarray(faces, np.int64)
    tri = v[f]  # [F, 3, 3]
    tbmin = tri.min(axis=1)
    tbmax = tri.max(axis=1)
    cent = (tbmin + tbmax) * 0.5
    T = int(tris_per_chunk)
    if supers_per and supers_per > 128:
        raise ValueError("supers_per must be <= 128 (one flags register block)")

    chunks: list[np.ndarray] = []

    def rec(idx: np.ndarray) -> None:
        if idx.size <= T:
            chunks.append(idx)
            return
        ext = cent[idx].max(axis=0) - cent[idx].min(axis=0)
        ax = int(np.argmax(ext))
        order = np.argsort(cent[idx, ax], kind="stable")
        half = (idx.size // 2 + T - 1) // T * T
        half = min(half, idx.size - 1)
        rec(idx[order[:half]])
        rec(idx[order[half:]])

    rec(np.arange(f.shape[0]))

    rows_all = triangle_rows(v, f)
    c = len(chunks)
    c_pad = -(-c // supers_per) * supers_per if supers_per else c
    cboxes = np.empty((c_pad, 6), np.float32)
    tris = np.zeros((c_pad * T, TRI_F), np.float32)
    face_of_slot = np.full((c_pad * T,), -1, np.int32)
    for ci, idx in enumerate(chunks):
        cboxes[ci, 0:3] = tbmin[idx].min(axis=0)
        cboxes[ci, 3:6] = tbmax[idx].max(axis=0)
        tris[ci * T : ci * T + idx.size] = rows_all[idx]
        face_of_slot[ci * T : ci * T + idx.size] = idx.astype(np.int32)
    for ci in range(c, c_pad):  # inverted boxes never pass the slab test
        cboxes[ci, 0:3] = 1.0
        cboxes[ci, 3:6] = -1.0

    def group_boxes(boxes, per):
        """AABBs over consecutive groups of `per` boxes, the input
        padded to a multiple of `per` with inverted (never-hit) boxes."""
        n = boxes.shape[0]
        n_pad = -(-n // per) * per
        if n_pad != n:
            pad = np.empty((n_pad - n, 6), np.float32)
            pad[:, 0:3] = 1.0
            pad[:, 3:6] = -1.0
            boxes = np.concatenate([boxes, pad], 0)
        out = np.empty((n_pad // per, 6), np.float32)
        for gi in range(n_pad // per):
            grp = boxes[gi * per : (gi + 1) * per]
            real = grp[:, 0] <= grp[:, 3]
            if real.any():
                out[gi, 0:3] = grp[real, 0:3].min(axis=0)
                out[gi, 3:6] = grp[real, 3:6].max(axis=0)
            else:
                out[gi, 0:3] = 1.0
                out[gi, 3:6] = -1.0
        return boxes, out

    if supers_per:
        _, sboxes = group_boxes(cboxes, supers_per)
    else:
        sboxes = np.zeros((0, 6), np.float32)
    if supers2_per:
        if not supers_per:
            raise ValueError("supers2_per requires supers_per")
        if supers2_per > 128:
            raise ValueError("supers2_per must be <= 128")
        sboxes, ssboxes = group_boxes(sboxes, supers2_per)
        # chunk arrays must cover the padded super count (clist indexes
        # run to n_supers * supers_per)
        c_full = sboxes.shape[0] * supers_per
        if c_full != cboxes.shape[0]:
            extra = c_full - cboxes.shape[0]
            padc = np.empty((extra, 6), np.float32)
            padc[:, 0:3] = 1.0
            padc[:, 3:6] = -1.0
            cboxes = np.concatenate([cboxes, padc], 0)
            tris = np.concatenate(
                [tris, np.zeros((extra * T, TRI_F), np.float32)], 0
            )
            face_of_slot = np.concatenate(
                [face_of_slot, np.full((extra * T,), -1, np.int32)], 0
            )
    else:
        ssboxes = np.zeros((0, 6), np.float32)

    return ChunkGrid(
        cboxes=cboxes,
        sboxes=sboxes,
        tris=tris,
        face_of_slot=face_of_slot,
        tris_per_chunk=T,
        supers_per=supers_per,
        ssboxes=ssboxes,
        supers2_per=supers2_per,
    )


def permute_face_attrib(grid: ChunkGrid, attrib: np.ndarray, pad_value=0):
    """Per-face attribute array [F, ...] -> slot-ordered [C*T, ...] so the
    kernel's hit slot indexes it directly (pads get `pad_value`)."""
    attrib = np.asarray(attrib)
    out = np.full((grid.face_of_slot.shape[0],) + attrib.shape[1:], pad_value,
                  attrib.dtype)
    live = grid.face_of_slot >= 0
    out[live] = attrib[grid.face_of_slot[live]]
    return out


def attr_triangle_rows(grid: ChunkGrid, face_albedo, face_emission,
                       face_material, diff_code=0, refr_code=2) -> np.ndarray:
    """ChunkGrid + per-face attributes -> [C*T, TRI_ATTR_F] slot rows for
    ``intersect_chunks_pallas(..., attrs=True)``: the 13 intersection
    floats plus unit normal, albedo, emission and material one-hots (as
    0/1 floats — scalar-bool `where` is not lowerable)."""
    rows = np.zeros((grid.tris.shape[0], TRI_ATTR_F), np.float32)
    rows[:, :TRI_F] = grid.tris
    n = grid.tris[:, 3:6].astype(np.float64)
    nn = np.linalg.norm(n, axis=1, keepdims=True)
    rows[:, 13:16] = np.where(nn > 0, n / np.maximum(nn, 1e-300), 0.0)
    rows[:, 16:19] = permute_face_attrib(grid, np.asarray(face_albedo, np.float64))
    rows[:, 19:22] = permute_face_attrib(grid, np.asarray(face_emission, np.float64))
    mat = permute_face_attrib(grid, np.asarray(face_material), pad_value=-1)
    rows[:, 22] = (mat == diff_code).astype(np.float32)
    rows[:, 23] = (mat == refr_code).astype(np.float32)
    return rows


def chunk_grid_to_device(grid: ChunkGrid):
    """ChunkGrid -> device arrays (cboxes, sboxes, tris, face_of_slot)."""
    return (
        jnp.asarray(grid.cboxes),
        jnp.asarray(grid.sboxes),
        jnp.asarray(grid.tris),
        jnp.asarray(grid.face_of_slot),
    )


# ------------------------------------------------------------------- kernel --
def _slab(ox, oy, oz, ix, iy, iz, bminx, bminy, bminz, bmaxx, bmaxy, bmaxz):
    t1x = (bminx - ox) * ix
    t2x = (bmaxx - ox) * ix
    t1y = (bminy - oy) * iy
    t2y = (bmaxy - oy) * iy
    t1z = (bminz - oz) * iz
    t2z = (bmaxz - oz) * iz
    tnear = jnp.maximum(
        jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
        jnp.minimum(t1z, t2z),
    )
    tfar = jnp.minimum(
        jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
        jnp.maximum(t1z, t2z),
    )
    return tfar >= jnp.maximum(tnear, 0.0)


def _slab_tmin(ox, oy, oz, ix, iy, iz, bminx, bminy, bminz, bmaxx, bmaxy,
               bmaxz, tmin):
    """Slab test with a per-ray entry bound: boxes entered beyond the
    current nearest hit cannot contain a closer one."""
    t1x = (bminx - ox) * ix
    t2x = (bmaxx - ox) * ix
    t1y = (bminy - oy) * iy
    t2y = (bmaxy - oy) * iy
    t1z = (bminz - oz) * iz
    t2z = (bmaxz - oz) * iz
    tnear = jnp.maximum(
        jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
        jnp.minimum(t1z, t2z),
    )
    tfar = jnp.minimum(
        jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
        jnp.maximum(t1z, t2z),
    )
    return (tfar >= jnp.maximum(tnear, 0.0)) & (tnear < tmin)


def compact_worklist(
    flags_ref,
    clist_ref,
    slist_ref,
    slab,          # slab(box_fn, index) -> (8, lanes) bool hit mask
    cbox,          # cbox(i, k) scalar box reads
    sbox,          # sbox(i, k) or None
    *,
    n_chunks,
    n_supers,
    supers_per,
    sslist_ref=None,   # SMEM [n_supers2] (3-level mode)
    ssbox=None,        # ssbox(i, k) or None
    n_supers2=0,
    supers2_per=0,
):
    """Phases A+Sync+Compact shared by the traversal and fused-PT kernels:
    slab-test boxes lanes-wide into the (8, 128)-blocked ``flags_ref``,
    collapse to per-box scalars with ONE sublane reduce per block, then
    scalar-core-compact hit chunk ids into ``clist_ref``.  Two-level when
    ``n_supers``: supers gate, then only hit supers' chunks are tested.
    Three-level when ``n_supers2``: super-supers gate the supers first —
    the static-unrolled top scan shrinks from O(n_supers) to
    O(n_supers2) slab tests, which is what carries phase A past ~1M
    triangles (5,120 unrolled tests/tile/bounce otherwise).
    Returns ``(k, ks, kss)`` (traced i32): the chunk worklist length,
    the hit-super count, and the hit-super-super count (0 for levels
    the configuration does not have) — the per-level trip counts the
    roofline accounting assigns to the kernel's data-dependent loops
    (benchmarks/roofline.py)."""
    f32 = jnp.float32
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    def scan_static(box, n):
        """Static-unrolled slab scan of boxes 0..n into flags."""
        for g in range(0, n, 128):
            acc = jnp.zeros((8, 128), f32)
            for bl in range(min(128, n - g)):
                m = jnp.max(slab(box, g + bl).astype(f32), axis=1,
                            keepdims=True)
                acc = jnp.where(lane == bl, m, acc)
            flags_ref[:, g : g + 128] = acc
        flags_ref[0:1, :] = jnp.max(flags_ref[:, :], axis=0, keepdims=True)

    def scan_group(box, base, per):
        """Unrolled slab scan of boxes base..base+per (traced base) into
        flags[:, 0:128]; per <= 128."""
        acc = jnp.zeros((8, 128), f32)
        for bl in range(per):
            m = jnp.max(slab(box, base + bl).astype(f32), axis=1,
                        keepdims=True)
            acc = jnp.where(lane == bl, m, acc)
        flags_ref[:, 0:128] = acc
        flags_ref[0:1, 0:128] = jnp.max(
            flags_ref[:, 0:128], axis=0, keepdims=True
        )

    if not n_supers:
        scan_static(cbox, n_chunks)
        k = jnp.int32(0)
        for c in range(n_chunks):
            hit_c = flags_ref[0, c] > 0.0
            clist_ref[k] = jnp.int32(c)
            k = k + jnp.where(hit_c, 1, 0).astype(jnp.int32)
        return k, jnp.int32(0), jnp.int32(0)

    if n_supers2:
        # level 2: super-supers (static unroll) -> sslist
        scan_static(ssbox, n_supers2)
        kss = jnp.int32(0)
        for s2 in range(n_supers2):
            hit_s2 = flags_ref[0, s2] > 0.0
            sslist_ref[kss] = jnp.int32(s2)
            kss = kss + jnp.where(hit_s2, 1, 0).astype(jnp.int32)

        # level 1: the supers of each hit super-super -> slist
        def ss_body(i, ks):
            base_s = sslist_ref[i] * supers2_per
            scan_group(sbox, base_s, supers2_per)
            for sl in range(supers2_per):
                hit_s = flags_ref[0, sl] > 0.0
                slist_ref[ks] = base_s + sl
                ks = ks + jnp.where(hit_s, 1, 0).astype(jnp.int32)
            return ks

        ks = jax.lax.fori_loop(0, kss, ss_body, jnp.int32(0))
    else:
        kss = jnp.int32(0)
        # level 1 only: supers (static unroll) -> slist
        scan_static(sbox, n_supers)
        ks = jnp.int32(0)
        for s in range(n_supers):
            hit_s = flags_ref[0, s] > 0.0
            slist_ref[ks] = jnp.int32(s)
            ks = ks + jnp.where(hit_s, 1, 0).astype(jnp.int32)

    # level 0: the chunks of each hit super -> clist (fori over the
    # compacted super list; chunk box reads use traced indices — scalar
    # loads take those fine)
    def super_body(i, k):
        base_c = slist_ref[i] * supers_per
        scan_group(cbox, base_c, supers_per)
        for cl in range(supers_per):
            hit_c = flags_ref[0, cl] > 0.0
            clist_ref[k] = base_c + cl
            k = k + jnp.where(hit_c, 1, 0).astype(jnp.int32)
        return k

    return jax.lax.fori_loop(0, ks, super_body, jnp.int32(0)), ks, kss


DMA_DEPTH = 8  # worklist-DMA ring depth (see streamed_chunk_loop)


def streamed_chunk_loop(
    k,
    clist_ref,
    chunk_fn,      # chunk_fn(trif, base_slot, carry) -> carry
    carry0,
    *,
    tris_mode,     # "smem" | "vmem" | "hbm"
    tris_ref,
    tris_per_chunk,
    tri_stride,
    tscratch_ref=None,
    dsem_ref=None,
):
    """Phase B driver shared by the traversal and fused-PT kernels: fori
    over the compacted worklist, calling ``chunk_fn`` once per hit chunk
    with a ``trif(j, kk)`` reader for float ``kk`` of the chunk's j-th
    triangle and the chunk's base SLOT id.  ``hbm`` mode streams each
    chunk's tile through a DEPTH-``DMA_DEPTH`` ring of scratch buffers:
    the 4 KB per-chunk DMA has ~µs-class LATENCY while one chunk's tri
    tests take only ~0.3 µs of VPU time, so the r3 depth-2 double buffer
    left the kernel DMA-latency-bound (the roofline run measured the s6
    fused kernel at 46.8% of its VPU bound with ~5M trips × ~1 µs of
    unhidden latency ≈ the whole frame; benchmarks/artifacts/
    roofline_r5.json) — a deeper ring keeps DMA_DEPTH-1 fetches in
    flight, trading 24 KB more VMEM scratch for covering the latency.
    HBM tris are packed ONE CHUNK PER (8, 128) TILE ([C, 8, 128]):
    Mosaic requires DMA slice minor dims be tile-aligned, and scalar
    reads from the landing scratch only lower with the dynamic index on
    a non-minor dim ((D, 8, 128)[buf, j, kk] lowers; (D, 1024)[buf, j]
    does not — measured on v5e)."""
    T = tris_per_chunk
    if tris_mode == "hbm":
        D = tscratch_ref.shape[0]

        def get_dma(slot_buf, i):
            c = clist_ref[i]
            return pltpu.make_async_copy(
                tris_ref.at[pl.ds(c, 1), :],
                tscratch_ref.at[pl.ds(slot_buf, 1), :],
                dsem_ref.at[slot_buf],
            )

        # prime the ring: fetches for chunks 0..D-2 all in flight
        for j in range(D - 1):
            @pl.when(j < k)
            def _(j=j):
                get_dma(jnp.int32(j), jnp.int32(j)).start()

        def chunk_body(i, carry):
            buf = jax.lax.rem(i, jnp.int32(D))

            @pl.when(i + (D - 1) < k)
            def _():
                get_dma(jax.lax.rem(i + (D - 1), jnp.int32(D)),
                        i + (D - 1)).start()

            get_dma(buf, i).wait()
            base = clist_ref[i] * T
            # scratch reads: dynamic non-minor index (buf), static
            # sublane/lane from the flat offset (j, kk python ints)
            def trif_s(t_, kk):
                off = t_ * tri_stride + kk
                return tscratch_ref[buf, off // 128, off % 128]

            return chunk_fn(trif_s, base, carry)

        return jax.lax.fori_loop(0, k, chunk_body, carry0)

    if tris_mode == "smem":
        def chunk_body(i, carry):
            base = clist_ref[i] * T
            trif = lambda t_, kk: tris_ref[(base + t_) * tri_stride + kk]
            return chunk_fn(trif, base, carry)
    else:
        def chunk_body(i, carry):
            base = clist_ref[i] * T
            trif = lambda t_, kk: tris_ref[base + t_, kk]
            return chunk_fn(trif, base, carry)

    return jax.lax.fori_loop(0, k, chunk_body, carry0)


def _wbvh_kernel(
    *refs,
    n_chunks,
    n_supers,
    supers_per,
    tris_per_chunk,
    eps,
    tris_mode,  # "smem" | "vmem" | "hbm"
    boxes_flat,  # True: cboxes/sboxes are flat SMEM; False: [*, 6] VMEM
    tri_stride=TRI_F,
    with_attrs=False,  # also emit the winner's shading attributes
    debug=False,  # per-tile worklist-length kernel_dump (device printf)
    n_supers2=0,
    supers2_per=0,
    with_stats=False,  # also emit per-tile worklist length k (SMEM out)
):
    """Refs (in order): cboxes, [sboxes], [ssboxes], tris, rays,
    tmin_out, hit_out, [11 attr outs], [kstats_out (SMEM)], flags
    (VMEM scratch), clist (SMEM), [slist (SMEM)], [sslist (SMEM)],
    [tri_scratch, dma_sem] (hbm mode)."""
    f32 = jnp.float32
    T = tris_per_chunk
    it = iter(refs)
    cboxes_ref = next(it)
    sboxes_ref = next(it) if n_supers else None
    ssboxes_ref = next(it) if n_supers2 else None
    tris_ref = next(it)
    rays_ref = next(it)
    tmin_ref = next(it)
    hit_ref = next(it)
    attr_refs = [next(it) for _ in range(11)] if with_attrs else []
    kstats_ref = next(it) if with_stats else None
    flags_ref = next(it)
    clist_ref = next(it)
    slist_ref = next(it) if n_supers else None
    sslist_ref = next(it) if n_supers2 else None
    if tris_mode == "hbm":
        tscratch_ref = next(it)
        dsem_ref = next(it)

    if boxes_flat:
        cbox = lambda c, k: cboxes_ref[c * 6 + k]
        sbox = (lambda s, k: sboxes_ref[s * 6 + k]) if n_supers else None
        ssbox = (lambda s, k: ssboxes_ref[s * 6 + k]) if n_supers2 else None
    else:
        cbox = lambda c, k: cboxes_ref[c, k]
        sbox = (lambda s, k: sboxes_ref[s, k]) if n_supers else None
        ssbox = (lambda s, k: ssboxes_ref[s, k]) if n_supers2 else None

    ox = rays_ref[0, 0]
    oy = rays_ref[1, 0]
    oz = rays_ref[2, 0]
    dx = rays_ref[3, 0]
    dy = rays_ref[4, 0]
    dz = rays_ref[5, 0]
    shape = ox.shape

    inv_dx = 1.0 / jnp.where(dx == 0, 1e-30, dx)
    inv_dy = 1.0 / jnp.where(dy == 0, 1e-30, dy)
    inv_dz = 1.0 / jnp.where(dz == 0, 1e-30, dz)

    def slab_idx(box, i):
        return _slab(
            ox, oy, oz, inv_dx, inv_dy, inv_dz,
            box(i, 0), box(i, 1), box(i, 2), box(i, 3), box(i, 4), box(i, 5),
        )

    # ---- phase A: box tests -> compacted chunk worklist ---------------
    k, ks, kss = compact_worklist(
        flags_ref, clist_ref, slist_ref, slab_idx, cbox, sbox,
        n_chunks=n_chunks, n_supers=n_supers, supers_per=supers_per,
        sslist_ref=sslist_ref, ssbox=ssbox, n_supers2=n_supers2,
        supers2_per=supers2_per,
    )
    if debug:
        # the rt_helper.h:17-48 DumpTensor analogue: per-tile worklist
        # length is THE load-balance diagnostic for this kernel
        from ascendpathtracing_tpu.utils.debug import kernel_dump

        kernel_dump("wbvh tile worklist k", k, every_cell=True)
    if with_stats:
        # per-tile (k, hit supers, hit super-supers) as real OUTPUTS
        # (occupancy/roofline accounting, VERDICT r4 asks 1+6) — these
        # are exactly the trip counts of the kernel's three
        # data-dependent loops (benchmarks/roofline.py assigns them).
        # TILES on the minor axis: SMEM pads the minor dim to 128 lanes
        kstats_ref[0, pl.program_id(0)] = k
        kstats_ref[1, pl.program_id(0)] = ks
        kstats_ref[2, pl.program_id(0)] = kss

    # ---- phase B: precomputed-plane tri tests over listed chunks ------
    # With with_attrs, everything shading needs from the winning triangle
    # rides in RUNNING CARRIERS updated on `better` (the no-gather idiom;
    # 1-D gathers of 4M indices measured ~35 ms EACH on v5e, so the jnp
    # "gather attributes by hit id" pattern costs more than the whole
    # traversal).  Attr table rows are TRI_ATTR_F floats (see
    # attr_triangle_rows); carriers are all f32 (i1 in a fori carry fails
    # Mosaic legalization).
    def tri_test(trif, tidx, slot, carry):
        tmin, hit = carry[0], carry[1]
        nx_ = trif(tidx, 3)
        ny_ = trif(tidx, 4)
        nz_ = trif(tidx, 5)
        nd = nx_ * dx + ny_ * dy + nz_ * dz
        no = nx_ * ox + ny_ * oy + nz_ * oz
        # Unguarded reciprocal: degenerate/padding triangles have n == 0,
        # so t = 0 * inf = nan and every IEEE compare below is False —
        # they reject themselves with no explicit mask.
        t = (trif(tidx, 12) - no) / nd
        wx = (ox - trif(tidx, 0)) + t * dx
        wy = (oy - trif(tidx, 1)) + t * dy
        wz = (oz - trif(tidx, 2)) + t * dz
        u = trif(tidx, 6) * wx + trif(tidx, 7) * wy + trif(tidx, 8) * wz
        v = trif(tidx, 9) * wx + trif(tidx, 10) * wy + trif(tidx, 11) * wz
        ok = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > eps)
        better = ok & (t < tmin)
        out = [
            jnp.where(better, t, tmin),
            jnp.where(better, jnp.full(shape, slot, jnp.int32), hit),
        ]
        if with_attrs:
            for ai in range(11):
                out.append(jnp.where(better, trif(tidx, 13 + ai), carry[2 + ai]))
        return tuple(out)

    tmin = jnp.full(shape, MISS_T, f32)
    hit = jnp.zeros(shape, jnp.int32)
    carry0 = (tmin, hit) + tuple(
        jnp.zeros(shape, f32) for _ in range(11 if with_attrs else 0)
    )

    def chunk_fn(trif, base, carry):
        for j in range(T):
            carry = tri_test(trif, j, base + j, carry)
        return carry

    carry0 = streamed_chunk_loop(
        k, clist_ref, chunk_fn, carry0,
        tris_mode=tris_mode, tris_ref=tris_ref, tris_per_chunk=T,
        tri_stride=tri_stride,
        tscratch_ref=tscratch_ref if tris_mode == "hbm" else None,
        dsem_ref=dsem_ref if tris_mode == "hbm" else None,
    )

    tmin, hit = carry0[0], carry0[1]
    for ai, ref in enumerate(attr_refs):
        ref[0] = carry0[2 + ai]

    tmin_ref[0] = tmin
    hit_ref[0] = hit


@functools.partial(
    jax.jit,
    static_argnames=(
        "tris_per_chunk", "supers_per", "supers2_per", "eps", "tile",
        "residency", "boxes_residency", "attrs", "interpret", "debug",
        "stats",
    ),
)
def intersect_chunks_pallas(
    rays_planes,  # [6, N] f32
    cboxes,  # [C, 6] f32
    sboxes,  # [Cs, 6] f32 (Cs == 0: single level)
    tris,  # [C*T, TRI_F] f32 (or [C*T, TRI_ATTR_F] with attrs=True)
    ssboxes=None,  # [Css, 6] f32 (third level; None/empty disables)
    *,
    tris_per_chunk: int = 32,
    supers_per: int = 0,
    supers2_per: int = 0,
    eps: float = 1e-4,
    tile: int = 2048,
    residency: str = "auto",  # auto | smem | vmem | hbm
    boxes_residency: str = "auto",  # auto | smem | vmem (force for tests)
    attrs: bool = False,
    interpret: bool = False,
    debug: bool = False,  # device-side per-tile worklist dump
    stats: bool = False,  # also return per-tile worklist lengths
):
    """Chunked traversal over ray tiles.

    Returns (tmin [N] f32, hit [N] i32 — SLOT index into the chunk-
    ordered triangle/attribute arrays, 0 on miss; miss = tmin >= MISS_T).
    With ``attrs=True`` (tris built by :func:`attr_triangle_rows`) an
    11-tuple of winner attribute planes is appended, in table order:
    (nx, ny, nz, ar, ag, ab, er, eg, eb, is_diff, is_refr).
    With ``stats=True`` a [3, n_tiles] i32 array of per-tile
    (worklist length k, hit supers, hit super-supers) rows is appended
    (phase-B load accounting — each tile tests k * tris_per_chunk
    triangles lanes-wide; rows 1-2 are the phase-A group-scan trip
    counts the roofline model needs).
    """
    n = rays_planes.shape[1]
    c = cboxes.shape[0]
    cs = sboxes.shape[0]
    if ssboxes is None:
        ssboxes = jnp.zeros((0, 6), jnp.float32)
    css = ssboxes.shape[0]
    ct = tris.shape[0]
    if tile % 1024:
        raise ValueError(f"{tile=} must be a multiple of 1024")
    if n % tile:
        raise ValueError(f"ray count {n} not divisible by {tile=}")
    if cs and cs * supers_per != c:
        raise ValueError("sboxes/supers_per inconsistent with chunk count")
    if css and (not cs or css * supers2_per != cs):
        raise ValueError("ssboxes/supers2_per inconsistent with super count")
    # compact_worklist's scan_group matches boxes against a 128-lane iota,
    # so any group size > 128 would silently skip boxes 128+ (missed
    # intersections, no error) — mirror build_chunk_grid's guards for
    # externally built tables (ADVICE r4 low #1)
    if cs and supers_per > 128:
        raise ValueError("supers_per must be <= 128 (one flags register block)")
    if css and supers2_per > 128:
        raise ValueError("supers2_per must be <= 128 (one flags register block)")
    nb = n // tile
    lanes = tile // 8
    stride = tris.shape[1]
    if attrs and stride != TRI_ATTR_F:
        raise ValueError(f"attrs=True needs [C*T, {TRI_ATTR_F}] rows")

    box_bytes = (c + cs + css) * 6 * 4
    tri_bytes = ct * stride * 4
    if residency == "auto":
        # smem when the tables fit, else the hbm SMEM-landing DMA ring
        # (r5): phase B reads tris as scalar loads and dynamic-index
        # scalar loads from VMEM lower to a slow path, so vmem residency
        # is dominated by the ring (mesh kernel s4: smem 1322 / vmem
        # 2366 / hbm-ring 1406 ms on identical work).  "vmem" stays
        # selectable for tests; hbm additionally needs
        # tris_per_chunk*stride <= 1024 (one (8,128) tile per chunk),
        # so wide rows keep the old vmem path.
        if box_bytes + tri_bytes <= 512 * 1024:
            residency = "smem"
        elif tris_per_chunk * stride <= 1024:
            residency = "hbm"
        else:
            residency = "vmem"
    if boxes_residency == "auto":
        boxes_flat = box_bytes <= 512 * 1024
    else:
        boxes_flat = boxes_residency == "smem"

    kernel = functools.partial(
        _wbvh_kernel,
        n_chunks=c,
        n_supers=cs,
        supers_per=supers_per,
        tris_per_chunk=tris_per_chunk,
        eps=eps,
        tris_mode=residency,
        boxes_flat=boxes_flat,
        tri_stride=stride,
        with_attrs=attrs,
        debug=debug,
        n_supers2=css,
        supers2_per=supers2_per,
        with_stats=stats,
    )

    inputs = []
    in_specs = []
    if boxes_flat:
        inputs.append(cboxes.reshape(c * 6))
        in_specs.append(
            pl.BlockSpec((c * 6,), lambda b: (0,), memory_space=pltpu.SMEM)
        )
        if cs:
            inputs.append(sboxes.reshape(cs * 6))
            in_specs.append(
                pl.BlockSpec((cs * 6,), lambda b: (0,), memory_space=pltpu.SMEM)
            )
        if css:
            inputs.append(ssboxes.reshape(css * 6))
            in_specs.append(
                pl.BlockSpec((css * 6,), lambda b: (0,),
                             memory_space=pltpu.SMEM)
            )
    else:
        inputs.append(cboxes)
        in_specs.append(
            pl.BlockSpec((c, 6), lambda b: (0, 0), memory_space=pltpu.VMEM)
        )
        if cs:
            inputs.append(sboxes)
            in_specs.append(
                pl.BlockSpec((cs, 6), lambda b: (0, 0), memory_space=pltpu.VMEM)
            )
        if css:
            inputs.append(ssboxes)
            in_specs.append(
                pl.BlockSpec((css, 6), lambda b: (0, 0),
                             memory_space=pltpu.VMEM)
            )
    if residency == "smem":
        inputs.append(tris.reshape(ct * stride))
        in_specs.append(
            pl.BlockSpec((ct * stride,), lambda b: (0,), memory_space=pltpu.SMEM)
        )
    elif residency == "vmem":
        inputs.append(tris)
        in_specs.append(
            pl.BlockSpec((ct, stride), lambda b: (0, 0), memory_space=pltpu.VMEM)
        )
    else:
        # one chunk per (8, 128) tile: T*stride floats padded to 1024
        row = tris_per_chunk * stride
        if row > 1024:
            raise ValueError(
                f"hbm residency needs tris_per_chunk*{stride} <= 1024, got {row}"
            )
        tris_rows = tris.reshape(c, row)  # noqa: F841 (row checked above)
        if row != 1024:
            tris_rows = jnp.pad(tris_rows, ((0, 0), (0, 1024 - row)))
        inputs.append(tris_rows.reshape(c, 8, 128))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))

    rays4 = rays_planes.reshape(6, nb, 8, lanes)
    inputs.append(rays4)
    in_specs.append(
        pl.BlockSpec((6, 1, 8, lanes), lambda b: (0, b, 0, 0),
                     memory_space=pltpu.VMEM)
    )

    # flags covers the largest STATIC scan: the top level of the
    # hierarchy (the traced group scans reuse flags[:, 0:128])
    top = css if css else (cs if cs else c)
    flags_lanes = -(-max(top, 128) // 128) * 128
    scratch = [
        pltpu.VMEM((8, flags_lanes), jnp.float32),
        pltpu.SMEM((c,), jnp.int32),
    ]
    if cs:
        scratch.append(pltpu.SMEM((cs,), jnp.int32))
    if css:
        scratch.append(pltpu.SMEM((css,), jnp.int32))
    if residency == "hbm":
        # SMEM, not VMEM, landing buffers: phase B reads the chunk tile
        # as ~24 scalar loads per triangle, and dynamic-index scalar
        # loads from VMEM scratch lower to a slow path — forcing vmem/
        # hbm residency at s4 measured 2366/2421 ms vs 1322 ms for smem
        # on the SAME work (roofline_r5.json experiment); landing the
        # DMA in SMEM makes the streamed path read at native scalar
        # speed.  HBM->SMEM DMA of one (8, 128) tile per chunk.
        scratch.append(pltpu.SMEM((DMA_DEPTH, 8, 128), jnp.float32))
        scratch.append(pltpu.SemaphoreType.DMA((DMA_DEPTH,)))

    n_out = 2 + (11 if attrs else 0)
    blk = lambda: pl.BlockSpec((1, 8, lanes), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)
    out_specs = tuple(blk() for _ in range(n_out))
    out_shape = tuple(
        jax.ShapeDtypeStruct((nb, 8, lanes),
                             jnp.int32 if i == 1 else jnp.float32)
        for i in range(n_out)
    )
    if stats:
        out_specs = out_specs + (
            pl.BlockSpec((3, nb), lambda b: (0, 0), memory_space=pltpu.SMEM),
        )
        out_shape = out_shape + (jax.ShapeDtypeStruct((3, nb), jnp.int32),)
    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)
    kstats = outs[n_out] if stats else None
    outs = tuple(o.reshape(n) for o in outs[:n_out])
    res = (outs[0], outs[1], outs[2:]) if attrs else (outs[0], outs[1])
    if stats:
        return res + (kstats,)
    return res
