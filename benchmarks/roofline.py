"""Per-kernel roofline accounting for the three flagship kernels.

VERDICT r4 ask 1 / SURVEY §6 Phase 6 ("roofline notes"): nothing said
whether 892 Mrays/s fwd+bwd is 30% or 90% of the relevant bound.  This
harness produces that evidence in three parts:

1. **Measured machine ceilings** (microbenchmarks, not datasheet
   assumptions): VPU issue rate (a dependent mul chain over 8
   independent (8, 128) f32 streams), the FMA rate (mul+add chains —
   whether Mosaic fuses them), the multi-cycle-op weights (sqrt / div
   chains, in mul-slot units), and streamed HBM bandwidth (copy and
   read-only kernels over a 256 MB array).  The only datasheet numbers
   kept for reference are the public v5e figures (819 GB/s HBM,
   197 bf16 TFLOP/s MXU) — reported next to the measured values.

2. **Mechanical op counts** (utils/roofline.count_ops): the jaxpr that
   is actually compiled — including inside pallas_call bodies — is
   walked and every vector op tallied per class.  Data-dependent loops
   (the chunk-grid kernels' phase-A group scans and phase-B worklist
   loop) get their trip counts from the kernels' own ``with_stats``
   outputs (per-tile/bounce k, hit-supers, hit-super-supers), measured
   in the same run on the same inputs.

3. **Bound composition**: per kernel, time lower bounds
   t_vpu = slots / R_issue (with measured multi-cycle weights),
   t_hbm = bytes / BW_measured, t_dma (phase-B chunk DMA, double-
   buffered so it overlaps compute — binding only if larger).  The
   roofline bound is max of these; pct_of_bound = bound / measured.

Reference seed: the one-kernel tile-streaming discipline whose TPU
analogue is being measured, /root/reference/src/render.cpp:52-59 and
104-207 (the reference itself publishes no perf numbers at all —
SURVEY §6).

Usage:
  python benchmarks/roofline.py [--sections ceilings,sphere,traversal,mesh]
      [--mesh-subdivs 4,6] [--out benchmarks/artifacts/roofline_r5.json]

Writes one JSON artifact; every row carries fit_ok / fit spread from
utils/profiling.benchmark_fit (the r3 methodology).
"""

from __future__ import annotations

import argparse
import functools
import json
import math
import os
import sys


def _fit(fitres):
    return {
        "fit_ok": fitres["fit_ok"],
        "fit_rel_spread": (round(fitres["rel_spread"], 4)
                           if fitres["rel_spread"] is not None else None),
    }


# ------------------------------------------------------------- ceilings --
def measure_ceilings(iters=6):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ascendpathtracing_tpu.utils import profiling

    # 32 independent chains: dependent-op latency must be covered by ILP
    # or the measured "ceiling" is a latency number, not an issue rate
    # (8 streams measured 1.17 Telem/s on the mul chain vs 5.3 Tslots/s
    # on the higher-ILP cmpsel chain — the giveaway)
    STREAMS, LOOP, UNROLL = 32, 4096, 8

    def chain_kernel(x_ref, o_ref, *, op):
        ss = [x_ref[i] for i in range(STREAMS)]
        c = x_ref[STREAMS]
        d = x_ref[STREAMS + 1]

        def body(_, ss):
            ss = list(ss)
            for _ in range(UNROLL):
                for j in range(STREAMS):
                    a = ss[j]
                    if op == "mul":
                        # NOTE: measured 4-8x "faster" than every other
                        # chain — the unrolled a*c*...*c reassociates to
                        # one mul per unroll body; kept as an
                        # informational row only, never the ceiling
                        a = a * c
                    elif op == "fma":
                        a = a * c + d
                    elif op == "cmpsel":
                        # cmp + select + sub + add: 4 slots, oscillates
                        a = jnp.where(a > c, a - d, a + d)
                    elif op == "mix":
                        # the kernels' actual mix: mul, cmp, sub, add,
                        # select — 5 dependent, unfoldable slots
                        b = a * c
                        a = jnp.where(b > d, b - d, a + d)
                    elif op == "sqrt":
                        a = jnp.sqrt(a) * c  # fixed point a* = c^2
                    elif op == "div":
                        a = c / a  # period-2 orbit, stable
                    ss[j] = a
            return tuple(ss)

        out = jax.lax.fori_loop(0, LOOP, body, tuple(ss))
        acc = out[0]
        for a in out[1:]:
            acc = acc + a
        o_ref[...] = acc

    def run_chain(op):
        x = jnp.full((STREAMS + 2, 8, 128), 1.5, jnp.float32)
        if op == "mul":
            x = x.at[STREAMS].set(1.0000001)
        elif op == "fma":
            x = x.at[STREAMS].set(0.999).at[STREAMS + 1].set(0.0015)
        elif op == "cmpsel":
            x = x.at[STREAMS].set(1.5).at[STREAMS + 1].set(0.001)
        elif op == "mix":
            x = x.at[STREAMS].set(1.001).at[STREAMS + 1].set(1.0)
        elif op == "sqrt":
            x = x.at[STREAMS].set(2.0)
        elif op == "div":
            x = x.at[STREAMS].set(2.25)
        call = pl.pallas_call(
            functools.partial(chain_kernel, op=op),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        fn = jax.jit(call)
        fit = profiling.benchmark_fit(lambda i: fn(x), iters=iters)
        chain_iters = STREAMS * LOOP * UNROLL  # vector instructions
        elems = chain_iters * 8 * 128
        return {
            "step_ms": round(fit["step_s"] * 1e3, 4),
            "chain_elem_iters": elems,
            **_fit(fit),
        }, elems / fit["step_s"], fit["fit_ok"]

    out = {}
    mul_row, mul_rate, _mok = run_chain("mul")
    out["vpu_mul"] = {
        **mul_row, "gelems_per_s": round(mul_rate / 1e9, 1),
        "note": "INFORMATIONAL ONLY — the pure-mul chain reassociates "
                "under unrolling (measured impossibly fast); the ceiling "
                "comes from the unfoldable chains below",
    }
    candidates = []
    mix_row, mix_rate, ok = run_chain("mix")  # 5 slots per chain iter
    out["vpu_mix"] = {**mix_row,
                      "gslots_per_s": round(5 * mix_rate / 1e9, 1)}
    if ok:
        candidates.append(5 * mix_rate)
    fma_row, fma_rate, ok = run_chain("fma")  # 2 flops per chain iter
    out["vpu_fma"] = {**fma_row, "gflops": round(2 * fma_rate / 1e9, 1)}
    if ok:
        candidates.append(2 * fma_rate)
    sel_row, sel_rate, ok = run_chain("cmpsel")  # 4 slots per chain iter
    out["vpu_cmpsel"] = {**sel_row,
                         "gslots_per_s": round(4 * sel_rate / 1e9, 1)}
    if ok:
        candidates.append(4 * sel_rate)
    # the ceiling: the highest DEMONSTRATED sustained issue rate among
    # fit-validated unfoldable chains (a true lower bound on the
    # machine's peak => pct_of_bound stays conservative)
    r_issue = max(candidates) if candidates else 4 * sel_rate
    out["r_issue_gslots"] = round(r_issue / 1e9, 1)

    sqrt_row, sqrt_rate, _ok = run_chain("sqrt")  # sqrt + mul per iter
    w_sqrt = max(r_issue / sqrt_rate - 1.0, 1.0)
    out["vpu_sqrt"] = {**sqrt_row, "weight_in_slots": round(w_sqrt, 2)}
    div_row, div_rate, _ok = run_chain("div")  # div per iter
    w_div = max(r_issue / div_rate, 1.0)
    out["vpu_div"] = {**div_row, "weight_in_slots": round(w_div, 2)}

    # ---- HBM streaming ------------------------------------------------
    NB, SUB = 128, 65536  # 128 x 2 MB blocks = 256 MB
    big = jnp.ones((NB, 8, SUB), jnp.float32)

    def copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 1.0000001

    copy = jax.jit(pl.pallas_call(
        copy_kernel, grid=(NB,),
        in_specs=[pl.BlockSpec((1, 8, SUB), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, 8, SUB), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NB, 8, SUB), jnp.float32),
    ))
    fit = profiling.benchmark_fit(lambda i: copy(big), iters=4)
    bytes_moved = 2 * NB * 8 * SUB * 4
    bw_copy = bytes_moved / fit["step_s"]
    out["hbm_copy"] = {"gb_per_s": round(bw_copy / 1e9, 1),
                       "bytes": bytes_moved,
                       "step_ms": round(fit["step_s"] * 1e3, 3), **_fit(fit)}

    def read_kernel(x_ref, o_ref):
        i = pl.program_id(0)
        s = jnp.sum(x_ref[...].reshape(8, SUB // 128, 128), axis=1)

        @pl.when(i == 0)
        def _():
            o_ref[...] = s

        @pl.when(i > 0)
        def _():
            o_ref[...] = o_ref[...] + s

    read = jax.jit(pl.pallas_call(
        read_kernel, grid=(NB,),
        in_specs=[pl.BlockSpec((1, 8, SUB), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda b: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    ))
    fit = profiling.benchmark_fit(lambda i: read(big), iters=4)
    bw_read = (NB * 8 * SUB * 4) / fit["step_s"]
    out["hbm_read"] = {"gb_per_s": round(bw_read / 1e9, 1),
                       "step_ms": round(fit["step_s"] * 1e3, 3), **_fit(fit)}

    out["datasheet_v5e"] = {
        "hbm_gb_per_s": 819,
        "mxu_bf16_tflops": 197,
        "note": "public v5e figures, for reference only — bounds below "
                "use the MEASURED ceilings",
    }
    out["model"] = {
        "r_issue_gslots": round(r_issue / 1e9, 1),
        "w_hard_sqrt": round(w_sqrt, 2),
        "w_hard_div": round(w_div, 2),
        "bw_gb_per_s": round(bw_copy / 1e9, 1),
        "bw_read_gb_per_s": round(bw_read / 1e9, 1),
    }
    return out


def _bound_row(counts, n_rays, step_s, model, bytes_hbm, dma_bytes=0.0,
               label="", extra=None):
    """Compose bound times from an OpCounts and measured ceilings."""
    r_issue = model["r_issue_gslots"] * 1e9
    # per-primitive hard-op weights from the measured chains; unknown
    # hard prims get the cheaper weight (keeps the bound a true LOWER
    # bound on achievable time)
    w_min = min(model["w_hard_sqrt"], model["w_hard_div"])
    hard_eff = 0.0
    for prim, e in counts.hard_by_prim.items():
        if prim in ("sqrt", "rsqrt", "cbrt"):
            hard_eff += e * model["w_hard_sqrt"]
        elif prim in ("div", "rem"):
            hard_eff += e * model["w_hard_div"]
        else:
            hard_eff += e * w_min
    slots_eff = counts.flops + counts.vops + hard_eff
    t_vpu = slots_eff / r_issue
    t_hbm = bytes_hbm / (model["bw_gb_per_s"] * 1e9)
    t_dma = dma_bytes / (model["bw_gb_per_s"] * 1e9)
    bound = max(t_vpu, t_hbm, t_dma)
    binding = ("vpu" if bound == t_vpu else
               ("hbm" if bound == t_hbm else "dma"))
    return {
        "label": label,
        "rays": n_rays,
        "measured_ms": round(step_s * 1e3, 3),
        "mrays_per_s": round(n_rays / step_s / 1e6, 2),
        "counts_per_ray": {
            "flops": round(counts.flops / n_rays, 1),
            "hard": round(counts.hard / n_rays, 1),
            "vops": round(counts.vops / n_rays, 1),
            "mem_elems": round(counts.mem_elems / n_rays, 1),
            "eff_slots": round(slots_eff / n_rays, 1),
        },
        "achieved_gslots_per_s": round(slots_eff / step_s / 1e9, 1),
        "hbm_bytes_per_ray": round(bytes_hbm / n_rays, 2),
        "dma_bytes_per_ray": round(dma_bytes / n_rays, 2),
        "bound_ms": {"vpu": round(t_vpu * 1e3, 3),
                     "hbm": round(t_hbm * 1e3, 3),
                     "dma": round(t_dma * 1e3, 3)},
        "binding": binding,
        "pct_of_bound": round(100.0 * bound / step_s, 1),
        **(extra or {}),
    }


# --------------------------------------------------------------- sphere --
def sphere_section(model, iters=8, rays=1 << 22, bounces=8, tile=4096):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ascendpathtracing_tpu import camera, scenes
    from ascendpathtracing_tpu.ops import pallas_kernels as pk
    from ascendpathtracing_tpu.utils import profiling
    from ascendpathtracing_tpu.utils import roofline as rl

    sc = scenes.get_scene("cornell8")
    planes = jnp.asarray(sc.soa10())
    w = h = int(np.sqrt(rays / 4))
    n = w * h * 4
    rp = jnp.transpose(jnp.asarray(
        camera.generate_rays_numpy(w, h, 1, seed=0).astype(np.float32)))

    fwd = jax.jit(lambda p: pk.render_reference_pallas_planes(
        rp, p, light_index=sc.light_index, bounces=bounces, tile=tile))
    render_d = pk.make_render_reference_pallas_diff(
        light_index=sc.light_index, bounces=bounces, tile=tile)
    step_d = jax.jit(jax.value_and_grad(lambda p: jnp.sum(render_d(rp, p))))

    # the two legs of the fwd+bwd step, separately (locates which kernel
    # carries the gap): residual-emitting forward, replay backward
    fwd_idx = jax.jit(lambda p: pk.render_reference_pallas_planes_with_idx(
        rp, p, light_index=sc.light_index, bounces=bounces, tile=tile))
    _out0, idx0 = fwd_idx(planes)
    g0 = jnp.ones((3, n), jnp.float32)
    bwd_only = jax.jit(lambda p: pk._render_ref_bwd_replay(
        idx0, p, g0, light_index=sc.light_index, bounces=bounces,
        tile=tile))

    rows = []
    for label, fn, count_fn in (
        ("sphere-pt fwd", fwd, fwd),
        ("sphere-pt fwd+bwd (custom-VJP replay)", step_d, step_d),
        ("sphere-pt fwd leg (residual-emitting)", fwd_idx, fwd_idx),
        ("sphere-pt bwd leg (replay)", bwd_only, bwd_only),
    ):
        counts = rl.count_ops(count_fn, planes)
        assert not counts.whiles and not counts.other, (
            counts.whiles, counts.other)
        fit = profiling.benchmark_fit(lambda i: fn(planes), iters=iters)
        # HBM per label: rays in / colors out / idx residuals / cotangent
        if label == "sphere-pt fwd":
            bytes_hbm = (6 + 3) * 4 * n
        elif label == "sphere-pt fwd leg (residual-emitting)":
            bytes_hbm = (6 + 3 + bounces) * 4 * n
        elif label == "sphere-pt bwd leg (replay)":
            bytes_hbm = (bounces + 3) * 4 * n
        else:  # fwd+bwd: rays+colors + idx written and read back + g
            bytes_hbm = (6 + 3 + 2 * bounces + 3) * 4 * n
        rows.append(_bound_row(
            counts, n, fit["step_s"], model, bytes_hbm,
            label=label, extra=_fit(fit)))
        print(json.dumps(rows[-1]), flush=True)

    # The bench.py headline default since r5 is tile 8192 for the
    # combined step (the larger tile amortizes the two-launch glue:
    # 892 -> 930 Mrays/s in the sweep); measure it against the same
    # bound so the artifact matches the shipped configuration.
    render_d8 = pk.make_render_reference_pallas_diff(
        light_index=sc.light_index, bounces=bounces, tile=8192)
    step_d8 = jax.jit(jax.value_and_grad(lambda p: jnp.sum(render_d8(rp, p))))
    counts = rl.count_ops(step_d8, planes)
    fit = profiling.benchmark_fit(lambda i: step_d8(planes), iters=iters)
    rows.append(_bound_row(
        counts, n, fit["step_s"], model, (6 + 3 + 2 * bounces + 3) * 4 * n,
        label="sphere-pt fwd+bwd (tile 8192, bench default)",
        extra=_fit(fit)))
    print(json.dumps(rows[-1]), flush=True)
    return rows


# ------------------------------------------------------------ traversal --
def traversal_section(model, iters=8, rays=1 << 20, subdiv=4,
                      chunk_tris=16, tile=1024):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ascendpathtracing_tpu.accel import meshes
    from ascendpathtracing_tpu.ops import pallas_wbvh as wbvh, sort as rs
    from ascendpathtracing_tpu.utils import profiling
    from ascendpathtracing_tpu.utils import roofline as rl

    v, f = meshes.icosphere(radius=1.0, subdivisions=subdiv)
    v32 = np.asarray(v, np.float32)
    n = rays
    rng = np.random.RandomState(0)
    o2 = rng.randn(3, n).astype(np.float32)
    o2 /= np.linalg.norm(o2, axis=0, keepdims=True)
    o2 *= 3.0
    d2 = rng.randn(3, n).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=0, keepdims=True)
    incoherent = jnp.asarray(np.concatenate([o2, d2], 0))

    lo, hi = jnp.asarray(v32.min(0)), jnp.asarray(v32.max(0))
    keys = rs.ray_sort_keys_6d(
        (incoherent[0], incoherent[1], incoherent[2]),
        (incoherent[3], incoherent[4], incoherent[5]), lo, hi)
    srt = jax.lax.sort((keys,) + tuple(incoherent[i] for i in range(6)),
                       num_keys=1)
    r_sorted = jnp.stack(srt[1:], 0)

    n_ch = -(-f.shape[0] // chunk_tris)
    supers_per = 16 if n_ch >= 128 else 0
    n_s = -(-n_ch // supers_per) if supers_per else 0
    supers2_per = 16 if n_s >= 256 else 0
    grid = wbvh.build_chunk_grid(v32, f, tris_per_chunk=chunk_tris,
                                 supers_per=supers_per,
                                 supers2_per=supers2_per)
    cb, sb, t13, _ = wbvh.chunk_grid_to_device(grid)
    ssb = jnp.asarray(grid.ssboxes) if grid.n_supers2 else None

    def call(r, stats):
        return wbvh.intersect_chunks_pallas(
            r, cb, sb, t13, ssb, tris_per_chunk=chunk_tris,
            supers_per=grid.supers_per, supers2_per=grid.supers2_per,
            tile=tile, stats=stats)

    step = jax.jit(lambda r: call(r, False))
    # one stats run on the same inputs for the loop trip counts
    *_out, kst = jax.jit(lambda r: call(r, True))(r_sorted)
    kst = np.asarray(kst).T  # -> [tiles, 3] = (k, hit supers, hit ss)
    k_mean, hs_mean, hss_mean = kst.mean(0)

    # while order inside compact_worklist: [ss_body] (3-level only),
    # super_body, chunk loop — assign measured means in traced order
    trips = {}
    wi = 0
    if grid.n_supers2:
        trips[wi] = float(hss_mean)
        wi += 1
    if grid.n_supers:
        trips[wi] = float(hs_mean)
        wi += 1
    trips[wi] = float(k_mean)

    counts = rl.count_ops(step, r_sorted, while_trips=trips,
                          default_while_trips=0.0)
    fit = profiling.benchmark_fit(lambda i: step(r_sorted), iters=iters)

    tiles = n // tile
    # bytes: rays in + tmin/hit out; tri table rides VMEM/SMEM at this
    # scale (hbm residency would add k*4096 DMA per tile)
    tri_bytes = grid.tris.shape[0] * grid.tris.shape[1] * 4
    residency_hbm = tri_bytes > 4 * 1024 * 1024
    dma = float(kst[:, 0].sum()) * 4096.0 if residency_hbm else 0.0
    bytes_hbm = (6 + 2) * 4 * n
    row = _bound_row(
        counts, n, fit["step_s"], model, bytes_hbm, dma_bytes=dma,
        label=f"traversal chunks s{subdiv} sorted-incoherent",
        extra={
            **_fit(fit),
            "tris": int(f.shape[0]), "chunks": grid.n_chunks,
            "supers": grid.n_supers, "supers2": grid.n_supers2,
            "tile": tile, "tiles": tiles,
            "worklist_k": {"mean": round(float(k_mean), 1),
                           "p95": int(np.percentile(kst[:, 0], 95)),
                           "max": int(kst[:, 0].max())},
            "hit_supers_mean": round(float(hs_mean), 1),
            "hit_ss_mean": round(float(hss_mean), 1),
            "whiles_counted": counts.whiles,
        })
    print(json.dumps(row), flush=True)
    return [row]


# ----------------------------------------------------------------- mesh --
def mesh_section(model, iters=4, size=512, spp=16, bounces=8,
                 subdiv=4, chunk_tris=16, tile=2048):
    # tile=2048 is the BASELINE mesh-row config (bench.py --tile 2048);
    # tile=1024 measured ~2x slower at s4 (2.16 vs 4.07 Mrays/s)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ascendpathtracing_tpu.accel import meshes
    from ascendpathtracing_tpu.models import mesh as mesh_mod
    from ascendpathtracing_tpu.ops import pallas_mesh_pt as mpt
    from ascendpathtracing_tpu.utils import profiling
    from ascendpathtracing_tpu.utils import roofline as rl

    w = h = size
    v, f = meshes.icosphere(center=(50, 40, 60), radius=14.0,
                            subdivisions=subdiv)
    ms = mesh_mod.MeshScene.cornell_with_mesh(
        v, f, albedo=(0.85, 0.55, 0.2), base_scene="smallpt9")
    planes, cb, sb, t24, mats, grid = mpt.mesh_pt_tables(
        ms, tris_per_chunk=chunk_tris)
    kw = mpt.pt_tables_kwargs(grid)
    total = w * h * spp

    def call(seed, stats):
        return mpt.render_pt_mesh_pallas(
            planes, cb, sb, t24, width=w, height=h, spp4=spp,
            materials=mats, bounces=bounces, rr_depth=5, tile=tile,
            seed=seed, with_stats=stats, **kw)

    step = jax.jit(lambda s: call(s, False))
    _col, kst = jax.jit(lambda s: call(s, True))(jnp.int32(0))
    kst = np.asarray(kst).T  # [3*bounces, cells] -> [cells, 3*bounces]
    k_b = kst[:, :bounces]          # worklist k per (cell, bounce)
    hs_b = kst[:, bounces:2 * bounces]
    hss_b = kst[:, 2 * bounces:]
    k_mean = float(k_b.mean())
    hs_mean = float(hs_b.mean())
    hss_mean = float(hss_b.mean())

    # fwd (non-residual) path: both bounce fori_loops (pre-RR and RR)
    # lower to scan, so each data-dependent loop appears ONCE per scan
    # with the grid/scan multiplier — assign each scan's across-bounce
    # means in traced order ([ss], [super], chunk per scan)
    n_levels = (1 + (1 if grid.n_supers else 0) +
                (1 if grid.n_supers2 else 0))
    rr_depth = 5
    n_pre = min(rr_depth, bounces)
    scan_slices = [s for s in (slice(0, n_pre), slice(n_pre, bounces))
                   if s.stop > s.start]
    trips = {}
    wi = 0
    for sl in scan_slices:
        if grid.n_supers2:
            trips[wi] = float(hss_b[:, sl].mean())
            wi += 1
        if grid.n_supers:
            trips[wi] = float(hs_b[:, sl].mean())
            wi += 1
        trips[wi] = float(k_b[:, sl].mean())
        wi += 1
    counts = rl.count_ops(step, jnp.int32(0), while_trips=trips,
                          default_while_trips=0.0)
    fit = profiling.benchmark_fit(lambda i: step(jnp.int32(i)),
                                  iters=iters, max_seconds=240.0)

    tri_bytes = t24.shape[0] * t24.shape[1] * 4
    residency_hbm = tri_bytes > 4 * 1024 * 1024
    dma = float(k_b.sum()) * 4096.0 if residency_hbm else 0.0
    bytes_hbm = 3 * 4 * w * h  # camera rays are generated in-kernel
    row = _bound_row(
        counts, total, fit["step_s"], model, bytes_hbm, dma_bytes=dma,
        label=f"mesh-pt fused fwd s{subdiv} {size}x{size}x{spp}spp",
        extra={
            **_fit(fit),
            "tris": int(f.shape[0]), "chunks": grid.n_chunks,
            "supers": grid.n_supers, "supers2": grid.n_supers2,
            "tile": tile, "residency": "hbm" if residency_hbm else "vmem",
            "levels": n_levels,
            "worklist_k": {
                "mean_all": round(k_mean, 2),
                "mean_by_bounce": [round(float(k_b[:, b].mean()), 2)
                                   for b in range(bounces)],
                "p95": int(np.percentile(k_b, 95)),
                "max": int(k_b.max()),
            },
            "hit_supers_mean": round(hs_mean, 2),
            "hit_ss_mean": round(hss_mean, 2),
            "whiles_counted": counts.whiles,
        })
    print(json.dumps(row), flush=True)
    return [row]


def main(argv=None) -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    p = argparse.ArgumentParser()
    p.add_argument("--sections", default="ceilings,sphere,traversal,mesh")
    p.add_argument("--mesh-subdivs", default="4,6")
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "artifacts", "roofline_r5.json"))
    args = p.parse_args(argv)

    import jax

    sections = args.sections.split(",")
    art = {"backend": jax.default_backend()}

    ceil = measure_ceilings(iters=args.iters)
    art["ceilings"] = ceil
    print(json.dumps({"ceilings": ceil}), flush=True)
    model = ceil["model"]

    rows = []
    if "sphere" in sections:
        rows += sphere_section(model, iters=args.iters)
    if "traversal" in sections:
        rows += traversal_section(model, iters=args.iters)
    if "mesh" in sections:
        for s in (int(x) for x in args.mesh_subdivs.split(",")):
            rows += mesh_section(model, iters=max(2, args.iters // 2),
                                 subdiv=s)
    art["rows"] = rows
    with open(args.out, "w") as fh:
        json.dump(art, fh, indent=1)
    print(json.dumps({"written": args.out, "n_rows": len(rows)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
