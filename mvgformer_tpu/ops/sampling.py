"""Multi-scale deformable sampling in pure jnp (XLA gather formulation).

Semantics contract (shared with the Pallas kernel): identical to the
reference CUDA op `deform_forward` (/root/reference/lib/models/ops/src/cuda/
deform_im2col_cuda.cuh:248-311) and its pure-torch mirror deform_core_pytorch
(/root/reference/lib/models/ops/functions/deform_func.py:68-99):

    * sampling locations are in [0, 1] normalized per-level coordinates;
      pixel coords use F.grid_sample align_corners=False convention:
      pix = loc * size - 0.5;
    * bilinear interpolation with zero padding outside the feature map;
    * output[n, q, h, :] = sum over (level, point) of
      w[n, q, h, l, p] * bilinear(value_l[n, :, h, :], loc[n, q, h, l, p]).

Everything is static-shape; levels are a Python-level loop (3 levels),
unrolled into one fused XLA program.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def flatten_feature_levels(feats: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, Tuple[Tuple[int, int], ...]]:
    """Concat per-level (N, C, H, W) maps into (N, sum HW, C) + static shapes.

    Mirrors the reference's input_flatten construction
    (lib/models/ops/modules/projattn.py:160).
    """
    shapes = tuple((int(f.shape[2]), int(f.shape[3])) for f in feats)
    flat = jnp.concatenate(
        [f.reshape(f.shape[0], f.shape[1], -1) for f in feats], axis=-1)
    return jnp.swapaxes(flat, 1, 2), shapes


def bilinear_sample(value: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                    h: int, w: int) -> jnp.ndarray:
    """Bilinear sample with zero padding.

    value: (..., h*w, D) row-major (y-major) flattened feature map.
    x, y:  (..., S) pixel coordinates (already -0.5 centered).
    Returns (..., S, D).
    """
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(xi, yi, wgt):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        gathered = jnp.take_along_axis(
            value, idx[..., None], axis=-2)  # (..., S, D)
        return gathered * (wgt * inb)[..., None]

    out = corner(x0i, y0i, (1 - lx) * (1 - ly))
    out += corner(x0i + 1, y0i, lx * (1 - ly))
    out += corner(x0i, y0i + 1, (1 - lx) * ly)
    out += corner(x0i + 1, y0i + 1, lx * ly)
    return out


def build_corner_tables(value: jnp.ndarray,
                        spatial_shapes: Sequence[Tuple[int, int]]):
    """Per-level zero-padded 4-corner tables for the fast gather path.

    For each level, pad the (h, w) map by one zero pixel on every side and
    build rows of the 4 bilinear corners [v[y,x], v[y,x+1], v[y+1,x],
    v[y+1,x+1]] so one wide row-gather fetches a whole bilinear stencil
    (XLA's TPU gather cost is per-slice, not per-byte, so 1 wide slice
    beats 4 narrow ones ~3x; measured on v5e).

    value: (N, Len_in, H, D) -> list of (N, H, (h+2)*(w+2), 4*D) tables.

    Built head-major-first: one small transpose of the pre-pad data, then
    pad/shift/concat on the minor axis — avoids a major-axis transpose of
    the 4x-blown-up table (~5 ms/layer on v5e at production shapes).
    """
    N, Len_in, H, D = value.shape
    tables = []
    start = 0
    for (h, w) in spatial_shapes:
        v = jax.lax.dynamic_slice_in_dim(value, start, h * w, axis=1)
        start += h * w
        v = jnp.swapaxes(v, 1, 2).reshape(N, H, h, w, D)
        v = jnp.pad(v, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        hp, wp = h + 2, w + 2
        c00 = v
        c01 = jnp.pad(v[:, :, :, 1:],
                      ((0, 0), (0, 0), (0, 0), (0, 1), (0, 0)))
        c10 = jnp.pad(v[:, :, 1:],
                      ((0, 0), (0, 0), (0, 1), (0, 0), (0, 0)))
        c11 = jnp.pad(v[:, :, 1:, 1:],
                      ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
        tbl = jnp.concatenate([c00, c01, c10, c11], axis=-1)
        tables.append(tbl.reshape(N, H, hp * wp, 4 * D))
    return tables


def _corner_table_single(v: jnp.ndarray) -> jnp.ndarray:
    """One (h, w, D) map -> ((h+2)*(w+2), 4D) zero-padded 4-corner rows."""
    h, w, D = v.shape
    v = jnp.pad(v, ((1, 1), (1, 1), (0, 0)))
    c00 = v
    c01 = jnp.pad(v[:, 1:], ((0, 0), (0, 1), (0, 0)))
    c10 = jnp.pad(v[1:], ((0, 1), (0, 0), (0, 0)))
    c11 = jnp.pad(v[1:, 1:], ((0, 1), (0, 1), (0, 0)))
    t = jnp.concatenate([c00, c01, c10, c11], axis=-1)
    return t.reshape((h + 2) * (w + 2), 4 * D)


def deform_sample_corner(value: jnp.ndarray,
                         spatial_shapes: Sequence[Tuple[int, int]],
                         sampling_locations: jnp.ndarray,
                         attention_weights: jnp.ndarray,
                         query_chunks: Optional[int] = None) -> jnp.ndarray:
    """Fast exact deformable sampling via 4-corner tables.

    Same contract as deform_sample; one (1, 4D) row-gather per sample
    instead of four (1, D) gathers.

    At production sizes each (view, head) pair gets its OWN standalone
    corner tables and its own gathers over them, with levels grouped into
    row-concatenated tables of at most ~8 MB. Measured v5e effects
    (PERF.md "gather wall", output/probe_gather_cost_model.py):
      * the gather's per-row cost is set by OPERAND size: ~0.4-1.8 ns/row
        for operands <= 8 MB, ~8-9 ns/row above ~10 MB (VMEM cliff);
      * gathers over small standalone operands run ~4-5x faster than one
        batched gather over the whole (N, H, hw, 4D) buffer;
      * slicing a big in-program table per (n, h) — even behind
        optimization_barrier — costs ~2x vs building each table as its
        own buffer (probe_bisect_sampler: 12.9 ms vs 6.7 ms);
      * so levels 1+2 (2.5 MB combined at production shapes) share one
        table + one gather per (n, h), level 0 (7.7 MB) gets its own."""
    N, Len_in, H, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    # unstacked wins whenever the row count amortizes its ~40-gather fixed
    # cost; measured at K=64/P=4 (153600 rows): unstacked 6.8 ms vs
    # batched 16.4 ms (probe_ptop_indirection.py, v5e 2026-08-19), so the
    # threshold sits below that shape
    unstacked = N * H * Lq * P >= 131072
    # probe knob (profile_stages4 / probe_ptop_indirection): force one
    # path for A/B measurement; read at trace time like MVG_GATHER_CAP_MB
    import os as _os
    _force = _os.environ.get("MVG_FORCE_GATHER_PATH", "")
    if _force == "batched":
        unstacked = False
    elif _force == "unstacked":
        unstacked = True

    # --- per-level sampling indices / weights (shared by both paths)
    idxs, wtss, aws, yxs = [], [], [], []
    for lvl, (h, w) in enumerate(spatial_shapes):
        hp, wp = h + 2, w + 2
        loc = sampling_locations[:, :, :, lvl]  # (N, Lq, H, P, 2)
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(N, H, Lq * P)
        y = jnp.transpose(y, (0, 2, 1, 3)).reshape(N, H, Lq * P)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        lx = x - x0
        ly = y - y0
        # a sample "touches" the map iff its stencil overlaps [0,w)x[0,h);
        # with the 1px zero pad, clamped padded indices are exact for all
        # touching samples, and non-touching ones are masked to zero
        touch = ((x > -1.0) & (x < w) & (y > -1.0) & (y < h))
        xi = jnp.clip(x0.astype(jnp.int32) + 1, 0, wp - 2)
        yi = jnp.clip(y0.astype(jnp.int32) + 1, 0, hp - 2)
        yxs.append((yi, xi))  # kept for padded-stride table layouts
        idxs.append(yi * wp + xi)  # (N, H, Lq*P)
        wts = jnp.stack([
            (1 - lx) * (1 - ly), lx * (1 - ly),
            (1 - lx) * ly, lx * ly], axis=-1)  # (N, H, Lq*P, 4)
        wtss.append(wts * touch[..., None])
        aws.append(jnp.transpose(attention_weights[:, :, :, lvl],
                                 (0, 2, 1, 3)).reshape(N, H, Lq * P))

    if not unstacked:
        tables = build_corner_tables(value, spatial_shapes)
        out = jnp.zeros((N, H, Lq, D), dtype=value.dtype)
        for lvl in range(L):
            g = jnp.take_along_axis(tables[lvl], idxs[lvl][..., None],
                                    axis=2)
            g = g.reshape(N, H, Lq * P, 4, D)
            sampled = jnp.sum(
                g * wtss[lvl][..., None].astype(g.dtype), axis=3)
            out = out + jnp.sum(
                (sampled * aws[lvl][..., None]).reshape(N, H, Lq, P, D),
                axis=3)
        return jnp.transpose(out, (0, 2, 1, 3)).reshape(N, Lq, H * D)

    # --- production path: per-(view, head) grouped-level tables.
    # Greedily group consecutive levels while the concatenated corner
    # table stays under the ~8 MB operand sweet spot (the gather cost
    # cliff sits at ~10 MB, PERF.md "round-2 gather findings"; the env
    # knob exists for re-measuring on other chips/toolchains).
    import os as _os

    # Group cap: 16 MB puts all 3 production levels (10.7 MB bf16) in ONE
    # table + one gather per (n, h); 8 MB splits them 2/1. Isolated probes
    # said 16 MB wins everywhere (profile_stages4.py), but FULL-MODEL
    # measurements disagree at P=8 (4th instance of the probe-transfer
    # trap, PERF.md): topk64_jacobi P=8 benches 8.97 fps at 8 MB vs 8.41
    # at 16 MB, while ptop4 (P=4, half the rows) benches 10.42 at 16 MB
    # vs 10.03 at 8 MB (bench_detail, v5e 2026-08-19). Fewer rows per
    # gather -> the per-gather fixed cost dominates -> one group wins;
    # more rows -> the >10 MB operand penalty dominates -> split wins.
    #
    # CRASH GUARD (round 5, PERF.md "measurement traps"): the full-model
    # K=128+ptop4 program with single-group tables at its compacted
    # layers (Lq=1920, P=4) reproducibly hard-faults the TPU worker
    # (solo-reproduced 2x 2026-08-19); the same program at cap=8 runs
    # clean (9.125 fps), and the sampler ALONE at the exact crashing
    # shape runs clean either way (probe_ptop128_crash.py) — a
    # full-model-context-only toolchain fault, same class as the
    # round-3 chunk-scan crash. The single-group path is therefore
    # gated to the measured-good row-count domain: the headline's
    # compacted layers (N*H*Lq*P = 153600 at K=64) and below, where the
    # per-gather fixed cost is what single-grouping wins back anyway.
    rows_total = N * H * Lq * P
    default_cap = "16" if (P <= 4 and rows_total <= 153600) else "8"
    CAP_BYTES = int(_os.environ.get("MVG_GATHER_CAP_MB",
                                    default_cap)) * 2 ** 20
    itemsize = jnp.dtype(value.dtype).itemsize

    # table build impl (MVG_TABLE_IMPL=xla|pallas, trace-time like the
    # cap knob): 'pallas' builds each level's padded corner table in one
    # static-DMA Mosaic kernel (ops/table_pallas.py) instead of 40 pad/
    # shift/concat XLA ops per level; rows are then indexed with the
    # kernel's lane-aligned stride. Gather structure is unchanged: the
    # per-(view, head) group tables are sliced out of the kernel output
    # behind an optimization_barrier so the gather still sees small
    # standalone operands.
    table_impl = _os.environ.get("MVG_TABLE_IMPL", "xla")
    if table_impl == "pallas":
        from mvgformer_tpu.ops.table_pallas import padded_width

        level_strides = [padded_width(w) for (_, w) in spatial_shapes]
        level_rows = [(h + 2) * level_strides[l]
                      for l, (h, w) in enumerate(spatial_shapes)]
        lvl_idx = [yi * level_strides[l] + xi
                   for l, (yi, xi) in enumerate(yxs)]
    else:
        level_rows = [(h + 2) * (w + 2) for (h, w) in spatial_shapes]
        lvl_idx = idxs
    groups: List[List[int]] = []
    cur: List[int] = []
    cur_bytes = 0
    for lvl in range(L):
        b = level_rows[lvl] * 4 * D * itemsize
        if cur and cur_bytes + b > CAP_BYTES:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(lvl)
        cur_bytes += b
    groups.append(cur)

    # (N, H, Len_in, D) view-head-major once; per-level slices reshape to
    # (N, H, h, w, D) for the per-(n,h) table builds
    value_hd = jnp.swapaxes(value, 1, 2)
    if table_impl == "pallas":
        from mvgformer_tpu.ops.table_pallas import \
            build_corner_tables_pallas

        ktables, _ = build_corner_tables_pallas(value_hd, spatial_shapes)
        v_lvls = None
    else:
        v_lvls = []
        start = 0
        for (h, w) in spatial_shapes:
            v_lvls.append(jax.lax.dynamic_slice_in_dim(
                value_hd, start, h * w, axis=2).reshape(N, H, h, w, D))
            start += h * w

    # pre-concatenate per-group indices/weights (row offsets for levels
    # after the first in a group)
    g_idx, g_wts, g_aw = [], [], []
    for grp in groups:
        off = 0
        parts = []
        for lvl in grp:
            parts.append(lvl_idx[lvl] + off)
            off += level_rows[lvl]
        g_idx.append(jnp.concatenate(parts, axis=-1))  # (N,H,G*LqP)
        g_wts.append(jnp.concatenate([wtss[lvl] for lvl in grp], axis=2))
        g_aw.append(jnp.concatenate([aws[lvl] for lvl in grp], axis=-1))

    # NOTE: splitting the 7.7 MB level-0 table into <=4 MB row-chunks with
    # clamp+masked gathers wins 2x in an isolated microbenchmark but is
    # ~15% SLOWER in the full op's context (probe_chunks vs in-context
    # run, 2026-08-16) — kept single-table per group.
    # query-chunked gather (TRAIN.SAMPLE_CHUNKS): the training backward
    # must materialize the gathered corner rows as residuals for the
    # location/weight VJPs — at flagship dense shapes that is
    # N*H*Lq*P*3 rows x 4D bf16 ~= 3.8 GB per layer, the HBM occupant
    # that blocks batch-2 (PERF.md "training wall-clock budget"). A
    # lax.scan over query chunks with jax.checkpoint on the body keeps
    # tables + per-chunk indices as the only residuals; the backward
    # re-gathers one chunk at a time, dividing that peak by `chunks`.
    # Inference passes None (single fused gather, unchanged).
    chunked = (query_chunks is not None and query_chunks > 1
               and Lq % query_chunks == 0)

    # sorted-window one-hot MXU gather (MVG_SAMPLER_IMPL=onehot,
    # ops/onehot_gather.py — VERDICT r4 item 1): only dense-layer-sized
    # row counts qualify (the trained model's sample-sorted windows are
    # one-hot viable at dense L1 but not at the compacted layers,
    # PERF.md "exact-path sorted-window gather"); exact for all inputs
    # via escape repair + cond fallback inside deform_gather_reduce.
    if (_os.environ.get("MVG_SAMPLER_IMPL", "") == "onehot"
            and not chunked and Lq * P >= 32768):
        from mvgformer_tpu.ops.onehot_gather import deform_gather_reduce

        acc = None
        for gi, grp in enumerate(groups):
            G = len(grp)
            if table_impl == "pallas":
                pair_tbls = [
                    jnp.concatenate([ktables[lvl][n * H + hh]
                                     for lvl in grp], axis=0)
                    if G > 1 else ktables[grp[0]][n * H + hh]
                    for n in range(N) for hh in range(H)]
            else:
                pair_tbls = [
                    jnp.concatenate([_corner_table_single(
                        v_lvls[lvl][n, hh]) for lvl in grp], axis=0)
                    for n in range(N) for hh in range(H)]
            tbl_stk = jax.lax.optimization_barrier(jnp.stack(pair_tbls))
            idx_g = g_idx[gi].reshape(N * H, G * Lq * P)
            w4 = (g_wts[gi] * g_aw[gi][..., None]).reshape(
                N * H, G * Lq * P, 4)
            red = deform_gather_reduce(tbl_stk, idx_g,
                                       w4.astype(tbl_stk.dtype))
            contrib = jnp.sum(
                red.reshape(N, H, G, Lq, P, D), axis=(2, 4))
            acc = contrib if acc is None else acc + contrib
        return jnp.transpose(acc, (0, 2, 1, 3)).reshape(N, Lq, H * D)

    def pair_output(n, hh, tbls):
        if not chunked:
            acc = None
            for gi, grp in enumerate(groups):
                G = len(grp)
                g = tbls[gi][g_idx[gi][n, hh]]  # (G*LqP, 4D)
                g = g.reshape(G * Lq * P, 4, D)
                sampled = jnp.sum(
                    g * g_wts[gi][n, hh][..., None].astype(g.dtype),
                    axis=1)
                contrib = jnp.sum(
                    (sampled * g_aw[gi][n, hh][..., None]).reshape(
                        G, Lq, P, D), axis=(0, 2))
                acc = contrib if acc is None else acc + contrib
            return acc

        nc = query_chunks
        Lqc = Lq // nc
        # chunk-major per-group views: (nc, G, Lqc*P[, 4])
        xs = []
        for gi, grp in enumerate(groups):
            G = len(grp)
            ci = jnp.swapaxes(
                g_idx[gi][n, hh].reshape(G, nc, Lqc * P), 0, 1)
            cw = jnp.swapaxes(
                g_wts[gi][n, hh].reshape(G, nc, Lqc * P, 4), 0, 1)
            ca = jnp.swapaxes(
                g_aw[gi][n, hh].reshape(G, nc, Lqc * P), 0, 1)
            xs.append((ci, cw, ca))

        def body(carry, chunk):
            acc = None
            for gi, grp in enumerate(groups):
                G = len(grp)
                ci, cw, ca = chunk[gi]
                g = tbls[gi][ci.reshape(-1)]
                g = g.reshape(G * Lqc * P, 4, D)
                sampled = jnp.sum(
                    g * cw.reshape(G * Lqc * P, 4)[..., None].astype(
                        g.dtype), axis=1)
                contrib = jnp.sum(
                    (sampled * ca.reshape(-1)[..., None]).reshape(
                        G, Lqc, P, D), axis=(0, 2))
                acc = contrib if acc is None else acc + contrib
            return carry, acc

        _, outs = jax.lax.scan(jax.checkpoint(body), 0.0, tuple(xs))
        return outs.reshape(Lq, D)

    houts = []
    for n in range(N):
        for hh in range(H):
            tbls = []
            for gi, grp in enumerate(groups):
                if table_impl == "pallas":
                    parts = [ktables[lvl][n * H + hh] for lvl in grp]
                    tbl = (jnp.concatenate(parts, axis=0)
                           if len(parts) > 1 else parts[0])
                else:
                    tbl = jnp.concatenate(
                        [_corner_table_single(v_lvls[lvl][n, hh])
                         for lvl in grp], axis=0)
                tbls.append(jax.lax.optimization_barrier(tbl))
            houts.append(pair_output(n, hh, tbls))
    out = jnp.stack(houts).reshape(N, H, Lq, D)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(N, Lq, H * D)


def deform_sample(value: jnp.ndarray,
                  spatial_shapes: Sequence[Tuple[int, int]],
                  sampling_locations: jnp.ndarray,
                  attention_weights: jnp.ndarray) -> jnp.ndarray:
    """Fused multi-level deformable sampling.

    Args:
        value:              (N, Len_in, H, D) per-head values; Len_in is the
                            concatenation of all levels' h*w (y-major).
        spatial_shapes:     static ((h0, w0), (h1, w1), ...).
        sampling_locations: (N, Lq, H, L, P, 2) in [0, 1] (x, y) order.
        attention_weights:  (N, Lq, H, L, P).

    Returns:
        (N, Lq, H*D) attended features.
    """
    N, Len_in, H, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes), (L, spatial_shapes)

    # (N, H, Len_in, D) so the gather batch dims lead
    value_hd = jnp.swapaxes(value, 1, 2)

    out = jnp.zeros((N, H, Lq, D), dtype=value.dtype)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v_l = jax.lax.dynamic_slice_in_dim(value_hd, start, h * w, axis=2)
        start += h * w
        # pixel coords, grid_sample align_corners=False convention
        loc = sampling_locations[:, :, :, lvl]  # (N, Lq, H, P, 2)
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        # -> (N, H, Lq*P)
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(N, H, Lq * P)
        y = jnp.transpose(y, (0, 2, 1, 3)).reshape(N, H, Lq * P)
        sampled = bilinear_sample(v_l, x, y, h, w)  # (N, H, Lq*P, D)
        wgt = jnp.transpose(
            attention_weights[:, :, :, lvl], (0, 2, 1, 3)
        ).reshape(N, H, Lq * P)
        out = out + jnp.sum(
            (sampled * wgt[..., None]).reshape(N, H, Lq, P, D), axis=3)

    # (N, H, Lq, D) -> (N, Lq, H*D); matches the reference's
    # view(N, M*D, Lq).transpose(1, 2) output layout (deform_func.py:98-99)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(N, Lq, H * D)
