"""Windowed layer-1 deformable sampling (rig-static tile bucketing).

The reference's deformable attention gathers one bilinear stencil per
(query, head, level, point) — 14.7M dynamic slices for the dense first
decoder layer at the flagship shape, which is gather-engine-bound on TPU
(~4 ns/row, PERF.md "the gather wall"). This module exploits a structural
fact of MVGFormer's FIRST layer: its sampling CENTERS are the projections
of the compile-time sample_space grid through the (fixed) camera rig
(dq_transformer.py:298-323 + dq_decoder.py:331-397), so each (query,
view, level) can be assigned to a static feature-map tile ON THE HOST,
once per rig. The learned offsets remain frame-dynamic (they depend on
image features sampled at the reference points, projattn.py:147-153), so
the per-sample bilinear weights are built ON DEVICE as separable
relu(1-|d|) terms over the tile's halo'd window and applied with one
blocked einsum per (view, level) — MXU math instead of per-sample
gathers.

Semantics vs the exact sampler (ops/sampling.py):
  * identical for every sample whose offset stays within `halo - 2`
    pixels of its query's static center (the relu terms reproduce
    bilinear weights exactly, and the window's zero padding reproduces
    the map's zero-padding border semantics);
  * samples escaping the window contribute ZERO instead of their true
    value. At init, offsets are bounded by the radial bias (<= n_points
    px per level, projattn.py:96-107), so halo >= n_points + 2 makes the
    op exact; for trained checkpoints the escape WEIGHT MASS is returned
    as a telemetry scalar so the deviation is measurable per frame.
    Only samples whose stencil touches the REAL map are counted: off-map
    samples read zero in the exact sampler too, so missing their window
    is not a deviation (common for queries projecting outside a view).
    With DECODER.layer1_offset_clamp <= halo - 2 the telemetry reads 0
    by construction.

This is an inference-only fast path (the training path keeps the exact
gather formulation); enable with DECODER.layer1_windowed_sampling.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class LevelPlan(NamedTuple):
    """Static bucketing for one (level) across all views (host-built)."""

    K: int                    # window side = tile + 2*halo (+2 border)
    tile: int
    pad: int                  # map zero-padding on each side
    block_rows: int
    # all arrays are np.ndarray (compile-time constants / device consts)
    row_query: np.ndarray     # (V, nrows) query id per row (tile-sorted)
    row_valid: np.ndarray     # (V, nrows) 1.0 real row / 0.0 padding
    row_origin: np.ndarray    # (V, nrows, 2) window origin (x0, y0) in
    #                           PADDED pixel coords
    block_tile: np.ndarray    # (V, nblocks) tile id per block
    inv_perm: np.ndarray      # (V, Lq) row index holding query q
    n_tiles: int
    grid_hw: Tuple[int, int]  # (nty, ntx)


class WindowPlan(NamedTuple):
    levels: Tuple[LevelPlan, ...]
    halo: int
    impl: str = "xla"  # 'xla' | 'pallas' (ops/window_pallas.py)


def build_window_plan(centers_px: np.ndarray,
                      spatial_shapes: Sequence[Tuple[int, int]],
                      tile: int = 8, halo: int = 10,
                      block_rows: Sequence[int] = None,
                      impl: str = "xla") -> WindowPlan:
    """Host-side plan: assign each (view, query, level) to a static tile.

    centers_px: (V, Lq, L, 2) static sampling centers in each level's
    pixel coordinates ((x, y), grid_sample convention: loc * size - 0.5),
    i.e. the layer-1 projected reference points WITHOUT learned offsets.
    """
    V, Lq, L, _ = centers_px.shape
    assert L == len(spatial_shapes)
    pad = halo + 2
    K = tile + 2 * halo  # window side; covers offsets up to halo - 2
    plans = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        br = (block_rows[lvl] if block_rows is not None
              else (32 if h * w >= 16384 else (64 if h * w >= 4096
                                               else 128)))
        nty = -(-h // tile)
        ntx = -(-w // tile)
        n_tiles = nty * ntx
        rq, rv, ro, bt, ip = [], [], [], [], []
        for v in range(V):
            cx = centers_px[v, :, lvl, 0]
            cy = centers_px[v, :, lvl, 1]
            tx = np.clip(np.floor(cx / tile).astype(np.int64), 0, ntx - 1)
            ty = np.clip(np.floor(cy / tile).astype(np.int64), 0, nty - 1)
            tid = ty * ntx + tx
            order = np.argsort(tid, kind="stable")
            # pad each tile's run to a multiple of block_rows; real rows
            # are the head of each run, pads (query 0, valid=0) the tail
            rows_q, rows_t, rows_v = [], [], []
            pos = np.full(Lq, -1, np.int64)
            sorted_tid = tid[order]
            starts = np.searchsorted(sorted_tid,
                                     np.arange(n_tiles), side="left")
            ends = np.searchsorted(sorted_tid,
                                   np.arange(n_tiles), side="right")
            n_sofar = 0
            for t in range(n_tiles):
                qs = order[starts[t]:ends[t]]
                if qs.size == 0:
                    continue
                n_pad = (-qs.size) % br
                pos[qs] = n_sofar + np.arange(qs.size)
                rows_q.append(np.concatenate(
                    [qs, np.zeros(n_pad, np.int64)]))
                rows_v.append(np.concatenate(
                    [np.ones(qs.size, np.float32),
                     np.zeros(n_pad, np.float32)]))
                rows_t.append(np.full(qs.size + n_pad, t, np.int64))
                n_sofar += qs.size + n_pad
            rows_q = np.concatenate(rows_q)
            rows_t = np.concatenate(rows_t)
            valid = np.concatenate(rows_v)
            assert (pos >= 0).all()
            origin_x = (rows_t % ntx) * tile - halo + pad
            origin_y = (rows_t // ntx) * tile - halo + pad
            rq.append(rows_q)
            rv.append(valid)
            ro.append(np.stack([origin_x, origin_y], -1))
            bt.append(rows_t.reshape(-1, br)[:, 0])
            ip.append(pos)
        # per-view row counts differ; pad to the max with dummy rows on
        # tile 0
        n_rows = max(x.size for x in rq)
        n_rows = -(-n_rows // br) * br

        def padv(a, fill, shape_tail=()):
            out = np.full((V, n_rows) + shape_tail, fill, a[0].dtype)
            for v in range(V):
                out[v, :a[v].shape[0]] = a[v]
            return out

        row_query = padv(rq, 0)
        row_valid = padv(rv, 0.0)
        row_origin = padv([o.astype(np.int64) for o in ro], pad, (2,))
        nblocks = n_rows // br
        block_tile = np.zeros((V, nblocks), np.int64)
        for v in range(V):
            nb = bt[v].shape[0]
            block_tile[v, :nb] = bt[v]
        inv_perm = np.stack(ip)
        plans.append(LevelPlan(
            K=K, tile=tile, pad=pad, block_rows=br,
            row_query=row_query.astype(np.int32),
            row_valid=row_valid.astype(np.float32),
            row_origin=row_origin.astype(np.int32),
            block_tile=block_tile.astype(np.int32),
            inv_perm=inv_perm.astype(np.int32),
            n_tiles=n_tiles, grid_hw=(nty, ntx)))
    return WindowPlan(levels=tuple(plans), halo=halo, impl=impl)


def _tile_windows(v_map: jnp.ndarray, plan: LevelPlan) -> jnp.ndarray:
    """(h, w, H, D) level map -> (n_tiles, K*K, H, D) halo'd windows.

    Built with static band slices (nty + ntx slice ops), no gathers."""
    h, w, H, D = v_map.shape
    K, tile, pad = plan.K, plan.tile, plan.pad
    nty, ntx = plan.grid_hw
    p = jnp.pad(v_map, ((pad, pad + tile), (pad, pad + tile),
                        (0, 0), (0, 0)))
    # horizontal bands: origin_y of tile row ty is ty*tile - halo + pad
    # = ty*tile + 2
    bands = jnp.stack([
        jax.lax.dynamic_slice_in_dim(p, ty * tile + 2, K, axis=0)
        for ty in range(nty)])                       # (nty, K, wp, H, D)
    cols = jnp.stack([
        jax.lax.dynamic_slice_in_dim(bands, tx * tile + 2, K, axis=2)
        for tx in range(ntx)], axis=1)               # (nty, ntx, K, K, H, D)
    return cols.reshape(nty * ntx, K * K, H, D)


def _inside_mass(rx, ry, kx, ky):
    """Closed-form in-window bilinear mass per sample (the integer
    triangle kernel is a partition of unity, so the mass inside
    [0, k-1] per axis is the product of the two edge-clipped axis
    masses). kx/ky are the window extents in x/y (they differ for the
    DMA kernel, whose x extent is widened to the 8-aligned Kx)."""
    mx = jnp.clip(rx + 1.0, 0.0, 1.0) * jnp.clip(kx - rx, 0.0, 1.0)
    my = jnp.clip(ry + 1.0, 0.0, 1.0) * jnp.clip(ky - ry, 0.0, 1.0)
    return mx * my


def window_sample(value: jnp.ndarray,
                  spatial_shapes: Sequence[Tuple[int, int]],
                  sampling_locations: jnp.ndarray,
                  attention_weights: jnp.ndarray,
                  plan: WindowPlan,
                  row_dtype: jnp.dtype = jnp.bfloat16,
                  impl: str = None):
    """Windowed deformable sampling; same contract as deform_sample plus a
    telemetry scalar.

    value:              (V, Len_in, H, D)
    sampling_locations: (V, Lq, H, L, P, 2) in [0, 1]
    attention_weights:  (V, Lq, H, L, P)
    Returns ((V, Lq, H*D) features, escaped-weight-mass scalar).
    """
    V, Len_in, H, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    if impl is None:
        impl = plan.impl
    plan_v = plan.levels[0].row_query.shape[0]
    if V != plan_v:
        # caller folded (views, batch) view-major (n = v*B + b); the plan
        # is per-view, so repeat each view's tables B times
        B = V // plan_v
        assert plan_v * B == V, (V, plan_v)
        plan = WindowPlan(levels=tuple(
            lp._replace(
                row_query=np.repeat(lp.row_query, B, axis=0),
                row_valid=np.repeat(lp.row_valid, B, axis=0),
                row_origin=np.repeat(lp.row_origin, B, axis=0),
                block_tile=np.repeat(lp.block_tile, B, axis=0),
                inv_perm=np.repeat(lp.inv_perm, B, axis=0))
            for lp in plan.levels), halo=plan.halo, impl=impl)
    out = jnp.zeros((V, Lq, H, D), dtype=jnp.float32)
    escaped = jnp.float32(0.0)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        lp = plan.levels[lvl]
        K = lp.K
        v_lvl = jax.lax.dynamic_slice_in_dim(
            value, start, h * w, axis=1).reshape(V, h, w, H, D)
        start += h * w
        tiles = None
        if impl != "pallas_dma":  # the DMA kernel reads the map directly
            tiles = jax.vmap(lambda m: _tile_windows(m, lp))(v_lvl)
            # (V, n_tiles, K*K, H, D)

        loc = sampling_locations[:, :, :, lvl]      # (V, Lq, H, P, 2)
        aw = attention_weights[:, :, :, lvl]        # (V, Lq, H, P)
        # px coords in PADDED space
        px = loc[..., 0] * w - 0.5 + lp.pad
        py = loc[..., 1] * h - 0.5 + lp.pad

        rq = jnp.asarray(lp.row_query)              # (V, nrows)
        rvalid = jnp.asarray(lp.row_valid)
        rorig = jnp.asarray(lp.row_origin)          # (V, nrows, 2)
        btile = jnp.asarray(lp.block_tile)
        iperm = jnp.asarray(lp.inv_perm)
        nrows = rq.shape[1]
        nblocks = nrows // lp.block_rows

        def take_rows(a, idx):  # a: (Lq, ...) idx: (nrows,)
            return jnp.take(a, idx, axis=0)

        def touch_mask(px_r, py_r):
            # escape telemetry counts only samples whose stencil overlaps
            # the REAL map: off-map samples read zero in the exact
            # sampler too (deform_sample's `touch`), so a window miss on
            # them is not a semantic deviation. px_r/py_r are in PADDED
            # pixel coords.
            return ((px_r > lp.pad - 1.0) & (px_r < w + lp.pad)
                    & (py_r > lp.pad - 1.0)
                    & (py_r < h + lp.pad)).astype(jnp.float32)

        if impl in ("pallas", "pallas_dma"):
            from mvgformer_tpu.ops.window_pallas import \
                window_block_matmul

            if impl == "pallas_dma":
                # Mosaic requires DMA slice offsets in the sublane
                # (second-minor) dim to be 8-aligned: align each
                # window's x-origin down and widen the window to Kx.
                # rx becomes relative to the ALIGNED origin; the extra
                # columns (left of the true origin and on the right)
                # read real neighboring-map data for interior tiles and
                # zero padding at the borders — either way coverage is
                # a strict superset of the K-window, so the result only
                # moves toward the exact sampler. Outputs/telemetry can
                # therefore differ slightly from impl='pallas' for the
                # same plan; _inside_mass uses (Kx, K) consistently.
                ox_np = ((np.asarray(lp.block_tile) % lp.grid_hw[1])
                         * lp.tile + 2)
                Kx = -(-(K + int((ox_np % 8).max())) // 8) * 8
                rorig_eff = jnp.stack(
                    [(rorig[..., 0] // 8) * 8, rorig[..., 1]], axis=-1)
            else:
                Kx = K
                rorig_eff = rorig

            def pack_view(px_v, py_v, aw_v, rq_v, rvalid_v, rorig_v):
                px_r = take_rows(px_v, rq_v)
                py_r = take_rows(py_v, rq_v)
                rx = px_r - rorig_v[:, None, None, 0].astype(jnp.float32)
                ry = py_r - rorig_v[:, None, None, 1].astype(jnp.float32)
                ra = take_rows(aw_v, rq_v) * rvalid_v[:, None, None]
                esc = jnp.sum(ra * touch_mask(px_r, py_r) * jnp.maximum(
                    0.0, 1.0 - _inside_mass(rx, ry, Kx, K)))
                rel = jnp.concatenate([ry, rx, ra], axis=-1)
                return rel.reshape(nrows, -1), esc

            rel, esc = jax.vmap(pack_view)(px, py, aw, rq, rvalid,
                                           rorig_eff)
            if impl == "pallas_dma":
                # window-DMA kernel: no tile materialization — the
                # kernel DMAs each block's (K, Kx) window straight from
                # the padded map (ops/window_dma.py)
                from mvgformer_tpu.ops.window_dma import window_block_dma

                nty, ntx = lp.grid_hw
                grow = (lp.pad, lp.pad + lp.tile)  # same as _tile_windows
                # extra right padding in x covers the widened window
                growx = (lp.pad, lp.pad + lp.tile + (Kx - K))
                padded = jnp.pad(v_lvl.reshape(V, h, w, H * D),
                                 ((0, 0), grow, growx, (0, 0)))
                oy = (btile // ntx) * lp.tile + 2
                # x origin passed as x0/8 (window_block_dma contract)
                ox8 = ((btile % ntx) * lp.tile + 2) // 8
                vix = jnp.broadcast_to(
                    jnp.arange(V, dtype=jnp.int32)[:, None], oy.shape)
                origins = jnp.stack(
                    [vix, oy.astype(jnp.int32), ox8.astype(jnp.int32)],
                    axis=-1).reshape(V * (nrows // lp.block_rows), 3)
                rows_out = window_block_dma(
                    padded.astype(value.dtype),
                    rel.reshape(V * nrows, -1), origins,
                    K=K, H=H, P=P, D=D, block_rows=lp.block_rows, Kx=Kx)
            else:
                n_tiles = tiles.shape[1]
                tiles_flat = tiles.reshape(V * n_tiles, K * K, H * D)
                bt_flat = (btile
                           + jnp.arange(V, dtype=btile.dtype)[:, None]
                           * n_tiles).reshape(-1)
                rows_out = window_block_matmul(
                    tiles_flat, rel.reshape(V * nrows, -1), bt_flat,
                    K=K, H=H, P=P, D=D, block_rows=lp.block_rows)
            rows_out = rows_out.reshape(V, nrows, H * D)
            lvl_out = jax.vmap(
                lambda r, ip: jnp.take(r, ip, axis=0))(rows_out, iperm)
            out = out + lvl_out.reshape(V, Lq, H, D).astype(jnp.float32)
            escaped = escaped + jnp.sum(esc)
            continue

        def per_view(px_v, py_v, aw_v, tiles_v, rq_v, rvalid_v, rorig_v,
                     btile_v, iperm_v):
            px_r = take_rows(px_v, rq_v)
            py_r = take_rows(py_v, rq_v)
            rx = px_r - rorig_v[:, None, None, 0].astype(jnp.float32)
            ry = py_r - rorig_v[:, None, None, 1].astype(jnp.float32)
            ra = take_rows(aw_v, rq_v) * rvalid_v[:, None, None]
            grid = jnp.arange(K, dtype=jnp.float32)
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(ry[..., None] - grid))
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(rx[..., None] - grid))
            # escape telemetry: fully-inside samples have
            # (sum wy)(sum wx) == 1 (zero-padding border reproduces the
            # exact sampler's own border semantics)
            inmass = jnp.sum(wy, -1) * jnp.sum(wx, -1)
            esc = jnp.sum(ra * touch_mask(px_r, py_r)
                          * jnp.maximum(0.0, 1.0 - inmass))
            rw = jnp.einsum('rhpy,rhpx->rhyx', wy * ra[..., None], wx)
            rw = rw.reshape(nrows, H, K * K).astype(row_dtype)
            ops = tiles_v[btile_v]                  # (nb, K*K, H, D)
            r = jnp.einsum(
                'bRhw,bwhd->bRhd',
                rw.reshape(nblocks, lp.block_rows, H, K * K), ops,
                preferred_element_type=jnp.float32)
            rows_out = r.reshape(nrows, H, D)
            return jnp.take(rows_out, iperm_v, axis=0), esc

        lvl_out, esc = jax.vmap(per_view)(
            px, py, aw, tiles, rq, rvalid, rorig, btile, iperm)
        out = out + lvl_out
        escaped = escaped + jnp.sum(esc)
    return out.reshape(V, Lq, H * D).astype(value.dtype), escaped
