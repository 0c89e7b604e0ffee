"""Sorted-window one-hot MXU gather for the dense deformable sampler
(VERDICT r4 item 1: the exact-semantics Pallas kernel).

The dense layer-1 corner gather (40.4 ms/frame, 7.37M rows, PERF.md
"where the time goes at the round-5 headline") runs ~1.8x off the
3.06 ns/row XLA gather-engine floor and is the single biggest perf
prize left on one chip. Mosaic cannot lower an arbitrary-row vector
gather (form f1, probe_mosaic_gather_forms.py), but it CAN lower a
one-hot matmul row-select on the MXU. This module composes that form
into an EXACT (unclamped, reference-semantics) replacement:

  1. sort each (view*head)'s sample rows (sample-sorted order: the
     trained model's blocks of BS=512 sorted samples span p95=712 rows
     at dense L1 lvl0 — probe_real_index_spans.py / PERF.md);
  2. per block, DMA the W-row table window [base, base+W) into VMEM
     and select rows with a (BS, W) one-hot @ (W, C) matmul
     (0.67 ns/row at W=512, 1.33 at W=1024 vs the 3.06 gather floor);
  3. stay exact on ALL inputs: samples escaping their block's window
     (~1.3% at W=1024 on real data) are repaired by a static-capacity
     correction gather (cumsum-compaction into E_CAP slots), and the
     whole op falls back to the plain XLA gather via lax.cond if the
     escape count ever exceeds capacity;
  4. corner-reduce in sorted order, then unsort only the (S, D)
     reduced output (4x narrower rows than the (S, 4D) table rows).

Semantics contract: deform_gather_reduce(tables, idx, w4) ==
  sum_c tables[pair, idx[pair, s], c*D:(c+1)*D] * w4[pair, s, c]
exactly as the production corner path computes it (reference CUDA
semantics anchor: /root/reference/lib/models/ops/src/cuda/
deform_im2col_cuda.cuh:248-311). The backward is supplied by a
custom_vjp that differentiates the mathematically-identical plain
gather+reduce, so training through this path is exact too.

Enabled via MVG_SAMPLER_IMPL=onehot (trace-time, like
MVG_GATHER_CAP_MB); ops/sampling.py routes only dense-layer-sized
groups here. MVG_ONEHOT_INTERPRET=1 runs the kernel in interpret mode
(CPU tests).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Block/window sizing (PERF.md "exact-path sorted-window gather"):
# BS=512 sorted samples per block, W=1024-row windows -> 1.3% escapes
# on trained-model dense-L1 indices, 1.33 ns/row one-hot core.
BS = 512
W = 1024
E_CAP = 4096  # escape-repair capacity per (view*head) pair


def _onehot_kernel(base_ref, local_ref, tbl_ref, out_ref, win, sem):
    """One grid step = one (pair, block): DMA the pair's W-row window
    into VMEM, one-hot select BS rows on the MXU.

    base_ref carries the window origin PRE-DIVIDED by 8: Mosaic requires
    DMA slice offsets in the sublane (second-minor) dim to be provably
    tile-aligned ("tile index ... divisible by the tiling (8)"); a
    dynamic origin fails the proof even when the values are aligned, so
    the caller divides and the kernel multiplies back (same recipe as
    ops/window_dma.py)."""
    pair = pl.program_id(0)
    blk = pl.program_id(1)
    dma = pltpu.make_async_copy(
        tbl_ref.at[pair, pl.ds(base_ref[pair, blk] * 8, W), :], win, sem)
    dma.start()
    dma.wait()
    local = local_ref[...].reshape(BS, 1)  # int32
    onehot = (local == jax.lax.broadcasted_iota(
        jnp.int32, (BS, W), 1)).astype(win.dtype)
    out_ref[...] = jnp.dot(
        onehot, win[...],
        preferred_element_type=jnp.float32).astype(out_ref.dtype)[None]


def _onehot_select(tables: jnp.ndarray, base: jnp.ndarray,
                   local: jnp.ndarray) -> jnp.ndarray:
    """(NH, nblk) grid pallas call: tables (NH, R, C) bf16 in HBM,
    base (NH, nblk) int32 window origins PRE-DIVIDED by 8 (true origin
    = 8*base, 8-aligned, <= R-W), local (NH, nblk*BS, 1) int32 in
    [0, W). Returns the selected rows (NH, nblk*BS, C)."""
    NH, R, C = tables.shape
    nblk = base.shape[1]
    S = nblk * BS
    interpret = os.environ.get("MVG_ONEHOT_INTERPRET", "") == "1"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # base
        grid=(NH, nblk),
        in_specs=[
            pl.BlockSpec((1, BS, 1), lambda p, b, base: (p, b, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),  # tables in HBM
        ],
        out_specs=pl.BlockSpec((1, BS, C), lambda p, b, base: (p, b, 0)),
        scratch_shapes=[pltpu.VMEM((W, C), tables.dtype),
                        pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        _onehot_kernel,
        out_shape=jax.ShapeDtypeStruct((NH, S, C), tables.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(base, local.reshape(NH, S, 1), tables)


def _reference_reduce(tables: jnp.ndarray, idx: jnp.ndarray,
                      w4: jnp.ndarray) -> jnp.ndarray:
    """The mathematically-identical plain-gather form (also the cond
    fallback and the custom_vjp backward's primal)."""
    rows = jnp.take_along_axis(tables, idx[..., None], axis=1)
    NH, S, C = rows.shape
    D = C // 4
    rows = rows.reshape(NH, S, 4, D)
    return jnp.sum(rows * w4[..., None].astype(rows.dtype), axis=2)


def _sorted_path(tables: jnp.ndarray, idx: jnp.ndarray,
                 w4: jnp.ndarray, sidx: jnp.ndarray, perm: jnp.ndarray,
                 base8: jnp.ndarray, local: jnp.ndarray,
                 esc: jnp.ndarray) -> jnp.ndarray:
    NH, R, C = tables.shape
    S = idx.shape[1]
    D = C // 4

    local_c = jnp.minimum(local, W - 1)
    rows_sorted = _onehot_select(tables, base8, local_c[..., None])

    # escape repair: compact escaped sorted-positions into E_CAP slots,
    # re-gather those rows exactly, scatter them back
    pos = jnp.cumsum(esc.astype(jnp.int32), axis=-1) - 1
    slot = jnp.where(esc, jnp.minimum(pos, E_CAP - 1), E_CAP)
    iota_s = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None],
                              (NH, S))

    def compact_one(sl, io):
        # positions of escaped samples in sorted order; S = "none"
        return jnp.full((E_CAP + 1,), S, jnp.int32).at[sl].set(
            io, mode="drop")[:E_CAP]

    esc_pos = jax.vmap(compact_one)(slot, iota_s)      # (NH, E_CAP)
    esc_rowid = jnp.take_along_axis(
        jnp.pad(sidx, ((0, 0), (0, 1))), esc_pos, axis=1)
    esc_rows = jnp.take_along_axis(
        tables, jnp.minimum(esc_rowid, R - 1)[..., None], axis=1)

    def scatter_one(rs, ep, er):
        return rs.at[ep].set(er, mode="drop")

    rows_sorted = jax.vmap(scatter_one)(
        jnp.pad(rows_sorted, ((0, 0), (0, 1), (0, 0))), esc_pos,
        esc_rows)[:, :S]

    # corner-reduce in sorted order (w4 permuted: 16-byte rows), then
    # unsort only the (S, D) reduced result
    w4s = jnp.take_along_axis(w4, perm[..., None], axis=1)
    red_sorted = jnp.sum(
        rows_sorted.reshape(NH, S, 4, D)
        * w4s[..., None].astype(rows_sorted.dtype), axis=2)
    invperm = jnp.zeros_like(perm).at[
        jnp.arange(NH)[:, None], perm].set(iota_s, unique_indices=True)
    return jnp.take_along_axis(red_sorted, invperm[..., None], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def deform_gather_reduce(tables: jnp.ndarray, idx: jnp.ndarray,
                         w4: jnp.ndarray) -> jnp.ndarray:
    """Exact corner gather + 4-corner weighted reduce.

    tables: (NH, R, 4D) corner tables; idx: (NH, S) int32 row ids;
    w4: (NH, S, 4) corner weights (attention weight folded in).
    Returns (NH, S, D) = sum_c tables[p, idx[p,s], cD:(c+1)D]*w4[p,s,c]
    for ALL inputs (escapes repaired; cond fallback above E_CAP)."""
    NH, R, C = tables.shape
    S = idx.shape[1]
    if S % BS != 0 or R < W:
        return _reference_reduce(tables, idx, w4)

    nblk = S // BS
    iota = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None],
                            (NH, S))
    sidx, perm = jax.lax.sort_key_val(idx, iota, dimension=-1)
    first = sidx.reshape(NH, nblk, BS)[:, :, 0]
    # window origins in units of 8 rows (the kernel multiplies back so
    # Mosaic can prove the DMA offset's sublane-tile alignment); the
    # clamp must stay in units of 8 too or the origin un-aligns
    base8 = jnp.minimum(first // 8, jnp.int32((R - W) // 8)).astype(
        jnp.int32)
    base = base8 * 8
    local = sidx - jnp.repeat(base, BS, axis=1)
    esc = local >= W
    n_esc = jnp.max(jnp.sum(esc, axis=-1))
    if os.environ.get("MVG_ONEHOT_DEBUG", "") == "1":
        jax.debug.print(
            "onehot_gather NH={nh} R={r} S={s}: max n_esc/pair = {n} "
            "(sorted path iff <= E_CAP={cap})",
            nh=NH, r=R, s=S, n=n_esc, cap=E_CAP)

    return jax.lax.cond(
        n_esc <= E_CAP,
        lambda: _sorted_path(tables, idx, w4, sidx, perm, base8, local,
                             esc),
        lambda: _reference_reduce(tables, idx, w4))


def _fwd(tables, idx, w4):
    return deform_gather_reduce(tables, idx, w4), (tables, idx, w4)


def _bwd(res, ct):
    tables, idx, w4 = res
    _, vjp = jax.vjp(lambda t, w: _reference_reduce(t, idx, w),
                     tables, w4)
    gt, gw = vjp(ct)
    return gt, None, gw


deform_gather_reduce.defvjp(_fwd, _bwd)
