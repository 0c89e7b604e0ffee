"""Pallas kernel for windowed layer-1 sampling (one level, views folded).

The XLA formulation of the windowed sampler (ops/window_sampling.py)
loses ~3x to materialization and dispatch overheads measured on v5e
(tools/probes/probe_static_rows2.py): the block-operand expansion is a
big-slice gather capped at ~30 GB/s, the (rows, H, K^2) weight-row
buffer makes an HBM round trip, and the blocked einsum pays ~1 us per
tiny batched matmul. This kernel fuses all three stages per row-block:

  grid = (nblocks,), one block = `block_rows` tile-sorted rows
  * the block's tile window arrives in VMEM via a scalar-prefetch
    BlockSpec index_map (block_tile[b]) — a plain blocked DMA, NOT the
    in-kernel dynamic vector gather that crashes this Mosaic toolchain;
  * per head: the K^2-wide bilinear weight rows are built in VMEM with a
    P-iteration VPU loop (separable relu terms; never touch HBM), then
    one (R, K^2) @ (K^2, D) MXU matmul accumulates the head's output.

Semantics identical to window_sample's per-level inner loop with
bfloat16 weight rows. The permute back to query order and the level sum
stay outside in XLA.
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(block_tile_ref, rel_ref, tile_ref, out_ref, *, K, H, P, D,
            block_rows):
    """rel_ref: (R, H*3P) f32 packed [ry(P) | rx(P) | aw(P)] per head.
    tile_ref: (1, K*K, H*D) bf16 — this block's window.
    out_ref:  (R, H*D) bf16."""
    K2 = K * K
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, K2), 1)
    gy = (iota // K).astype(jnp.float32)
    gx = (iota % K).astype(jnp.float32)
    rel = rel_ref[:]  # (R, H*3P)

    for h in range(H):
        base = h * 3 * P
        rw = jnp.zeros((block_rows, K2), jnp.float32)
        for p in range(P):
            ry = rel[:, base + p][:, None]            # (R, 1)
            rx = rel[:, base + P + p][:, None]
            aw = rel[:, base + 2 * P + p][:, None]
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(ry - gy))
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(rx - gx))
            rw = rw + aw * (wy * wx)
        t_h = tile_ref[0, :, h * D:(h + 1) * D]       # (K2, D) bf16
        acc = jnp.dot(rw.astype(jnp.bfloat16), t_h,
                      preferred_element_type=jnp.float32)
        out_ref[:, h * D:(h + 1) * D] = acc.astype(out_ref.dtype)


def window_block_matmul(tiles: jnp.ndarray, rel: jnp.ndarray,
                        block_tile: jnp.ndarray, K: int, H: int, P: int,
                        D: int, block_rows: int) -> jnp.ndarray:
    """tiles: (n_tiles, K*K, H*D) bf16; rel: (nrows, H*3P) f32;
    block_tile: (nblocks,) int32. Returns (nrows, H*D) bf16 row outputs
    in the same (tile-sorted) row order."""
    nrows = rel.shape[0]
    nblocks = nrows // block_rows
    assert nblocks * block_rows == nrows, (nrows, block_rows)
    K2 = K * K
    kern = functools.partial(_kernel, K=K, H=H, P=P, D=D,
                             block_rows=block_rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((block_rows, rel.shape[1]),
                         lambda b, bt: (b, 0)),
            pl.BlockSpec((1, K2, H * D),
                         lambda b, bt: (bt[b], 0, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, H * D),
                               lambda b, bt: (b, 0)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        # interpret mode off-TPU so the CPU test suite exercises the
        # kernel's math
        interpret=jax.devices()[0].platform != "tpu",
        out_shape=jax.ShapeDtypeStruct((nrows, H * D), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * nrows * H * (P * K2 * 3 + K2 * D),
            bytes_accessed=(nrows * rel.shape[1] * 4
                            + nblocks * K2 * H * D * 2
                            + nrows * H * D * 2),
            transcendentals=0),
    )(block_tile, rel, tiles)
