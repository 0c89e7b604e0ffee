"""Pallas TPU kernel for deformable sampling (corner-table formulation).

Status (round 1, measured on v5e — see PERF.md): XLA's gather executes the
corner-table formulation at ~20 ns/slice, while Mosaic scalar loops run at
~10-30x that per sample, so `deform_sample_corner` (ops/sampling.py) remains
the production path. This kernel is the working Pallas implementation of the
same contract — one (1, 4D) corner-row load per sample, bilinear weighting
and attention-weighted accumulation fused in VMEM — kept correct and tested
(interpret mode in CI, optional on-device test) as the base for the round-2
DMA-pipelined variant.

Grid: one program per (n, h, level); the padded corner table for that
(n, h, level) resides in VMEM (level 0: (130*242, 128) bf16 ≈ 7.9 MB), the
flat sample indices and bilinear/attention weights stream in, and the
kernel accumulates per-query outputs.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvgformer_tpu.ops.sampling import build_corner_tables


def _kernel(idx_ref, w_ref, tbl_ref, out_ref, *, num_queries: int,
            points: int, d: int):
    """idx (Lq*P,) SMEM; w (Lq*P, 8) VMEM [w00 w01 w10 w11 aw 0 0 0];
    tbl (rows, 4D) VMEM; out (Lq, D) VMEM."""

    def query_body(q, _):
        acc = jnp.zeros((1, d), dtype=jnp.float32)
        for p in range(points):  # static unroll over sampling points
            i = q * points + p
            row = tbl_ref[pl.ds(idx_ref[i], 1), :].astype(jnp.float32)
            w = w_ref[pl.ds(i, 1), :]
            acc = acc + (row[:, 0:d] * w[0, 0]
                         + row[:, d:2 * d] * w[0, 1]
                         + row[:, 2 * d:3 * d] * w[0, 2]
                         + row[:, 3 * d:4 * d] * w[0, 3]) * w[0, 4]
        out_ref[pl.ds(q, 1), :] = acc
        return 0

    jax.lax.fori_loop(0, num_queries, query_body, 0)


def deform_sample_pallas(value: jnp.ndarray,
                         spatial_shapes: Sequence[Tuple[int, int]],
                         sampling_locations: jnp.ndarray,
                         attention_weights: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """Same contract as ops.sampling.deform_sample.

    value: (N, Len_in, H, D); locations (N, Lq, H, L, P, 2) in [0,1];
    weights (N, Lq, H, L, P) -> (N, Lq, H*D).
    """
    N, Len_in, H, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    tables = build_corner_tables(value, spatial_shapes)

    out = jnp.zeros((N, H, Lq, D), dtype=jnp.float32)
    for lvl, (h, w) in enumerate(spatial_shapes):
        hp, wp = h + 2, w + 2
        loc = sampling_locations[:, :, :, lvl]  # (N, Lq, H, P, 2)
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(N * H, Lq * P)
        y = jnp.transpose(y, (0, 2, 1, 3)).reshape(N * H, Lq * P)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        lx = x - x0
        ly = y - y0
        touch = ((x > -1.0) & (x < w) & (y > -1.0) & (y < h)).astype(
            jnp.float32)
        xi = jnp.clip(x0.astype(jnp.int32) + 1, 0, wp - 2)
        yi = jnp.clip(y0.astype(jnp.int32) + 1, 0, hp - 2)
        idx = yi * wp + xi  # (N*H, Lq*P)
        aw = jnp.transpose(attention_weights[:, :, :, lvl],
                           (0, 2, 1, 3)).reshape(N * H, Lq * P)
        wmat = jnp.stack([
            (1 - lx) * (1 - ly) * touch, lx * (1 - ly) * touch,
            (1 - lx) * ly * touch, lx * ly * touch,
            aw.astype(jnp.float32),
            jnp.zeros_like(lx), jnp.zeros_like(lx), jnp.zeros_like(lx),
        ], axis=-1)  # (N*H, Lq*P, 8)

        tbl = tables[lvl].reshape(N * H, hp * wp, 4 * D).astype(jnp.float32)

        kern = functools.partial(_kernel, num_queries=Lq, points=P, d=D)
        call = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((Lq, D), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )
        # static loop over (n, h) programs — vmap over pallas_call would
        # impose tile-alignment on the SMEM index block
        lvl_out = jnp.stack([call(idx[g], wmat[g], tbl[g])
                             for g in range(N * H)])  # (N*H, Lq, D)
        out = out + lvl_out.reshape(N, H, Lq, D)

    return jnp.transpose(out, (0, 2, 1, 3)).reshape(
        N, Lq, H * D).astype(value.dtype)
