"""Pallas corner-table build: one static-DMA kernel per feature level.

The 4-corner tables (ops/sampling.py build path; semantics anchor
/root/reference/lib/models/ops/src/cuda/deform_im2col_cuda.cuh:248-311 —
the 4 bilinear stencil corners packed per row) are rebuilt every decoder
layer from that layer's own value projection. The XLA build (pad + 3
shifted pads + concat per (view, head) pair = 120 small ops/layer)
costs ~6-7 ms/layer at production shapes where bandwidth arithmetic
says ~1-2 ms (PERF.md "gather wall"), and at the K=64+ptop4 headline it
DOMINATES the compacted layers (probe_ptop128_crash.py: the Lq=960
sampler costs 6.5 ms against a 1.4 ms gather floor). This kernel does
the whole build as one grid of static sublane/lane shifts per level —
no gathers, the Mosaic-compilable class — with a one-row-halo DMA per
output block.

Layout difference vs the XLA build: padded rows are lane-aligned to
wp_pad = round_up(w+2, 16) columns (bf16 tile constraint), so the
caller must index rows as y * wp_pad + x instead of y * (w+2) + x.
The extra columns hold zeros and are never indexed.

Forward-only Pallas; the backward (the build is linear: its transpose
is 4 shifted slice-adds of the cotangent) is plain XLA via custom_vjp,
so the training path can use the kernel too.

STATUS (2026-08-19 toolchain): interpret-mode correct
(tests/test_table_pallas.py) but real-TPU Mosaic REJECTS every lowering
tried — this one and four alternates (full-block concat stores, the
proven window_dma PrefetchScalarGridSpec recipe, bare DMA+copy
micro-forms: HTTP 500; the no-DMA block-pipeline form: compiler hang).
Suspected blocker: the 32-element sub-lane-width minormost dim of the
per-head value layout (tools/probes/probe_table_kernel_forms.py;
PERF.md round-5 section). MVG_TABLE_IMPL stays 'xla' in production
(1.8 ms/layer, not the wall); re-probe on toolchain updates.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def padded_width(w: int) -> int:
    """Lane-aligned padded row width for a level of width w."""
    return ((w + 2 + 15) // 16) * 16


def _block_rows(hp: int, cap: int = 16) -> int:
    """Largest divisor of hp that is <= cap (output y-rows per step)."""
    for by in range(min(cap, hp), 0, -1):
        if hp % by == 0:
            return by
    return 1


def _build_kernel(vp_hbm, out_ref, vbuf, sem, *, by, w, d):
    p = pl.program_id(0)
    t = pl.program_id(1)
    dma = pltpu.make_async_copy(
        vp_hbm.at[p, pl.ds(t * by, by + 1)], vbuf, sem)
    dma.start()
    dma.wait()
    cur = vbuf[0:by]          # vp[y]   = v[y-1] rows  (by, w, d)
    nxt = vbuf[1:by + 1]      # vp[y+1] = v[y]   rows
    out_ref[...] = jnp.zeros_like(out_ref)
    # row (y, x) = [v[y-1,x-1] | v[y-1,x] | v[y,x-1] | v[y,x]]
    out_ref[0, :, 1:w + 1, 0:d] = cur
    out_ref[0, :, 0:w, d:2 * d] = cur
    out_ref[0, :, 1:w + 1, 2 * d:3 * d] = nxt
    out_ref[0, :, 0:w, 3 * d:4 * d] = nxt


def _build_level_fwd(v: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(NH, h, w, D) -> (NH, (h+2)*wp_pad, 4D) padded corner table."""
    nh, _, _, d = v.shape
    hp = h + 2
    wpp = padded_width(w)
    by = _block_rows(hp)
    # one extra bottom row so the (by+1)-row halo DMA of the LAST block
    # stays in bounds; vp[y] = v[y-1] with zero top/bottom borders
    vp = jnp.pad(v, ((0, 0), (1, 2), (0, 0), (0, 0)))
    kernel = functools.partial(_build_kernel, by=by, w=w, d=d)
    out = pl.pallas_call(
        kernel,
        grid=(nh, hp // by),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, by, wpp, 4 * d),
                               lambda p, t: (p, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nh, hp, wpp, 4 * d), v.dtype),
        scratch_shapes=[pltpu.VMEM((by + 1, w, d), v.dtype),
                        pltpu.SemaphoreType.DMA(())],
        # interpret mode off-TPU so the CPU test suite exercises the
        # math (same convention as ops/window_pallas.py)
        interpret=jax.devices()[0].platform != "tpu",
    )(vp)
    return out.reshape(nh, hp * wpp, 4 * d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def build_corner_table_level(v: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Corner table for one level, Pallas build (see module docstring).

    v: (NH, h, w, D) one (view*head)-major level slice of the value
    projection. Returns (NH, (h+2)*wp_pad, 4D) with wp_pad =
    padded_width(w); rows are indexed y * wp_pad + x, 1-based padded
    coords (same convention as ops/sampling.build_corner_tables, whose
    stride is w+2 instead).
    """
    return _build_level_fwd(v, h, w)


def _vjp_fwd(v, h, w):
    return _build_level_fwd(v, h, w), v.shape


def _vjp_bwd(h, w, v_shape, ct):
    nh, _, _, d = v_shape
    hp = h + 2
    wpp = padded_width(w)
    ct = ct.reshape(nh, hp, wpp, 4 * d)
    # transpose of the 4 shifted placements (linear build)
    dv = (ct[:, 1:h + 1, 1:w + 1, 0:d]
          + ct[:, 1:h + 1, 0:w, d:2 * d]
          + ct[:, 0:h, 1:w + 1, 2 * d:3 * d]
          + ct[:, 0:h, 0:w, 3 * d:4 * d])
    return (dv.astype(ct.dtype),)


build_corner_table_level.defvjp(_vjp_fwd, _vjp_bwd)


def build_corner_tables_pallas(
        value_hd: jnp.ndarray,
        spatial_shapes: Sequence[Tuple[int, int]]):
    """All levels' padded corner tables from the (N, H, Len_in, D) value.

    Returns (tables, padded_strides): tables[lvl] is
    (N*H, (h+2)*wp_pad, 4D); padded_strides[lvl] = wp_pad for the
    caller's y * wp_pad + x row indexing.
    """
    n, hh, _, d = value_hd.shape
    tables = []
    strides = []
    start = 0
    for (h, w) in spatial_shapes:
        v = jax.lax.dynamic_slice_in_dim(
            value_hd, start, h * w, axis=2).reshape(n * hh, h, w, d)
        start += h * w
        tables.append(build_corner_table_level(v, h, w))
        strides.append(padded_width(w))
    return tables, strides
