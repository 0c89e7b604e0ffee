"""Pallas window-DMA kernel for windowed layer-1 sampling.

Round-3's clamped-window measurement (PERF.md "clamped-offset windows")
found that the (K/28)^2 VPU-scaling win was eaten by everything AROUND
the kernel — chiefly the XLA block-operand expansion that materializes
an (n_tiles, K*K, H*D) window buffer in HBM (a big-slice gather at
~30 GB/s) before ops/window_pallas.py can consume it. This kernel is the
parked follow-up: each grid block's (K, K) window is DMA'd DIRECTLY from
the padded per-view feature map into VMEM scratch using the
scalar-prefetched window origins (pltpu.make_async_copy with dynamic
pl.ds offsets — a plain strided DMA, not the arbitrary-row vector gather
that still fails on this Mosaic toolchain, probe_mosaic_gather_forms f1).
The HBM re-read of overlapping windows is bandwidth-trivial
(~0.5 GB/level at K=20).

Everything else matches window_pallas._kernel: per head, build the
K^2-wide bilinear weight rows in VMEM with a P-iteration VPU loop and
accumulate the head's output with one (R, K^2) @ (K^2, D) MXU matmul.

Semantics: identical to window_block_matmul over tiles built by
window_sampling._tile_windows (exactness-tested against it in
tests/test_window_sampling.py); the windowed op's semantics contract vs
the exact sampler is documented in ops/window_sampling.py. Reference
semantics anchor: /root/reference/lib/models/ops/src/cuda/
deform_im2col_cuda.cuh:248-311.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(origins_ref, rel_ref, pmap_ref, out_ref, win_ref, sem,
            *, K, Kx, H, P, D, block_rows):
    """origins_ref: (nblocks, 3) int32 scalar-prefetch (v, y0, x0) per
    block, origins in PADDED map pixel coords. x0 must be a multiple of
    8: Mosaic requires DMA slice offsets in the sublane (second-minor)
    dim to be tile-aligned ("tile index ... divisible by the tiling"),
    so the caller aligns origins down and widens the window to Kx >=
    K + max_shift (rows' rx are relative to the ALIGNED origin).
    rel_ref:  (R, H*3P) f32 packed [ry(P) | rx(P) | aw(P)] per head
              (this block's rows, blocked by the BlockSpec).
    pmap_ref: (V, hp, wp, H*D) bf16 padded feature map, stays in ANY/HBM.
    out_ref:  (R, H*D) bf16.
    win_ref:  (K, Kx, H*D) VMEM scratch; sem: DMA semaphore."""
    b = pl.program_id(0)
    v = origins_ref[b, 0]
    y0 = origins_ref[b, 1]
    # origins carry x0/8; multiplying here lets Mosaic PROVE the sublane
    # offset is 8-divisible (a dynamic x0 fails its divisibility check
    # even when the values are in fact aligned)
    x0 = origins_ref[b, 2] * 8
    copy = pltpu.make_async_copy(
        pmap_ref.at[v, pl.ds(y0, K), pl.ds(x0, Kx), :], win_ref, sem)
    copy.start()

    # build every head's weight rows WHILE the window DMA is in flight —
    # the bilinear rows depend only on rel, not on the window
    K2 = K * Kx
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, K2), 1)
    gy = (iota // Kx).astype(jnp.float32)
    gx = (iota % Kx).astype(jnp.float32)
    rel = rel_ref[:]  # (R, H*3P)
    rws = []
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
        rws.append(rw)

    copy.wait()
    win = win_ref[:].reshape(K2, H * D)
    for h in range(H):
        acc = jnp.dot(rws[h].astype(win.dtype),
                      win[:, h * D:(h + 1) * D],
                      preferred_element_type=jnp.float32)
        out_ref[:, h * D:(h + 1) * D] = acc.astype(out_ref.dtype)


def window_block_dma(padded_map: jnp.ndarray, rel: jnp.ndarray,
                     origins: jnp.ndarray, K: int, H: int, P: int,
                     D: int, block_rows: int, Kx: int = None
                     ) -> jnp.ndarray:
    """padded_map: (V, hp, wp, H*D) bf16 (zero-padded level map);
    rel: (nrows, H*3P) f32 tile-sorted rows (views flattened), rx
    relative to the 8-ALIGNED window origin;
    origins: (nblocks, 3) int32 (view, y0, x0/8) per row-block in padded
    pixel coords — x is passed PRE-DIVIDED by 8 (Mosaic sublane-tiling
    constraint on DMA slice offsets; the kernel multiplies back so the
    alignment is provable). Kx: window width (multiple of 8, >= K).
    Returns (nrows, H*D) bf16 rows in the same order."""
    if Kx is None:
        Kx = -(-K // 8) * 8
    assert Kx % 8 == 0 and Kx >= K, (K, Kx)
    nrows = rel.shape[0]
    nblocks = nrows // block_rows
    assert nblocks * block_rows == nrows, (nrows, block_rows)
    assert origins.shape == (nblocks, 3), (origins.shape, nblocks)
    kern = functools.partial(_kernel, K=K, Kx=Kx, H=H, P=P, D=D,
                             block_rows=block_rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((block_rows, rel.shape[1]),
                         lambda b, og: (b, 0)),
            # the padded map stays off-chip; the kernel DMAs windows
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec((block_rows, H * D),
                               lambda b, og: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((K, Kx, H * D), padded_map.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        # interpret mode off-TPU so the CPU test suite exercises the math
        interpret=jax.devices()[0].platform != "tpu",
        out_shape=jax.ShapeDtypeStruct((nrows, H * D), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * nrows * H * (P * K * Kx * 3 + K * Kx * D),
            bytes_accessed=(nrows * rel.shape[1] * 4
                            + nblocks * K * Kx * H * D * 2
                            + nrows * H * D * 2),
            transcendentals=0),
    )(origins, rel, padded_map)
