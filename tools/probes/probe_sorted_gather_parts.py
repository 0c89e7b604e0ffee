"""Viability probe for the exact-semantics sorted-window Pallas gather
(VERDICT r4 item 1 / round-3 item 3's actual target).

The kernel composition under consideration (PERF.md "gate arithmetic"):
per (view, head), SORT the sample row indices (locality -> small sorted
windows), DMA each block's table window into VMEM, select rows with a
one-hot matmul on the MXU (the only Mosaic-compilable arbitrary-row
form at useful width), and keep exactness with a whole-frame XLA-gather
fallback via lax.cond if any sample escapes its block's window.

Before integrating, measure the three cost pillars at flagship shapes
(N*H=40 pairs, S=184320 samples/pair at dense ptop4, R~41620 rows):

  1. lax.sort_key_val on (40, S) int32  — the prologue cost
  2. block-span statistics of SORTED production-like indices — what
     window size W covers blocks of BS sorted samples
  3. Pallas one-hot-window row-select (BS, W) @ (W, 128) — the core's
     ns/row vs the 3.06 ns/row XLA gather floor
  4. the same one-hot select in pure XLA (no Pallas) — maybe the MXU
     path needs no kernel at all

Run: PYTHONPATH=/root/repo:/root/.axon_site python \
    tools/probes/probe_sorted_gather_parts.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 20
NH = 40          # view*head pairs
LQ = 15360       # dense layer-1 queries
P = 4            # post-ptop points
S = 3 * LQ * P   # samples per pair (all levels)
R = 41620        # concatenated corner-table rows


def chained(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(eps, _):
            out = fn(a[0] + eps.astype(a[0].dtype), *a[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.sum(leaf).astype(jnp.float32) * 0.0, None

        eps, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return eps

    float(run(*args))
    t = time.perf_counter()
    float(run(*args))
    dt = (time.perf_counter() - t) / ITERS * 1e3
    print(f"{name:56s} {dt:8.2f} ms", flush=True)
    return dt


def production_like_indices(rng):
    """Synthetic indices with production locality: queries uniform over
    the image, P points within a +-8 px learned-offset radius, row =
    y * wp + x on the (130, 242) level-0 padded grid (the dominant
    level). Shape (NH, S)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    qy = jax.random.uniform(k1, (NH, S // P, 1), minval=0, maxval=128)
    qx = jax.random.uniform(k2, (NH, S // P, 1), minval=0, maxval=240)
    off = jax.random.normal(k3, (NH, S // P, P, 2)) * 4.0
    y = jnp.clip(qy[..., None, 0] + off[..., 0], 0, 129).astype(jnp.int32)
    x = jnp.clip(qx[..., None, 0] + off[..., 1], 0, 241).astype(jnp.int32)
    return (y * 242 + x).reshape(NH, S)


def main():
    rng = jax.random.PRNGKey(0)
    idx = production_like_indices(rng)
    slots = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None],
                             (NH, S))

    # 1) sort prologue
    chained("lax.sort_key_val (40, 184320) int32+int32",
            lambda i, s: jax.lax.sort_key_val(i, s, dimension=-1),
            idx, slots)
    chained("argsort only (40, 184320)",
            lambda i: jnp.argsort(i, axis=-1), idx)

    # 2) block-span statistics (host-side, informational)
    si = np.sort(np.asarray(idx), axis=-1)
    for bs in (512, 1024, 2048):
        spans = si.reshape(NH, -1, bs)
        span = spans[:, :, -1] - spans[:, :, 0]
        print(f"  sorted block span BS={bs}: p50={np.percentile(span, 50):.0f} "
              f"p95={np.percentile(span, 95):.0f} max={span.max():.0f}",
              flush=True)

    # 3) Pallas one-hot-window select core at (BS, W)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    table = jax.random.normal(rng, (R, 128), jnp.bfloat16)
    BS, W = 1024, 512
    nblk = S // BS

    sorted_idx = jnp.sort(idx[0])
    base = (sorted_idx.reshape(nblk, BS)[:, 0] // 8) * 8
    base = jnp.minimum(base, R - W).astype(jnp.int32)
    local = (sorted_idx.reshape(nblk, BS)
             - base[:, None]).astype(jnp.int32)
    local = jnp.clip(local, 0, W - 1)  # escapes clamped (probe only)

    def kernel(base_ref, local_ref, tbl_hbm, out_ref, tbl_vmem, sem):
        b = pl.program_id(0)
        dma = pltpu.make_async_copy(
            tbl_hbm.at[pl.ds(base_ref[b], W), :], tbl_vmem, sem)
        dma.start()
        dma.wait()
        onehot = (local_ref[:].reshape(BS, 1)
                  == jax.lax.broadcasted_iota(jnp.int32, (BS, W), 1))
        out_ref[:] = jnp.dot(onehot.astype(jnp.bfloat16), tbl_vmem[:],
                             preferred_element_type=jnp.bfloat16)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((BS,), lambda b, base: (b,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((BS, 128), lambda b, base: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((W, 128), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA(())],
    )

    def onehot_window_gather(table, base, local):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.bfloat16),
            grid_spec=grid_spec,
        )(base, local.reshape(nblk * BS), table)

    try:
        dt = chained(f"pallas one-hot window BS={BS} W={W} (1 pair)",
                     onehot_window_gather, table, base, local)
        print(f"  -> {dt * 1e6 / S:.2f} ns/row (x40 pairs = "
              f"{dt * 40:.1f} ms/layer-equiv)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"pallas one-hot FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:200]}", flush=True)
        time.sleep(60)

    # 4) same select in pure XLA (einsum over windows)
    def xla_onehot(table, base, local):
        wins = table[base[:, None] + jnp.arange(W)[None, :]]  # (nblk,W,128)
        onehot = (local.reshape(nblk, BS, 1)
                  == jnp.arange(W, dtype=jnp.int32)[None, None, :])
        return jnp.einsum("bsw,bwc->bsc", onehot.astype(jnp.bfloat16),
                          wins)

    dt = chained(f"XLA one-hot window BS={BS} W={W} (1 pair)",
                 xla_onehot, table, base, local)
    print(f"  -> {dt * 1e6 / S:.2f} ns/row", flush=True)

    # baseline: plain XLA gather, same indices, same operand
    dt = chained("XLA gather baseline (1 pair, S rows)",
                 lambda t, i: t[i], table, sorted_idx)
    print(f"  -> {dt * 1e6 / S:.2f} ns/row", flush=True)
    dt = chained("XLA gather baseline UNSORTED idx",
                 lambda t, i: t[i], table, idx[0])
    print(f"  -> {dt * 1e6 / S:.2f} ns/row", flush=True)


if __name__ == "__main__":
    main()
