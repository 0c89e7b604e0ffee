"""Probe: windowed layer-1 deformable sampling (PERF roadmap items 1+2).

Design being costed: layer-1 sampling CENTERS are rig-static (projected
sample_space grid), so the host assigns each (query, view, level) to a
static tile; the learned offsets are frame-dynamic, so the K^2-wide
bilinear weight row per (q, h) is built ON DEVICE from separable relu
terms, then applied to the tile window with one blocked einsum per
(view, level). Escaped samples (|offset| > halo) read zero.

Device pipeline per (view, level), rows = Lq queries in tile-sorted order:
  1. build weight rows: wy/wx relu terms (rows,H,P,K) -> P-contraction
     einsum -> (rows, H, K^2) bf16
  2. expand block operands: tiles[block_tile] -> (nblocks, K^2, H, D)
  3. blocked einsum 'bRhw,bwhd->bRhd'
  4. un-permute rows back to query order (one gather of H*D-wide rows)

Flagship dense layer-1: V=5, H=8, Lq=15360, P=8, D=32, levels
(128,240),(64,120),(32,60); tile=8, halo=10 -> K=28, width 784.

Run on the real TPU:  python tools/probes/probe_static_rows.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 10
H, P, D = 8, 8, 32


def bench(fn, *args):
    @jax.jit
    def chained(*a):
        def body(eps, _):
            pert = (a[0] + eps,) + tuple(a[1:])
            out = fn(*pert)
            return jnp.sum(out).astype(jnp.float32) * 0.0, None

        eps, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return eps

    float(chained(*args))
    t0 = time.perf_counter()
    float(chained(*args))
    return (time.perf_counter() - t0) / ITERS * 1000.0


def run_level(name, Lq, n_tiles, K, block_rows=128, n_views=5,
              f32_rows=False):
    """One level across all views, rows = n_views * Lq."""
    rows = n_views * Lq
    nblocks = rows // block_rows
    W2 = K * K
    key = jax.random.PRNGKey(0)
    # per-frame inputs
    tiles = jax.random.normal(key, (n_views * n_tiles, W2, H, D),
                              jnp.bfloat16)
    loc = jax.random.uniform(key, (rows, H, P, 2), jnp.float32) * K
    aw = jax.random.uniform(key, (rows, H, P), jnp.float32)
    block_tile = jnp.asarray(
        np.random.randint(0, n_views * n_tiles, (nblocks,)))
    inv_perm = jnp.asarray(np.random.permutation(rows))
    grid = jnp.arange(K, dtype=jnp.float32)

    def build_rows(loc, aw):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(
            loc[..., 1:2] - grid))                      # (rows,H,P,K)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(
            loc[..., 0:1] - grid))
        wya = wy * aw[..., None]
        rw = jnp.einsum('rhpy,rhpx->rhyx', wya, wx)     # (rows,H,K,K)
        return rw.reshape(rows, H, W2).astype(
            jnp.float32 if f32_rows else jnp.bfloat16)

    def f(tiles, loc, aw):
        rw = build_rows(loc, aw)
        Wb = rw.reshape(nblocks, block_rows, H, W2)
        ops = tiles[block_tile]                          # (nb, W2, H, D)
        r = jnp.einsum('bRhw,bwhd->bRhd', Wb, ops,
                       preferred_element_type=jnp.float32)
        out = r.reshape(rows, H * D)[inv_perm]
        return out

    ms = bench(f, tiles, loc, aw)
    ms_rows = bench(lambda t, l, a: build_rows(l, a), tiles, loc, aw)
    gb = (rows * H * W2 * (4 if f32_rows else 2)
          + nblocks * W2 * H * D * 2 + rows * H * D * 4) / 1e9
    print(f"{name}: full={ms:.2f} ms  rowbuild={ms_rows:.2f} ms  "
          f"~{gb:.2f} GB/iter", flush=True)
    return ms


def run_gather_baseline(Lq, hw, n_views=5):
    """Current production formulation at one level: corner-table gather."""
    rows = n_views * H * Lq * P
    key = jax.random.PRNGKey(0)
    tables = [jax.random.normal(key, (hw, 4 * D), jnp.bfloat16)
              for _ in range(n_views * H)]
    idx = [jnp.asarray(np.random.randint(0, hw, (Lq * P,)))
           for _ in range(n_views * H)]
    wts = jax.random.uniform(key, (n_views * H, Lq * P, 4), jnp.float32)

    def f(t0, *rest):
        tabs = (t0,) + tuple(rest)
        outs = []
        for i, t in enumerate(tabs):
            t = jax.lax.optimization_barrier(t)
            g = t[idx[i]].reshape(Lq * P, 4, D)
            s = jnp.sum(g * wts[i][..., None].astype(g.dtype), axis=1)
            outs.append(s.reshape(Lq, P, D).sum(axis=1))
        return jnp.stack(outs)

    ms = bench(f, *tables)
    print(f"gather-baseline hw={hw}: {ms:.2f} ms ({rows} rows, "
          f"{ms * 1e6 / rows:.1f} ns/row)", flush=True)
    return ms


def main():
    print("devices:", jax.devices(), flush=True)
    Lq = 15360
    # tile=8, halo=10 -> K=28; level tile counts (ceil(h/8)*ceil(w/8))
    run_level("L0 (128x240) K=28", Lq, 480, 28)
    run_level("L1 (64x120)  K=28", Lq, 120, 28)
    run_level("L2 (32x60)   K=28", Lq, 32, 28)
    run_level("L0 K=28 f32-rows", Lq, 480, 28, f32_rows=True)
    run_level("L0 K=20 (halo 6)", Lq, 480, 20)
    # gather baseline for the same three levels
    run_gather_baseline(Lq, (128 + 2) * (240 + 2))
    run_gather_baseline(Lq, (64 + 2) * (120 + 2))
    run_gather_baseline(Lq, (32 + 2) * (60 + 2))


if __name__ == "__main__":
    main()
