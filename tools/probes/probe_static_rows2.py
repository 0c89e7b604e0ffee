"""Probe 2: decompose the windowed-sampling pipeline stage by stage.

probe_static_rows measured the fused pipeline at ~34 ms/level (38 GB/s
effective) — far from line rate. This isolates: block-operand expansion,
the blocked einsum on pre-materialized inputs, einsum layout variants,
and the row-permute, each with every input perturbed (non-hoistable).

python tools/probes/probe_static_rows2.py  (real TPU)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 10
H, P, D = 8, 8, 32


def bench(fn, *args, pert=(0,)):
    @jax.jit
    def chained(*a):
        def body(eps, _):
            pa = tuple(x + eps.astype(x.dtype) if i in pert else x
                       for i, x in enumerate(a))
            out = fn(*pa)
            return jnp.sum(out).astype(jnp.float32) * 0.0, None

        eps, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return eps

    float(chained(*args))
    t0 = time.perf_counter()
    float(chained(*args))
    return (time.perf_counter() - t0) / ITERS * 1000.0


def main():
    print("devices:", jax.devices(), flush=True)
    Lq, V = 15360, 5
    rows = V * Lq
    K = 28
    W2 = K * K
    R = 128
    nblocks = rows // R
    n_tiles = V * 480
    key = jax.random.PRNGKey(0)

    tiles = jax.random.normal(key, (n_tiles, W2, H, D), jnp.bfloat16)
    rw = jax.random.normal(key, (nblocks, R, H, W2), jnp.bfloat16)
    ops = jax.random.normal(key, (nblocks, W2, H, D), jnp.bfloat16)
    block_tile = jnp.asarray(np.random.randint(0, n_tiles, (nblocks,)))
    inv_perm = jnp.asarray(np.random.permutation(rows))

    ms = bench(lambda t: t[block_tile], tiles)
    print(f"expansion-only (600x401KB gather): {ms:.2f} ms "
          f"({nblocks * W2 * H * D * 2 / 1e9:.2f} GB)", flush=True)

    def es(rw, ops):
        return jnp.einsum('bRhw,bwhd->bRhd', rw, ops,
                          preferred_element_type=jnp.float32)

    ms = bench(es, rw, ops, pert=(0, 1))
    print(f"einsum-only bRhw,bwhd: {ms:.2f} ms", flush=True)

    def es2(rw2, ops2):
        return jnp.einsum('bhRw,bhwd->bhRd', rw2, ops2,
                          preferred_element_type=jnp.float32)

    rw2 = jnp.swapaxes(rw, 1, 2)
    ops2 = jnp.swapaxes(ops, 1, 2)
    ms = bench(es2, rw2, ops2, pert=(0, 1))
    print(f"einsum-only bhRw,bhwd (h-major): {ms:.2f} ms", flush=True)

    # head-merged: one (R, W2*?) ... actual alternative: fold h into rows
    rw3 = rw2.reshape(nblocks * H, R, W2)
    ops3 = ops2.reshape(nblocks * H, W2, D)
    ms = bench(lambda a, b: jnp.einsum(
        'bRw,bwd->bRd', a, b, preferred_element_type=jnp.float32),
        rw3, ops3, pert=(0, 1))
    print(f"einsum-only folded batch (4800,128,784)@(4800,784,32): "
          f"{ms:.2f} ms", flush=True)

    out = jax.random.normal(key, (rows, H, D), jnp.float32)
    ms = bench(lambda o: jnp.take(o, inv_perm, axis=0), out)
    print(f"permute-only ({rows} x 1KB rows): {ms:.2f} ms", flush=True)

    def full_nogather(rw, ops):
        r = es(rw, ops)
        return r.reshape(rows, H, D)[inv_perm]

    ms = bench(full_nogather, rw, ops, pert=(0, 1))
    print(f"einsum+permute (no expansion): {ms:.2f} ms", flush=True)

    def full(rw, tiles):
        r = es(rw, tiles[block_tile])
        return r.reshape(rows, H, D)[inv_perm]

    ms = bench(full, rw, tiles, pert=(0, 1))
    print(f"expansion+einsum+permute: {ms:.2f} ms", flush=True)

    # honest gather baseline: EVERY table perturbed, per-(v,h) tables
    hw = 31460
    tabs = jax.random.normal(key, (V * H, hw, 4 * D), jnp.bfloat16)
    idx = jnp.asarray(np.random.randint(0, hw, (V * H, Lq * P)))
    wts = jax.random.uniform(key, (V * H, Lq * P, 4), jnp.float32)

    def gat(tabs):
        outs = []
        for i in range(V * H):
            t = jax.lax.optimization_barrier(tabs[i])
            g = t[idx[i]].reshape(Lq * P, 4, D)
            s = jnp.sum(g * wts[i][..., None].astype(g.dtype), axis=1)
            outs.append(s.reshape(Lq, P, D).sum(axis=1))
        return jnp.stack(outs)

    ms = bench(gat, tabs)
    nrow = V * H * Lq * P
    print(f"gather-baseline all-perturbed hw={hw}: {ms:.2f} ms "
          f"({nrow} rows, {ms * 1e6 / nrow:.2f} ns/row)", flush=True)


if __name__ == "__main__":
    main()
