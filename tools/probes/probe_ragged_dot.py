"""Probe: lax.ragged_dot for windowed sampling's per-tile matmuls.

Each (query, head, level) weight row multiplies its tile's window — a
grouped matmul with ragged group sizes, which is exactly lax.ragged_dot
(the MoE primitive): lhs (m, k) rows sorted by group, rhs (g, k, n)
per-group operands, group_sizes (g,). No block padding, no operand
expansion gather.

Shapes per (level) across 5 views, dense layer 1: m = 5*15360*8 rows
h-major-per-view (H folded into groups), k = 784 (K=28 window), n = 32,
g = 5*480*8 tile-head pairs.

python tools/probes/probe_ragged_dot.py  (real TPU)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 10


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


def run(name, m, k, n, g, dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(0)
    lhs = jax.random.normal(key, (m, k), dtype)
    rhs = jax.random.normal(key, (g, k, n), dtype)
    # roughly uniform group sizes with jitter, summing to m
    sizes = np.random.multinomial(m, np.ones(g) / g)
    group_sizes = jnp.asarray(sizes, jnp.int32)

    def f(lhs, rhs):
        return jax.lax.ragged_dot(
            lhs, rhs, group_sizes,
            preferred_element_type=jnp.float32)

    ms = bench(f, lhs, rhs, pert=(0, 1))
    gflop = 2 * m * k * n / 1e9
    gb = (m * k * 2 + g * k * n * 2 + m * n * 4) / 1e9
    print(f"{name}: {ms:.2f} ms  ({gflop:.1f} GFLOP -> "
          f"{gflop / ms:.0f} GF/ms, {gb:.2f} GB)", flush=True)
    return ms


def main():
    print("devices:", jax.devices(), flush=True)
    V, Lq, H = 5, 15360, 8
    # one level, H folded into groups
    run("L0 K=28 (m=614k, g=19200)", V * Lq * H, 784, 32, V * 480 * H)
    run("L0 K=28 few groups (g=2400)", V * Lq * H, 784, 32, 2400)
    run("L0 K=20 (m=614k, g=19200)", V * Lq * H, 400, 32, V * 480 * H)
    # n=32 underuses lanes; try folding 4 heads' outputs? (structure
    # differs, just measure n sensitivity)
    run("L0 K=28 n=128", V * Lq * H // 4, 784, 128, V * 480 * H // 4)
    # permute layout check: (rows, 256) bf16 vs (rows, 8, 32) f32
    rows = V * Lq
    out_flat = jax.random.normal(jax.random.PRNGKey(1), (rows, 256),
                                 jnp.bfloat16)
    perm = jnp.asarray(np.random.permutation(rows))
    ms = bench(lambda o: jnp.take(o, perm, axis=0), out_flat)
    print(f"permute (rows,256) bf16: {ms:.2f} ms", flush=True)
    out_3d = jax.random.normal(jax.random.PRNGKey(1), (rows, 8, 32),
                               jnp.float32)
    ms = bench(lambda o: jnp.take(o, perm, axis=0), out_3d)
    print(f"permute (rows,8,32) f32: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
