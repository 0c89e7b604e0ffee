"""Measure the XLA TPU gather cost model: time vs operand size, row
count, index distribution. Honest idx (not hoistable), ITERS=100 chains.

Hypotheses to separate:
  cost = a * operand_bytes + b * rows   (streaming engine)
  cost = rows * f(operand_bytes)        (random-access, cache-limited)
"""

import sys
import time

import jax
import jax.numpy as jnp

ITERS = 100


def chained(fn, *args):
    @jax.jit
    def run(*a):
        def body(eps, _):
            out = fn(eps, *a)
            return jnp.sum(out).astype(jnp.float32) * 0.0, None
        eps, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return eps
    float(run(*args))
    t = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t) / ITERS


def main():
    key = jax.random.PRNGKey(0)
    print(f"{'rows_tbl':>9} {'MB':>6} {'rows_gath':>10} {'idx':>7} "
          f"{'ms':>8} {'ns/row':>8}")

    null = chained(lambda e: e[None] + 1.0)
    print(f"{'null':>9} {'':>6} {'':>10} {'':>7} {null*1e3:8.3f}")

    for rows_tbl in (2048, 8192, 16384, 31488, 62976):
        mb = rows_tbl * 128 * 2 / 2**20
        tbl = jax.random.normal(key, (rows_tbl, 128), jnp.bfloat16)
        for rows_g in (30720, 122880):
            for mode in ("rand", "sorted", "local"):
                idx = jax.random.randint(key, (rows_g,), 0, rows_tbl,
                                         jnp.int32)
                if mode == "sorted":
                    idx = jnp.sort(idx)
                elif mode == "local":
                    # clustered: consecutive samples near each other
                    base = jnp.repeat(
                        jax.random.randint(key, (rows_g // 64,), 0,
                                           max(rows_tbl - 64, 1),
                                           jnp.int32), 64)
                    idx = base + jnp.arange(rows_g, dtype=jnp.int32) % 64

                def fn(eps, tbl_, idx=idx, rows_tbl=rows_tbl):
                    ii = jnp.clip(idx + (eps > 1e30).astype(jnp.int32),
                                  0, rows_tbl - 1)
                    sub = jax.lax.optimization_barrier(tbl_)
                    return sub[ii].astype(jnp.float32)

                dt = chained(fn, tbl) - null
                print(f"{rows_tbl:9d} {mb:6.2f} {rows_g:10d} {mode:>7} "
                      f"{dt*1e3:8.3f} {dt/rows_g*1e9:8.2f}", flush=True)


if __name__ == "__main__":
    main()
