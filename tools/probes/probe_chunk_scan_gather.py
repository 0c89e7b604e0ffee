"""Does an inner chunk-scan put in-program-built gather operands into the
VMEM-staged (~1 ns/row) regime?

Round-2 finding (probe_gather_cost_model): gathers whose operand is a
loop-invariant PROGRAM INPUT inside a lax.scan run 3-4x faster than the
same gathers from in-program-produced buffers — XLA hoists the operand's
VMEM staging out of the scan. The round-2 conclusion ("per-frame tables
can never be loop-invariant") missed that a table IS invariant across
row-chunks within the frame: scan over index chunks with the table closed
over, and the staging may hoist even for an in-program producer.

Shapes = one (view, head) pair of dense layer-1: table 31488x128 bf16
(7.7 MB), 122880 gather rows.
"""

import sys
import time

import jax
import jax.numpy as jnp

ITERS = 50
ROWS_TBL = 31488
ROW_W = 128
ROWS_G = 122880


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
    raw = jax.random.normal(key, (ROWS_TBL, ROW_W), jnp.bfloat16)
    tbl_input = raw
    idx = jax.random.randint(key, (ROWS_G,), 0, ROWS_TBL, jnp.int32)

    null = chained(lambda e: e[None] + 1.0)
    print(f"null: {null*1e3:.3f} ms")

    def fresh_table(eps, raw_):
        # an in-program-produced operand (not constant-foldable)
        t = raw_ + eps.astype(jnp.bfloat16)
        return jax.lax.optimization_barrier(t)

    def jitter(eps, i):
        return jnp.clip(i + (eps > 1e30).astype(jnp.int32), 0, ROWS_TBL - 1)

    # A: in-program table, one big gather (current production regime)
    def a(eps, raw_, idx_):
        return fresh_table(eps, raw_)[jitter(eps, idx_)].astype(jnp.float32)

    # B: in-program table, scan over N chunks of rows
    def make_chunked(n_chunks):
        chunk = ROWS_G // n_chunks

        def b(eps, raw_, idx_):
            t = fresh_table(eps, raw_)
            ii = jitter(eps, idx_).reshape(n_chunks, chunk)

            def body(c, ic):
                return c + jnp.sum(t[ic].astype(jnp.float32), axis=0), None

            acc, _ = jax.lax.scan(body, jnp.zeros((ROW_W,), jnp.float32),
                                  ii)
            return acc
        return b

    # C: program-input table, one big gather, used once
    def c(eps, tbl_, idx_):
        return tbl_[jitter(eps, idx_)].astype(jnp.float32)

    # D: program-input table, chunk scan (round-2 E1 reference point)
    def make_chunked_input(n_chunks):
        chunk = ROWS_G // n_chunks

        def d(eps, tbl_, idx_):
            ii = jitter(eps, idx_).reshape(n_chunks, chunk)

            def body(carry, ic):
                return carry + jnp.sum(tbl_[ic].astype(jnp.float32),
                                       axis=0), None

            acc, _ = jax.lax.scan(
                body, jnp.zeros((ROW_W,), jnp.float32), ii)
            return acc
        return d

    rows = ROWS_G
    for name, fn, args in [
        ("A in-prog single gather", a, (raw, idx)),
        ("B in-prog chunk-scan x4", make_chunked(4), (raw, idx)),
        ("B in-prog chunk-scan x8", make_chunked(8), (raw, idx)),
        ("B in-prog chunk-scan x16", make_chunked(16), (raw, idx)),
        ("B in-prog chunk-scan x32", make_chunked(32), (raw, idx)),
        ("C input single gather", c, (tbl_input, idx)),
        ("D input chunk-scan x8", make_chunked_input(8),
         (tbl_input, idx)),
        ("D input chunk-scan x32", make_chunked_input(32),
         (tbl_input, idx)),
    ]:
        dt = chained(fn, *args) - null
        print(f"{name:28s} {dt*1e3:8.3f} ms  {dt/rows*1e9:6.2f} ns/row",
              flush=True)


if __name__ == "__main__":
    main()
