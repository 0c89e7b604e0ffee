"""Time the REAL production sampler (deform_sample_corner) standalone at
dense layer-1 / compacted-layer shapes across MVG_GATHER_CHUNKS values.

Purpose: (a) reproduce / rule out the TPU-worker crash seen with the
chunk-scanned sampler inside the full model; (b) measure the in-context
win over the single-gather regime without paying full-model compiles.

Usage: probe_chunk_scan_multi.py [n_chunks] [Lq]   (run on the real TPU;
set MVG_GATHER_CHUNKS via the first arg)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp

ITERS = 20
N, H, D, P = 5, 8, 32, 8
SHAPES = ((128, 240), (64, 120), (32, 60))


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
    n_chunks = sys.argv[1] if len(sys.argv) > 1 else "4"
    Lq = int(sys.argv[2]) if len(sys.argv) > 2 else 15360
    os.environ["MVG_GATHER_CHUNKS"] = n_chunks

    from mvgformer_tpu.ops.sampling import deform_sample_corner

    key = jax.random.PRNGKey(0)
    len_in = sum(h * w for h, w in SHAPES)
    value = jax.random.normal(key, (N, len_in, H, D), jnp.bfloat16)
    locs = jax.random.uniform(key, (N, Lq, H, 3, P, 2), jnp.float32)
    aw = jax.random.uniform(key, (N, Lq, H, 3, P), jnp.float32)

    def op(eps, v, l, a):
        v = jax.lax.optimization_barrier(v + eps.astype(v.dtype))
        return deform_sample_corner(v, SHAPES, l, a)

    rows = N * H * Lq * P * 3
    dt = chained(op, value, locs, aw)
    print(f"n_chunks={n_chunks} Lq={Lq}: {dt*1e3:.2f} ms/layer "
          f"({dt/rows*1e9:.2f} ns/row over {rows/1e6:.1f}M rows)",
          flush=True)


if __name__ == "__main__":
    main()
