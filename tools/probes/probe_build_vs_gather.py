"""Probe: corner-table build cost vs gather cost at K=128 shapes.

The corner-table build is K-independent (it expands the full feature
map), so as compaction shrinks the gather, the build becomes the
compacted layers' floor. Measures, at production shapes:
  - the per-(view,head) grouped-table BUILD alone,
  - the full sampler at Lq=1920 (top-K=128) and Lq=15360 (dense),
so the build/gather split is explicit before investing in a DMA-based
build kernel.

python tools/probes/probe_build_vs_gather.py  (real TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

from mvgformer_tpu.ops.sampling import (_corner_table_single,
                                        deform_sample_corner)

ITERS = 20
SHAPES = ((128, 240), (64, 120), (32, 60))
N, H, D, P = 5, 8, 32, 8


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
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    rng = jax.random.PRNGKey(0)
    total_hw = sum(h * w for h, w in SHAPES)
    value = jax.random.normal(rng, (N, total_hw, H, D), jnp.bfloat16)

    def build_all(value):
        value_hd = jnp.swapaxes(value, 1, 2)
        outs = []
        start = 0
        for (h, w) in SHAPES:
            v = jax.lax.dynamic_slice_in_dim(
                value_hd, start, h * w, axis=2).reshape(N, H, h, w, D)
            start += h * w
            for n in range(N):
                for hh in range(H):
                    outs.append(jax.lax.optimization_barrier(
                        _corner_table_single(v[n, hh])))
        return outs

    chained("corner-table build, all pairs/levels", build_all, value)

    for Lq, name in ((1920, "sampler topk128"), (3840, "sampler topk256"),
                     (15360, "sampler dense")):
        loc = jax.random.uniform(rng, (N, Lq, H, 3, P, 2))
        aw = jax.random.uniform(rng, (N, Lq, H, 3, P), jnp.bfloat16)
        chained(f"{name} (Lq={Lq})",
                lambda v, l, a: deform_sample_corner(v, SHAPES, l, a),
                value, loc, aw)


if __name__ == "__main__":
    main()
