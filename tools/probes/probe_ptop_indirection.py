"""Round-4: isolate WHY point-top-m measured fps-negative (3.98-6.62)
despite removing half the gather rows.

Hypothesis: the `take_along_axis(locations, p_idx, axis=4)` in
projattn.py's ptop block is itself a huge tiny-slice gather
(N*Lq*H*Lt*m rows of (1,2)) that costs more than the rows it saves.
Candidate fix: one-hot select over P (pure VPU math).

Also measures the sampler at P=4 directly (the payoff ptop should see)
and the unstacked-vs-batched crossover at the K=64/P=4 shape that falls
under the 262144 threshold.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp

ITERS = 25


def chained_time(name, make_fn, primary, *rest, iters=ITERS):
    @jax.jit
    def run(primary, *rest):
        def body(eps, _):
            out = make_fn(primary + eps.astype(primary.dtype), *rest)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.sum(leaf).astype(jnp.float32) * 0.0, None

        eps, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return eps

    float(run(primary, *rest))
    t = time.perf_counter()
    float(run(primary, *rest))
    dt = (time.perf_counter() - t) / iters
    print(f"{name:56s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    from mvgformer_tpu.ops import sampling as S

    rng = jax.random.PRNGKey(0)
    N, H, D = 5, 8, 32
    Lt, P, m = 3, 8, 4
    SHAPES = ((128, 240), (64, 120), (32, 60))
    total_hw = sum(h * w for h, w in SHAPES)
    value = jax.random.normal(rng, (N, total_hw, H, D), jnp.bfloat16)

    Lq = 15360
    locations = jax.random.uniform(rng, (N, Lq, H, Lt, P, 2))
    weights = jax.random.uniform(rng, (N, Lq, H, Lt, P))

    # (a) the current ptop indirection alone: top_k + take_along_axis
    def ptop_take(loc, w):
        w_sel, p_idx = jax.lax.top_k(w, m)
        kept = jnp.sum(w_sel, axis=(-2, -1), keepdims=True)
        w2 = w_sel / jnp.maximum(kept, 1e-6)
        loc2 = jnp.take_along_axis(loc, p_idx[..., None], axis=4)
        return loc2, w2

    chained_time("ptop select: top_k + take_along (CURRENT)",
                 ptop_take, locations, weights)

    # (b) one-hot select (VPU math, no gather)
    def ptop_onehot(loc, w):
        w_sel, p_idx = jax.lax.top_k(w, m)
        kept = jnp.sum(w_sel, axis=(-2, -1), keepdims=True)
        w2 = w_sel / jnp.maximum(kept, 1e-6)
        oh = jax.nn.one_hot(p_idx, P, dtype=loc.dtype)  # (..., m, P)
        loc2 = jnp.einsum("nqhlmp,nqhlpc->nqhlmc", oh, loc)
        return loc2, w2

    chained_time("ptop select: top_k + ONE-HOT einsum",
                 ptop_onehot, locations, weights)

    # (c) sampler at P=4 dense (what ptop4 should cost downstream)
    loc4 = locations[:, :, :, :, :m]
    aw4 = jax.random.uniform(rng, (N, Lq, H, Lt, m), jnp.bfloat16)
    chained_time("deform dense Lq=15360 P=4 (unstacked)",
                 lambda v, l, a: S.deform_sample_corner(v, SHAPES, l, a),
                 value, loc4, aw4)

    os.environ["MVG_GATHER_CAP_MB"] = "16"
    chained_time("deform dense Lq=15360 P=4 CAP=16",
                 lambda v, l, a: S.deform_sample_corner(v, SHAPES, l, a),
                 value, loc4, aw4)
    os.environ["MVG_GATHER_CAP_MB"] = "8"

    # (d) compacted K=64 at P=4: falls under the 262144 unstacked
    # threshold -> batched path today; measure both
    Lqc = 960
    locc = jax.random.uniform(rng, (N, Lqc, H, Lt, m, 2))
    awc = jax.random.uniform(rng, (N, Lqc, H, Lt, m), jnp.bfloat16)
    chained_time("deform topk64 P=4 (current=BATCHED, under threshold)",
                 lambda v, l, a: S.deform_sample_corner(v, SHAPES, l, a),
                 value, locc, awc)

    real = S.deform_sample_corner

    def forced_unstacked(v, sh, l, a):
        os.environ["MVG_FORCE_GATHER_PATH"] = "unstacked"
        try:
            return real(v, sh, l, a)
        finally:
            os.environ.pop("MVG_FORCE_GATHER_PATH", None)

    chained_time("deform topk64 P=4 FORCED unstacked",
                 lambda v, l, a: forced_unstacked(v, SHAPES, l, a),
                 value, locc, awc)

    os.environ["MVG_GATHER_CAP_MB"] = "16"
    chained_time("deform topk64 P=4 FORCED unstacked CAP=16",
                 lambda v, l, a: forced_unstacked(v, SHAPES, l, a),
                 value, locc, awc)
    os.environ["MVG_GATHER_CAP_MB"] = "8"


if __name__ == "__main__":
    main()
