"""Decompose deform_sample_corner cost at exact model shapes.

profile_stages2 measured 24 ms for deform_sample_corner at topk shapes
with ONE level (128,240), but an isolated XLA row-gather of the same
volume runs at ~1 ns/row. This probe times each internal stage:
  1. build_corner_tables alone
  2. index+weight computation alone
  3. the gather alone (per-(n,h) unstacked, with barriers, as production)
  4. the batched gather alternative (no unstacking)
  5. gather + weighted-sum epilogue
  6. the full deform_sample_corner
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mvgformer_tpu.ops import sampling

ITERS = 50
N, H, D, P = 5, 8, 32, 8
Lq = 3840
SHAPES = ((128, 240),)
h, w = SHAPES[0]


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
    dt = (time.perf_counter() - t) / ITERS
    print(f"{name:44s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    value = jax.random.normal(key, (N, h * w, H, D), jnp.bfloat16)
    loc = jax.random.uniform(key, (N, Lq, H, 1, P, 2))
    aw = jax.random.uniform(key, (N, Lq, H, 1, P), jnp.bfloat16)

    chained("null", lambda v: v[0, 0, 0], value)

    # 1. table build
    chained("build_corner_tables",
            lambda v: sampling.build_corner_tables(v, SHAPES)[0], value)

    tables = jax.jit(
        lambda v: sampling.build_corner_tables(v, SHAPES))(value)
    tbl = tables[0]  # (N, H, hp*wp, 4D)
    hp, wp = h + 2, w + 2

    # 2. idx + weights from locations
    def idx_weights(loc):
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x = jnp.transpose(x[:, :, :, 0], (0, 2, 1, 3)).reshape(N, H, Lq * P)
        y = jnp.transpose(y[:, :, :, 0], (0, 2, 1, 3)).reshape(N, H, Lq * P)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        lx = x - x0
        ly = y - y0
        touch = ((x > -1.0) & (x < w) & (y > -1.0) & (y < h))
        xi = jnp.clip(x0.astype(jnp.int32) + 1, 0, wp - 2)
        yi = jnp.clip(y0.astype(jnp.int32) + 1, 0, hp - 2)
        idx = yi * wp + xi
        wts = jnp.stack([(1 - lx) * (1 - ly), lx * (1 - ly),
                         (1 - lx) * ly, lx * ly], axis=-1)
        wts = wts * touch[..., None]
        return idx, wts

    chained("idx+weights", lambda l: idx_weights(l)[0], loc)
    idx, wts = jax.jit(idx_weights)(loc)

    # 3. unstacked per-(n,h) gather only (production formulation)
    def gather_unstacked(tbl, idx):
        outs = []
        for n in range(N):
            for hh in range(H):
                sub = jax.lax.optimization_barrier(tbl[n, hh])
                outs.append(sub[idx[n, hh]])
        return jnp.stack(outs)

    chained("gather only (unstacked, barriers)", gather_unstacked, tbl, idx)

    # 4. batched gather (take_along_axis over (N,H) batch dims)
    def gather_batched(tbl, idx):
        return jnp.take_along_axis(tbl, idx[..., None], axis=2)

    chained("gather only (batched big-operand)", gather_batched, tbl, idx)

    # 5. unstacked gather + full epilogue
    def gather_epilogue(tbl, idx, wts, aw):
        houts = []
        awt = jnp.transpose(aw[:, :, :, 0], (0, 2, 1, 3)).reshape(
            N, H, Lq * P)
        for n in range(N):
            for hh in range(H):
                sub = jax.lax.optimization_barrier(tbl[n, hh])
                g = sub[idx[n, hh]]
                g = g.reshape(Lq * P, 4, D)
                sampled = jnp.sum(
                    g * wts[n, hh][..., None].astype(g.dtype), axis=1)
                houts.append(jnp.sum(
                    (sampled * awt[n, hh][..., None]).reshape(Lq, P, D),
                    axis=1))
        out = jnp.stack(houts).reshape(N, H, Lq, D)
        return jnp.transpose(out, (0, 2, 1, 3)).reshape(N, Lq, H * D)

    chained("gather+epilogue (unstacked)", gather_epilogue, tbl, idx,
            wts, aw)

    # 5b. batched gather + epilogue
    def gather_epilogue_batched(tbl, idx, wts, aw):
        awt = jnp.transpose(aw[:, :, :, 0], (0, 2, 1, 3)).reshape(
            N, H, Lq * P)
        g = jnp.take_along_axis(tbl, idx[..., None], axis=2)
        g = g.reshape(N, H, Lq * P, 4, D)
        sampled = jnp.sum(g * wts[..., None].astype(g.dtype), axis=3)
        out = jnp.sum((sampled * awt[..., None]).reshape(N, H, Lq, P, D),
                      axis=3)
        return jnp.transpose(out, (0, 2, 1, 3)).reshape(N, Lq, H * D)

    chained("gather+epilogue (batched)", gather_epilogue_batched, tbl,
            idx, wts, aw)

    # 6. full production call
    chained("deform_sample_corner (full)",
            lambda v, l, a: sampling.deform_sample_corner(v, SHAPES, l, a),
            value, loc, aw)


if __name__ == "__main__":
    main()


def verify():
    """Numeric check: corner vs simple path after edits."""
    key = jax.random.PRNGKey(1)
    value = jax.random.normal(key, (N, h * w, H, D), jnp.float32)
    loc = jax.random.uniform(key, (N, 512, H, 1, P, 2)) * 1.2 - 0.1
    aw = jax.random.uniform(key, (N, 512, H, 1, P), jnp.float32)
    a = jax.jit(lambda v, l, w_: sampling.deform_sample_corner(
        v, SHAPES, l, w_))(value, loc, aw)
    b = jax.jit(lambda v, l, w_: sampling.deform_sample(
        v, SHAPES, l, w_))(value, loc, aw)
    import numpy as np
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
    print("verify small-shape OK")
    # production-size path (unstacked branch)
    value = jax.random.normal(key, (N, h * w, H, D), jnp.float32)
    loc = jax.random.uniform(key, (N, Lq, H, 1, P, 2)) * 1.2 - 0.1
    aw = jax.random.uniform(key, (N, Lq, H, 1, P), jnp.float32)
    a = jax.jit(lambda v, l, w_: sampling.deform_sample_corner(
        v, SHAPES, l, w_))(value, loc, aw)
    b = jax.jit(lambda v, l, w_: sampling.deform_sample(
        v, SHAPES, l, w_))(value, loc, aw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
    print("verify production-shape OK")
