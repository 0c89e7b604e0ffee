"""Bisect the gap: parts of deform_sample_corner sum to ~6 ms but the
full program costs ~13 ms. Build hybrid programs to find the interaction.
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
hp, wp = h + 2, w + 2


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
    print(f"{name:52s} {dt*1e3:8.3f} ms", flush=True)
    return dt


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
    return idx, wts * touch[..., None]


def gathers(tbl, idx, wts, aw, slice_barrier=True):
    awt = jnp.transpose(aw[:, :, :, 0], (0, 2, 1, 3)).reshape(N, H, Lq * P)
    houts = []
    for n in range(N):
        for hh in range(H):
            sub = tbl[n, hh]
            if slice_barrier:
                sub = jax.lax.optimization_barrier(sub)
            g = sub[idx[n, hh]]
            g = g.reshape(Lq * P, 4, D)
            sampled = jnp.sum(
                g * wts[n, hh][..., None].astype(g.dtype), axis=1)
            houts.append(jnp.sum(
                (sampled * awt[n, hh][..., None]).reshape(Lq, P, D),
                axis=1))
    out = jnp.stack(houts).reshape(N, H, Lq, D)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(N, Lq, H * D)


def main():
    key = jax.random.PRNGKey(0)
    value = jax.random.normal(key, (N, h * w, H, D), jnp.bfloat16)
    loc = jax.random.uniform(key, (N, Lq, H, 1, P, 2))
    aw = jax.random.uniform(key, (N, Lq, H, 1, P), jnp.bfloat16)
    tbl = jax.jit(lambda v: jax.lax.optimization_barrier(
        sampling.build_corner_tables(v, SHAPES)[0]))(value)
    idx, wts = jax.jit(idx_weights)(loc)

    # P1: build in-program, idx/wts as inputs
    def p1(value, idx, wts, aw):
        t = jax.lax.optimization_barrier(
            sampling.build_corner_tables(value, SHAPES)[0])
        return gathers(t, idx, wts, aw)

    chained("P1 build+gathers (idx input)", p1, value, idx, wts, aw)

    # P2: tbl as input, loc math in-program
    def p2(loc, tbl, aw):
        i, w_ = idx_weights(loc)
        return gathers(tbl, i, w_, aw)

    chained("P2 locmath+gathers (tbl input)", p2, loc, tbl, aw)

    # P3: all in-program (the full path)
    def p3(value, loc, aw):
        t = jax.lax.optimization_barrier(
            sampling.build_corner_tables(value, SHAPES)[0])
        i, w_ = idx_weights(loc)
        return gathers(t, i, w_, aw)

    chained("P3 full", p3, value, loc, aw)

    # P4: full but no per-slice barrier
    def p4(value, loc, aw):
        t = jax.lax.optimization_barrier(
            sampling.build_corner_tables(value, SHAPES)[0])
        i, w_ = idx_weights(loc)
        return gathers(t, i, w_, aw, slice_barrier=False)

    chained("P4 full, no slice barrier", p4, value, loc, aw)

    # P5: gathers only from input tbl/idx/wts (repeat of decompose #5)
    chained("P5 gathers only (all inputs)",
            lambda t, i, w_, a: gathers(t, i, w_, a), tbl, idx, wts, aw)

    # P6: like P5 but no slice barrier
    chained("P6 gathers only, no slice barrier",
            lambda t, i, w_, a: gathers(t, i, w_, a, slice_barrier=False),
            tbl, idx, wts, aw)


if __name__ == "__main__":
    main()


def main2():
    key = jax.random.PRNGKey(0)
    value = jax.random.normal(key, (N, h * w, H, D), jnp.bfloat16)
    loc = jax.random.uniform(key, (N, Lq, H, 1, P, 2))
    aw = jax.random.uniform(key, (N, Lq, H, 1, P), jnp.bfloat16)
    idx, wts = jax.jit(idx_weights)(loc)

    def build_per_nh(value):
        """40 standalone (hp*wp, 4D) tables."""
        tbls = {}
        v4 = jnp.swapaxes(value, 1, 2).reshape(N, H, h, w, D)
        for n in range(N):
            for hh in range(H):
                v = v4[n, hh]
                v = jnp.pad(v, ((1, 1), (1, 1), (0, 0)))
                c00 = v
                c01 = jnp.pad(v[:, 1:], ((0, 0), (0, 1), (0, 0)))
                c10 = jnp.pad(v[1:], ((0, 1), (0, 0), (0, 0)))
                c11 = jnp.pad(v[1:, 1:], ((0, 1), (0, 1), (0, 0)))
                t = jnp.concatenate([c00, c01, c10, c11], axis=-1)
                tbls[(n, hh)] = jax.lax.optimization_barrier(
                    t.reshape(hp * wp, 4 * D))
        return tbls

    def gathers_dict(tbls, idx, wts, aw):
        awt = jnp.transpose(aw[:, :, :, 0], (0, 2, 1, 3)).reshape(
            N, H, Lq * P)
        houts = []
        for n in range(N):
            for hh in range(H):
                g = tbls[(n, hh)][idx[n, hh]]
                g = g.reshape(Lq * P, 4, D)
                sampled = jnp.sum(
                    g * wts[n, hh][..., None].astype(g.dtype), axis=1)
                houts.append(jnp.sum(
                    (sampled * awt[n, hh][..., None]).reshape(Lq, P, D),
                    axis=1))
        out = jnp.stack(houts).reshape(N, H, Lq, D)
        return jnp.transpose(out, (0, 2, 1, 3)).reshape(N, Lq, H * D)

    def p7(value, idx, wts, aw):
        return gathers_dict(build_per_nh(value), idx, wts, aw)

    chained("P7 per-(n,h) build + gathers", p7, value, idx, wts, aw)

    def p8(value, idx, wts, aw):
        t = sampling.build_corner_tables(value, SHAPES)[0]
        t = jax.lax.optimization_barrier(
            t.astype(jnp.float32)).astype(jnp.bfloat16)
        t = jax.lax.optimization_barrier(t)
        return gathers(t, idx, wts, aw)

    chained("P8 build + f32 roundtrip relayout + gathers", p8,
            value, idx, wts, aw)

    # P9: what does an input table with the BUILD's layout cost? emulate:
    # feed value, build, write table out as program output, separate
    # program gathers (two dispatches, chained timing covers only combined)
    def p9(value, idx, wts, aw):
        t = sampling.build_corner_tables(value, SHAPES)[0]
        # force one full elementwise pass (copy) without dtype tricks
        t = jax.lax.optimization_barrier(t * jnp.bfloat16(1.0))
        return gathers(t, idx, wts, aw)

    chained("P9 build + *1.0 copy + gathers", p9, value, idx, wts, aw)


main2()
