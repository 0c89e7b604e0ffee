"""Isolate grouped-sampler stage costs at 3-level topk shapes:
E1 gathers+epilogue (tables as separate inputs), E2 builds only,
E3 builds+gathers, E4 idx/wts prep only, E5 full.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mvgformer_tpu.ops import sampling

ITERS = 25
N, H, D, P = 5, 8, 32, 8
SHAPES = ((128, 240), (64, 120), (32, 60))
TOTAL = sum(h * w for h, w in SHAPES)
Lq = 3840
LEVEL_ROWS = [(h + 2) * (w + 2) for h, w in SHAPES]
GROUPS = [[0], [1, 2]]


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
    print(f"{name:40s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def make_inputs():
    key = jax.random.PRNGKey(0)
    value = jax.random.normal(key, (N, TOTAL, H, D), jnp.bfloat16)
    loc = jax.random.uniform(key, (N, Lq, H, 3, P, 2))
    aw = jax.random.uniform(key, (N, Lq, H, 3, P), jnp.bfloat16)
    return value, loc, aw


def idx_prep(loc, aw_in):
    idxs, wtss, aws = [], [], []
    for lvl, (h, w) in enumerate(SHAPES):
        hp, wp = h + 2, w + 2
        l = loc[:, :, :, lvl]
        x = l[..., 0] * w - 0.5
        y = l[..., 1] * h - 0.5
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(N, H, Lq * P)
        y = jnp.transpose(y, (0, 2, 1, 3)).reshape(N, H, Lq * P)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        lx, ly = x - x0, y - y0
        touch = ((x > -1.0) & (x < w) & (y > -1.0) & (y < h))
        xi = jnp.clip(x0.astype(jnp.int32) + 1, 0, wp - 2)
        yi = jnp.clip(y0.astype(jnp.int32) + 1, 0, hp - 2)
        idxs.append(yi * wp + xi)
        wts = jnp.stack([(1 - lx) * (1 - ly), lx * (1 - ly),
                         (1 - lx) * ly, lx * ly], axis=-1)
        wtss.append(wts * touch[..., None])
        aws.append(jnp.transpose(aw_in[:, :, :, lvl],
                                 (0, 2, 1, 3)).reshape(N, H, Lq * P))
    g_idx, g_wts, g_aw = [], [], []
    for grp in GROUPS:
        off = 0
        parts = []
        for lvl in grp:
            parts.append(idxs[lvl] + off)
            off += LEVEL_ROWS[lvl]
        g_idx.append(jnp.concatenate(parts, axis=-1))
        g_wts.append(jnp.concatenate([wtss[lvl] for lvl in grp], axis=2))
        g_aw.append(jnp.concatenate([aws[lvl] for lvl in grp], axis=-1))
    return g_idx, g_wts, g_aw


def builds(value):
    value_hd = jnp.swapaxes(value, 1, 2)
    v_lvls = []
    start = 0
    for (h, w) in SHAPES:
        v_lvls.append(jax.lax.dynamic_slice_in_dim(
            value_hd, start, h * w, axis=2).reshape(N, H, h, w, D))
        start += h * w
    tbls = []  # [group][n*H+h] -> (rows, 4D)
    for grp in GROUPS:
        gt = []
        for n in range(N):
            for hh in range(H):
                t = jnp.concatenate(
                    [sampling._corner_table_single(v_lvls[lvl][n, hh])
                     for lvl in grp], axis=0)
                gt.append(jax.lax.optimization_barrier(t))
        tbls.append(gt)
    return tbls


def gathers(tbls, g_idx, g_wts, g_aw):
    houts = []
    for n in range(N):
        for hh in range(H):
            acc = None
            for gi, grp in enumerate(GROUPS):
                G = len(grp)
                tbl = tbls[gi][n * H + hh]
                g = tbl[g_idx[gi][n, hh]]
                g = g.reshape(G * Lq * P, 4, D)
                sampled = jnp.sum(
                    g * g_wts[gi][n, hh][..., None].astype(g.dtype), axis=1)
                contrib = jnp.sum(
                    (sampled * g_aw[gi][n, hh][..., None]).reshape(
                        G, Lq, P, D), axis=(0, 2))
                acc = contrib if acc is None else acc + contrib
            houts.append(acc)
    out = jnp.stack(houts).reshape(N, H, Lq, D)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(N, Lq, H * D)


def main():
    value, loc, aw = make_inputs()
    g_idx, g_wts, g_aw = jax.jit(idx_prep)(loc, aw)
    tbls = jax.jit(builds)(value)

    chained("E4 idx/wts prep only", lambda l, a: idx_prep(l, a)[0], loc, aw)
    chained("E2 builds only", lambda v: builds(v)[0][0], value)
    chained("E1 gathers (tables as inputs)",
            lambda i0, tb, w_, a_: gathers(tb, [i0, g_idx[1]], w_, a_),
            g_idx[0], tbls, g_wts, g_aw)

    def e3(value, g_idx, g_wts, g_aw):
        return gathers(builds(value), g_idx, g_wts, g_aw)

    chained("E3 builds+gathers", e3, value, g_idx, g_wts, g_aw)

    chained("E5 full deform_sample_corner",
            lambda v, l, a: sampling.deform_sample_corner(v, SHAPES, l, a),
            value, loc, aw)


if __name__ == "__main__":
    main()


def main2():
    value, loc, aw = make_inputs()
    g_idx, g_wts, g_aw = jax.jit(idx_prep)(loc, aw)
    tbls = jax.jit(builds)(value)

    # E8: gathers from INPUT tables, but builds also run in-program
    # (results consumed into a scalar, not gathered from)
    def e8(value, tbls, g_idx, g_wts, g_aw):
        built = builds(value)
        waste = sum(jnp.sum(t[0, 0]).astype(jnp.float32)
                    for gt in built for t in gt)
        out = gathers(tbls, g_idx, g_wts, g_aw)
        return out + (waste * 0.0).astype(out.dtype)

    chained("E8 gathers(input tbls) + builds beside", e8, value, tbls,
            g_idx, g_wts, g_aw)

    # E9: builds + gathers but gathers read tables through one extra
    # elementwise copy (fresh arena buffer, standard layout)
    def e9(value, g_idx, g_wts, g_aw):
        built = builds(value)
        built = [[jax.lax.optimization_barrier(t + jnp.bfloat16(0.0))
                  for t in gt] for gt in built]
        return gathers(built, g_idx, g_wts, g_aw)

    chained("E9 builds + copy + gathers", e9, value, g_idx, g_wts, g_aw)


main2()
