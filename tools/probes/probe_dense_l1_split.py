"""Decompose the dense layer-1 sampler cost at the headline shapes
(P=4 after ptop, Lq=15360): the full op measured 40.4 ms
(profile_stages5) against a 22.6 ms gather floor (7.37M rows x 3.06
ns) — this probe splits the gap into (a) index/weight preparation
(floor/clip/transpose/stack over 7.4M samples), (b) the gathers
themselves, (c) the weighted epilogue, so the next optimization lands
on the right stage.

Run: PYTHONPATH=/root/repo:/root/.axon_site python \
    tools/probes/probe_dense_l1_split.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp

from mvgformer_tpu.ops import sampling as S

ITERS = 20
N, H, D, P, Lq = 5, 8, 32, 4, 15360
SHAPES = ((128, 240), (64, 120), (32, 60))


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
    print(f"{name:56s} {dt:8.2f} ms", flush=True)
    return dt


def prep(loc, aw):
    """The index/weight preparation exactly as deform_sample_corner."""
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
        lx = x - x0
        ly = y - y0
        touch = ((x > -1.0) & (x < w) & (y > -1.0) & (y < h))
        xi = jnp.clip(x0.astype(jnp.int32) + 1, 0, wp - 2)
        yi = jnp.clip(y0.astype(jnp.int32) + 1, 0, hp - 2)
        idxs.append(yi * wp + xi)
        wts = jnp.stack([(1 - lx) * (1 - ly), lx * (1 - ly),
                         (1 - lx) * ly, lx * ly], axis=-1)
        wtss.append(wts * touch[..., None])
        aws.append(jnp.transpose(aw[:, :, :, lvl],
                                 (0, 2, 1, 3)).reshape(N, H, Lq * P))
    return idxs, wtss, aws


def main():
    rng = jax.random.PRNGKey(0)
    total_hw = sum(h * w for h, w in SHAPES)
    value = jax.random.normal(rng, (N, total_hw, H, D), jnp.bfloat16)
    loc = jax.random.uniform(rng, (N, Lq, H, 3, P, 2))
    aw = jax.random.uniform(rng, (N, Lq, H, 3, P), jnp.bfloat16)

    chained("full sampler dense P=4 (baseline)",
            lambda v, l, a: S.deform_sample_corner(v, SHAPES, l, a),
            value, loc, aw)

    chained("index/weight prep only",
            lambda l, a: prep(l, a), loc, aw)

    chained("table build only (all pairs, cap8 grouping)",
            lambda v: [jax.lax.optimization_barrier(
                S._corner_table_single(
                    jnp.swapaxes(v, 1, 2)[n, hh,
                                          :SHAPES[0][0] * SHAPES[0][1]]
                    .reshape(SHAPES[0][0], SHAPES[0][1], D)))
                for n in range(N) for hh in range(H)],
            value)

    # gather+epilogue with prep hoisted OUT of the timed body: pass
    # idx/wts as inputs, re-derive a trivial dependence so XLA cannot
    # stage them as loop invariants (the known probe trap)
    idxs, wtss, aws = jax.jit(prep)(loc, aw)

    def gather_epilogue(v, idx0, idx1, idx2, w0, w1, w2, a0, a1, a2):
        # v is the eps-perturbed arg: derive a zero-valued loop
        # dependence for the index inputs so neither the tables nor the
        # gather indices are loop-invariant (the round-2 probe trap:
        # XLA stages loop-invariant gather operands out of the scan)
        dep = (jnp.sum(v[0, 0, 0]) * 0).astype(jnp.int32)
        idxs = [idx0 + dep, idx1 + dep, idx2 + dep]
        wtss = [w0, w1, w2]
        aws = [a0, a1, a2]
        value_hd = jnp.swapaxes(v, 1, 2)
        v_lvls = []
        start = 0
        for (h, w) in SHAPES:
            v_lvls.append(jax.lax.dynamic_slice_in_dim(
                value_hd, start, h * w, axis=2).reshape(N, H, h, w, D))
            start += h * w
        level_rows = [(h + 2) * (w + 2) for (h, w) in SHAPES]
        groups = [[0], [1, 2]]
        g_idx, g_wts, g_aw = [], [], []
        for grp in groups:
            off = 0
            parts = []
            for lvl in grp:
                parts.append(idxs[lvl] + off)
                off += level_rows[lvl]
            g_idx.append(jnp.concatenate(parts, axis=-1))
            g_wts.append(jnp.concatenate([wtss[lvl] for lvl in grp],
                                         axis=2))
            g_aw.append(jnp.concatenate([aws[lvl] for lvl in grp],
                                        axis=-1))
        houts = []
        for n in range(N):
            for hh in range(H):
                acc = None
                for gi, grp in enumerate(groups):
                    tbl = jnp.concatenate(
                        [S._corner_table_single(v_lvls[lvl][n, hh])
                         for lvl in grp], axis=0)
                    tbl = jax.lax.optimization_barrier(tbl)
                    G = len(grp)
                    g = tbl[g_idx[gi][n, hh]]
                    g = g.reshape(G * Lq * P, 4, D)
                    sampled = jnp.sum(
                        g * g_wts[gi][n, hh][..., None].astype(g.dtype),
                        axis=1)
                    acc_c = jnp.sum(
                        (sampled * g_aw[gi][n, hh][..., None]).reshape(
                            G, Lq, P, D), axis=(0, 2))
                    acc = acc_c if acc is None else acc + acc_c
                houts.append(acc)
        out = jnp.stack(houts).reshape(N, H, Lq, D)
        return jnp.transpose(out, (0, 2, 1, 3)).reshape(N, Lq, H * D)

    chained("build+gather+epilogue (idx precomputed as inputs)",
            gather_epilogue, value,
            idxs[0], idxs[1], idxs[2], wtss[0], wtss[1], wtss[2],
            aws[0], aws[1], aws[2])


if __name__ == "__main__":
    main()
