"""Stage profiling v5 (round 5): decompose the ~96 ms frame at the
CURRENT headline config (topk=64 + ptop4 + jacobi, 10.4 fps) so the
round's kernel effort lands on the actual wall.

Hypothesis under test: at ptop4 the gather rows halved (m/P = 4/8) but
the corner-table BUILD is row-count-independent (it expands the full
feature map: ~7 ms/layer x 4 layers from the round-1 measurement), so
the build may now rival or exceed the gather as the sampling stage's
dominant cost — in which case a static-DMA Pallas build kernel (all
shifts static, no gathers: the Mosaic-compilable class) is the highest
-value kernel, ahead of the f4/f5/f6 exact-gather composition.

Run: PYTHONPATH=/root/repo:/root/.axon_site python \
    tools/probes/profile_stages5.py   (real TPU, ~15 min incl. compiles)
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp

ITERS = 20


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
    from mvgformer_tpu.config import load_config
    from mvgformer_tpu.data.synthetic import make_batch
    from mvgformer_tpu.models.mvgformer import MVGFormer
    from mvgformer_tpu.ops import sampling as S
    from mvgformer_tpu.ops.sampling import _corner_table_single

    cfg = load_config()
    cfg.DECODER.num_instance = 1024
    cfg.DATASET.CAMERA_NUM = 5
    cfg.NETWORK.IMAGE_SIZE = [960, 512]
    cfg.DECODER.inference_topk_queries = 64
    cfg.DECODER.triangulation_method = "jacobi"
    cfg.DECODER.inference_point_topm = 4

    rng = jax.random.PRNGKey(0)
    threshold = 0.1

    model = MVGFormer(cfg=cfg)
    batch = make_batch(cfg, batch_size=1, seed=0, num_people=3)
    variables = jax.jit(model.init)(rng, batch)

    dummy = jnp.zeros((4,), jnp.float32)
    chained_time("null (relay floor per iter)", lambda d: d + 1.0, dummy)

    def full(views, batch, variables):
        b = dataclasses.replace(batch, views=views)
        outs = model.apply(variables, b, threshold=threshold)
        return outs[-1]["pred_poses"]

    chained_time("full eval step (headline k64+ptop4+jacobi)", full,
                 batch.views, batch, variables)

    # full model with sampling stubbed (rest-of-model)
    real = S.deform_sample_corner

    def fake(value, shapes, loc, aw):
        N_, _, H_, D_ = value.shape
        return (jnp.zeros((N_, loc.shape[1], H_ * D_), value.dtype)
                + jnp.sum(value) * 0 + jnp.sum(loc).astype(value.dtype) * 0
                + jnp.sum(aw) * 0)

    import mvgformer_tpu.ops.projattn as pm
    S.deform_sample_corner = fake
    pm.deform_sample_corner = fake
    try:
        model2 = MVGFormer(cfg=cfg)

        def full2(views, batch, variables):
            b = dataclasses.replace(batch, views=views)
            outs = model2.apply(variables, b, threshold=threshold)
            return outs[-1]["pred_poses"]

        chained_time("full step, sampling stubbed", full2, batch.views,
                     batch, variables)
    finally:
        S.deform_sample_corner = real
        pm.deform_sample_corner = real

    # sampler components at EXACT headline shapes (post-ptop P=m=4)
    N, H, D = 5, 8, 32
    SHAPES = ((128, 240), (64, 120), (32, 60))
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

    chained_time("corner-table build alone (one layer, 40 pairs)",
                 build_all, value)

    for P in (4, 8):
        for Lq, tag in ((15360, "dense L1"), (960, "topk64 L2-4")):
            loc = jax.random.uniform(rng, (N, Lq, H, 3, P, 2))
            aw = jax.random.uniform(rng, (N, Lq, H, 3, P), jnp.bfloat16)
            chained_time(
                f"deform P={P} Lq={Lq} ({tag})",
                lambda v, l, a: S.deform_sample_corner(v, SHAPES, l, a),
                value, loc, aw)

    # geometry + heads at headline shapes (K=64 -> Nqc=960)
    from mvgformer_tpu.geometry.cameras import (project_points,
                                                undistort_points,
                                                projection_matrices)
    from mvgformer_tpu.geometry.triangulate import triangulate_dlt

    B, V = 1, 5
    cams = batch.view_data.cameras
    pts = jax.random.normal(rng, (B, V, 15360, 3)) * 100.0
    chained_time("project_points dense (B,V,15360)",
                 lambda p, c: project_points(p, c), pts, cams)
    pts_c = jax.random.normal(rng, (B, V, 960, 3)) * 100.0
    chained_time("project_points topk64 (B,V,960)",
                 lambda p, c: project_points(p, c), pts_c, cams)
    p2d = jax.random.uniform(rng, (B, V, 960, 2)) * 500.0
    chained_time("undistort_points topk64 (B,V,960)",
                 lambda p, c: undistort_points(p, c), p2d, cams)
    p2d_d = jax.random.uniform(rng, (B, V, 15360, 2)) * 500.0
    chained_time("undistort_points dense (B,V,15360)",
                 lambda p, c: undistort_points(p, c), p2d_d, cams)

    P_mats = jnp.broadcast_to(projection_matrices(cams)[:, None],
                              (B, 960, V, 3, 4))
    pts2d = jax.random.uniform(rng, (B, 960, V, 2)) * 500.0
    conf = jnp.ones((B, 960, V))
    chained_time("triangulate_dlt jacobi topk64 (960)",
                 lambda p2, P_, c: triangulate_dlt(P_, p2, c,
                                                   solver="jacobi"),
                 pts2d, P_mats, conf)
    P_mats_d = jnp.broadcast_to(projection_matrices(cams)[:, None],
                                (B, 15360, V, 3, 4))
    pts2d_d = jax.random.uniform(rng, (B, 15360, V, 2)) * 500.0
    conf_d = jnp.ones((B, 15360, V))
    chained_time("triangulate_dlt jacobi dense (15360)",
                 lambda p2, P_, c: triangulate_dlt(P_, p2, c,
                                                   solver="jacobi"),
                 pts2d_d, P_mats_d, conf_d)


if __name__ == "__main__":
    main()
