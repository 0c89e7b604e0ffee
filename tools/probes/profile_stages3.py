"""Stage profiling v3: production config (topk=256 + jacobi), 3-level
deform shapes matching the model exactly, ITERS=50 chains (relay floor
~0.6 ms/iter; a `null` row is printed to subtract)."""

import dataclasses
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
    print(f"{name:46s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    from mvgformer_tpu.config import load_config
    from mvgformer_tpu.data.synthetic import make_batch
    from mvgformer_tpu.models.mvgformer import MVGFormer
    from mvgformer_tpu.models.pose_resnet import PoseResNet
    from mvgformer_tpu.ops.sampling import deform_sample_corner
    from mvgformer_tpu.geometry.triangulate import triangulate_dlt
    from mvgformer_tpu.geometry.cameras import (project_points,
                                                undistort_points,
                                                projection_matrices)

    cfg = load_config()
    cfg.DECODER.num_instance = 1024
    cfg.DATASET.CAMERA_NUM = 5
    cfg.NETWORK.IMAGE_SIZE = [960, 512]
    cfg.DECODER.inference_topk_queries = 256
    cfg.DECODER.triangulation_method = "jacobi"

    rng = jax.random.PRNGKey(0)
    threshold = 0.1

    model = MVGFormer(cfg=cfg)
    batch = make_batch(cfg, batch_size=1, seed=0, num_people=3)
    variables = jax.jit(model.init)(rng, batch)

    dummy = jnp.zeros((4,), jnp.float32)
    chained_time("null (relay floor per iter)",
                 lambda d: d + 1.0, dummy)

    def full(views, batch, variables):
        b = dataclasses.replace(batch, views=views)
        outs = model.apply(variables, b, threshold=threshold)
        return outs[-1]["pred_poses"]

    chained_time("full eval step (topk+jacobi)", full, batch.views,
                 batch, variables)

    # backbone
    bb = PoseResNet(dtype=jnp.bfloat16)
    imgs = jnp.zeros((5, 512, 960, 3), jnp.float32)
    bvars = jax.jit(bb.init)(rng, imgs)
    chained_time("backbone (5 views)", lambda x, v: bb.apply(v, x),
                 imgs, bvars)

    # deform sampling at EXACT model shapes: 3 levels
    N, H, D, P = 5, 8, 32, 8
    SHAPES = ((128, 240), (64, 120), (32, 60))
    total_hw = sum(h * w for h, w in SHAPES)
    value = jax.random.normal(rng, (N, total_hw, H, D), jnp.bfloat16)
    for Lq, name in ((15360, "deform 3lvl dense (layer1)"),
                     (3840, "deform 3lvl topk256 (layers2-4)")):
        loc = jax.random.uniform(rng, (N, Lq, H, 3, P, 2))
        aw = jax.random.uniform(rng, (N, Lq, H, 3, P), jnp.bfloat16)
        chained_time(name,
                     lambda v, l, a: deform_sample_corner(v, SHAPES, l, a),
                     value, loc, aw)

    # full model with sampling stubbed (rest-of-model)
    import mvgformer_tpu.ops.projattn as pm
    real = pm.deform_sample_corner

    def fake(value, shapes, loc, aw):
        N_, _, H_, D_ = value.shape
        return (jnp.zeros((N_, loc.shape[1], H_ * D_), value.dtype)
                + jnp.sum(value) * 0 + jnp.sum(loc).astype(value.dtype) * 0
                + jnp.sum(aw) * 0)

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
        pm.deform_sample_corner = real

    # geometry pieces at layer shapes
    B, V = 1, 5
    pts = jax.random.normal(rng, (B, V, 15360, 3)) * 100.0
    cams = batch.view_data.cameras
    chained_time("project_points dense (B,V,15360)",
                 lambda p, c: project_points(p, c), pts, cams)
    pts_c = jax.random.normal(rng, (B, V, 3840, 3)) * 100.0
    chained_time("project_points topk (B,V,3840)",
                 lambda p, c: project_points(p, c), pts_c, cams)
    p2d = jax.random.uniform(rng, (B, V, 3840, 2)) * 500.0
    chained_time("undistort_points topk (B,V,3840)",
                 lambda p, c: undistort_points(p, c), p2d, cams)

    P_mats = jnp.broadcast_to(projection_matrices(cams)[:, None],
                              (B, 3840, V, 3, 4))
    pts2d = jax.random.uniform(rng, (B, 3840, V, 2)) * 500.0
    conf = jnp.ones((B, 3840, V))
    chained_time("triangulate_dlt jacobi topk (3840)",
                 lambda p2, P_, c: triangulate_dlt(P_, p2, c,
                                                   solver="jacobi"),
                 pts2d, P_mats, conf)


if __name__ == "__main__":
    main()
