"""Stage profiling v4 (round 4, post-K=64 headline): decompose the
111 ms frame at the CURRENT production config (topk=64 + jacobi) and
measure candidate compacted-layer sampler variants in isolation.

Hypothesis under test: at Lq=960 (K=64 x 15 joints) the per-(view,head)
unstacked gather path pays 80 gathers/layer whose ~30-90 us FIXED per-op
cost (round-2 cost model, operands >= 4 MB) dominates the ~23 us of
marginal row cost per gather — so a coarser-granularity path (batched
corner table, simple 4-gather, or single-group tables) may win for
layers 2-4 while the dense layer 1 keeps the unstacked path.
"""

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
    print(f"{name:52s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    from mvgformer_tpu.config import load_config
    from mvgformer_tpu.data.synthetic import make_batch
    from mvgformer_tpu.models.mvgformer import MVGFormer
    from mvgformer_tpu.models.pose_resnet import PoseResNet
    from mvgformer_tpu.ops import sampling as S

    cfg = load_config()
    cfg.DECODER.num_instance = 1024
    cfg.DATASET.CAMERA_NUM = 5
    cfg.NETWORK.IMAGE_SIZE = [960, 512]
    cfg.DECODER.inference_topk_queries = 64
    cfg.DECODER.triangulation_method = "jacobi"

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

    chained_time("full eval step (topk64+jacobi)", full, batch.views,
                 batch, variables)

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

    def make_inputs(Lq):
        loc = jax.random.uniform(rng, (N, Lq, H, 3, P, 2))
        aw = jax.random.uniform(rng, (N, Lq, H, 3, P), jnp.bfloat16)
        return loc, aw

    loc_d, aw_d = make_inputs(15360)
    chained_time("deform dense Lq=15360 (layer1, production)",
                 lambda v, l, a: S.deform_sample_corner(v, SHAPES, l, a),
                 value, loc_d, aw_d)

    loc_c, aw_c = make_inputs(960)
    chained_time("deform topk64 Lq=960 (production=unstacked)",
                 lambda v, l, a: S.deform_sample_corner(v, SHAPES, l, a),
                 value, loc_c, aw_c)

    # variant A: batched corner path (one take_along_axis per level over
    # the full (N,H,hw,4D) tables) — flip the unstacked threshold
    real_thresh = None

    def corner_batched(v, l, a):
        # force the batched branch via the sampling.py env knob (read at
        # trace time, like MVG_GATHER_CAP_MB)
        os.environ["MVG_FORCE_GATHER_PATH"] = "batched"
        try:
            return S.deform_sample_corner(v, SHAPES, l, a)
        finally:
            os.environ.pop("MVG_FORCE_GATHER_PATH", None)

    chained_time("deform topk64 BATCHED corner tables",
                 corner_batched, value, loc_c, aw_c)

    # variant B: simple 4-gather path (no corner tables at all)
    chained_time("deform topk64 SIMPLE 4-gather",
                 lambda v, l, a: S.deform_sample(v, SHAPES, l, a),
                 value, loc_c, aw_c)

    # variant C: unstacked but single level group (CAP=16MB)
    def corner_cap16(v, l, a):
        os.environ["MVG_GATHER_CAP_MB"] = "16"
        try:
            return S.deform_sample_corner(v, SHAPES, l, a)
        finally:
            os.environ["MVG_GATHER_CAP_MB"] = "8"

    chained_time("deform topk64 unstacked CAP=16MB (1 group)",
                 corner_cap16, value, loc_c, aw_c)

    # also measure dense variants for completeness
    chained_time("deform dense unstacked CAP=16MB (1 group)",
                 corner_cap16, value, loc_d, aw_d)

    # geometry pieces at topk64 shapes
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

    P_mats = jnp.broadcast_to(projection_matrices(cams)[:, None],
                              (B, 960, V, 3, 4))
    pts2d = jax.random.uniform(rng, (B, 960, V, 2)) * 500.0
    conf = jnp.ones((B, 960, V))
    chained_time("triangulate_dlt jacobi topk64 (960)",
                 lambda p2, P_, c: triangulate_dlt(P_, p2, c,
                                                   solver="jacobi"),
                 pts2d, P_mats, conf)


if __name__ == "__main__":
    main()
