"""Stage-level timing at the production config (run on the real TPU).

Times each jitted sub-component with honest host readbacks so we know where
the remaining frame time lives (PERF.md's breakdown predates compaction).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..', '..'))

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - start) / iters
    print(f"{name:40s} {dt * 1000:8.1f} ms", flush=True)
    return dt


def main():
    from mvgformer_tpu.config import load_config
    from mvgformer_tpu.core.train import make_eval_step
    from mvgformer_tpu.data.synthetic import make_batch
    from mvgformer_tpu.models.mvgformer import MVGFormer
    from mvgformer_tpu.models.pose_resnet import PoseResNet
    from mvgformer_tpu.ops.sampling import deform_sample_corner

    cfg = load_config()
    cfg.DECODER.num_instance = 1024
    cfg.DATASET.CAMERA_NUM = 5
    cfg.NETWORK.IMAGE_SIZE = [960, 512]
    cfg.DECODER.inference_topk_queries = 256

    rng = jax.random.PRNGKey(0)

    # --- backbone alone (5 views, 512x960) ---
    bb = PoseResNet(dtype=jnp.bfloat16)
    imgs = jnp.zeros((5, 512, 960, 3), jnp.float32)
    bvars = jax.jit(bb.init)(rng, imgs)
    bb_apply = jax.jit(lambda p, x: bb.apply(p, x))
    timeit("backbone (5 views)", lambda: bb_apply(bvars, imgs))

    # --- deformable sampling, dense layer-1 shapes ---
    N, H, D, P = 5, 8, 32, 8
    h, w = 128, 240
    Lq_dense = 1024 * 15
    Lq_topk = 256 * 15
    value = jax.random.normal(rng, (N, h * w, H, D), jnp.float32)

    def samp(Lq, name):
        loc = jax.random.uniform(rng, (N, Lq, H, 1, P, 2))
        aw = jax.random.uniform(rng, (N, Lq, H, 1, P))
        f = jax.jit(lambda v, l, a: deform_sample_corner(
            v, ((h, w),), l, a))
        timeit(name, lambda: f(value, loc, aw))

    samp(Lq_dense, "deform_sample dense (15360 q)")
    samp(Lq_topk, "deform_sample topk256 (3840 q)")

    # --- full model with sampling stubbed to zeros (everything-but-gather)
    t_full = 0.5531  # measured above in the previous run (full eval step)
    model = MVGFormer(cfg=cfg)
    batch = make_batch(cfg, batch_size=1, seed=0, num_people=3)
    variables = jax.jit(model.init)(rng, batch)
    import mvgformer_tpu.ops.projattn as projattn_mod
    real = projattn_mod.deform_sample_corner

    def fake(value, shapes, loc, aw):
        N_, _, H_, D_ = value.shape
        Lq_ = loc.shape[1]
        return (jnp.zeros((N_, Lq_, H_ * D_), value.dtype)
                + jnp.sum(value) * 0 + jnp.sum(loc) * 0 + jnp.sum(aw) * 0)

    projattn_mod.deform_sample_corner = fake
    try:
        model2 = MVGFormer(cfg=cfg)
        step2 = make_eval_step(cfg, model2, threshold=0.1)
        t_nog = timeit("full step, sampling stubbed", lambda: step2(
            variables["params"], variables["batch_stats"], batch))
    finally:
        projattn_mod.deform_sample_corner = real
    print(f"{'=> gather share':40s} {(t_full - t_nog) * 1000:8.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
