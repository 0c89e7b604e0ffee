"""Detailed benchmark: throughput across inference configurations.

Prints one JSON line per configuration (the driver-facing single-line
summary stays in bench.py). Timing uses per-iteration host readbacks.
"""

import json
import time


def run_config(name, batch_size=1, topk=None, solver="linalg", iters=10):
    import jax
    import jax.numpy as jnp

    from mvgformer_tpu.config import load_config
    from mvgformer_tpu.core.train import make_eval_step
    from mvgformer_tpu.data.synthetic import make_batch
    from mvgformer_tpu.models.mvgformer import MVGFormer

    cfg = load_config()
    cfg.DECODER.num_instance = 1024
    cfg.DATASET.CAMERA_NUM = 5
    cfg.NETWORK.IMAGE_SIZE = [960, 512]
    cfg.DECODER.inference_topk_queries = topk
    cfg.DECODER.triangulation_method = solver

    model = MVGFormer(cfg=cfg)
    batch = make_batch(cfg, batch_size=batch_size, seed=0, num_people=3)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    step = make_eval_step(cfg, model, threshold=0.1)

    def once():
        return float(jnp.sum(step(variables["params"],
                                  variables["batch_stats"], batch)))

    once()
    start = time.perf_counter()
    for _ in range(iters):
        once()
    fps = batch_size * iters / (time.perf_counter() - start)
    print(json.dumps({"config": name, "fps_per_chip": round(fps, 3)}),
          flush=True)
    return fps


def main():
    run_config("dense_svd_b1", batch_size=1, topk=None)
    run_config("topk256_svd_b1", batch_size=1, topk=256)
    run_config("topk256_svd_b2", batch_size=2, topk=256)
    run_config("topk256_eigh_b1", batch_size=1, topk=256, solver="eigh")


if __name__ == "__main__":
    main()
