"""Locate the AP-ablation proxy's train-step slowdown (2026-08-17).

The flagship training config (960x512, d_model 256, frozen backbone,
svd solver) steps at ~2.16 s; the ablation proxy (480x256, d_model 128,
TRAIN_BACKBONE, jacobi) measured ~21 s/step inside run/train.py. This
probe times the jitted train step for the proxy config across the knobs
that differ, chained-scan protocol (PERF.md measurement traps).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probes/probe_proxy_train_step.py
"""

import json
import time

import jax
import jax.numpy as jnp

from mvgformer_tpu.config import load_config
from mvgformer_tpu.core.train import create_train_state, make_train_step
from mvgformer_tpu.data.synthetic import make_batch
from mvgformer_tpu.models.mvgformer import MVGFormer

CFG = "/root/repo/configs/synthetic_ap_ablation.yaml"
ITERS = 4


def timed(name, **overrides):
    cfg = load_config(CFG)
    for k, v in overrides.items():
        obj = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            obj = getattr(obj, p)
        setattr(obj, parts[-1], v)

    model = MVGFormer(cfg=cfg)
    batch = make_batch(cfg, batch_size=1, seed=0, num_people=3,
                       cam_seed=0, render=False)
    t0 = time.time()
    state, tx = create_train_state(cfg, model, batch, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, model, tx, donate=False)

    @jax.jit
    def chained(state, batch, rng):
        def body(carry, _):
            st, r = carry
            r, sub = jax.random.split(r)
            st, metrics = step_fn(st, batch, sub)
            return (st, r), metrics["total"]

        (st, _), totals = jax.lax.scan(body, (state, rng), None,
                                       length=ITERS)
        return jnp.sum(totals)

    rng = jax.random.PRNGKey(1)
    total = float(chained(state, batch, rng))
    compile_s = time.time() - t0
    t0 = time.time()
    total = float(chained(state, batch, rng))
    sps = ITERS / (time.time() - t0)
    print(json.dumps({"config": name, "steps_per_sec": round(sps, 4),
                      "sec_per_step": round(1.0 / sps, 3),
                      "compile_s": round(compile_s, 1),
                      "total": round(total, 1)}), flush=True)


if __name__ == "__main__":
    timed("proxy_as_configured")
    timed("proxy_frozen_backbone", **{"TRAIN.TRAIN_BACKBONE": False})
    timed("proxy_linalg", **{"DECODER.triangulation_method": "linalg"})
    timed("proxy_no_skipnonfinite", **{"TRAIN.SKIP_NONFINITE": False})
