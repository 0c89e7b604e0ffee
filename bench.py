"""Benchmark: flagship-model multi-view inference throughput per chip.

Runs the full MVGFormer forward (PoseResNet-50 on 5x 512x960 views, 1024
queries x 15 joints, 4 decoder layers with dense triangulation) on the
available accelerator and reports frames/sec/chip, where one "frame" is one
multi-view sample (5 views), matching the reference's per-frame eval loop
(/root/reference/lib/core/function.py:363-396).

Baseline: the reference publishes no throughput numbers (SURVEY.md §6); the
denominator below is an estimate of the torch reference's A100 per-GPU
inference rate at this setting, derived in BASELINE.md "A100
reference-throughput estimate" from (a) a measured CPU run of the reference
model in this environment (output/bench_reference_torch.py) and (b) a
per-stage roofline accounting of its op mix on A100 specs; documented
bounds [10, 50] fps, point estimate 25. vs_baseline therefore reads as
"estimated speedup over the A100 torch reference"; the BASELINE.json
throughput gate is vs_baseline >= 5. (Round 1 used an undocumented 10.0
here - rescale by 10/25 to compare vs_baseline across rounds.)
"""

import json
import time

A100_REFERENCE_FPS_ESTIMATE = 25.0


def main():
    import jax

    from mvgformer_tpu.config import load_config
    from mvgformer_tpu.data.synthetic import make_batch
    from mvgformer_tpu.models.mvgformer import MVGFormer

    cfg = load_config()
    cfg.DECODER.num_instance = 1024
    cfg.DATASET.CAMERA_NUM = 5
    cfg.NETWORK.IMAGE_SIZE = [960, 512]
    # inference fast path: layers 2-4 run on the top-64 person queries by
    # layer-1 score (vs max ~10 people in Panoptic scenes, a 6.4x margin);
    # kept queries are bit-identical to the dense run
    # (tests/test_model.py). K=64 is AP-validated by the synthetic
    # ablation (perf/ap_ablation_results.jsonl, PERF.md "Synthetic
    # AP/MPJPE ablation": jacobi_k64 212.2 mm / recall 0.908 vs k128
    # 223.7 mm / 0.850 — within or better than the noise band), and
    # measured 8.89 fps vs 7.97 at K=128 (2026-08-19). NOTE: this and
    # the ptop4 approval below are PROXY-GRADE evidence (synthetic
    # 48-frame eval at ~210-260 mm absolute MPJPE — blind to <=25 mm
    # degradations); re-judge both with tools/verify_checkpoint.py when
    # real Panoptic data + a released checkpoint are available.
    cfg.DECODER.inference_topk_queries = 64
    # point-top-m=4: keep the top-4 of P=8 attention points per (query,
    # head, level), renormalized — halves the gather rows in every layer.
    # AP-approved (jacobi_k64_ptop4: 219.4 mm / recall 0.925, the table's
    # "headline rule" winner). It first measured fps-NEGATIVE (6.62) —
    # the selection's take_along_axis indirection was itself a 127 ms
    # tiny-slice gather; replaced with a one-hot einsum (~1.8 ms, pure
    # VPU math, tools/probes/probe_ptop_indirection.py) it benches
    # 10.42 fps vs 8.97 without (v5e 2026-08-19).
    cfg.DECODER.inference_point_topm = 4
    # scalarized fixed-sweep Jacobi null-vector solver: ~1.5 ms vs 23 ms
    # (SVD) / 17 ms (XLA eigh) per layer at these shapes; agrees with the
    # SVD solution to ~1e-4 on the unit null vector (PERF.md)
    cfg.DECODER.triangulation_method = "jacobi"

    batch_size = 1
    model = MVGFormer(cfg=cfg)
    batch = make_batch(cfg, batch_size=batch_size, seed=0, num_people=3)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    # Timing protocol: the environment's remote-TPU relay (a) lets
    # block_until_ready return early and (b) adds a ~30 ms round-trip to
    # every host readback. So the device runs ITERS *chained* eval steps
    # inside one program (a lax.scan whose carry feeds a zero derived from
    # step i's prediction into step i+1's input, forcing sequential
    # execution and defeating CSE/DCE) and the single final readback pays
    # the relay cost once.
    import dataclasses

    import jax.numpy as jnp

    iters = 20
    threshold = 0.1

    @jax.jit
    def chained(params, batch_stats, batch):
        def body(eps, _):
            b = dataclasses.replace(batch,
                                    views=batch.views + eps)
            outs = model.apply({"params": params,
                                "batch_stats": batch_stats},
                               b, threshold=threshold)
            out = outs[-1]
            B, Q = out["pred_logits"].shape[:2]
            poses = out["pred_poses"].reshape(B, Q, -1, 3)
            J = poses.shape[2]
            score = jax.nn.sigmoid(out["pred_logits"][:, :, 1:2])
            score = jnp.broadcast_to(score[:, :, None], (B, Q, J, 1))
            flag = (score > threshold).astype(poses.dtype) - 1.0
            pred = jnp.concatenate([poses, flag, score], axis=-1)
            # *0.0 is not constant-foldable for floats (NaN semantics),
            # so the data dependency survives compilation
            return jnp.sum(pred) * 0.0, None

        eps, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return eps

    args = (variables["params"], variables["batch_stats"], batch)
    float(chained(*args))  # compile + warmup

    start = time.perf_counter()
    float(chained(*args))
    elapsed = time.perf_counter() - start

    fps = batch_size * iters / elapsed
    print(json.dumps({
        "metric": "panoptic_5view_inference_fps_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / A100_REFERENCE_FPS_ESTIMATE, 3),
    }))


if __name__ == "__main__":
    main()
