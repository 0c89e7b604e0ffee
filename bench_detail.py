"""Detailed benchmark: throughput across inference configurations.

Prints one JSON line per configuration (the driver-facing single-line
summary stays in bench.py). Timing uses the chained-scan protocol (see
bench.py / PERF.md "measurement traps"): ITERS eval steps run device-side
with a data dependency between them, one host readback at the end, so the
~30 ms relay round-trip is amortized instead of inflating every frame.
"""

import dataclasses
import json
import time

ITERS = 20


def run_config(name, batch_size=1, topk=None, solver="linalg",
               windowed=False, offset_clamp=None, window_impl="xla",
               point_topm=None):
    import jax
    import jax.numpy as jnp

    from mvgformer_tpu.config import load_config
    from mvgformer_tpu.data.synthetic import make_batch
    from mvgformer_tpu.models.mvgformer import MVGFormer

    cfg = load_config()
    cfg.DECODER.num_instance = 1024
    cfg.DATASET.CAMERA_NUM = 5
    cfg.NETWORK.IMAGE_SIZE = [960, 512]
    cfg.DECODER.inference_topk_queries = topk
    cfg.DECODER.triangulation_method = solver
    cfg.DECODER.layer1_offset_clamp = offset_clamp
    cfg.DECODER.layer1_window_impl = window_impl
    cfg.DECODER.inference_point_topm = point_topm

    threshold = 0.1
    model = MVGFormer(cfg=cfg)
    batch = make_batch(cfg, batch_size=batch_size, seed=0, num_people=3)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    window_plan = None
    if windowed:
        from mvgformer_tpu.models.mvgformer import build_layer1_window_plan

        window_plan = build_layer1_window_plan(cfg, batch.view_data)

    @jax.jit
    def chained(params, batch_stats, batch):
        def body(eps, _):
            b = dataclasses.replace(batch, views=batch.views + eps)
            outs = model.apply({"params": params,
                                "batch_stats": batch_stats},
                               b, threshold=threshold,
                               window_plan=window_plan)
            return (jnp.sum(outs[-1]["pred_poses"]).astype(jnp.float32)
                    * 0.0, None)

        eps, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return eps

    args = (variables["params"], variables["batch_stats"], batch)
    float(chained(*args))
    start = time.perf_counter()
    float(chained(*args))
    fps = batch_size * ITERS / (time.perf_counter() - start)
    print(json.dumps({"config": name, "fps_per_chip": round(fps, 3)}),
          flush=True)
    return fps


def run_train_config(name, batch_size=1, solver="linalg", iters=5,
                     sample_chunks=None):
    """Training-step throughput (steps/s/chip) at the flagship training
    config: gt_match dense path, all decoder layers, criterion, backward,
    clipped Adam. Chained via lax.scan with the TrainState as carry (the
    state dependency makes iterations sequential; one readback)."""
    import jax
    import jax.numpy as jnp

    from mvgformer_tpu.config import load_config
    from mvgformer_tpu.core.train import create_train_state, make_train_step
    from mvgformer_tpu.data.synthetic import make_batch
    from mvgformer_tpu.models.mvgformer import MVGFormer

    cfg = load_config()
    cfg.DECODER.num_instance = 1024
    cfg.DATASET.CAMERA_NUM = 5
    cfg.NETWORK.IMAGE_SIZE = [960, 512]
    cfg.DECODER.gt_match = True
    cfg.DECODER.triangulation_method = solver
    cfg.TRAIN.SAMPLE_CHUNKS = sample_chunks

    model = MVGFormer(cfg=cfg)
    batch = make_batch(cfg, batch_size=batch_size, seed=0, num_people=3)
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
                                       length=iters)
        return jnp.sum(totals)

    rng = jax.random.PRNGKey(1)
    float(chained(state, batch, rng))
    start = time.perf_counter()
    float(chained(state, batch, rng))
    sps = iters / (time.perf_counter() - start)
    print(json.dumps({"config": name,
                      "train_steps_per_sec_per_chip": round(sps, 4),
                      "frames_per_sec_per_chip": round(sps * batch_size,
                                                       4)}),
          flush=True)
    return sps


def main(only=None):
    def want(name):
        return only is None or any(s in name for s in only)

    jobs = [
        ("topk128_jacobi_b1", lambda: run_config(
            "topk128_jacobi_b1", topk=128, solver="jacobi")),
        ("topk256_jacobi_b1", lambda: run_config(
            "topk256_jacobi_b1", topk=256, solver="jacobi")),
        ("topk256_svd_b1", lambda: run_config(
            "topk256_svd_b1", topk=256, solver="linalg")),
        ("dense_jacobi_windowed_b1", lambda: run_config(
            "dense_jacobi_windowed_b1", topk=None, solver="jacobi",
            windowed=True)),
        ("dense_jacobi_b1", lambda: run_config(
            "dense_jacobi_b1", topk=None, solver="jacobi")),
        ("topk256_jacobi_b2", lambda: run_config(
            "topk256_jacobi_b2", batch_size=2, topk=256,
            solver="jacobi")),
        ("train_gtmatch_linalg_b1", lambda: run_train_config(
            "train_gtmatch_linalg_b1", solver="linalg")),
        # training-solver lever (VERDICT r2 item 4): svd costs ~23
        # ms/layer fwd and more in the VJP; AP effect measured on the
        # synthetic harness (tools/ap_ablation.py train_solver mode)
        ("train_gtmatch_jacobi_b1", lambda: run_train_config(
            "train_gtmatch_jacobi_b1", solver="jacobi")),
        ("train_gtmatch_eigh_b1", lambda: run_train_config(
            "train_gtmatch_eigh_b1", solver="eigh")),
        # TRAIN.SAMPLE_CHUNKS: query-chunked remat gather divides the
        # backward's gathered-rows HBM peak (the batch-2 blocker,
        # PERF.md "training wall-clock budget") by `chunks`
        ("train_gtmatch_jacobi_b1_chunk8", lambda: run_train_config(
            "train_gtmatch_jacobi_b1_chunk8", solver="jacobi",
            sample_chunks=8)),
        ("train_gtmatch_jacobi_b2_chunk8", lambda: run_train_config(
            "train_gtmatch_jacobi_b2_chunk8", batch_size=2,
            solver="jacobi", sample_chunks=8)),
        ("train_gtmatch_jacobi_b2", lambda: run_train_config(
            "train_gtmatch_jacobi_b2", batch_size=2, solver="jacobi")),
    ]
    # semantics-changing clamped-offset windows (AP cost measured by
    # tools/ap_ablation.py; PERF.md "clamped-offset windows")
    # pallas_dma = window-DMA kernel (ops/window_dma.py): windows DMA'd
    # straight from the padded map, no tile materialization
    for clamp, impl in ((4.0, "xla"), (2.0, "xla"),
                        (4.0, "pallas"), (2.0, "pallas"),
                        (4.0, "pallas_dma"), (2.0, "pallas_dma")):
        name = f"topk128_jacobi_winclamp{int(clamp)}_{impl}_b1"
        jobs.append((name, lambda n=name, c=clamp, i=impl: run_config(
            n, topk=128, solver="jacobi", windowed=True,
            offset_clamp=c, window_impl=i)))
    jobs.append(("topk128_jacobi_clamp4_gather_b1", lambda: run_config(
        "topk128_jacobi_clamp4_gather_b1", topk=128, solver="jacobi",
        offset_clamp=4.0)))
    # semantics-changing point sparsification: top-m of P=8 attention
    # points per (query, head, level), renormalized — gather rows (the
    # measured wall) scale m/8 in every layer (AP cost: ap_ablation rows)
    for m in (4, 2):
        for topk in (128, 64):
            name = f"topk{topk}_jacobi_ptop{m}_b1"
            jobs.append((name, lambda n=name, m_=m, t=topk: run_config(
                n, topk=t, solver="jacobi", point_topm=m_)))
    jobs.append(("topk64_jacobi_b1", lambda: run_config(
        "topk64_jacobi_b1", topk=64, solver="jacobi")))
    jobs.append(("topk64_jacobi_b2", lambda: run_config(
        "topk64_jacobi_b2", batch_size=2, topk=64, solver="jacobi")))
    jobs.append(("topk64_jacobi_b4", lambda: run_config(
        "topk64_jacobi_b4", batch_size=4, topk=64, solver="jacobi")))

    for name, fn in jobs:
        if want(name):
            # fail soft: a config that cannot compile (e.g. the
            # winclamp pallas_dma rows overflow Mosaic SMEM at flagship
            # scale, perf/bench_rows_r04.jsonl) must not kill the rest
            # of the matrix. NOTE a Mosaic compiler fault can still
            # wedge the TPU worker for ~1 min (PERF.md "measurement
            # traps"); subsequent rows may need that recovery window.
            try:
                fn()
            except Exception as e:  # noqa: BLE001 - report-and-continue
                msg = str(e).split("\n", 1)[0][:300]
                print(json.dumps({"config": name, "error": msg}),
                      flush=True)


if __name__ == "__main__":
    import sys

    main(only=sys.argv[1:] or None)
