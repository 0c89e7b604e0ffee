"""Training entry point (reference: /root/reference/run/train_3d.py).

Single program for 1..N chips: the jit-compiled train step is sharded over a
data-parallel mesh (replacing torchrun+DDP); eval runs per-epoch with NMS +
AP/MPJPE tables; checkpoints via orbax with best-model tracking.

Usage:
    python run/train.py --cfg configs/panoptic/knn5-lr4-q1024-g8.yaml \
        [KEY.SUBKEY=value ...]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def parse_args():
    parser = argparse.ArgumentParser(description="Train MVGFormer-TPU")
    parser.add_argument("--cfg", required=True, help="experiment yaml")
    parser.add_argument("--max_steps", type=int, default=None,
                        help="optional step cap (smoke runs)")
    args, overrides = parser.parse_known_args()
    return args, overrides


def main():
    import jax

    # honored before first backend use; unlike the JAX_PLATFORMS env var,
    # this cannot be rewritten by the environment's sitecustomize
    if os.environ.get("MVGFORMER_FORCE_PLATFORM"):
        jax.config.update("jax_platforms",
                          os.environ["MVGFORMER_FORCE_PLATFORM"])
    import numpy as np

    from mvgformer_tpu.config import load_config
    from mvgformer_tpu.core.criterion import match_queries
    from mvgformer_tpu.core.nms import apply_pose_nms
    from mvgformer_tpu.core.train import (create_train_state,
                                          make_eval_step, make_train_step)
    from mvgformer_tpu.data.datasets import get_dataset
    from mvgformer_tpu.data.prefetch import Prefetcher
    from mvgformer_tpu.models import build_model
    from mvgformer_tpu.parallel import make_mesh, shard_batch
    from mvgformer_tpu.utils.checkpoint import (PreemptionGuard,
                                                load_backbone_pretrained,
                                                load_checkpoint,
                                                save_checkpoint)
    from mvgformer_tpu.utils.logging import (create_logger, ExperimentTracker,
                                             MetricLogger)

    args, overrides = parse_args()
    cfg = load_config(args.cfg, overrides)
    logger, out_dir = create_logger(cfg, args.cfg, phase="train")
    logger.info("devices: %s", jax.devices())
    # JSONL experiment tracking (capability parity with the reference's
    # wandb summary metrics + per-iter dicts, run/train_3d.py:172-182)
    import dataclasses as _dc

    tracker = ExperimentTracker(out_dir, run_name=os.path.basename(args.cfg),
                                config=_dc.asdict(cfg))

    train_ds = get_dataset(cfg, cfg.DATASET.TRAIN_SUBSET, is_train=True)
    test_ds = get_dataset(cfg, cfg.DATASET.TEST_SUBSET, is_train=False)
    logger.info("train frames: %d, test frames: %d",
                len(train_ds), len(test_ds))

    # PARALLEL.DATA caps the data-parallel axis (-1 = all devices)
    n_dev = (jax.device_count() if cfg.PARALLEL.DATA <= 0
             else min(cfg.PARALLEL.DATA, jax.device_count()))
    global_batch = cfg.TRAIN.BATCH_SIZE * n_dev
    steps_per_epoch = max(len(train_ds) // global_batch, 1)

    # TRANSFORMER dispatch: dq_transformer (MVGFormer) or the MvP baseline
    # (reference run/train_3d.py:245-250)
    model = build_model(cfg)
    mesh = make_mesh(n_dev)
    rng = jax.random.PRNGKey(cfg.TRAIN.SEED)

    init_batch = train_ds.load_batch(list(range(global_batch))
                                     if len(train_ds) >= global_batch
                                     else [0] * global_batch)
    state, tx = create_train_state(cfg, model, init_batch, rng,
                                   steps_per_epoch=steps_per_epoch)
    if cfg.NETWORK.PRETRAINED_BACKBONE:
        variables = load_backbone_pretrained(
            cfg.NETWORK.PRETRAINED_BACKBONE,
            {"params": state.params, "batch_stats": state.batch_stats})
        state = state.replace(params=variables["params"],
                              batch_stats=variables["batch_stats"])
        logger.info("loaded pretrained backbone %s",
                    cfg.NETWORK.PRETRAINED_BACKBONE)

    if cfg.TRAIN.FINETUNE_MODEL:
        # weights-only init for finetuning (run/train_3d.py:268-271, e.g.
        # the shelf/campus finetune recipes); epoch/optimizer start fresh
        if cfg.TRAIN.FINETUNE_MODEL.endswith((".pth", ".tar")):
            from mvgformer_tpu.utils.torch_convert import \
                load_torch_checkpoint

            ft = load_torch_checkpoint(cfg.TRAIN.FINETUNE_MODEL, cfg)
        else:
            from mvgformer_tpu.utils.checkpoint import \
                load_params_checkpoint

            restored = load_params_checkpoint(cfg.TRAIN.FINETUNE_MODEL)
            if restored is None:
                raise FileNotFoundError(cfg.TRAIN.FINETUNE_MODEL)
            ft = restored[0]
        state = state.replace(params=ft["params"],
                              batch_stats=ft["batch_stats"])
        logger.info("finetuning from %s", cfg.TRAIN.FINETUNE_MODEL)

    ckpt_dir = os.path.join(out_dir, "checkpoints")
    begin_epoch = cfg.TRAIN.BEGIN_EPOCH
    best_precision = 0.0
    if cfg.TRAIN.RESUME:
        restored = load_checkpoint(ckpt_dir, state)
        if restored is not None:
            state, begin_epoch, best_precision = restored
            logger.info("resumed from epoch %d", begin_epoch)

    train_step = make_train_step(cfg, model, tx, num_replicas=n_dev)
    # eval uses its own batch size (reference's separate test loader) and
    # the same windowed-sampling plan the validate CLI would use
    eval_batch = max(cfg.TEST.BATCH_SIZE // n_dev, 1) * n_dev
    window_plan = None
    if cfg.DECODER.layer1_windowed_sampling:
        from mvgformer_tpu.models.mvgformer import build_layer1_window_plan

        window_plan = build_layer1_window_plan(
            cfg, test_ds.load_batch([0], load_images=False).view_data,
            tile=cfg.DECODER.layer1_window_tile,
            halo=cfg.DECODER.layer1_window_halo)
    # one eval step per configured confidence threshold (the reference
    # validates per threshold each epoch, run/train_3d.py:310-314); jit is
    # lazy, so unused thresholds never compile
    eval_steps = {thr: make_eval_step(cfg, model, threshold=thr,
                                      window_plan=window_plan)
                  for thr in cfg.DECODER.inference_conf_thr}
    eval_loss_step = None
    if cfg.DEBUG.LOG_VAL_LOSS:
        from mvgformer_tpu.core.train import make_eval_loss_step

        eval_loss_step = make_eval_loss_step(
            cfg, model, threshold=cfg.DECODER.inference_conf_thr[0],
            window_plan=window_plan)

    guard = PreemptionGuard()
    total_steps = 0
    for epoch in range(begin_epoch, cfg.TRAIN.END_EPOCH):
        meter = MetricLogger()
        t_epoch = time.time()
        # background prefetch: image load + warp + sharded device_put run
        # on a producer thread, double-buffered, overlapping the step
        # (replaces DataLoader workers, run/train_3d.py:216-238)
        loader = Prefetcher(
            train_ds.batches(global_batch, shuffle=cfg.TRAIN.SHUFFLE,
                             seed=cfg.TRAIN.SEED + epoch),
            place_fn=lambda b: shard_batch(b, mesh))
        for step, (idx, batch) in enumerate(loader):
            rng, sub = jax.random.split(rng)
            state, metrics = train_step(state, batch, sub)
            meter.update({k: float(v) for k, v in metrics.items()})
            meter.update({"data_wait_s": loader.last_wait_s})
            total_steps += 1
            if step % cfg.PRINT_FREQ == 0:
                logger.info("epoch %d step %d | %s", epoch, step,
                            meter.format())
                tracker.log({k: m.avg for k, m in meter.meters.items()},
                            step=total_steps, epoch=epoch, prefix="train/")
            if args.max_steps and total_steps >= args.max_steps:
                break
            if guard.should_stop:
                logger.info("preemption requested; checkpointing epoch %d",
                            epoch)
                # mid-epoch save: resume re-runs this epoch
                save_checkpoint(ckpt_dir, state, epoch, best_precision,
                                next_epoch=epoch)
                return

        logger.info("epoch %d done in %.1fs | %s", epoch,
                    time.time() - t_epoch, meter.format())
        # device-memory observability (the reference logs
        # cuda.memory_allocated per print block, lib/core/function.py:191)
        mem = jax.local_devices()[0].memory_stats() or {}
        if "bytes_in_use" in mem:
            logger.info("device memory: %.2f / %.2f GiB in use",
                        mem["bytes_in_use"] / 2 ** 30,
                        mem.get("bytes_limit", 0) / 2 ** 30)

        # a preemption during eval would lose the whole trained epoch:
        # checkpoint the finished epoch first if we're asked to stop
        if guard.should_stop:
            logger.info("preemption requested post-epoch; checkpointing")
            save_checkpoint(ckpt_dir, state, epoch, best_precision,
                            next_epoch=epoch + 1)
            return

        # ---- per-epoch eval, one pass per confidence threshold
        # (run/train_3d.py:309-399; best precision is cumulative across
        # thresholds like the reference's in-loop checkpoint updates)
        precision = 0.0
        val_loss_meter = MetricLogger() if eval_loss_step else None
        for thr, eval_step in eval_steps.items():
            preds = []
            for idx, batch in Prefetcher(
                    test_ds.batches(eval_batch, shuffle=False,
                                    drop_last=False),
                    place_fn=lambda b: shard_batch(b, mesh)):
                pred = np.asarray(eval_step(state.params, state.batch_stats,
                                            batch))
                if val_loss_meter is not None and thr == next(
                        iter(eval_steps)):
                    # DEBUG.LOG_VAL_LOSS (lib/core/function.py:413-576):
                    # criterion on eval batches, logged once per epoch
                    vl = eval_loss_step(state.params, state.batch_stats,
                                        batch)
                    val_loss_meter.update(
                        {k: float(v) for k, v in vl.items()})
                for b, frame_idx in enumerate(idx):
                    if len(preds) <= frame_idx:
                        preds.extend([None] * (frame_idx + 1 - len(preds)))
                    preds[frame_idx] = pred[b]
            preds = [p for p in preds if p is not None]
            nmsed = [apply_pose_nms(p) for p in preds]
            metrics = test_ds.evaluate(nmsed)
            if isinstance(metrics, dict):
                logger.info("eval epoch %d thr %s: %s", epoch, thr, {
                    k: round(v, 4) for k, v in metrics.items()})
                precision = max(precision, metrics.get("ap@25", 0.0))
                tracker.log(metrics, epoch=epoch, prefix="eval/")
            else:  # PCP datasets
                actor_pcp, avg_pcp, _, recall = metrics
                logger.info(
                    "eval epoch %d thr %s: PCP %s avg %.4f recall %.4f",
                    epoch, thr, actor_pcp, avg_pcp, recall)
                precision = max(precision, avg_pcp)
                tracker.log({"pcp_avg": avg_pcp}, epoch=epoch,
                            prefix="eval/")
        if val_loss_meter is not None and val_loss_meter.meters:
            logger.info("val loss epoch %d | %s", epoch,
                        val_loss_meter.format())
            tracker.log({k: m.avg for k, m in val_loss_meter.meters.items()},
                        epoch=epoch, prefix="val_loss/")

        is_best = precision > best_precision
        best_precision = max(best_precision, precision)
        # store the BEST precision (the reference's 'precision':
        # best_precision) so a resumed run can't overwrite a better best/
        # checkpoint, and epoch+1 as the resume point
        save_checkpoint(ckpt_dir, state, epoch, best_precision, is_best,
                        next_epoch=epoch + 1)
        if args.max_steps and total_steps >= args.max_steps:
            break

    logger.info("done; best precision %.4f", best_precision)


if __name__ == "__main__":
    main()
