"""Validation / inference entry point (reference: run/validate_3d.py).

Loads a checkpoint (orbax, or a converted reference .pth.tar), runs jitted
inference over the eval set for each configured confidence threshold, applies
pose NMS, and prints the AP/MPJPE (Panoptic) or PCP (Shelf/Campus) tables.

Usage:
    python run/validate.py --cfg configs/panoptic/knn5-lr4-q1024-g8.yaml \
        --model_path <orbax dir | reference .pth.tar> [KEY.SUBKEY=value ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def parse_args():
    parser = argparse.ArgumentParser(description="Validate MVGFormer-TPU")
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--model_path", default=None,
                        help="orbax checkpoint dir or reference .pth.tar")
    parser.add_argument("--model_step", type=int, default=None,
                        help="specific checkpoint step (orbax dirs only; "
                        "default = latest). Used by the AP-ablation "
                        "multi-checkpoint noise-band measurement.")
    parser.add_argument("--save_preds", default=None,
                        help="save raw predictions to this .npy")
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
    from mvgformer_tpu.core.nms import apply_pose_nms
    from mvgformer_tpu.core.train import make_eval_step
    from mvgformer_tpu.data.datasets import get_dataset
    from mvgformer_tpu.models import build_model
    from mvgformer_tpu.parallel import make_mesh, shard_batch
    from mvgformer_tpu.utils.logging import create_logger

    args, overrides = parse_args()
    cfg = load_config(args.cfg, overrides)
    logger, out_dir = create_logger(cfg, args.cfg, phase="validate")

    test_ds = get_dataset(cfg, cfg.DATASET.TEST_SUBSET, is_train=False)
    logger.info("eval frames: %d", len(test_ds))

    # TRANSFORMER dispatch (the reference's validate_3d hard-codes
    # dq_transformer, run/validate_3d.py:150; the rebuild honors the knob
    # for both stacks)
    model = build_model(cfg)
    if not args.model_path and cfg.TEST.MODEL_FILE:
        # config-specified checkpoint (the reference resolves
        # TEST.MODEL_FILE when no --model_path is given,
        # run/validate_3d.py:159-166)
        args.model_path = cfg.TEST.MODEL_FILE
        logger.info("using TEST.MODEL_FILE %s", args.model_path)
    # PARALLEL.DATA caps the data-parallel axis (-1 = all devices)
    n_dev = (jax.device_count() if cfg.PARALLEL.DATA <= 0
             else min(cfg.PARALLEL.DATA, jax.device_count()))
    mesh = make_mesh(n_dev)
    batch_size = max(cfg.TEST.BATCH_SIZE // max(n_dev, 1), 1) * n_dev

    init_batch = test_ds.load_batch([0] * batch_size, load_images=False)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), init_batch)

    if args.model_path:
        if args.model_path.endswith((".pth", ".tar", ".pth.tar")):
            from mvgformer_tpu.utils.torch_convert import \
                load_torch_checkpoint

            variables = load_torch_checkpoint(args.model_path, cfg)
            logger.info("converted torch checkpoint %s", args.model_path)
        else:
            # training checkpoints hold a full TrainState; restore
            # template-free and keep only params/batch_stats (a bare
            # variables template would fail orbax's structure check)
            from mvgformer_tpu.utils.checkpoint import \
                load_params_checkpoint

            restored = load_params_checkpoint(args.model_path,
                                              step=args.model_step)
            if restored is None:
                raise FileNotFoundError(
                    f"{args.model_path} (step={args.model_step})")
            variables = restored[0]
            logger.info("restored %s (next epoch %d)", args.model_path,
                        restored[1])

    window_plan = None
    if cfg.DECODER.layer1_windowed_sampling:
        # rig-static fast path: bucket the layer-1 sampling centers once
        # per run (threshold-independent) from the first frame's cameras
        # — no image IO needed for the plan
        from mvgformer_tpu.models.mvgformer import build_layer1_window_plan

        first = test_ds.load_batch([0], load_images=False)
        window_plan = build_layer1_window_plan(
            cfg, first.view_data,
            tile=cfg.DECODER.layer1_window_tile,
            halo=cfg.DECODER.layer1_window_halo)

    summary_rows = []
    for thr in cfg.DECODER.inference_conf_thr:
        # --- prediction cache: reload per-threshold .npy when present
        # (validate_3d.py:192-202); fresh runs always save alongside
        pred_path = os.path.join(
            out_dir, "{}-{}.npy".format(cfg.TEST.PRED_FILE or "preds", thr))
        if cfg.TEST.PRED_FILE and os.path.isfile(pred_path):
            preds = list(np.load(pred_path))
            logger.info("loaded cached preds from %s", pred_path)
        else:
            from mvgformer_tpu.data.prefetch import Prefetcher

            # surface the windowed path's escaped-weight-mass telemetry
            # (the one safety instrument for layer1_windowed_sampling;
            # sown at ops/projattn.py)
            telemetry = cfg.DECODER.layer1_windowed_sampling
            eval_step = make_eval_step(cfg, model, threshold=thr,
                                       window_plan=window_plan,
                                       with_escape_telemetry=telemetry)
            eval_loss_step = None
            if cfg.DEBUG.LOG_VAL_LOSS:
                from mvgformer_tpu.core.train import make_eval_loss_step

                eval_loss_step = make_eval_loss_step(
                    cfg, model, threshold=thr, window_plan=window_plan)
                val_losses = {}
                val_loss_batches = 0
            escaped_total = 0.0

            # debug dumps every JUMP_NUM-th frame: 3D pred-vs-gt, per-layer
            # 2D overlays, and ProjAttn attention-point overlays (the
            # reference's in-forward hooks, dq_transformer.py:613-651)
            jump = cfg.DEBUG.VISUALIZATION_JUMP_NUM
            debug_step = None
            # the debug overlays read MVGFormer's sown intermediates; the
            # MvP baseline sows none
            if jump >= 0 and cfg.TRANSFORMER == "dq_transformer":
                from mvgformer_tpu.utils.visualization import \
                    visualize_frame

                vis_dir = os.path.join(out_dir, "vis")

                @jax.jit
                def debug_step(params, batch_stats, b):
                    outs, st = model.apply(
                        {"params": params, "batch_stats": batch_stats},
                        b, threshold=thr, mutable=["intermediates"])
                    return outs, st["intermediates"]

            preds = [None] * len(test_ds)
            for idx, batch in Prefetcher(
                    test_ds.batches(batch_size, shuffle=False,
                                    drop_last=False),
                    place_fn=lambda b: shard_batch(b, mesh)):
                if telemetry:
                    pred, esc = eval_step(variables["params"],
                                          variables["batch_stats"], batch)
                    pred = np.asarray(pred)
                    escaped_total += float(esc)
                else:
                    pred = np.asarray(eval_step(variables["params"],
                                                variables["batch_stats"],
                                                batch))
                if eval_loss_step is not None:
                    vl = eval_loss_step(variables["params"],
                                        variables["batch_stats"], batch)
                    for k, v in vl.items():
                        val_losses[k] = val_losses.get(k, 0.0) + float(v)
                    val_loss_batches += 1
                dbg = None  # the debug forward runs at most once per batch
                for b, frame_idx in enumerate(idx):
                    preds[frame_idx] = pred[b]
                    if (debug_step is not None
                            and frame_idx % max(jump, 1) == 0):
                        if dbg is None:
                            outs, inter = debug_step(
                                variables["params"],
                                variables["batch_stats"], batch)
                            dbg = (jax.device_get(outs),
                                   jax.device_get(inter))
                        host_batch = jax.device_get(batch)
                        visualize_frame(
                            vis_dir, frame_idx, host_batch,
                            pred[b], layer_outputs=dbg[0],
                            intermediates=dbg[1], batch_index=b)
                        if cfg.DEBUG.DEBUG:
                            # DEBUG.DEBUG additionally saves the
                            # reference's exotic debug artifacts
                            # (vis.py:683-837): the per-sample 3D grid,
                            # root-cube scatter, and the epipolar
                            # offline pickle
                            from mvgformer_tpu.utils.visualization import (
                                save_debug_3d_cubes, save_debug_3d_images,
                                save_debug_epipolar_dump)

                            prefix = os.path.join(
                                vis_dir, f"frame{frame_idx}")
                            save_debug_3d_images(
                                cfg, host_batch, pred, prefix)
                            save_debug_3d_cubes(
                                cfg, host_batch,
                                pred[:, :, cfg.DATASET.ROOTIDX, :4],
                                prefix)
                            save_debug_epipolar_dump(
                                host_batch, prefix, batch_index=b)
            preds = [p for p in preds if p is not None]
            np.save(pred_path, np.stack(preds))
            logger.info("saved preds to %s", pred_path)
            if telemetry:
                logger.info(
                    "windowed-sampling escaped weight mass: %.6g over %d "
                    "frames (%.3g/frame; >0 means ON-MAP samples left "
                    "their halo and read zero — raise layer1_window_halo "
                    "or set layer1_offset_clamp)", escaped_total,
                    len(preds), escaped_total / max(len(preds), 1))
            if eval_loss_step is not None and val_loss_batches:
                logger.info("val loss thr=%s  %s", thr, {
                    k: round(v / val_loss_batches, 5)
                    for k, v in sorted(val_losses.items())})
        if args.save_preds:
            # one file per threshold — a fixed name would leave only the
            # last threshold's predictions
            root, ext = os.path.splitext(args.save_preds)
            np.save(f"{root}-{thr}{ext or '.npy'}", np.stack(preds))

        nmsed = [apply_pose_nms(p) for p in preds]
        metrics = test_ds.evaluate(nmsed)
        if isinstance(metrics, dict):
            logger.info("thr=%s  %s", thr,
                        {k: round(v, 4) for k, v in metrics.items()})
            summary_rows.append(
                [thr] + [float(metrics.get(k, 0.0))
                         for k in ("ap@25", "ap@50", "ap@100", "ap@150",
                                   "recall@25", "mpjpe", "recall@500")])

            # --- NMS operating-point grid search
            # (validate_3d.py:218-241; full grid under NMS_DETAIL_ALL)
            if cfg.DATASET.NMS_DETAIL:
                if cfg.DATASET.NMS_DETAIL_ALL:
                    dist_thrs = [0.01, 0.03, 0.05, 0.06, 0.07, 0.08, 0.09,
                                 0.1, 0.2, 0.3, 0.4, 0.5, 0.8]
                    nearby_thrs = [3, 4, 5, 6, 7, 8, 9, 10, 13]
                else:
                    dist_thrs = [0.3]
                    nearby_thrs = [7]
                for d in dist_thrs:
                    for nb in nearby_thrs:
                        if (d, nb) == (0.3, 7):
                            m = metrics  # already computed above
                        else:
                            m = test_ds.evaluate(
                                [apply_pose_nms(p, d, nb) for p in preds])
                        logger.info(
                            "nms dist=%.2f nearby=%d  ap25=%.4f "
                            "ap100=%.4f mpjpe=%.2f recall@500=%.4f",
                            d, nb, m.get("ap@25", 0.0), m.get("ap@100", 0.0),
                            m.get("mpjpe", 0.0), m.get("recall@500", 0.0))

            # --- per-camera-observability breakdown
            # (TEST.CAMERA_DETAIL -> panoptic.py:577-703)
            if cfg.DATASET.CAMERA_DETAIL:
                arrays = test_ds.observability_arrays(len(nmsed))
                if arrays is not None:
                    from mvgformer_tpu.core.evaluate import \
                        evaluate_by_observability

                    gts, vis3d, vis = arrays
                    obs = evaluate_by_observability(
                        nmsed, gts, vis, num_views=test_ds.num_views,
                        gt_vis3d=vis3d)
                    for (pct, ncam), m in sorted(obs.items()):
                        logger.info(
                            "obs>=%d%% cams=%d  n_gt=%d ap25=%.4f "
                            "mpjpe=%.2f", pct, ncam, m["num_gt"],
                            m.get("ap@25", 0.0), m.get("mpjpe", 0.0))
                else:
                    logger.info("CAMERA_DETAIL: dataset has no per-view "
                                "2D visibility; skipped")
        else:
            actor_pcp, avg_pcp, bone_pcp, recall = metrics
            logger.info("thr=%s  PCP per-actor %s avg %.4f recall@500 %.4f",
                        thr, np.round(actor_pcp, 4), avg_pcp, recall)
            for k, v in bone_pcp.items():
                logger.info("  %s: %s", k, np.round(v, 4))
            summary_rows.append([thr, float(avg_pcp), float(recall)])

    # cross-threshold summary table (the reference's PrettyTable report,
    # run/validate_3d.py:182-268)
    if summary_rows:
        from mvgformer_tpu.utils.logging import format_table

        if len(summary_rows[0]) == 8:
            headers = ["thr", "ap@25", "ap@50", "ap@100", "ap@150",
                       "recall@25", "mpjpe", "recall@500"]
        else:
            headers = ["thr", "pcp_avg", "recall@500"]
        logger.info("summary:\n%s", format_table(headers, summary_rows))


if __name__ == "__main__":
    main()
