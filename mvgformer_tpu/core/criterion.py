"""Set criterion: matching-based losses, dense static-shape formulation.

Rebuild of SetCriterion (/root/reference/lib/models/multi_view_pose_
transformer.py:491-932) + the per-layer decay-weighted summing
(dq_transformer.py:670-714). The ragged matched-pair index lists become the
dense MatchResult (B, M, K) gather + validity masks; every loss reduces to
masked sums with the reference's exact normalizations:

  loss_ce               = sum(focal(logits, onehot)) / num_samples
                          (sigmoid_focal_loss * num_queries,
                           multi_view_pose_transformer.py:49-78, 611-615)
  loss_pose_perjoint    = sum(|pred - gt| * vis) / (num_samples * J * 3)
                          (:653-696 with loss_type 'l1', abs coords)
  loss_pose_perprojection_2d
                        = sum(|pred2d - proj(gt)| * vis2d) /
                          (num_samples * V * J * 2), zeroed when > 1e5
                          (:732-772; per-(pair, view) weights correctly
                           aligned — the reference concatenates view-major
                           weights against pair-major predictions)
  num_samples           = clamp(mean-per-replica gt count, 1): psum over the
                          data axis replaces the NCCL all_reduce (:847-855)

Known deviation from the reference (documented, not a parity break for the
shipped configs): see the 2D-loss weight alignment note above.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from mvgformer_tpu.config import Config
from mvgformer_tpu.data.meta import Batch
from mvgformer_tpu.geometry.cameras import project_points
from mvgformer_tpu.geometry.transforms import (
    absolute2norm,
    apply_affine,
    norm2absolute,
)
from mvgformer_tpu.models.matcher import MatchResult


def sigmoid_focal_loss(logits, targets, alpha=0.25, gamma=2.0):
    """Element-wise focal BCE (multi_view_pose_transformer.py:49-78,
    pre-normalization)."""
    prob = jax.nn.sigmoid(logits)
    ce = (jnp.maximum(logits, 0) - logits * targets
          + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    p_t = prob * targets + (1 - prob) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss


# Panoptic 15-joint limb pairs (lib/core/loss.py:152-154)
LIMBS15 = ((0, 1), (0, 2), (0, 3), (3, 4), (4, 5), (0, 9), (9, 10),
           (10, 11), (2, 6), (2, 12), (6, 7), (7, 8), (12, 13), (13, 14))


def _gather_pairs(x: jnp.ndarray, query_idx: jnp.ndarray) -> jnp.ndarray:
    """Gather per-query tensors at matched pairs.

    x: (B, Q, ...); query_idx: (B, M, K) -> (B, M, K, ...)."""
    B, M, K = query_idx.shape
    flat = query_idx.reshape(B, M * K)

    def take(xb, ib):
        return jnp.take(xb, ib, axis=0)

    out = jax.vmap(take)(x, flat)
    return out.reshape((B, M, K) + x.shape[2:])


def compute_layer_losses(cfg: Config,
                         out: Dict[str, jnp.ndarray],
                         batch: Batch,
                         match: MatchResult,
                         num_samples: jnp.ndarray,
                         match_ce: Optional[MatchResult] = None
                         ) -> Dict[str, jnp.ndarray]:
    """Losses for one decoder layer's outputs. match_ce, when given,
    replaces the assignment used by the classification loss only
    (use_ce_match, multi_view_pose_transformer.py:833-841)."""
    dec = cfg.DECODER
    targets = batch.targets
    vd = batch.view_data
    gs = cfg.MULTI_PERSON.SPACE_SIZE
    gc = cfg.MULTI_PERSON.SPACE_CENTER

    logits = out["pred_logits"].astype(jnp.float32)  # (B, Q, 2)
    B, Q, _ = logits.shape
    gt = targets.joints_3d.astype(jnp.float32)  # (B, M, J, 3) absolute mm
    Bm, M, J, _ = gt.shape
    K = match.query_idx.shape[-1]
    V = vd.num_views

    # per-(gt, k) weights: KNN/hungarian fill every K slot of a valid gt;
    # threshold matching fills a variable number and exports pair_valid
    # so unfilled slots (garbage query indices) carry zero weight
    if match.pair_valid is not None:
        pair_valid = match.pair_valid  # (B, M, K)
    else:
        pair_valid = jnp.broadcast_to(match.gt_valid[:, :, None],
                                      match.query_idx.shape)
    pair_w = pair_valid.astype(jnp.float32)

    losses: Dict[str, jnp.ndarray] = {}

    # ------------------------------------------------ labels (focal)
    ce_match = match_ce if match_ce is not None else match
    target_pos = ce_match.query_mask.astype(jnp.float32)  # (B, Q)
    onehot = jnp.stack([jnp.zeros_like(target_pos), target_pos], axis=-1)
    focal = sigmoid_focal_loss(logits, onehot)
    losses["loss_ce"] = jnp.sum(focal) / num_samples

    # logs: error / recall / precision (multi_view_pose_transformer.py:618-626)
    thr = dec.pred_conf_threshold
    prob1 = jax.nn.sigmoid(logits[..., 1])
    pred_pos = prob1 > thr
    matched = ce_match.query_mask
    n_matched = jnp.maximum(jnp.sum(matched), 1)
    argmax_ok = (logits[..., 1] > logits[..., 0]) & matched
    losses["class_error"] = 100.0 * (
        1.0 - jnp.sum(argmax_ok) / n_matched)
    losses["class_recall"] = 100.0 * jnp.sum(
        pred_pos & matched) / n_matched
    losses["class_precision"] = 100.0 * jnp.sum(pred_pos & matched) / (
        jnp.sum(pred_pos) + 1e-5)

    # ------------------------------------------------ cardinality (log)
    card_pred = jnp.sum(pred_pos, axis=1).astype(jnp.float32)
    losses["cardinality_error"] = jnp.mean(
        jnp.abs(card_pred - targets.num_person.astype(jnp.float32)))

    # ------------------------------------------------ per-joint 3D loss
    pred = out["pred_poses"].astype(jnp.float32).reshape(B, Q, J, 3)
    src = _gather_pairs(pred, match.query_idx)  # (B, M, K, J, 3)
    vis3d = targets.joints_3d_vis.astype(jnp.float32)  # (B, M, J)
    w3 = (vis3d[:, :, None, :, None] * pair_w[..., None, None])
    d = src - gt[:, :, None]
    joint_type = dec.loss_joint_type
    if joint_type == "l1":
        losses["loss_pose_perjoint"] = jnp.sum(
            jnp.abs(d) * w3) / (num_samples * J * 3)
    elif joint_type == "l2":
        losses["loss_pose_perjoint"] = jnp.sum(
            (d * w3) ** 2) / (num_samples * J * 3)
    elif joint_type == "mpjpe":
        # per-pair visibility-weighted mean euclidean error, summed over
        # pairs / num_samples (lib/core/loss.py:101-105)
        dist = jnp.sqrt(jnp.sum(d ** 2, axis=-1) + 1e-12)
        wj = vis3d[:, :, None, :] * pair_w[..., None]
        per_pair = jnp.sum(dist * wj, axis=-1) / jnp.maximum(
            jnp.sum(wj, axis=-1), 1e-5)
        losses["loss_pose_perjoint"] = jnp.sum(
            per_pair * pair_w) / num_samples
    else:
        raise ValueError(joint_type)

    # ------------------------------------------------ per-bone L1 (opt)
    if dec.use_loss_pose_perbone and J == 15:
        la = jnp.asarray([a for a, _ in LIMBS15])
        lb = jnp.asarray([b for _, b in LIMBS15])
        bone_src = src[..., la, :] - src[..., lb, :]
        bone_gt = (gt[..., la, :] - gt[..., lb, :])[:, :, None]
        wb = (vis3d[..., la] * vis3d[..., lb])[:, :, None, :, None] \
            * pair_w[..., None, None]
        losses["loss_pose_perbone"] = jnp.sum(
            jnp.abs(bone_src - bone_gt) * wb) / (
            num_samples * len(LIMBS15) * 3)

    # ------------------------------ 3D-projected reprojection L1 (opt)
    if dec.use_loss_pose_perprojection:
        # project BOTH pred and gt into each camera, original-image coords
        # (PerProjectionL1Loss, lib/core/loss.py:197-242)
        M_, Kk = match.gt_valid.shape[1], match.query_idx.shape[-1]
        src_flat = jnp.broadcast_to(
            src.reshape(B, 1, M_ * Kk * J, 3),
            (B, V, M_ * Kk * J, 3))
        gt_flat = jnp.broadcast_to(
            gt.reshape(B, 1, M_ * J, 3), (B, V, M_ * J, 3))
        proj_src = project_points(src_flat, vd.cameras).reshape(
            B, V, M_, Kk, J, 2)
        proj_gt3 = project_points(gt_flat, vd.cameras).reshape(
            B, V, M_, 1, J, 2)
        wp = (vd.joints_vis_2d[:, :, :, None, :, None]  # (B,V,M,1,J,1)
              * pair_w[:, None, :, :, None, None])
        dp = jnp.abs(proj_src - proj_gt3) * wp
        loss_pp = jnp.sum(dp) / (num_samples * V * J * 2)
        losses["loss_pose_perprojection"] = jnp.where(
            loss_pp > 1e5, 0.0, loss_pp)

    # ------------------------------------------------ 2D reprojection L1
    if dec.use_loss_pose_perprojection_2d and "pred_poses_2d" in out:
        pred2d = out["pred_poses_2d"].astype(jnp.float32).reshape(
            B, V, Q, J, 2)
        src2d = _gather_pairs(
            jnp.transpose(pred2d, (0, 2, 1, 3, 4)), match.query_idx
        )  # (B, M, K, V, J, 2)
        # project gt into each view with distortion, then the net affine
        gt_views = jnp.broadcast_to(
            gt[:, None].reshape(B, 1, M * J, 3), (B, V, M * J, 3))
        proj_gt = project_points(gt_views, vd.cameras)  # (B, V, M*J, 2)
        proj_gt = apply_affine(proj_gt, vd.affine).reshape(B, V, M, J, 2)
        proj_gt = jnp.transpose(proj_gt, (0, 2, 1, 3, 4))  # (B, M, V, J, 2)
        vis2d = jnp.transpose(vd.joints_vis_2d, (0, 2, 1, 3))  # (B, M, V, J)
        w2 = (vis2d[:, :, None, :, :, None]
              * pair_w[..., None, None, None])  # (B, M, K->1, V, J, 1)
        d2 = jnp.abs(src2d - proj_gt[:, :, None]) * w2
        loss2d = jnp.sum(d2) / (num_samples * V * J * 2)
        # reprojection kill switch (multi_view_pose_transformer.py:770-771)
        losses["loss_pose_perprojection_2d"] = jnp.where(
            loss2d > 1e5, 0.0, loss2d)

    return losses


LOG_KEYS = ("class_error", "class_recall", "class_precision",
            "cardinality_error")


def layer_decay_weights(method: str, num_layers: int) -> jnp.ndarray:
    """dq_transformer.py:692-708."""
    if method == "none":
        return jnp.ones((num_layers,))
    if method == "linear":
        return jnp.linspace(0.0, 1.0, num_layers + 1)[1:]
    if method == "exp":
        w = 2.0 ** jnp.arange(1, num_layers + 1)
        return w / w[-1]
    if method == "last":
        w = jnp.zeros((num_layers,))
        return w.at[-1].set(1.0)
    raise ValueError(method)


def match_outputs(cfg: Config, out: Dict[str, jnp.ndarray],
                  batch: Batch) -> MatchResult:
    """DETR-style per-layer matching on the layer's own outputs
    (gt_match=False path: SetCriterion.forward matches outputs when no
    origin is given, multi_view_pose_transformer.py:827-830). Cost =
    cost_class * focal-class + cost_pose * 0.01 * L1 (matcher.py:150-175);
    KNN uses the pose-only cost like the reference (matcher.py:190-195)."""
    from mvgformer_tpu.models.matcher import (focal_class_cost, knn_match,
                                              pose_l1_cost, threshold_match)

    dec = cfg.DECODER
    gt = batch.targets.joints_3d.astype(jnp.float32)
    B, M, J, _ = gt.shape
    pred = out["pred_poses"].astype(jnp.float32).reshape(B, -1, J, 3)
    cost_pose = pose_l1_cost(pred, gt)
    if dec.match_method == "KNN":
        return knn_match(cost_pose, batch.targets.num_person,
                         int(dec.match_method_value))
    if dec.match_method == "multiple":
        return threshold_match(cost_pose, batch.targets.num_person,
                               float(dec.match_method_value),
                               k_cap=max(int(dec.num_instance // 8), 8))
    # full cost (class + pose) exists for the Hungarian host path; traced
    # training supports the KNN/multiple methods the shipped configs use
    raise NotImplementedError(
        f"match_method {dec.match_method} on outputs is host-side")


def compute_losses(cfg: Config,
                   layer_outputs: List[Dict[str, jnp.ndarray]],
                   batch: Batch,
                   match: Optional[MatchResult],
                   init_reference: Optional[jnp.ndarray] = None,
                   axis_name: Optional[str] = None,
                   num_replicas: int = 1) -> Dict[str, jnp.ndarray]:
    """Decay-weighted per-layer criterion + total weighted loss.

    Returns a dict with each loss term plus 'total' (the weighted sum used
    for backprop, mirroring lib/core/function.py:127-128).

    num_samples semantics: the reference computes per-rank
    clamp(total_gt / world, 1) via NCCL all_reduce, then DDP averages
    gradients, which nets out to global_sum / max(total_gt, world)
    (multi_view_pose_transformer.py:847-855). With a global-batch jit the
    equivalent is num_samples = max(sum(num_person), num_replicas); under
    shard_map pass axis_name instead and the psum reproduces the all_reduce.
    """
    dec = cfg.DECODER
    num = jnp.sum(batch.targets.num_person).astype(jnp.float32)
    if axis_name is not None:
        num = jax.lax.psum(num, axis_name)
        num_replicas = jax.lax.psum(1, axis_name)
    num_samples = jnp.maximum(num, jnp.float32(num_replicas))

    # gt_match=True: one fixed match from the initial query grid; otherwise
    # DETR-style per-layer matching on each layer's outputs. use_ce_match
    # (multi_view_pose_transformer.py:833-841): with gt_match on, the CE
    # loss instead matches each layer's own outputs (pose-only Hungarian,
    # 'hungarian-dis') so classification supervises final assignments.
    def layer_losses(out):
        m = match if match is not None else match_outputs(cfg, out, batch)
        if dec.use_ce_match and match is not None:
            from mvgformer_tpu.models.matcher import (
                hungarian_match_callback, pose_l1_cost)

            pred = out["pred_poses"].astype(jnp.float32).reshape(
                out["pred_poses"].shape[0], -1,
                batch.targets.joints_3d.shape[2], 3)
            # the assignment is a non-differentiable decision; without the
            # stop_gradient, jax.grad hits pure_callback's missing JVP
            # rule and the train step crashes (the reference's
            # scipy-on-detached-cost does the same implicitly)
            cost = jax.lax.stop_gradient(pose_l1_cost(
                pred, batch.targets.joints_3d.astype(jnp.float32)))
            m_ce = hungarian_match_callback(cost, batch.targets.num_person)
            return compute_layer_losses(cfg, out, batch, m, num_samples,
                                        match_ce=m_ce)
        return compute_layer_losses(cfg, out, batch, m, num_samples)

    per_layer = [layer_losses(out) for out in layer_outputs]
    weights = layer_decay_weights(dec.decay_method, len(per_layer))

    summed: Dict[str, jnp.ndarray] = {}
    for key in per_layer[0]:
        vals = jnp.stack([pl[key] for pl in per_layer])
        if key in LOG_KEYS:
            summed[key] = jnp.mean(vals)
        else:
            summed[key] = jnp.sum(weights * vals)
    # init loss (dq_transformer.py:718-729): per-joint loss on the initial
    # reference points with their own output matching; active only when
    # gt_match is off and loss_weight_init > 0
    if (dec.loss_weight_init > 0 and match is None
            and init_reference is not None):
        # the reference converts the init poses to the gt joint order
        # (construct_output_from_origin, dq_transformer.py:97-101) ...
        init_pred = init_reference
        if dec.convert_joint_format_indices is not None:
            cji = jnp.asarray(dec.convert_joint_format_indices, jnp.int32)
            B0 = init_pred.shape[0]
            init_pred = init_pred.reshape(
                B0, -1, dec.num_keypoints, 3)[:, :, cji].reshape(B0, -1, 3)
        init_out = {"pred_logits": layer_outputs[0]["pred_logits"],
                    "pred_poses": init_pred}
        init_match = match_outputs(cfg, init_out, batch)
        # ... and normalizes by the MATCHED-PAIR count, not the global
        # num_samples (loss_poses with num_samples=None -> len(src_poses),
        # multi_view_pose_transformer.py:684-685)
        pv = (init_match.pair_valid if init_match.pair_valid is not None
              else jnp.broadcast_to(init_match.gt_valid[:, :, None],
                                    init_match.query_idx.shape))
        n_pairs = jnp.maximum(jnp.sum(pv.astype(jnp.float32)), 1.0)
        init_losses = compute_layer_losses(cfg, init_out, batch, init_match,
                                           n_pairs)
        summed["loss_init"] = init_losses["loss_pose_perjoint"]
    else:
        summed["loss_init"] = jnp.zeros(())

    weight_dict = {
        "loss_ce": dec.loss_weight_loss_ce,
        "loss_pose_perjoint": dec.loss_pose_perjoint,
        "loss_pose_perprojection_2d": dec.loss_pose_perprojection_2d,
        "loss_init": dec.loss_weight_init,
    }
    total = sum(summed[k] * w for k, w in weight_dict.items()
                if k in summed)
    summed["total"] = total
    return summed


def match_queries(cfg: Config, init_reference: jnp.ndarray,
                  batch: Batch) -> MatchResult:
    """gt-match on the initial query poses (dq_transformer.py:496-524):
    pose-only cost for KNN (matcher.py:192-195), class+pose for hungarian.

    init_reference: (B, Q*J, 3) absolute mm.
    """
    from mvgformer_tpu.models.matcher import knn_match, pose_l1_cost, \
        threshold_match

    dec = cfg.DECODER
    J = dec.num_keypoints
    B = init_reference.shape[0]
    pred = init_reference.reshape(B, -1, J, 3)
    if dec.convert_joint_format_indices is not None:
        idx = jnp.asarray(dec.convert_joint_format_indices, jnp.int32)
        pred = pred[:, :, idx]
    gt = batch.targets.joints_3d.astype(jnp.float32)
    # match_coord_gt='norm' + norm2absolute in the matcher -> both absolute
    cost = pose_l1_cost(pred.astype(jnp.float32), gt)
    if dec.match_method == "KNN":
        return knn_match(cost, batch.targets.num_person,
                         int(dec.match_method_value))
    if dec.match_method == "multiple":
        return threshold_match(cost, batch.targets.num_person,
                               float(dec.match_method_value),
                               k_cap=max(int(dec.num_instance // 8), 8))
    if dec.match_method in ("hungarian", "hungarian-dis"):
        # pose-only cost for hungarian-dis; init poses carry no class
        # scores, so 'hungarian' here also matches on pose (the
        # reference's class cost on the all-ones init logits is a
        # per-query constant and does not change the assignment)
        from mvgformer_tpu.models.matcher import hungarian_match_callback

        return hungarian_match_callback(cost, batch.targets.num_person)
    raise ValueError(f"unknown match_method {dec.match_method}")
