"""Training step: one jit-compiled program over a data-parallel mesh.

Rebuild of the reference's training core (/root/reference/run/train_3d.py:
116-146 optimizer construction, lib/core/function.py:56-326 loop body) as a
single compiled step: match -> forward (all decoder layers) -> criterion ->
grad -> clip -> Adam update, all traced. The batch is sharded over the
'data' mesh axis; gradient reduction is XLA's all-reduce over ICI (replacing
DDP/NCCL). The frozen backbone and the 0.1x learning-rate group for
sampling_offsets / reference-point projections reproduce the reference's
two-param-group optimizer (run/train_3d.py:123-146) via optax partitions.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from mvgformer_tpu.config import Config
from mvgformer_tpu.core.criterion import compute_losses, match_queries
from mvgformer_tpu.data.meta import Batch
from mvgformer_tpu.models.mvgformer import MVGFormer


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_lr_schedule(cfg: Config, steps_per_epoch: int):
    """MultiStep (LR_FACTOR at LR_STEP epochs) or cosine over END_EPOCH
    (run/train_3d.py:280-290), with optional linear warmup
    (TRAIN.WARMUP_EPOCHS — a from-scratch stability knob the reference
    lacks because it always starts from a pretrained backbone; without
    it the synthetic proxy diverges by epoch 2, 2026-08-17)."""
    base = cfg.TRAIN.LR
    total = cfg.TRAIN.END_EPOCH * steps_per_epoch
    warmup = int(cfg.TRAIN.WARMUP_EPOCHS * steps_per_epoch)
    if cfg.TRAIN.LR_SCHEDULER == "cosine":
        main = optax.cosine_decay_schedule(base, max(total - warmup, 1))
    else:
        boundaries = {max(int(e) * steps_per_epoch - warmup, 1):
                      cfg.TRAIN.LR_FACTOR for e in cfg.TRAIN.LR_STEP}
        main = optax.piecewise_constant_schedule(base, boundaries)
    if not warmup:
        return main
    return optax.join_schedules(
        [optax.linear_schedule(0.0, base, warmup), main], [warmup])


def _param_labels(params, train_backbone: bool = False) -> Any:
    """Label tree: 'frozen' (backbone), 'proj' (0.1x lr), 'main'.

    Mirrors get_optimizer (run/train_3d.py:116-146): backbone requires_grad
    False; params whose name contains 'sampling_offsets' or
    'reference_points' go to the lr_linear_proj_mult group.
    TRAIN.TRAIN_BACKBONE=True moves the backbone into 'main' (a deviation
    knob the reference lacks: it always has pretrained backbone weights to
    freeze; synthetic-data training from scratch does not).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label_of(path):
        keys = [getattr(p, "key", str(p)) for p in path]
        if keys and keys[0] == "backbone" and not train_backbone:
            return "frozen"
        if any("sampling_offsets" in k or "reference_points" in k
               for k in keys):
            return "proj"
        return "main"

    labels = {jax.tree_util.keystr(path): label_of(path)
              for path, _ in flat}

    def build(path, _):
        return labels[jax.tree_util.keystr(path)]

    return jax.tree_util.tree_map_with_path(build, params)


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    schedule = make_lr_schedule(cfg, steps_per_epoch)
    mult = cfg.DECODER.lr_linear_proj_mult

    def adam(lr_scale):
        return optax.chain(
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(
                lambda step: schedule(step) * lr_scale),
        )

    # clipping is ONE global norm over all trainable grads, applied before
    # the per-group transforms — the reference clips
    # clip_grad_norm_(model.parameters(), ...) once (function.py:171-176),
    # not per param group; clip_max_norm <= 0 disables clipping there
    # (and clip_by_global_norm(0.0) would zero every update). The frozen
    # backbone's grads are exact zeros (stop_gradient), so including them
    # in the norm is a no-op, matching the reference's trainable-only set.
    clip = (optax.clip_by_global_norm(cfg.TRAIN.clip_max_norm)
            if cfg.TRAIN.clip_max_norm > 0 else optax.identity())
    tx = optax.chain(
        clip,
        optax.multi_transform(
            {"main": adam(1.0), "proj": adam(mult),
             "frozen": optax.set_to_zero()},
            lambda params: _param_labels(
                params, train_backbone=cfg.TRAIN.TRAIN_BACKBONE),
        ),
    )
    if cfg.TRAIN.SKIP_NONFINITE:
        # drop (do not apply) any update containing non-finite values —
        # one degenerate batch (e.g. an ill-conditioned triangulation
        # VJP) then costs one step instead of poisoning the params. The
        # inner state still advances on every finite step; after
        # max_consecutive_errors consecutive bad steps the NaNs are
        # allowed through so a persistent divergence stays visible in
        # the loss curve instead of silently freezing training.
        tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    return tx


def create_train_state(cfg: Config, model: MVGFormer, batch: Batch,
                       rng, steps_per_epoch: int = 1000) -> Tuple[TrainState, optax.GradientTransformation]:
    variables = jax.jit(model.init)(rng, batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = make_optimizer(cfg, steps_per_epoch)
    opt_state = tx.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=opt_state), tx


def make_train_step(cfg: Config, model: MVGFormer,
                    tx: optax.GradientTransformation,
                    num_replicas: int = 1,
                    donate: bool = True):
    """Returns train_step(state, batch, rng) -> (state, metrics), jittable.

    The full step — gt-match on the initial query grid, 4-layer decoder
    forward, criterion, backward, clipped Adam — is one XLA program
    (SURVEY.md §7 design delta 6).
    """

    # the MvP baseline (TRANSFORMER: multi_view_pose_transformer,
    # run/train_3d.py:245-250) has no initial query grid: it always matches
    # per layer on its own outputs (SetCriterion without origin)
    is_dq = hasattr(model, "initial_reference_points_static")
    gt_match = cfg.DECODER.gt_match and is_dq

    def loss_fn(params, batch_stats, batch, match, init_refs, rng):
        if is_dq:
            outs = model.apply(
                {"params": params, "batch_stats": batch_stats}, batch,
                query_mask=match.query_mask if gt_match else None,
                train=True, rngs={"dropout": rng})
        else:
            outs = model.apply(
                {"params": params, "batch_stats": batch_stats}, batch,
                train=True, rngs={"dropout": rng})
        losses = compute_losses(cfg, outs, batch,
                                match if gt_match else None,
                                init_reference=init_refs,
                                num_replicas=num_replicas)
        return losses["total"], losses

    def train_step(state: TrainState, batch: Batch, rng):
        if not is_dq:
            init_refs = match = None
        else:
            init_refs = model.initial_reference_points_static(
                batch.views.shape[0])
            # gt-match on the initial query grid
            # (dq_transformer.py:496-524); with gt_match off the criterion
            # re-matches per layer instead and this result is unused (it is
            # cheap and keeps one code path)
            match = match_queries(cfg, init_refs, batch)
        (_, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   batch, match, init_refs, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               batch_stats=state.batch_stats,
                               opt_state=opt_state)
        metrics = {k: v for k, v in losses.items()
                   if not isinstance(v, (list, dict))}
        if cfg.TRAIN.SKIP_NONFINITE:
            # observability for the skip guard: a run whose updates are
            # being silently dropped (PERF.md "dropped-update runs look
            # like training") is visible as a climbing counter
            metrics["notfinite_total"] = opt_state.total_notfinite
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)


def make_eval_step(cfg: Config, model: MVGFormer, threshold: float,
                   window_plan=None, with_escape_telemetry: bool = False):
    """Jitted inference step returning the reference's pred array
    (lib/core/function.py:386-394): (B, Q, J, 5) = xyz | (score>thr)-1 |
    score. window_plan: optional rig-static layer-1 sampling plan
    (build_layer1_window_plan); a compile-time constant.

    with_escape_telemetry: also return the summed windowed-sampling
    escaped-weight mass (sown by ProjAttn when layer1_windowed_sampling is
    on) so the validate CLI can surface the safety instrument."""

    is_dq = hasattr(model, "initial_reference_points_static")

    def forward(params, batch_stats, batch, **apply_kwargs):
        if is_dq:
            return model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch, threshold=threshold, window_plan=window_plan,
                **apply_kwargs)
        # MvP baseline: no query filtering, the threshold only shapes
        # the returned flag channel below
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, batch,
            **apply_kwargs)

    def to_pred(outs):
        out = outs[-1]
        B, Q = out["pred_logits"].shape[:2]
        poses = out["pred_poses"].reshape(B, Q, -1, 3)
        J = poses.shape[2]
        score = jax.nn.sigmoid(out["pred_logits"][:, :, 1:2])
        score = jnp.broadcast_to(score[:, :, None], (B, Q, J, 1))
        flag = (score > threshold).astype(poses.dtype) - 1.0
        return jnp.concatenate([poses, flag, score], axis=-1)

    if with_escape_telemetry:
        def eval_step(params, batch_stats, batch: Batch):
            outs, st = forward(params, batch_stats, batch,
                               mutable=["intermediates"])
            esc = jnp.zeros((), jnp.float32)
            for path, leaf in jax.tree_util.tree_flatten_with_path(
                    st["intermediates"])[0]:
                if any(getattr(p, "key", "") == "escaped_mass"
                       for p in path):
                    esc = esc + jnp.sum(leaf)
            return to_pred(outs), esc
    else:
        def eval_step(params, batch_stats, batch: Batch):
            return to_pred(forward(params, batch_stats, batch))

    return jax.jit(eval_step)


def make_eval_loss_step(cfg: Config, model: MVGFormer, threshold: float,
                        window_plan=None):
    """Loss dict on eval batches (DEBUG.LOG_VAL_LOSS: the reference's
    validate_3d loss mirror, lib/core/function.py:413-576).

    Inference-mode forward (threshold query filtering, no gt-match) with
    the criterion matching each layer's own outputs — the reference's eval
    forward has no GT indices either (gt_match_test defaults False)."""

    is_dq = hasattr(model, "initial_reference_points_static")

    def loss_step(params, batch_stats, batch: Batch):
        if is_dq:
            outs = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch, threshold=threshold, window_plan=window_plan)
        else:
            outs = model.apply(
                {"params": params, "batch_stats": batch_stats}, batch)
        losses = compute_losses(cfg, outs, batch, None)
        return {k: v for k, v in losses.items()
                if not isinstance(v, (list, dict))}

    return jax.jit(loss_step)
