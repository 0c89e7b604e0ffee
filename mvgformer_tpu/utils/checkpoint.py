"""Checkpoint save/load via orbax.

TPU-native replacement of the reference's torch checkpointing
(/root/reference/lib/utils/utils.py:105-150: per-epoch checkpoint.pth.tar
{epoch, state_dict, optimizer, lr_scheduler, precision} + model_best):
an orbax CheckpointManager keeping `checkpoint` (latest) and best-metric
tracking, plus the torch->flax converters in utils.torch_convert for loading
reference .pth.tar weights (backbone pretrain and full-model finetune paths,
lib/utils/utils.py:124-188).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _manager(ckpt_dir: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True),
    )


def save_checkpoint(ckpt_dir: str, state, epoch: int,
                    precision: Optional[float] = None,
                    is_best: bool = False,
                    next_epoch: Optional[int] = None) -> None:
    """Save {state, epoch, precision}; mirrors save_checkpoint
    (lib/utils/utils.py:144-150) incl. best tracking.

    meta['epoch'] stores the NEXT epoch to run on resume (the reference
    saves 'epoch': epoch + 1): pass next_epoch=epoch+1 for end-of-epoch
    saves, next_epoch=epoch for mid-epoch preemption saves (re-run the
    interrupted epoch). Saving over an existing step (preemption + resume
    re-running an epoch) replaces it instead of raising
    StepAlreadyExistsError. precision should be the BEST metric so far,
    like the reference ('precision': best_precision)."""
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir)
    payload = {
        "state": jax.tree_util.tree_map(np.asarray, state),
        "meta": {"epoch": int(next_epoch if next_epoch is not None
                              else epoch),
                 "precision": float(precision or 0.0),
                 "is_best": bool(is_best)},
    }
    if epoch in (mgr.all_steps() or []):
        mgr.delete(epoch)
    mgr.save(epoch, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    if is_best:
        best_dir = os.path.join(os.path.abspath(ckpt_dir), "best")
        best = ocp.CheckpointManager(
            best_dir, options=ocp.CheckpointManagerOptions(max_to_keep=1,
                                                           create=True))
        if epoch in (best.all_steps() or []):
            best.delete(epoch)
        best.save(epoch, args=ocp.args.StandardSave(payload))
        best.wait_until_finished()


def load_checkpoint(ckpt_dir: str, state_like, step: Optional[int] = None):
    """Restore (state, next_epoch, best_precision); resume path
    (lib/utils/utils.py:105-122). next_epoch is the epoch to START at."""
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        return None
    template = {
        "state": jax.tree_util.tree_map(np.asarray, state_like),
        "meta": {"epoch": 0, "precision": 0.0, "is_best": False},
    }
    payload = mgr.restore(step, args=ocp.args.StandardRestore(template))
    import jax.numpy as jnp

    state = jax.tree_util.tree_map(jnp.asarray, payload["state"])
    return state, payload["meta"]["epoch"], payload["meta"]["precision"]


def load_params_checkpoint(ckpt_dir: str, step: Optional[int] = None):
    """Restore only {params, batch_stats} from a TRAINING checkpoint
    without needing a full TrainState template — the eval CLI's path
    (the saved payload holds a TrainState; a bare variables-dict template
    would fail orbax's structure check). Returns (variables, next_epoch)
    or None."""
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        return None
    payload = mgr.restore(step)  # template-free: nested containers
    import jax.numpy as jnp

    st = payload["state"]
    get = (lambda obj, k: getattr(obj, k, None)
           if not isinstance(obj, dict) else obj.get(k))
    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, get(st, "params")),
        "batch_stats": jax.tree_util.tree_map(
            jnp.asarray, get(st, "batch_stats") or {}),
    }
    return variables, payload["meta"]["epoch"]


class PreemptionGuard:
    """Cooperative preemption handling (no reference equivalent — the
    reference's recovery story is manual TRAIN.RESUME, SURVEY.md §5):
    SIGTERM/SIGINT set a flag; the train loop checks `should_stop` at step
    boundaries and checkpoints before exiting, so preempted TPU jobs resume
    losslessly."""

    def __init__(self):
        import signal

        self._stop = False
        self._installed = False
        try:
            signal.signal(signal.SIGTERM, self._handler)
            signal.signal(signal.SIGINT, self._handler)
            self._installed = True
        except ValueError:
            pass  # not the main thread; polling still works via request()

    def _handler(self, signum, frame):
        self._stop = True

    def request(self):
        self._stop = True

    @property
    def should_stop(self) -> bool:
        return self._stop


def load_backbone_pretrained(path: str, variables: dict) -> dict:
    """Load a PoseResNet .pth.tar backbone pretrain into full-model
    variables (lib/utils/utils.py:152-188; final-layer is not part of this
    model, so no reinit is needed)."""
    import torch

    from mvgformer_tpu.models.pose_resnet import convert_torch_state_dict

    sd = torch.load(path, map_location="cpu", weights_only=False)
    sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
    bb = convert_torch_state_dict(sd)
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    params["backbone"] = bb["params"]
    stats["backbone"] = bb["batch_stats"]
    return {"params": params, "batch_stats": stats}
