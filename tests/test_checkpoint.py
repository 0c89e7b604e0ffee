"""Orbax checkpoint save/load round trip + torch converter sanity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvgformer_tpu.core.train import create_train_state
from mvgformer_tpu.data.synthetic import make_batch
from mvgformer_tpu.models.mvgformer import MVGFormer
from mvgformer_tpu.utils.checkpoint import (PreemptionGuard,
                                            load_checkpoint,
                                            save_checkpoint)

from test_model import small_cfg


@pytest.mark.slow
def test_save_load_roundtrip(tmp_path):
    cfg = small_cfg()
    model = MVGFormer(cfg=cfg)
    batch = make_batch(cfg, batch_size=1, seed=0)
    state, _ = create_train_state(cfg, model, batch, jax.random.PRNGKey(0))

    ckpt_dir = str(tmp_path / "ckpts")
    save_checkpoint(ckpt_dir, state, epoch=3, precision=0.5, is_best=True)
    restored = load_checkpoint(ckpt_dir, state)
    assert restored is not None
    new_state, epoch, precision = restored
    assert epoch == 3
    assert precision == pytest.approx(0.5)
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(new_state.params)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_preemption_guard_flags():
    guard = PreemptionGuard()
    assert not guard.should_stop
    guard.request()
    assert guard.should_stop


@pytest.mark.slow
def test_resave_same_step_and_params_only_restore(tmp_path):
    """Re-saving an existing step must replace it (preemption + resume
    re-runs an epoch), next_epoch round-trips as the resume point, and
    load_params_checkpoint restores params/batch_stats from a TrainState
    payload without a template (the validate CLI's path)."""
    from mvgformer_tpu.utils.checkpoint import load_params_checkpoint

    cfg = small_cfg()
    model = MVGFormer(cfg=cfg)
    batch = make_batch(cfg, batch_size=1, seed=0)
    state, _ = create_train_state(cfg, model, batch, jax.random.PRNGKey(0))

    ckpt_dir = str(tmp_path / "ckpts")
    # mid-epoch preemption save, then the re-run epoch's end-of-epoch save
    # on the SAME step: must not raise StepAlreadyExistsError
    save_checkpoint(ckpt_dir, state, epoch=2, precision=0.1,
                    next_epoch=2)
    save_checkpoint(ckpt_dir, state, epoch=2, precision=0.4,
                    next_epoch=3)
    restored = load_checkpoint(ckpt_dir, state)
    assert restored is not None
    _, next_epoch, precision = restored
    assert next_epoch == 3 and precision == pytest.approx(0.4)

    out = load_params_checkpoint(ckpt_dir)
    assert out is not None
    variables, next_epoch = out
    assert next_epoch == 3
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(variables["params"])
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # restored variables drive the eval step directly
    from mvgformer_tpu.core.train import make_eval_step

    pred = make_eval_step(cfg, model, threshold=0.3)(
        variables["params"], variables["batch_stats"], batch)
    assert np.asarray(pred).shape[0] == 1
