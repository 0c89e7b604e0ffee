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
