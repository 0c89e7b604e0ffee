"""Train-step tests: loss decreases, backbone stays frozen, mesh sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvgformer_tpu.core.train import (
    TrainState, create_train_state, make_eval_step, make_train_step,
    _param_labels)
from mvgformer_tpu.data.synthetic import make_batch
from mvgformer_tpu.models.mvgformer import MVGFormer
from mvgformer_tpu.parallel import make_mesh, shard_batch

from test_model import small_cfg


class TestTrainStep:
    @pytest.mark.slow
    def test_loss_decreases_and_backbone_frozen(self):
        cfg = small_cfg()
        cfg.TRAIN.LR = 1e-3
        model = MVGFormer(cfg=cfg)
        batch = make_batch(cfg, batch_size=1, seed=0, num_people=2,
                           render=True)
        state, tx = create_train_state(cfg, model, batch,
                                       jax.random.PRNGKey(0))
        backbone_before = jax.tree_util.tree_leaves(
            state.params["backbone"])[0].copy()
        step = make_train_step(cfg, model, tx, donate=False)

        rng = jax.random.PRNGKey(1)
        losses = []
        for i in range(16):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, batch, sub)
            losses.append(float(metrics["total"]))
        assert np.isfinite(losses).all()
        # overfitting a single synthetic batch must reduce the loss
        # (16 steps: ~3% on CPU; 8 steps sat borderline at the 2% bar
        # and flipped with toolchain-level numeric drift)
        assert losses[-1] < losses[0] * 0.98, losses
        assert all(b < a for a, b in zip(losses, losses[1:])), losses

        backbone_after = jax.tree_util.tree_leaves(
            state.params["backbone"])[0]
        np.testing.assert_array_equal(np.asarray(backbone_before),
                                      np.asarray(backbone_after))

    @pytest.mark.slow
    def test_train_backbone_knob_updates_backbone(self):
        """TRAIN.TRAIN_BACKBONE=True (synthetic from-scratch training;
        the reference always freezes, run/train_3d.py:118-121) must make
        backbone params actually move."""
        cfg = small_cfg()
        cfg.TRAIN.TRAIN_BACKBONE = True
        model = MVGFormer(cfg=cfg)
        batch = make_batch(cfg, batch_size=1, seed=0, num_people=2,
                           render=True)
        state, tx = create_train_state(cfg, model, batch,
                                       jax.random.PRNGKey(0))
        before = np.asarray(jax.tree_util.tree_leaves(
            state.params["backbone"])[0]).copy()
        step = make_train_step(cfg, model, tx, donate=False)
        state, _ = step(state, batch, jax.random.PRNGKey(1))
        after = np.asarray(jax.tree_util.tree_leaves(
            state.params["backbone"])[0])
        assert np.abs(after - before).max() > 0

    def test_param_groups(self):
        cfg = small_cfg()
        model = MVGFormer(cfg=cfg)
        batch = make_batch(cfg, batch_size=1, seed=0)
        variables = model.init(jax.random.PRNGKey(0), batch)
        labels = _param_labels(variables["params"])
        flat = jax.tree_util.tree_flatten_with_path(labels)[0]
        got = {jax.tree_util.keystr(p): l for p, l in flat}
        assert all(v == "frozen" for k, v in got.items()
                   if k.startswith("['backbone']"))
        assert any(v == "proj" for k, v in got.items()
                   if "sampling_offsets" in k)
        assert got["['joint_embedding']"] == "main"

    def test_eval_step_pred_format(self):
        cfg = small_cfg()
        model = MVGFormer(cfg=cfg)
        batch = make_batch(cfg, batch_size=2, seed=0)
        variables = model.init(jax.random.PRNGKey(0), batch)
        eval_step = make_eval_step(cfg, model, threshold=0.3)
        pred = np.asarray(eval_step(variables["params"],
                                    variables["batch_stats"], batch))
        Q, J = cfg.DECODER.num_instance, cfg.DECODER.num_keypoints
        assert pred.shape == (2, Q, J, 5)
        assert set(np.unique(pred[..., 3])) <= {-1.0, 0.0}
        assert (pred[..., 4] >= 0).all() and (pred[..., 4] <= 1).all()


class TestRemat:
    @pytest.mark.slow
    def test_remat_decoder_matches_no_remat(self):
        """nn.remat on the decoder layers trades recompute for HBM in the
        backward pass (flagship train step OOMs without it, PERF.md
        "training memory") — it must not change the math: one train step
        with REMAT_DECODER on/off from identical init must agree."""
        from mvgformer_tpu.core.criterion import compute_losses, \
            match_queries

        results = {}
        for remat, policy in ((False, "full"), (True, "full"),
                              (True, "save_sampled")):
            cfg = small_cfg()
            cfg.PARALLEL.REMAT_DECODER = remat
            cfg.PARALLEL.REMAT_POLICY = policy
            model = MVGFormer(cfg=cfg)
            batch = make_batch(cfg, batch_size=1, seed=0, num_people=2)
            state, tx = create_train_state(cfg, model, batch,
                                           jax.random.PRNGKey(0))

            def loss_only(params, b, model=model, state=state, cfg=cfg):
                match = match_queries(
                    cfg, model.initial_reference_points_static(1), b)
                outs = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    b, query_mask=match.query_mask, train=True,
                    rngs={"dropout": jax.random.PRNGKey(7)})
                return compute_losses(cfg, outs, b, match)["total"]

            loss, grads = jax.jit(jax.value_and_grad(loss_only))(
                state.params, batch)
            results[(remat, policy)] = (
                float(loss),
                jax.tree_util.tree_leaves(grads["decoder"]))
        base = results[(False, "full")]
        for key in ((True, "full"), (True, "save_sampled")):
            # forward (and the dropout-mask replay) must be bit-equivalent
            np.testing.assert_allclose(base[0], results[key][0], rtol=1e-6)
            # backward recompute reassociates f32 reductions; through the
            # ill-conditioned SVD-triangulation gradient that amplifies to
            # ~2e-3 of leaf scale (measured; a dropout-replay or
            # structural bug would show up as O(1) differences)
            for x, y in zip(base[1], results[key][1]):
                x, y = np.asarray(x), np.asarray(y)
                scale = max(np.abs(x).max(), 1e-3)
                np.testing.assert_allclose(x, y, rtol=1e-2,
                                           atol=3e-3 * scale)


class TestMeshTraining:
    @pytest.mark.slow
    def test_sharded_train_step_matches_single(self):
        """The same step on an 8-device data-parallel mesh must produce the
        same parameters as the single-device run (XLA inserts the
        all-reduce; semantics are the global-batch gradient)."""
        cfg = small_cfg()
        model = MVGFormer(cfg=cfg)
        batch = make_batch(cfg, batch_size=8, seed=0, num_people=2)
        state, tx = create_train_state(cfg, model, batch,
                                       jax.random.PRNGKey(0))
        step = make_train_step(cfg, model, tx, donate=False)
        rng = jax.random.PRNGKey(7)

        state_single, m_single = step(state, batch, rng)

        mesh = make_mesh(8)
        sharded = shard_batch(batch, mesh)
        state_mesh, m_mesh = step(state, sharded, rng)

        np.testing.assert_allclose(float(m_single["total"]),
                                   float(m_mesh["total"]), rtol=1e-5)
        for key in ("loss_ce", "loss_pose_perjoint",
                    "loss_pose_perprojection_2d"):
            np.testing.assert_allclose(float(m_single[key]),
                                       float(m_mesh[key]), rtol=1e-4)

        # gradients must agree up to f32 cross-device reduction order
        # (comparing post-Adam params would amplify noise on ~0 grads)
        from mvgformer_tpu.core.criterion import compute_losses, \
            match_queries

        def loss_only(params, b):
            match = match_queries(
                cfg, model.initial_reference_points_static(8), b)
            outs = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                b, query_mask=match.query_mask, train=False)
            return compute_losses(cfg, outs, b, match)["total"]

        g_single = jax.jit(jax.grad(loss_only))(state.params, batch)
        g_mesh = jax.jit(jax.grad(loss_only))(state.params, sharded)
        a = jax.tree_util.tree_leaves(g_single["decoder"])
        b = jax.tree_util.tree_leaves(g_mesh["decoder"])
        for x, y in zip(a, b):
            x, y = np.asarray(x), np.asarray(y)
            scale = max(np.abs(x).max(), 1e-3)
            np.testing.assert_allclose(x, y, rtol=1e-3, atol=2e-4 * scale)


class TestViewParallelism:
    @pytest.mark.slow
    def test_2d_mesh_matches_single_device(self):
        """(data x view) 2-D mesh: per-view work sharded over the 'view'
        axis; outputs must equal the unsharded run (XLA inserts the
        cross-view collectives for fusion/softmax/triangulation)."""
        from mvgformer_tpu.core.train import make_eval_step
        from mvgformer_tpu.parallel import make_mesh_2d, shard_batch

        cfg = small_cfg(**{"DATASET.CAMERA_NUM": 4})
        model = MVGFormer(cfg=cfg)
        batch = make_batch(cfg, batch_size=4, seed=0, num_people=2)
        variables = model.init(jax.random.PRNGKey(0), batch)
        step = make_eval_step(cfg, model, threshold=0.3)

        ref = np.asarray(step(variables["params"],
                              variables["batch_stats"], batch))

        mesh = make_mesh_2d(4, 2)
        sharded = shard_batch(batch, mesh, view_axis="view")
        got = np.asarray(step(variables["params"],
                              variables["batch_stats"], sharded))
        # resharding changes f32 reduction order; tiny diffs amplify
        # through the iterative triangulation of random-weight queries —
        # allow sub-percent drift (mm-scale outputs)
        np.testing.assert_allclose(got, ref, rtol=1e-2, atol=1.0)


class TestSkipNonfinite:
    def test_nonfinite_updates_are_dropped(self):
        """TRAIN.SKIP_NONFINITE wraps the optimizer in
        optax.apply_if_finite: a NaN gradient must produce a zero update
        (params untouched) while a finite gradient still steps."""
        from mvgformer_tpu.core.train import make_optimizer

        cfg = small_cfg()
        cfg.TRAIN.SKIP_NONFINITE = True
        tx = make_optimizer(cfg, steps_per_epoch=10)
        params = {"backbone": {"w": jnp.ones((3,))},
                  "decoder": {"w": jnp.ones((3,))}}
        state = tx.init(params)

        bad = jax.tree_util.tree_map(
            lambda p: jnp.full_like(p, jnp.nan), params)
        upd, state2 = tx.update(bad, state, params)
        assert all(float(jnp.abs(u).max()) == 0.0
                   for u in jax.tree_util.tree_leaves(upd))

        good = jax.tree_util.tree_map(jnp.ones_like, params)
        upd2, _ = tx.update(good, state2, params)
        # decoder group must actually move (backbone frozen by default)
        assert float(jnp.abs(upd2["decoder"]["w"]).max()) > 0.0


def test_lr_warmup_schedule():
    """TRAIN.WARMUP_EPOCHS ramps 0 -> LR linearly, then the multistep
    decay applies at LR_STEP epochs (measured from epoch 0, matching the
    reference's epoch-indexed milestones)."""
    from mvgformer_tpu.core.train import make_lr_schedule

    cfg = small_cfg()
    cfg.TRAIN.LR = 1e-3
    cfg.TRAIN.WARMUP_EPOCHS = 2
    cfg.TRAIN.LR_STEP = [4]
    cfg.TRAIN.LR_FACTOR = 0.1
    cfg.TRAIN.END_EPOCH = 6
    s = make_lr_schedule(cfg, steps_per_epoch=10)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(10)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(20)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(s(39)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(s(41)), 1e-4, rtol=1e-6)
