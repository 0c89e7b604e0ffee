"""End-to-end model smoke + behavior tests on a small config."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvgformer_tpu.config import load_config
from mvgformer_tpu.core.criterion import compute_losses, match_queries
from mvgformer_tpu.data.synthetic import make_batch
from mvgformer_tpu.models.mvgformer import MVGFormer


def small_cfg(**overrides):
    cfg = load_config()
    cfg.NETWORK.IMAGE_SIZE = [96, 64]   # (W, H)
    cfg.DECODER.d_model = 32
    cfg.POSE_RESNET.NUM_DECONV_FILTERS = [32, 32, 32]
    cfg.POSE_RESNET.NUM_LAYERS = 18
    cfg.DECODER.dim_feedforward = 64
    cfg.DECODER.nhead = 4
    cfg.DECODER.dec_n_points = 2
    cfg.DECODER.num_decoder_layers = 2
    cfg.DECODER.num_instance = 16
    cfg.DATASET.CAMERA_NUM = 3
    cfg.MULTI_PERSON.MAX_PEOPLE_NUM = 4
    cfg.PARALLEL.COMPUTE_DTYPE = "float32"
    for k, v in overrides.items():
        parts = k.split(".")
        obj = cfg
        for p in parts[:-1]:
            obj = getattr(obj, p)
        setattr(obj, parts[-1], v)
    return cfg


@pytest.fixture(scope="module")
def setup():
    cfg = small_cfg()
    model = MVGFormer(cfg=cfg)
    batch = make_batch(cfg, batch_size=2, seed=0, num_people=2)
    variables = model.init(jax.random.PRNGKey(0), batch)
    return cfg, model, batch, variables


class TestForward:
    def test_output_shapes(self, setup):
        cfg, model, batch, variables = setup
        outs = model.apply(variables, batch, threshold=0.1)
        assert len(outs) == cfg.DECODER.num_decoder_layers
        B, Q, J = 2, cfg.DECODER.num_instance, cfg.DECODER.num_keypoints
        V = cfg.DATASET.CAMERA_NUM
        for out in outs:
            assert out["pred_logits"].shape == (B, Q, 2)
            assert out["pred_poses"].shape == (B, Q * J, 3)
            assert out["pred_poses_2d"].shape == (B, V, Q * J, 2)
            assert out["pred_poses_2d_proj"].shape == (B, V, Q * J, 2)
        for out in outs:
            for v in out.values():
                assert np.all(np.isfinite(np.asarray(v)))

    def test_masked_queries_are_zeroed(self, setup):
        """Queries outside the mask produce zero poses (the reference's
        scatter-to-zeros, dq_decoder.py:1011-1029)."""
        cfg, model, batch, variables = setup
        Q = cfg.DECODER.num_instance
        mask = np.zeros((2, Q), dtype=bool)
        mask[:, :3] = True
        outs = model.apply(variables, batch, query_mask=jnp.asarray(mask))
        poses = np.asarray(outs[-1]["pred_poses"]).reshape(2, Q, -1)
        assert np.all(poses[:, 3:] == 0)
        assert np.any(poses[:, :3] != 0)

    def test_triangulated_points_in_space(self, setup):
        """With an all-pass mask, triangulated layer-1 points stay finite and
        roughly in the capture space."""
        cfg, model, batch, variables = setup
        Q = cfg.DECODER.num_instance
        mask = np.ones((2, Q), dtype=bool)
        outs = model.apply(variables, batch, query_mask=jnp.asarray(mask))
        pts = np.asarray(outs[0]["pred_poses"])
        assert np.all(np.isfinite(pts))
        assert np.percentile(np.abs(pts), 99) < 5e4  # mm


class TestLosses:
    def test_match_and_losses(self, setup):
        cfg, model, batch, variables = setup
        init_ref = np.asarray(
            model.bind(variables).initial_reference_points(2))
        match = match_queries(cfg, jnp.asarray(init_ref), batch)
        K = int(cfg.DECODER.match_method_value)
        assert match.query_idx.shape == (2, cfg.MULTI_PERSON.MAX_PEOPLE_NUM,
                                         K)
        # 2 people per sample -> exactly 2*K matched queries unless dup
        n_matched = np.asarray(match.query_mask).sum(axis=1)
        assert np.all(n_matched >= K) and np.all(n_matched <= 2 * K)

        outs = model.apply(variables, batch, query_mask=match.query_mask)
        losses = compute_losses(cfg, outs, batch, match)
        for key in ("loss_ce", "loss_pose_perjoint",
                    "loss_pose_perprojection_2d", "total"):
            val = np.asarray(losses[key])
            assert np.isfinite(val), key
            assert val >= 0, key

    @pytest.mark.slow
    def test_grads_finite(self, setup):
        cfg, model, batch, variables = setup
        match = match_queries(
            cfg, model.bind(variables).initial_reference_points(2), batch)

        def loss_fn(params):
            outs = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                batch, query_mask=match.query_mask)
            return compute_losses(cfg, outs, batch, match)["total"]

        grads = jax.grad(loss_fn)(variables["params"])
        flat, _ = jax.tree_util.tree_flatten(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
        # decoder heads must receive gradient
        gd = grads["decoder"]["layer_0"]["pose_embed"]["MLP"]["layers_0"][
            "kernel"]
        assert np.abs(np.asarray(gd)).sum() > 0

    def test_knn_matches_nearest(self):
        """KNN(K=1) picks the query whose init pose is nearest each gt."""
        cfg = small_cfg(**{"DECODER.match_method_value": 1})
        model = MVGFormer(cfg=cfg)
        batch = make_batch(cfg, batch_size=1, seed=3, num_people=3)
        init_ref = MVGFormer(cfg=cfg).cfg and None
        # build init refs without initializing the full model
        from mvgformer_tpu.models.mvgformer import (
            load_tpose, sample_space_reference_points)
        refs = sample_space_reference_points(
            cfg.DECODER.num_instance, load_tpose(None),
            cfg.MULTI_PERSON.SPACE_SIZE, cfg.MULTI_PERSON.SPACE_CENTER)
        refs = jnp.asarray(refs)[None]
        match = match_queries(cfg, refs, batch)
        J = cfg.DECODER.num_keypoints
        pred = np.asarray(refs).reshape(1, -1, J, 3)
        gt = np.asarray(batch.targets.joints_3d)
        n = int(batch.targets.num_person[0])
        cost = 0.01 * np.abs(pred[0][:, None] - gt[0][None]).sum((-1, -2))
        expect = cost.argmin(axis=0)  # (M,)
        got = np.asarray(match.query_idx)[0, :, 0]
        np.testing.assert_array_equal(got[:n], expect[:n])


class TestTopKCompaction:
    @pytest.mark.slow
    def test_topk_matches_dense_for_kept_queries(self):
        """With top-K compaction, kept queries' outputs must equal the dense
        run exactly; dropped queries read as zeros."""
        cfg = small_cfg()
        model_dense = MVGFormer(cfg=cfg)
        batch = make_batch(cfg, batch_size=2, seed=5, num_people=2)
        variables = model_dense.init(jax.random.PRNGKey(0), batch)
        outs_dense = model_dense.apply(variables, batch, threshold=0.0)

        cfg2 = small_cfg()
        cfg2.DECODER.inference_topk_queries = 6
        model_topk = MVGFormer(cfg=cfg2)
        outs_topk = model_topk.apply(variables, batch, threshold=0.0)

        Q = cfg.DECODER.num_instance
        J = cfg.DECODER.num_keypoints
        score0 = np.asarray(
            jax.nn.sigmoid(outs_dense[0]["pred_logits"][..., 1]))
        for b in range(2):
            kept = set(np.argsort(-score0[b])[:6].tolist())
            dense = np.asarray(outs_dense[-1]["pred_poses"]).reshape(
                2, Q, J, 3)[b]
            topk = np.asarray(outs_topk[-1]["pred_poses"]).reshape(
                2, Q, J, 3)[b]
            for q in range(Q):
                if q in kept:
                    np.testing.assert_allclose(topk[q], dense[q],
                                               rtol=1e-4, atol=1e-3)
                else:
                    np.testing.assert_array_equal(topk[q], 0)

    @pytest.mark.slow
    def test_topk_ignored_in_training(self):
        cfg = small_cfg()
        cfg.DECODER.inference_topk_queries = 4
        model = MVGFormer(cfg=cfg)
        batch = make_batch(cfg, batch_size=1, seed=1, num_people=2)
        variables = model.init(jax.random.PRNGKey(0), batch)
        Q = cfg.DECODER.num_instance
        mask = np.ones((1, Q), dtype=bool)
        outs = model.apply(variables, batch, query_mask=jnp.asarray(mask),
                           train=True, rngs={"dropout": jax.random.PRNGKey(2)})
        poses = np.asarray(outs[-1]["pred_poses"]).reshape(1, Q, -1)
        # all queries active in training regardless of the topk knob
        assert (np.abs(poses).sum(-1) > 0).sum() == Q


class TestPointTopM:
    """DECODER.inference_point_topm end-to-end wiring (the selection math
    itself is unit-tested in tests/test_projattn.py::TestPointTopM)."""

    def test_eval_runs_and_differs_from_dense(self):
        cfg = small_cfg()
        model = MVGFormer(cfg=cfg)
        batch = make_batch(cfg, batch_size=1, seed=3, num_people=2)
        variables = model.init(jax.random.PRNGKey(0), batch)
        outs_full = model.apply(variables, batch, threshold=0.0)

        cfg2 = small_cfg()
        # small_cfg has dec_n_points=2, so top-1 is the live selection
        cfg2.DECODER.inference_point_topm = 1
        outs_m = MVGFormer(cfg=cfg2).apply(variables, batch, threshold=0.0)
        full = np.asarray(outs_full[-1]["pred_poses"])
        sparse = np.asarray(outs_m[-1]["pred_poses"])
        assert sparse.shape == full.shape
        assert np.isfinite(sparse).all()
        # fresh init has uniform attention weights, so dropping points is
        # a real perturbation — outputs must differ (wiring is live)
        assert not np.allclose(sparse, full)

    def test_ignored_in_training(self):
        cfg = small_cfg()
        cfg.DECODER.inference_point_topm = 2
        model = MVGFormer(cfg=cfg)
        batch = make_batch(cfg, batch_size=1, seed=1, num_people=2)
        variables = model.init(jax.random.PRNGKey(0), batch)
        Q = cfg.DECODER.num_instance
        mask = np.ones((1, Q), dtype=bool)
        outs_t = model.apply(variables, batch, query_mask=jnp.asarray(mask),
                             train=True,
                             rngs={"dropout": jax.random.PRNGKey(2)})
        cfg2 = small_cfg()
        model2 = MVGFormer(cfg=cfg2)
        outs_f = model2.apply(variables, batch,
                              query_mask=jnp.asarray(mask), train=True,
                              rngs={"dropout": jax.random.PRNGKey(2)})
        np.testing.assert_array_equal(
            np.asarray(outs_t[-1]["pred_poses"]),
            np.asarray(outs_f[-1]["pred_poses"]))


@pytest.mark.slow
def test_st_triangulation_method_runs():
    """triangulation_method 'st' wires structural triangulation end-to-end."""
    cfg = small_cfg(**{"DECODER.triangulation_method": "st",
                       "DECODER.num_instance": 4})
    model = MVGFormer(cfg=cfg)
    batch = make_batch(cfg, batch_size=1, seed=0, num_people=2)
    variables = model.init(jax.random.PRNGKey(0), batch)
    outs = model.apply(variables, batch, threshold=0.0)
    poses = np.asarray(outs[-1]["pred_poses"])
    assert np.all(np.isfinite(poses))


class TestInitRefMethods:
    @pytest.mark.parametrize("method", ["query_adapt", "query_adapt_center"])
    def test_query_adapt(self, method):
        cfg = small_cfg(**{"DECODER.init_ref_method": method})
        model = MVGFormer(cfg=cfg)
        batch = make_batch(cfg, batch_size=1, seed=0, num_people=2)
        variables = model.init(jax.random.PRNGKey(0), batch)
        assert "reference_feats" in variables["params"]
        outs = model.apply(variables, batch, threshold=0.0)
        assert np.all(np.isfinite(np.asarray(outs[-1]["pred_poses"])))

    def test_query_adapt_batch_consistent(self):
        """The adaptive init pools per-sample features from the
        view-major (V*B) fold; item 0 of a 2-batch must see exactly the
        same pooled features as a 1-batch of the same frame (a plain
        reshape(B, -1) would scramble features across samples)."""
        cfg = small_cfg(**{"DECODER.init_ref_method": "query_adapt"})
        model = MVGFormer(cfg=cfg)
        b2 = make_batch(cfg, batch_size=2, seed=0, num_people=2)
        b1 = jax.tree_util.tree_map(lambda a: a[:1], b2)
        variables = model.init(jax.random.PRNGKey(0), b2)
        out2 = np.asarray(model.apply(variables, b2,
                                      threshold=0.0)[-1]["pred_poses"])
        out1 = np.asarray(model.apply(variables, b1,
                                      threshold=0.0)[-1]["pred_poses"])
        np.testing.assert_allclose(out2[0], out1[0], rtol=1e-3, atol=0.5)

    def test_voxcel_pose_base(self):
        """Reference points straight from attached voxelpose predictions
        (dq_transformer.py:260-263,325-327); num_instance must equal the
        voxelpose slot count."""
        import dataclasses

        cfg = small_cfg(**{"DECODER.init_ref_method": "voxcel_pose_base",
                           "DECODER.num_instance": 4})
        model = MVGFormer(cfg=cfg)
        batch = make_batch(cfg, batch_size=1, seed=0, num_people=2)
        M, J = 4, cfg.NETWORK.NUM_JOINTS
        vp = np.zeros((1, M, J, 5), np.float32)
        vp[..., :3] = np.asarray(batch.targets.joints_3d)[:, :M, :J]
        vp[..., 4] = 0.9
        batch = dataclasses.replace(
            batch, targets=dataclasses.replace(batch.targets,
                                               voxelpose_pred=vp))
        variables = model.init(jax.random.PRNGKey(0), batch)
        outs = model.apply(variables, batch, threshold=0.0)
        assert np.all(np.isfinite(np.asarray(outs[-1]["pred_poses"])))

        # missing preds and mismatched query count both raise
        batch_no_vp = make_batch(cfg, batch_size=1, seed=0, num_people=2)
        with pytest.raises(ValueError, match="voxcel_pose_base"):
            model.apply(variables, batch_no_vp, threshold=0.0)
        cfg_bad = small_cfg(
            **{"DECODER.init_ref_method": "voxcel_pose_base",
               "DECODER.num_instance": 16})
        model_bad = MVGFormer(cfg=cfg_bad)
        with pytest.raises(ValueError, match="num_instance"):
            model_bad.init(jax.random.PRNGKey(0), batch)

    def test_gt_noise(self):
        cfg = small_cfg(**{"DECODER.init_ref_method": "gt_noise",
                           "DECODER.init_ref_method_value": 50.0})
        model = MVGFormer(cfg=cfg)
        batch = make_batch(cfg, batch_size=1, seed=0, num_people=2)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "init_ref": jax.random.PRNGKey(1)}, batch)
        outs = model.apply(variables, batch, threshold=0.0,
                           rngs={"init_ref": jax.random.PRNGKey(2)})
        assert np.all(np.isfinite(np.asarray(outs[-1]["pred_poses"])))


def test_hungarian_match_in_traced_step():
    """match_method 'hungarian' runs inside jit via pure_callback and picks
    the optimal one-to-one assignment."""
    from mvgformer_tpu.core.criterion import match_queries

    cfg = small_cfg(**{"DECODER.match_method": "hungarian"})
    batch = make_batch(cfg, batch_size=2, seed=4, num_people=3)
    refs = MVGFormer(cfg=cfg).initial_reference_points_static(2)

    match = jax.jit(lambda r, b: match_queries(cfg, r, b))(refs, batch)
    J = cfg.DECODER.num_keypoints
    pred = np.asarray(refs).reshape(2, -1, J, 3)
    gt = np.asarray(batch.targets.joints_3d)
    from scipy.optimize import linear_sum_assignment
    for b in range(2):
        n = int(batch.targets.num_person[b])
        cost = 0.01 * np.abs(
            pred[b][:, None] - gt[b][None]).sum((-1, -2))[:, :n]
        q_ids, g_ids = linear_sum_assignment(cost)
        got = np.asarray(match.query_idx)[b, :, 0]
        for q, g in zip(q_ids, g_ids):
            assert got[g] == q
        assert np.asarray(match.gt_valid)[b, :n].all()
        assert not np.asarray(match.gt_valid)[b, n:].any()


def test_clamp_refs_to_space_bounds_next_layer_only():
    """DECODER.clamp_refs_to_space clips the refs fed to the NEXT layer
    (from-scratch stabilizer) while every layer's own raw output is
    untouched — so layer 0's outputs match the unclamped model exactly
    and later layers may diverge."""
    # a tiny space box so random-init layer-1 triangulations land
    # outside it and the clamp actually binds
    space = {"MULTI_PERSON.SPACE_SIZE": [800.0, 800.0, 800.0]}
    cfg = small_cfg(**space)
    model = MVGFormer(cfg=cfg)
    batch = make_batch(cfg, batch_size=1, seed=3, num_people=2)
    variables = model.init(jax.random.PRNGKey(0), batch)

    cfg_c = small_cfg(**{"DECODER.clamp_refs_to_space": True, **space})
    model_c = MVGFormer(cfg=cfg_c)
    ref = model.apply(variables, batch, threshold=0.3)
    got = model_c.apply(variables, batch, threshold=0.3)
    np.testing.assert_array_equal(np.asarray(got[0]["pred_poses"]),
                                  np.asarray(ref[0]["pred_poses"]))
    # the clamp box must actually bound the refs the next layer consumed:
    # outputs themselves stay raw, so just assert the knob is live
    assert not np.array_equal(np.asarray(got[-1]["pred_poses"]),
                              np.asarray(ref[-1]["pred_poses"]))
