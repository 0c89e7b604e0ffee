"""Evaluation metric tests: NMS parity, AP/MPJPE/PCP behavior."""

import os

import numpy as np
import pytest

from mvgformer_tpu.core.evaluate import (
    evaluate_ap_mpjpe, evaluate_pcp, eval_list_to_ap)
from mvgformer_tpu.core.nms import apply_pose_nms, nearby_joints_nms
from mvgformer_tpu.data.synthetic import make_people

from oracles import reference_available, _init_paths

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available")


def _pred_from_people(people, score=0.9, flag=0.0):
    n = len(people)
    out = np.zeros((n, people.shape[1], 5), dtype=np.float32)
    out[:, :, :3] = people
    out[:, :, 3] = flag
    out[:, :, 4] = score
    return out


class TestNMS:
    @needs_ref
    def test_matches_reference_nms(self, rng):
        _init_paths()
        import core.nms as ref_nms  # type: ignore

        people = make_people(6, seed=1)
        # duplicate two instances with small perturbations and lower scores
        dup = people[:2] + rng.normal(0, 15.0, people[:2].shape)
        kpts = _pred_from_people(np.concatenate([people, dup]))
        kpts[:, 0, 4] = np.linspace(0.9, 0.3, len(kpts))

        ours = nearby_joints_nms(kpts, dist_thr=0.3,
                                 num_nearby_joints_thr=7)
        theirs = ref_nms.nearby_joints_nms(kpts, 0.3,
                                           num_nearby_joints_thr=7)
        assert list(ours) == list(theirs)
        assert len(ours) == 6  # duplicates suppressed

    def test_apply_pose_nms_filters_flag(self):
        people = make_people(3, seed=2)
        kpts = _pred_from_people(people)
        kpts[0, :, 3] = -1  # below threshold
        out = apply_pose_nms(kpts)
        assert len(out) == 2


class TestAP:
    def test_perfect_predictions(self):
        gts = [make_people(3, seed=i) for i in range(4)]
        preds = [_pred_from_people(g) for g in gts]
        m = evaluate_ap_mpjpe(preds, gts)
        assert m["ap@25"] == pytest.approx(1.0, abs=1e-3)
        assert m["mpjpe"] == pytest.approx(0.0, abs=1e-3)
        assert m["recall@500"] == pytest.approx(1.0)

    def test_noise_degrades_ap25_not_ap150(self, rng):
        gts = [make_people(3, seed=i) for i in range(4)]
        preds = [_pred_from_people(
            g + rng.normal(0, 30.0, g.shape)) for g in gts]
        m = evaluate_ap_mpjpe(preds, gts)
        assert m["ap@150"] > 0.99
        assert m["ap@25"] < m["ap@150"]
        assert 10.0 < m["mpjpe"] < 120.0

    def test_false_positives_hurt_ap(self):
        gts = [make_people(2, seed=5)]
        fp = make_people(2, seed=9) + 4000.0
        pred = np.concatenate([
            _pred_from_people(gts[0], score=0.8),
            _pred_from_people(fp, score=0.9),  # confident false positives
        ])
        m = evaluate_ap_mpjpe([pred], gts)
        assert m["ap@25"] < 0.6

    @needs_ref
    def test_ap_matches_reference_helper(self, rng):
        """_eval_list_to_ap parity on a random eval list."""
        _init_paths()
        from dataset.panoptic import Panoptic  # type: ignore

        eval_list = [{"mpjpe": float(rng.uniform(0, 200)),
                      "score": float(rng.uniform(0, 1)),
                      "gt_id": int(rng.randint(0, 12))}
                     for _ in range(40)]
        total_gt = 12
        for t in (25, 50, 100):
            ours = eval_list_to_ap([dict(e) for e in eval_list], total_gt, t)
            theirs = Panoptic._eval_list_to_ap(
                [dict(e) for e in eval_list], total_gt, t)
            assert ours[0] == pytest.approx(theirs[0], abs=1e-9)
            assert ours[1] == pytest.approx(theirs[1], abs=1e-9)


class TestPCP:
    def test_perfect_pcp(self):
        people = make_people(3, seed=0)[:, :14]  # 14-joint format
        preds = [_pred_from_people(people)] * 5
        gts = [[people[a] for a in range(3)]] * 5
        actor_pcp, avg_pcp, bone_pcp, recall = evaluate_pcp(
            preds, gts, num_actors=3)
        assert avg_pcp == pytest.approx(1.0)
        assert recall == pytest.approx(1.0, abs=1e-6)

    def test_missing_actor_skipped(self):
        people = make_people(3, seed=0)[:, :14]
        preds = [_pred_from_people(people[:2])]
        gts = [[people[0], people[1], np.zeros((0,))]]
        actor_pcp, avg_pcp, _, recall = evaluate_pcp(preds, gts,
                                                     num_actors=3)
        assert actor_pcp[0] == pytest.approx(1.0)
        assert actor_pcp[2] == 0.0


class TestExtendedLosses:
    def _setup(self):
        import jax
        from mvgformer_tpu.core.criterion import compute_losses, \
            match_queries
        from mvgformer_tpu.data.synthetic import make_batch
        from mvgformer_tpu.models.mvgformer import MVGFormer
        from test_model import small_cfg
        return jax, compute_losses, match_queries, make_batch, MVGFormer, \
            small_cfg

    @pytest.mark.parametrize("joint_type", ["l1", "l2", "mpjpe"])
    @pytest.mark.slow
    def test_joint_loss_types(self, joint_type):
        jax, compute_losses, match_queries, make_batch, MVGFormer, \
            small_cfg = self._setup()
        cfg = small_cfg(**{"DECODER.loss_joint_type": joint_type,
                           "DECODER.use_loss_pose_perbone": True,
                           "DECODER.use_loss_pose_perprojection": True})
        model = MVGFormer(cfg=cfg)
        batch = make_batch(cfg, batch_size=1, seed=0, num_people=2)
        variables = model.init(jax.random.PRNGKey(0), batch)
        match = match_queries(
            cfg, model.bind(variables).initial_reference_points(1), batch)
        outs = model.apply(variables, batch, query_mask=match.query_mask)
        losses = compute_losses(cfg, outs, batch, match)
        for key in ("loss_pose_perjoint", "loss_pose_perbone",
                    "loss_pose_perprojection", "total"):
            v = float(np.asarray(losses[key]))
            assert np.isfinite(v) and v >= 0, (key, v)

    def test_perfect_prediction_zero_loss(self):
        """Per-joint/bone/projection losses vanish when predictions equal
        the matched gt."""
        jax, compute_losses, match_queries, make_batch, MVGFormer, \
            small_cfg = self._setup()
        import jax.numpy as jnp
        # K=1 so each gt matches a distinct nearest query (duplicate
        # matches would rightly make the loss nonzero)
        cfg = small_cfg(**{"DECODER.use_loss_pose_perbone": True,
                           "DECODER.use_loss_pose_perprojection": True,
                           "DECODER.match_method_value": 1})
        batch = make_batch(cfg, batch_size=1, seed=1, num_people=2)
        model = MVGFormer(cfg=cfg)
        match = match_queries(
            cfg, MVGFormer(cfg=cfg).initial_reference_points_static(1),
            batch)
        Q, J = cfg.DECODER.num_instance, cfg.DECODER.num_keypoints
        # construct outputs equal to matched gt
        gt = np.asarray(batch.targets.joints_3d)  # (1, M, J, 3)
        pred = np.zeros((1, Q, J, 3), np.float32)
        qidx = np.asarray(match.query_idx)
        valid = np.asarray(match.gt_valid)
        for m in range(qidx.shape[1]):
            if not valid[0, m]:
                continue  # padded gt slots still carry (masked) indices
            for k in range(qidx.shape[2]):
                pred[0, qidx[0, m, k]] = gt[0, m]
        fake_out = {
            "pred_logits": jnp.full((1, Q, 2), -10.0),
            "pred_poses": jnp.asarray(pred.reshape(1, Q * J, 3)),
        }
        losses = compute_losses(cfg, [fake_out], batch, match)
        assert float(losses["loss_pose_perjoint"]) < 1e-4
        assert float(losses["loss_pose_perbone"]) < 1e-4
        assert float(losses["loss_pose_perprojection"]) < 1e-2


def test_detr_style_matching_without_gt_match():
    """gt_match=False: per-layer matching on outputs + init loss."""
    import jax
    import jax.numpy as jnp
    from mvgformer_tpu.core.criterion import compute_losses
    from mvgformer_tpu.data.synthetic import make_batch
    from mvgformer_tpu.models.mvgformer import MVGFormer
    from test_model import small_cfg

    cfg = small_cfg(**{"DECODER.gt_match": False,
                       "DECODER.loss_weight_init": 1.0})
    model = MVGFormer(cfg=cfg)
    batch = make_batch(cfg, batch_size=1, seed=0, num_people=2)
    variables = model.init(jax.random.PRNGKey(0), batch)
    outs = model.apply(variables, batch, threshold=0.0)
    init_ref = model.initial_reference_points_static(1)
    losses = compute_losses(cfg, outs, batch, match=None,
                            init_reference=init_ref)
    assert np.isfinite(float(losses["total"]))
    assert float(losses["loss_init"]) > 0


def test_visualization_savers(tmp_path):
    from mvgformer_tpu.data.synthetic import make_batch, make_people
    from mvgformer_tpu.utils.visualization import (
        save_2d_overlay, save_3d_poses, save_view_grid, visualize_frame)
    from test_model import small_cfg

    cfg = small_cfg()
    batch = make_batch(cfg, batch_size=1, seed=0, num_people=2, render=True)
    people = make_people(2, seed=0)
    save_3d_poses(str(tmp_path / "p3d.png"), people, people)
    save_2d_overlay(str(tmp_path / "ov.png"),
                    np.asarray(batch.views[0, 0]),
                    np.random.rand(2, 15, 2) * 60)
    save_view_grid(str(tmp_path / "grid.png"), np.asarray(batch.views[0]))
    pred = np.zeros((4, 15, 5), np.float32)
    pred[:2, :, 3] = 0
    pred[2:, :, 3] = -1
    pred[:, :, :3] = np.concatenate([people, people])
    visualize_frame(str(tmp_path), 0, batch, pred)
    for f in ("p3d.png", "ov.png", "grid.png", "0_joints3d.png"):
        assert (tmp_path / f).exists(), f


def test_attention_point_overlays(tmp_path):
    """ProjAttn sows sampling locations/weights; visualize_frame draws
    the per-layer attention-point overlays from them
    (visualize_proj_attention, lib/utils/vis.py:82-202)."""
    import jax

    from mvgformer_tpu.data.synthetic import make_batch
    from mvgformer_tpu.models.mvgformer import MVGFormer
    from mvgformer_tpu.utils.visualization import visualize_frame
    from test_model import small_cfg

    cfg = small_cfg()
    model = MVGFormer(cfg=cfg)
    batch = make_batch(cfg, batch_size=1, seed=0, num_people=2,
                       render=True)
    variables = model.init(jax.random.PRNGKey(0), batch)
    outs, state = model.apply(variables, batch, threshold=0.0,
                              mutable=["intermediates"])
    inter = state["intermediates"]
    loc = inter["decoder"]["layer_0"]["proj_attn"][
        "sampling_locations"][0]
    V = batch.views.shape[1]
    L = len(cfg.DECODER.use_feat_level)
    assert loc.shape[0] == V and loc.shape[-1] == 2 and loc.shape[3] == L
    pred = np.zeros((2, 15, 5), np.float32)
    visualize_frame(str(tmp_path), 7, batch, pred, intermediates=inter)
    assert (tmp_path / "7_layer_0_view0_attn.png").exists(), \
        list(tmp_path.iterdir())


def test_observability_breakdown():
    from mvgformer_tpu.core.evaluate import evaluate_by_observability

    people_a = make_people(1, seed=0)   # seen by all 3 cameras
    people_b = make_people(1, seed=1)   # seen by only 1 camera
    gts = [np.concatenate([people_a, people_b])]
    preds = [_pred_from_people(gts[0])]
    vis = np.ones((3, 2, 15), np.float32)
    vis[1:, 1, :] = 0.0  # person b invisible in cameras 1, 2
    out = evaluate_by_observability(preds, gts, [vis], num_views=3,
                                    ob_percentiles=[0])
    assert (100, 3) in out and (100, 1) in out
    assert out[(100, 3)]["num_gt"] == 1
    assert out[(100, 1)]["num_gt"] == 1
    assert out[(100, 3)]["ap@25"] == pytest.approx(1.0, abs=1e-3)


def test_use_ce_match():
    """use_ce_match: CE supervises per-layer Hungarian-on-outputs
    assignments while pose losses keep the gt-match assignment."""
    import jax
    from mvgformer_tpu.core.criterion import compute_losses, match_queries
    from mvgformer_tpu.data.synthetic import make_batch
    from mvgformer_tpu.models.mvgformer import MVGFormer
    from test_model import small_cfg

    cfg = small_cfg(**{"DECODER.use_ce_match": True})
    model = MVGFormer(cfg=cfg)
    batch = make_batch(cfg, batch_size=1, seed=0, num_people=2)
    variables = model.init(jax.random.PRNGKey(0), batch)
    match = match_queries(
        cfg, model.initial_reference_points_static(1), batch)
    outs = model.apply(variables, batch, query_mask=match.query_mask)
    losses = compute_losses(cfg, outs, batch, match)
    assert np.isfinite(float(losses["total"]))


@pytest.mark.slow
def test_use_ce_match_differentiable():
    """use_ce_match runs a Hungarian pure_callback inside the
    differentiated loss; the assignment cost must be stop-gradiented or
    jax.grad crashes with 'Pure callbacks do not support JVP'."""
    import jax
    import jax.numpy as jnp

    from mvgformer_tpu.core.criterion import compute_losses, match_queries
    from mvgformer_tpu.data.synthetic import make_batch
    from mvgformer_tpu.models.mvgformer import MVGFormer
    from test_model import small_cfg

    cfg = small_cfg(**{"DECODER.use_ce_match": True})
    model = MVGFormer(cfg=cfg)
    batch = make_batch(cfg, batch_size=1, seed=0, num_people=2)
    variables = model.init(jax.random.PRNGKey(0), batch)
    match = match_queries(cfg, model.initial_reference_points_static(1),
                          batch)

    def loss_fn(params):
        outs = model.apply({"params": params,
                            "batch_stats": variables["batch_stats"]},
                           batch, query_mask=match.query_mask)
        return compute_losses(cfg, outs, batch, match)["total"]

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads["decoder"])
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)


def test_threshold_match_ignores_padding_and_weights_real_pairs():
    """'multiple' matching: zero-padded gt slots must not win the argmin,
    and unfilled top-k slots must carry zero pair weight."""
    import jax.numpy as jnp
    import numpy as np

    from mvgformer_tpu.models.matcher import threshold_match

    B, Q, M = 1, 6, 3
    cost = np.full((B, Q, M), 50.0, np.float32)
    # queries 0,1 are close to gt 0; query 2 close to gt 1
    cost[0, 0, 0] = 1.0
    cost[0, 1, 0] = 2.0
    cost[0, 2, 1] = 1.5
    # padding slot (gt 2, beyond num_person) is artificially the best
    # match for every query — it must be ignored
    cost[0, :, 2] = 0.01
    m = threshold_match(jnp.asarray(cost), jnp.asarray([2]), thresh=5.0,
                        k_cap=4)
    assert m.pair_valid is not None
    pv = np.asarray(m.pair_valid)[0]  # (M, K)
    assert pv[0].sum() == 2 and pv[1].sum() == 1  # real matches only
    assert pv[2].sum() == 0                       # padding slot empty
    qi = np.asarray(m.query_idx)[0]
    assert set(qi[0][pv[0]]) == {0, 1}
    assert set(qi[1][pv[1]]) == {2}
    qm = np.asarray(m.query_mask)[0]
    assert list(np.nonzero(qm)[0]) == [0, 1, 2]


def test_debug_savers_3d_cubes_epipolar(tmp_path):
    """The reference's exotic debug savers (vis.py:683-837): per-sample
    3D pred-vs-gt grids, root-cube scatters, and the epipolar offline
    pickle, rebuilt over the Batch pytree."""
    import pickle

    from mvgformer_tpu.data.synthetic import make_batch, make_people
    from mvgformer_tpu.utils.visualization import (
        save_debug_3d_cubes, save_debug_3d_images,
        save_debug_epipolar_dump)
    from test_model import small_cfg

    cfg = small_cfg()
    batch = make_batch(cfg, batch_size=2, seed=0, num_people=2,
                       render=True)
    people = make_people(2, seed=0)
    preds = np.zeros((2, 4, 15, 5), np.float32)
    preds[:, 2:, :, 3] = -1.0
    preds[:, :2, :, :3] = people
    prefix = str(tmp_path / "val" / "frame0")
    f1 = save_debug_3d_images(cfg, batch, preds, prefix, show_id=True)
    roots = preds[:, :, 0, :4]
    f2 = save_debug_3d_cubes(cfg, batch, roots, prefix)
    f3 = save_debug_epipolar_dump(batch, prefix,
                                  extras={"note": np.arange(3)})
    assert f1.endswith("3d_joints/frame0_3d.png") and os.path.exists(f1)
    assert f2.endswith("root_cubes/frame0_root.png") and os.path.exists(f2)
    with open(f3, "rb") as fh:
        dump = pickle.load(fh)
    V = batch.views.shape[1]
    n = int(np.asarray(batch.targets.num_person)[0])
    assert dump["view0_img"].shape == tuple(batch.views.shape[2:])
    assert dump["view0_joints_2d"].shape == (n, 15, 2)
    assert dump["view0_joints_vis"].shape[0] == n
    assert {f"view{v}_img" for v in range(V)} <= set(dump)
    assert dump["note"].tolist() == [0, 1, 2]
    # the projected gt 2D joints should be mostly inside the net image
    w, h = cfg.NETWORK.IMAGE_SIZE
    pts = dump["view0_joints_2d"].reshape(-1, 2)
    frac_in = np.mean((pts[:, 0] >= 0) & (pts[:, 0] < w)
                      & (pts[:, 1] >= 0) & (pts[:, 1] < h))
    assert frac_in > 0.5, frac_in
