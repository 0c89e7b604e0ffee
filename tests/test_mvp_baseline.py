"""MvP baseline model tests + use_rayconv ProjAttn parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvgformer_tpu.data.synthetic import make_batch
from mvgformer_tpu.models.mvp_decoder import MvPTransformer
from mvgformer_tpu.ops import ProjAttn

from oracles import reference_available, ref_projattn
from test_model import small_cfg

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available")

SHAPES = ((16, 30), (8, 15), (4, 8))


class TestMvPBaseline:
    @pytest.mark.parametrize("mode", ["ablation_not_use_rayconv",
                                      "use_rayconv"])
    @pytest.mark.slow
    def test_forward_shapes(self, mode):
        cfg = small_cfg(**{
            "DECODER.projattn_posembed_mode": mode,
            "DECODER.fuse_view_feats": "cat_proj",
            "DECODER.num_instance": 8,
        })
        model = MvPTransformer(cfg=cfg)
        batch = make_batch(cfg, batch_size=1, seed=0, num_people=2)
        variables = model.init(jax.random.PRNGKey(0), batch)
        outs = model.apply(variables, batch)
        assert len(outs) == cfg.DECODER.num_decoder_layers
        Q, J = cfg.DECODER.num_instance, cfg.DECODER.num_keypoints
        for out in outs:
            assert out["pred_logits"].shape == (1, Q, 2)
            assert out["pred_poses"].shape == (1, Q * J, 3)
            assert np.all(np.isfinite(np.asarray(out["pred_poses"])))

    @pytest.mark.parametrize("fuse", ["mean", "sum_proj",
                                      "attn_fuse_dot_prod",
                                      "attn_fuse_subtract"])
    def test_fusion_modes(self, fuse):
        cfg = small_cfg(**{"DECODER.fuse_view_feats": fuse,
                           "DECODER.num_instance": 4,
                           "DECODER.num_decoder_layers": 1})
        model = MvPTransformer(cfg=cfg)
        batch = make_batch(cfg, batch_size=1, seed=1, num_people=1)
        variables = model.init(jax.random.PRNGKey(0), batch)
        outs = model.apply(variables, batch)
        assert np.all(np.isfinite(np.asarray(outs[-1]["pred_poses"])))


class TestRayconvParity:
    @needs_ref
    @pytest.mark.slow
    def test_use_rayconv_matches_reference(self, rng):
        import torch
        from test_projattn import _copy_torch_linear

        RefProjAttn = ref_projattn()
        d_model, n_heads, n_points, n_levels = 64, 4, 6, 1
        N, lq = 3, 10
        torch.manual_seed(1)
        ref = RefProjAttn(d_model, n_levels, n_heads, n_points,
                          "use_rayconv").eval()

        src_views = [rng.randn(N, d_model, h, w).astype(np.float32)
                     for h, w in SHAPES]
        query = rng.randn(N, lq, d_model).astype(np.float32)
        refpts = rng.uniform(0.05, 0.95,
                             size=(N, lq, 1, 2)).astype(np.float32)
        shp = np.asarray(SHAPES, dtype=np.float32)
        wh = shp[:, ::-1]
        refpts_expand = refpts * wh / (wh - 1.0)
        # per-level (N, h, w, 3) ray embeddings, reference passes a list
        rays = [rng.randn(N, h, w, 3).astype(np.float32) for h, w in SHAPES]

        src_nhwc = [np.transpose(s, (0, 2, 3, 1)) for s in src_views]
        rays_flat = np.concatenate(
            [r.reshape(N, -1, 3) for r in rays], axis=1)

        mod = ProjAttn(d_model=d_model, n_levels=n_levels, n_heads=n_heads,
                       n_points=n_points, posembed_mode="use_rayconv")
        params = mod.init(jax.random.PRNGKey(0), jnp.asarray(query),
                          jnp.asarray(refpts_expand),
                          [jnp.asarray(s) for s in src_nhwc], SHAPES,
                          camera_ray_embeds=jnp.asarray(rays_flat))
        p = jax.tree_util.tree_map(lambda x: x, params)["params"]
        _copy_torch_linear(p, ref.sampling_offsets, "sampling_offsets")
        _copy_torch_linear(p, ref.attention_weights, "attention_weights")
        _copy_torch_linear(p, ref.rayconv, "rayconv")
        _copy_torch_linear(p, ref.output_proj, "output_proj")

        ours = np.asarray(mod.apply(
            {"params": p}, jnp.asarray(query), jnp.asarray(refpts_expand),
            [jnp.asarray(s) for s in src_nhwc], SHAPES,
            camera_ray_embeds=jnp.asarray(rays_flat)))

        lsi = np.cumsum([0] + [h * w for h, w in SHAPES])[:-1]
        with torch.no_grad():
            theirs = ref(
                torch.as_tensor(query),
                torch.as_tensor(refpts_expand),
                [torch.as_tensor(s) for s in src_views],
                [torch.as_tensor(r) for r in rays],
                torch.as_tensor(np.asarray(SHAPES, dtype=np.int64)),
                torch.as_tensor(lsi.astype(np.int64)),
                None,
            ).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


class TestMvPDispatch:
    """TRANSFORMER dispatch (reference run/train_3d.py:245-250) plus the
    MvP baseline running end-to-end through the shared train/eval steps."""

    def test_build_model_dispatch(self):
        from mvgformer_tpu.models import build_model
        from mvgformer_tpu.models.mvgformer import MVGFormer

        cfg = small_cfg()
        assert isinstance(build_model(cfg), MVGFormer)
        cfg.TRANSFORMER = "multi_view_pose_transformer"
        assert isinstance(build_model(cfg), MvPTransformer)
        cfg.TRANSFORMER = "bogus"
        with pytest.raises(ValueError):
            build_model(cfg)

    @pytest.mark.slow
    def test_mvp_train_step_decreases_loss(self):
        from mvgformer_tpu.core.train import (create_train_state,
                                              make_train_step)

        cfg = small_cfg(**{"DECODER.num_instance": 8,
                           "DECODER.num_decoder_layers": 2})
        cfg.TRANSFORMER = "multi_view_pose_transformer"
        cfg.TRAIN.LR = 1e-3
        model = MvPTransformer(cfg=cfg)
        batch = make_batch(cfg, batch_size=1, seed=0, num_people=2,
                           render=True)
        state, tx = create_train_state(cfg, model, batch,
                                       jax.random.PRNGKey(0))
        step = make_train_step(cfg, model, tx, donate=False)
        rng = jax.random.PRNGKey(1)
        losses = []
        for _ in range(8):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, batch, sub)
            losses.append(float(metrics["total"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses

    @pytest.mark.slow
    def test_mvp_eval_step_pred_format(self):
        from mvgformer_tpu.core.train import make_eval_step

        cfg = small_cfg(**{"DECODER.num_instance": 8})
        cfg.TRANSFORMER = "multi_view_pose_transformer"
        model = MvPTransformer(cfg=cfg)
        batch = make_batch(cfg, batch_size=1, seed=0, num_people=2)
        variables = model.init(jax.random.PRNGKey(0), batch)
        step = make_eval_step(cfg, model, threshold=0.1)
        pred = np.asarray(step(variables["params"],
                               variables.get("batch_stats", {}), batch))
        Q, J = cfg.DECODER.num_instance, cfg.DECODER.num_keypoints
        assert pred.shape == (1, Q, J, 5)
        assert np.all(np.isfinite(pred[..., :3]))
        assert set(np.unique(pred[..., 3])) <= {-1.0, 0.0}


class TestEvalLossStep:
    @pytest.mark.slow
    def test_eval_loss_dict(self):
        """DEBUG.LOG_VAL_LOSS support: criterion on eval batches
        (reference lib/core/function.py:413-576)."""
        from mvgformer_tpu.core.train import make_eval_loss_step
        from mvgformer_tpu.models.mvgformer import MVGFormer

        cfg = small_cfg()
        model = MVGFormer(cfg=cfg)
        batch = make_batch(cfg, batch_size=1, seed=0, num_people=2)
        variables = model.init(jax.random.PRNGKey(0), batch)
        step = make_eval_loss_step(cfg, model, threshold=0.1)
        losses = step(variables["params"],
                      variables.get("batch_stats", {}), batch)
        for key in ("total", "loss_ce", "loss_pose_perjoint"):
            assert key in losses
            assert np.isfinite(float(losses[key])), (key, losses[key])
