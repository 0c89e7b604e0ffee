"""Windowed layer-1 sampling vs the exact gather sampler.

The windowed formulation (ops/window_sampling.py) must agree with
deform_sample exactly (up to row dtype) whenever every sample stays
within `halo - 2` px of its query's static center — which holds by
construction at offset init (radial bias <= n_points px,
projattn.py:96-107). Escaped samples read zero, and their weight mass is
reported; both behaviors are pinned here.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvgformer_tpu.ops.sampling import deform_sample
from mvgformer_tpu.ops.window_sampling import (build_window_plan,
                                               window_sample)

SHAPES = ((24, 40), (12, 20), (6, 10))
V, Lq, H, P, D = 2, 50, 4, 3, 8
L = len(SHAPES)


def make_inputs(seed, offset_px, centers_rng=None):
    rng = np.random.RandomState(seed)
    len_in = sum(h * w for h, w in SHAPES)
    value = rng.randn(V, len_in, H, D).astype(np.float32)
    # static centers in [0,1] normalized coords per level
    centers = rng.uniform(0.05, 0.95, (V, Lq, 2)).astype(np.float32)
    # per-level normalized center + per-sample offsets of +-offset_px
    locs = np.zeros((V, Lq, H, L, P, 2), np.float32)
    centers_px = np.zeros((V, Lq, L, 2), np.float32)
    for lvl, (h, w) in enumerate(SHAPES):
        wh = np.array([w, h], np.float32)
        off = rng.uniform(-offset_px, offset_px,
                          (V, Lq, H, P, 2)).astype(np.float32)
        locs[:, :, :, lvl] = centers[:, :, None, None] + off / wh
        centers_px[:, :, lvl] = centers * wh - 0.5
    aw = rng.rand(V, Lq, H, L, P).astype(np.float32)
    aw /= aw.sum(axis=(3, 4), keepdims=True)
    return value, locs, aw, centers_px


class TestWindowSampling:
    def test_matches_exact_within_halo(self):
        value, locs, aw, centers_px = make_inputs(0, offset_px=3.0)
        plan = build_window_plan(centers_px, SHAPES, tile=4, halo=6)
        ref = deform_sample(jnp.asarray(value), SHAPES,
                            jnp.asarray(locs), jnp.asarray(aw))
        got, esc = jax.jit(lambda v, l, a: window_sample(
            v, SHAPES, l, a, plan, row_dtype=jnp.float32))(
            jnp.asarray(value), jnp.asarray(locs), jnp.asarray(aw))
        assert float(esc) < 1e-5, float(esc)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_matches_exact_bf16_rows(self):
        value, locs, aw, centers_px = make_inputs(1, offset_px=3.0)
        plan = build_window_plan(centers_px, SHAPES, tile=4, halo=6)
        ref = deform_sample(jnp.asarray(value), SHAPES,
                            jnp.asarray(locs), jnp.asarray(aw))
        got, _ = jax.jit(lambda v, l, a: window_sample(
            v, SHAPES, l, a, plan, row_dtype=jnp.bfloat16))(
            jnp.asarray(value), jnp.asarray(locs), jnp.asarray(aw))
        # bf16 weight rows: ~3 decimal digits on the bilinear weights
        err = np.abs(np.asarray(got) - np.asarray(ref))
        scale = np.abs(np.asarray(ref)).max()
        assert err.max() < 2e-2 * scale, (err.max(), scale)

    def test_escapes_read_zero_and_are_counted(self):
        value, locs, aw, centers_px = make_inputs(2, offset_px=0.5)
        # push one sample far outside its window but inside the map
        locs = locs.copy()
        locs[0, 7, 1, 0, 0] = np.array([0.5, 0.5]) + 0.45
        plan = build_window_plan(centers_px, SHAPES, tile=4, halo=6)
        got, esc = jax.jit(lambda v, l, a: window_sample(
            v, SHAPES, l, a, plan, row_dtype=jnp.float32))(
            jnp.asarray(value), jnp.asarray(locs), jnp.asarray(aw))
        # escaped mass equals that sample's attention weight
        np.testing.assert_allclose(float(esc), float(aw[0, 7, 1, 0, 0]),
                                   rtol=1e-5)
        # the rest of the op still matches the exact sampler with that
        # sample's contribution removed
        aw_zeroed = aw.copy()
        aw_zeroed[0, 7, 1, 0, 0] = 0.0
        ref = deform_sample(jnp.asarray(value), SHAPES,
                            jnp.asarray(locs), jnp.asarray(aw_zeroed))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.slow
    def test_full_model_windowed_matches_exact(self):
        """End to end: MVGFormer with the rig-static windowed layer-1
        plan must match the exact-gather model at offset init (the radial
        bias keeps every sample within the halo)."""
        import sys

        sys.path.insert(0, "tests")
        from test_model import small_cfg

        from mvgformer_tpu.data.synthetic import make_batch
        from mvgformer_tpu.models.mvgformer import (
            MVGFormer, build_layer1_window_plan)

        cfg = small_cfg()
        model = MVGFormer(cfg=cfg)
        batch = make_batch(cfg, batch_size=2, seed=0, num_people=2)
        variables = model.init(jax.random.PRNGKey(0), batch)
        plan = build_layer1_window_plan(cfg, batch.view_data)
        ref = model.apply(variables, batch, threshold=0.3)
        got = model.apply(variables, batch, threshold=0.3,
                          window_plan=plan)
        np.testing.assert_allclose(
            np.asarray(got[-1]["pred_logits"]),
            np.asarray(ref[-1]["pred_logits"]), atol=1e-4)
        # bf16 weight rows perturb layer-1 features ~1e-3; random-init
        # triangulation amplifies that to the mm / sub-px class
        np.testing.assert_allclose(
            np.asarray(got[-1]["pred_poses"]),
            np.asarray(ref[-1]["pred_poses"]), atol=4.0)
        np.testing.assert_allclose(
            np.asarray(got[-1]["pred_poses_2d"]),
            np.asarray(ref[-1]["pred_poses_2d"]), atol=1.0)

    @pytest.mark.parametrize("impl", ["pallas", "pallas_dma"])
    def test_pallas_impl_matches_exact(self, impl):
        """The Pallas window kernels (interpret mode off-TPU) must agree
        with the exact sampler within bf16-weight-row tolerance at a
        small clamp-class window (K = 4 + 2*6 = 16). pallas_dma is the
        window-DMA kernel (ops/window_dma.py): same math, windows DMA'd
        straight from the padded map instead of a materialized tile
        buffer."""
        value, locs, aw, centers_px = make_inputs(5, offset_px=3.0)
        plan = build_window_plan(centers_px, SHAPES, tile=4, halo=6,
                                 impl=impl)
        ref = deform_sample(jnp.asarray(value), SHAPES,
                            jnp.asarray(locs), jnp.asarray(aw))
        got, esc = jax.jit(lambda v, l, a: window_sample(
            v, SHAPES, l, a, plan))(
            jnp.asarray(value), jnp.asarray(locs), jnp.asarray(aw))
        assert float(esc) < 1e-5, float(esc)
        err = np.abs(np.asarray(got, np.float32) - np.asarray(ref))
        scale = np.abs(np.asarray(ref)).max()
        # bf16 rows AND bf16 kernel output: ~2 decimal digits
        assert err.max() < 4e-2 * scale, (err.max(), scale)

    def test_small_halo_exact_for_clamped_offsets(self):
        """The clamped-offset fast path's op-level premise: offsets
        bounded by halo - 2 px make even a SMALL window exact."""
        value, locs, aw, centers_px = make_inputs(4, offset_px=1.9)
        plan = build_window_plan(centers_px, SHAPES, tile=4, halo=4)
        ref = deform_sample(jnp.asarray(value), SHAPES,
                            jnp.asarray(locs), jnp.asarray(aw))
        got, esc = jax.jit(lambda v, l, a: window_sample(
            v, SHAPES, l, a, plan, row_dtype=jnp.float32))(
            jnp.asarray(value), jnp.asarray(locs), jnp.asarray(aw))
        assert float(esc) < 1e-5, float(esc)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.slow
    def test_full_model_clamped_window_matches_clamped_gather(self):
        """DECODER.layer1_offset_clamp: the clamp binds (radial-bias init
        reaches dec_n_points px > clamp), the window halo derives from the
        clamp (ceil(clamp) + 2), and the windowed model must match the
        clamped-GATHER model — the clamp sits upstream in ProjAttn and is
        shared by both sampling paths."""
        import sys

        sys.path.insert(0, "tests")
        from test_model import small_cfg

        from mvgformer_tpu.data.synthetic import make_batch
        from mvgformer_tpu.models.mvgformer import (
            MVGFormer, build_layer1_window_plan)

        cfg = small_cfg()
        cfg.DECODER.layer1_offset_clamp = 1.0
        model = MVGFormer(cfg=cfg)
        batch = make_batch(cfg, batch_size=2, seed=0, num_people=2)
        variables = model.init(jax.random.PRNGKey(0), batch)
        plan = build_layer1_window_plan(cfg, batch.view_data)
        assert plan.halo == 3  # ceil(1.0) + 2
        ref = model.apply(variables, batch, threshold=0.3)
        got = model.apply(variables, batch, threshold=0.3,
                          window_plan=plan)
        np.testing.assert_allclose(
            np.asarray(got[-1]["pred_logits"]),
            np.asarray(ref[-1]["pred_logits"]), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(got[-1]["pred_poses"]),
            np.asarray(ref[-1]["pred_poses"]), atol=4.0)
        # the clamp itself must be live: unclamped gather differs
        cfg_off = small_cfg()
        model_off = MVGFormer(cfg=cfg_off)
        base = model_off.apply(variables, batch, threshold=0.3)
        assert np.abs(np.asarray(base[-1]["pred_poses"])
                      - np.asarray(ref[-1]["pred_poses"])).max() > 1e-3

    def test_clamp_halo_consistency_guard(self):
        """A halo too small for the clamp must be rejected at plan-build
        time (escaped samples would silently read zero)."""
        import sys

        sys.path.insert(0, "tests")
        from test_model import small_cfg

        from mvgformer_tpu.data.synthetic import make_batch
        from mvgformer_tpu.models.mvgformer import build_layer1_window_plan

        cfg = small_cfg()
        cfg.DECODER.layer1_offset_clamp = 4.0
        cfg.DECODER.layer1_window_halo = 3
        batch = make_batch(cfg, batch_size=1, seed=0, num_people=1)
        with pytest.raises(ValueError, match="layer1_offset_clamp"):
            build_layer1_window_plan(cfg, batch.view_data)

    def test_border_zero_padding_semantics(self):
        """Centers near the map edge: out-of-map stencil pixels must read
        zero exactly as in the exact sampler."""
        rng = np.random.RandomState(3)
        len_in = sum(h * w for h, w in SHAPES)
        value = rng.randn(V, len_in, H, D).astype(np.float32)
        centers = rng.uniform(0.0, 0.06, (V, Lq, 2)).astype(np.float32)
        locs = np.zeros((V, Lq, H, L, P, 2), np.float32)
        centers_px = np.zeros((V, Lq, L, 2), np.float32)
        for lvl, (h, w) in enumerate(SHAPES):
            wh = np.array([w, h], np.float32)
            off = rng.uniform(-3, 3, (V, Lq, H, P, 2)).astype(np.float32)
            locs[:, :, :, lvl] = centers[:, :, None, None] + off / wh
            centers_px[:, :, lvl] = centers * wh - 0.5
        aw = rng.rand(V, Lq, H, L, P).astype(np.float32)
        plan = build_window_plan(centers_px, SHAPES, tile=4, halo=6)
        ref = deform_sample(jnp.asarray(value), SHAPES,
                            jnp.asarray(locs), jnp.asarray(aw))
        got, esc = jax.jit(lambda v, l, a: window_sample(
            v, SHAPES, l, a, plan, row_dtype=jnp.float32))(
            jnp.asarray(value), jnp.asarray(locs), jnp.asarray(aw))
        assert float(esc) < 1e-5, float(esc)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
