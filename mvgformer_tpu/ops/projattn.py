"""Projective attention (ProjAttn) — flax module.

Functional mirror of /root/reference/lib/models/ops/modules/projattn.py:42-204
with the same parameter surface (sampling_offsets / attention_weights /
rayconv / output_proj linears, radial-grid offsets-bias init) and the same
forward math, including the reference's row-major reshape of per-level head
outputs (projattn.py:180-184), which with num_feature_levels=1 scrambles the
(level, head, point) axes in a specific, trained-in way — replicated exactly
here so converted checkpoints are bit-compatible.

Difference from the reference: all views are processed in one call with the
(batch*views) folded leading dim instead of a Python loop over views
(lib/models/dq_decoder.py:553-592) — one fused XLA program.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mvgformer_tpu.ops.sampling import (bilinear_sample, deform_sample,
    deform_sample_corner)


def radial_offsets_bias_init(n_heads: int, n_levels: int, n_points: int):
    """Radial grid init of the sampling-offsets bias (projattn.py:96-107)."""

    def init(key, shape, dtype=jnp.float32):
        thetas = jnp.arange(n_heads, dtype=jnp.float32) * (
            2.0 * math.pi / n_heads)
        grid = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], axis=-1)
        grid = grid / jnp.max(jnp.abs(grid), axis=-1, keepdims=True)
        grid = jnp.tile(grid.reshape(n_heads, 1, 1, 2),
                        (1, n_levels, n_points, 1))
        scale = jnp.arange(1, n_points + 1, dtype=jnp.float32)
        grid = grid * scale[None, None, :, None]
        flat = grid.reshape(-1)
        assert flat.shape == shape, (flat.shape, shape)
        return flat.astype(dtype)

    return init


class ProjAttn(nn.Module):
    """Projective attention over multi-scale per-view feature maps."""

    d_model: int = 256
    n_levels: int = 1  # cfg.DECODER.num_feature_levels
    n_heads: int = 8
    n_points: int = 8
    posembed_mode: str = "ablation_not_use_rayconv"
    # 'corner' = fast exact 4-corner-table gather (default); 'simple' = the
    # straightforward 4x row-gather reference implementation
    sampling_impl: str = "corner"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self,
                 query: jnp.ndarray,
                 reference_points: jnp.ndarray,
                 src_views: Sequence[jnp.ndarray],
                 spatial_shapes: Sequence[Tuple[int, int]],
                 camera_ray_embeds: Optional[jnp.ndarray] = None,
                 window_plan=None,
                 offset_clamp_px: Optional[float] = None,
                 point_topm: Optional[int] = None,
                 sample_chunks: Optional[int] = None) -> jnp.ndarray:
        """
        Args:
            query:            (N, Lq, C) per-view query features (already
                              pos-embedded by the caller).
            reference_points: (N, Lq, L, 2) per-level [0,1] sampling centers
                              (the decoder pre-multiplies by S/(S-1),
                              dq_decoder.py:570-573).
            src_views:        list of per-level (N, h, w, C) feature maps
                              (NHWC — TPU-native; the reference is NCHW).
            spatial_shapes:   static ((h, w), ...) matching src_views.
            camera_ray_embeds: (N, sum hw, 3) ray dirs (use_rayconv mode) or
                              (N, sum hw, 2) coords (use_2d_coordconv mode).

        Returns:
            (N, Lq, C) attended features.
        """
        N, Lq, C = query.shape
        feat_lvls = len(src_views)
        H, P = self.n_heads, self.n_points
        assert C == self.d_model

        # --- sample the per-level reference-point feature (projattn.py:147-153)
        # grid_sample(align_corners=False) on grid clamp(2r-1, -1.1, 1.1)
        # src_views are NHWC: (N, h, w, C)
        ref_feats = []
        for lvl, (h, w) in enumerate(spatial_shapes):
            g = jnp.clip(reference_points[:, :, lvl, :] * 2.0 - 1.0,
                         -1.1, 1.1)
            x = (g[..., 0] + 1.0) * 0.5 * w - 0.5
            y = (g[..., 1] + 1.0) * 0.5 * h - 0.5
            v = src_views[lvl].reshape(N, h * w, C)
            ref_feats.append(bilinear_sample(v, x, y, h, w))  # (N, Lq, C)
        ref_feats = jnp.stack(ref_feats, axis=2)  # (N, Lq, L, C)

        # --- value projection over flattened levels (projattn.py:160-175)
        input_flatten = jnp.concatenate(
            [s.reshape(N, -1, C) for s in src_views], axis=1)  # (N,Len_in,C)
        if self.posembed_mode == "use_rayconv":
            assert camera_ray_embeds is not None
            input_flatten = jnp.concatenate(
                [input_flatten, camera_ray_embeds.astype(input_flatten.dtype)],
                axis=-1)
        elif self.posembed_mode == "use_2d_coordconv":
            assert camera_ray_embeds is not None
            input_flatten = jnp.concatenate(
                [input_flatten, camera_ray_embeds.astype(input_flatten.dtype)],
                axis=-1)
        elif self.posembed_mode != "ablation_not_use_rayconv":
            raise ValueError(self.posembed_mode)

        xavier = nn.initializers.xavier_uniform()
        value = nn.Dense(self.d_model, kernel_init=xavier, name="rayconv",
                         dtype=self.dtype)(input_flatten)
        Len_in = value.shape[1]
        value = value.reshape(N, Len_in, H, self.d_model // H)

        # --- offsets & weights from (ref feat + query) (projattn.py:180-184)
        mix = (ref_feats + query[:, :, None, :]).astype(self.dtype)
        off_dim = H * self.n_levels * P * 2
        offsets = nn.Dense(
            off_dim,
            kernel_init=nn.initializers.zeros,
            bias_init=radial_offsets_bias_init(H, self.n_levels, P),
            name="sampling_offsets",
            dtype=jnp.float32,
        )(mix)  # (N, Lq, L, off_dim)
        wdim = H * self.n_levels * P
        weights = nn.Dense(
            wdim,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
            dtype=jnp.float32,
        )(mix)  # (N, Lq, L, wdim)

        # torch-style row-major reinterpretation across the stacked level
        # axis (projattn.py:180-184). total levels = feat_lvls * n_levels.
        Lt = feat_lvls * self.n_levels
        offsets = offsets.reshape(N, Lq, H, Lt, P, 2)
        if offset_clamp_px is not None:
            # semantics-changing fast path (DECODER.layer1_offset_clamp):
            # bound learned offsets to +-clamp px in each level's own
            # pixel units so a small-halo window covers every sample
            offsets = jnp.clip(offsets, -float(offset_clamp_px),
                               float(offset_clamp_px))
        weights = weights.reshape(N, Lq, H, Lt * P)
        weights = jax.nn.softmax(weights, axis=-1).reshape(N, Lq, H, Lt, P)

        # --- sampling locations (projattn.py:186-191)
        shapes_arr = jnp.asarray(spatial_shapes, dtype=jnp.float32)  # (L,(h,w))
        normalizer = jnp.stack(
            [shapes_arr[:, 1], shapes_arr[:, 0]], axis=-1)  # (L, 2) = (w, h)
        locations = (reference_points[:, :, None, :, None, :]
                     + offsets / normalizer[None, None, None, :, None, :])

        if point_topm is not None and point_topm < P:
            # semantics-changing fast path (DECODER.inference_point_topm):
            # keep only the top-m points per (query, head, level) by
            # attention weight and renormalize GLOBALLY over (level, point)
            # so total attention mass stays 1 and the learned cross-level
            # balance is preserved. Rows into the deformable gather — the
            # measured per-frame wall — scale by m/P.
            m = int(point_topm)
            w_sel, p_idx = jax.lax.top_k(weights, m)  # (N, Lq, H, Lt, m)
            kept_mass = jnp.sum(w_sel, axis=(-2, -1), keepdims=True)
            weights = w_sel / jnp.maximum(kept_mass, 1e-6)
            # select the kept points' locations with a one-hot einsum
            # (pure VPU math) instead of take_along_axis: the tiny-slice
            # gather over (N*Lq*H*Lt*m) rows of (1, 2) costs ~127 ms at
            # dense production shapes vs ~1.8 ms for the einsum
            # (tools/probes/probe_ptop_indirection.py, v5e 2026-08-19) —
            # it was the entire reason ptop measured fps-negative in r4.
            onehot = jax.nn.one_hot(p_idx, P, dtype=locations.dtype)
            locations = jnp.einsum("nqhlmp,nqhlpc->nqhlmc",
                                   onehot, locations)

        # debug taps for attention-point overlays (visualize_proj_attention,
        # lib/utils/vis.py:82-202); materialized only when the caller asks
        # for mutable=['intermediates'], free otherwise
        self.sow("intermediates", "sampling_locations", locations)
        self.sow("intermediates", "sampling_weights", weights)

        if window_plan is not None:
            # rig-static windowed fast path (layer 1 only; see
            # ops/window_sampling.py for semantics + escape telemetry)
            from mvgformer_tpu.ops.window_sampling import window_sample

            out, esc = window_sample(value, spatial_shapes,
                                     locations.astype(jnp.float32),
                                     weights.astype(jnp.float32),
                                     window_plan)
            self.sow("intermediates", "escaped_mass", esc)
        else:
            if self.sampling_impl == "corner":
                # sample_chunks (TRAIN.SAMPLE_CHUNKS): query-chunked
                # rematerialized gather — divides the training
                # backward's gathered-rows residual peak by `chunks`
                # (see ops/sampling.py); inference callers pass None
                out = deform_sample_corner(
                    value, spatial_shapes,
                    locations.astype(jnp.float32),
                    weights.astype(value.dtype),
                    query_chunks=sample_chunks)
            else:
                out = deform_sample(value, spatial_shapes,
                                    locations.astype(jnp.float32),
                                    weights.astype(value.dtype))
        out = nn.Dense(self.d_model, kernel_init=xavier, name="output_proj",
                       dtype=self.dtype)(out)
        return out
