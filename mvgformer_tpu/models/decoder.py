"""Dynamic-query decoder: iterative project → attend → refine → triangulate.

TPU-native re-design of DQDecoderLayer / DQDecoder
(/root/reference/lib/models/dq_decoder.py:248-1172). The reference filters
"active" queries per layer with host-side index bookkeeping
(padding_query_with_mask, dq_decoder.py:615-656) to skip triangulation work;
here everything is **dense with a boolean query mask** (SURVEY.md §7 design
delta 1): every layer computes offsets and triangulation for all Q queries
and masks the updates (`where(mask, triangulated, 0)`), reproducing the
reference's scatter-to-zeros semantics (dq_decoder.py:1011-1029) in one
static-shape fused XLA program with zero host syncs.

Per layer (numbers refer to the reference flow):
  1. project each query's 3D joints into every camera with full distortion,
     bounds-mask, clamp, map to network-image coords (project_ref_points,
     dq_decoder.py:331-397) — all views at once, no cv2;
  2. projective attention over multi-scale per-view features (ProjAttn);
     out-of-image features zeroed via the bounds mask (:585-588);
  3. fuse mean-over-views features into the query features (update_feature,
     :763-848) + optional FFN;
  4. classify queries; the active mask comes from gt-match indices (train),
     a score threshold, or 'all' (generate_valid_masks, :596-612);
  5. per-view offset net -> refined 2D + per-view confidence softmax
     (calculate_2d_offsets, :659-717);
  6. inverse-affine to the original image, undistort, confidence-weighted
     DLT triangulation (learnable_triangulate, :399-514);
  7. masked update: inactive queries' outputs and next-layer reference
     points become zeros, as in the reference's dense scatter (:1011-1029).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from jax.ad_checkpoint import checkpoint_name

from mvgformer_tpu.data.meta import ViewData
from mvgformer_tpu.geometry.cameras import (
    project_points,
    projection_matrices,
    undistort_points,
)
from mvgformer_tpu.geometry.transforms import apply_affine
from mvgformer_tpu.geometry.structural import structural_triangulate
from mvgformer_tpu.geometry.triangulate import (clip_cotangent,
                                                triangulate_dlt)
from mvgformer_tpu.models.mlp import MLP, OffsetNet
from mvgformer_tpu.ops.projattn import ProjAttn


def with_pos_embed(x, pos):
    return x if pos is None else x + pos


def project_reference_points(reference_points: jnp.ndarray,
                             view_data: ViewData,
                             spatial_shapes,
                             img_size,
                             detach: bool = True):
    """3D refs -> per-view normalized net-image points + bounds mask.

    reference_points: (B, Nq, 3) absolute mm.
    Returns (ref2d_norm (B,V,Nq,2), ref2d_lvl (B,V,Nq,L,2), bounds
    (B,V,Nq)). Mirrors dq_decoder.py:331-397 with the per-item cv2 call
    replaced by the precomputed batched affine. Module-level so the
    windowed-sampling plan builder (ops/window_sampling.py) can reuse the
    exact same math for the static layer-1 centers."""
    refs = reference_points
    if detach:
        refs = jax.lax.stop_gradient(refs)
    B, Nq, _ = refs.shape
    x = jnp.broadcast_to(refs[:, None], (B, view_data.num_views, Nq, 3))
    pix = project_points(x.astype(jnp.float32), view_data.cameras)

    wh = view_data.centers * 2.0  # (B, V, 2); dq_decoder.py:374
    bounds = ((pix[..., 0] >= 0) & (pix[..., 1] >= 0)
              & (pix[..., 0] < wh[..., 0:1])
              & (pix[..., 1] < wh[..., 1:2]))
    # per-view scalar clamp hi = wh.max() over (batch, 2) — the reference
    # clamps with the current view's scalar max (dq_decoder.py:383)
    hi = jnp.max(wh, axis=(0, 2))  # (V,)
    pix = jnp.clip(pix, -1.0, hi[None, :, None, None])

    net = apply_affine(pix, view_data.affine)
    img_wh = jnp.asarray(img_size, dtype=jnp.float32)
    norm = net / img_wh

    shapes = jnp.asarray(spatial_shapes, dtype=jnp.float32)  # (L, (h,w))
    whl = shapes[:, ::-1]  # (L, 2) = (w, h)
    # per-level S/(S-1) expansion (dq_decoder.py:570-573)
    lvl = norm[..., None, :] * (whl / (whl - 1.0))
    return norm, lvl, bounds


class DQDecoderLayer(nn.Module):
    """One iterative-geometry decoder layer (dense-masked)."""

    d_model: int = 256
    d_ffn: int = 1024
    dropout: float = 0.1
    n_levels: int = 1           # cfg.DECODER.num_feature_levels
    n_heads: int = 8
    n_points: int = 8
    img_size: Tuple[int, int] = (960, 512)  # (W, H) network image
    num_joints: int = 15
    detach_refpoints: bool = True
    feature_update_method: str = "MLP"
    init_self_attention: bool = False
    open_forward_ffn: bool = True
    posembed_mode: str = "ablation_not_use_rayconv"
    triangulation_solver: str = "eigh"  # 'svd' | 'eigh' | 'jacobi' | 'st'
    # target bone lengths (J-1,) for 'st' (structural triangulation);
    # defaults are derived from the T-pose asset by the top model
    st_bone_lengths: tuple = None
    st_n_steps: int = 1
    bayesian_update: bool = False
    pose_embed_layers: int = 3
    # TRAIN.TRI_GRAD_CLIP: clip the cotangent norm arriving at the
    # triangulation's 2D/confidence inputs (training only; see
    # geometry/triangulate.py clip_cotangent)
    tri_grad_clip: Optional[float] = None
    # TRAIN.SAMPLE_CHUNKS: query-chunked rematerialized deformable
    # gather in the TRAINING forward (ops/sampling.py query_chunks) —
    # divides the backward's gathered-rows HBM peak by `chunks`.
    # Inference is never chunked.
    train_sample_chunks: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    def project_ref_points(self, reference_points: jnp.ndarray,
                           view_data: ViewData,
                           spatial_shapes) -> Tuple[jnp.ndarray, jnp.ndarray,
                                                    jnp.ndarray]:
        """See project_reference_points (module level)."""
        return project_reference_points(
            reference_points, view_data, spatial_shapes, self.img_size,
            detach=self.detach_refpoints)

    def update_feature(self, tgt, attn_mean, query_pos, train: bool):
        """Fuse attended features into query features (dq_decoder.py:763-848).
        attn_mean: (B, Nq, C) mean over views."""
        method = self.feature_update_method
        drop = nn.Dropout(self.dropout, deterministic=not train,
                          name="dropout2")
        norm2 = nn.LayerNorm(dtype=self.dtype, name="norm2")
        if method == "MLP":
            tgt2 = nn.Dense(self.d_model, dtype=self.dtype,
                            name="feature_update_mlp")(attn_mean)
            return norm2(tgt + drop(tgt2))
        if method == "MLP0":
            return nn.Dense(self.d_model, dtype=self.dtype,
                            name="feature_update_mlp")(attn_mean)
        if method == "MLPr":
            tgt2 = nn.Dense(self.d_model, dtype=self.dtype,
                            name="feature_update_mlp")(attn_mean)
            return tgt + drop(tgt2)
        if method == "mean":
            drop1 = nn.Dropout(self.dropout, deterministic=not train,
                               name="dropout1")
            norm1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
            return norm1(tgt + drop1(jnp.mean(attn_mean, axis=1,
                                              keepdims=True)))
        if method.startswith("attention"):
            # attention family (dq_decoder.py:778-830): q = k = attn
            # (+pos for the 'embed' variants); the value is attn for the
            # '_tgt'-fixed variants but TGT for the original 'attention'
            # (its acknowledged bug, kept for checkpoint compatibility)
            q = k = (with_pos_embed(attn_mean, query_pos)
                     if "embed" in method else attn_mean)
            value = tgt if method == "attention" else attn_mean
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.n_heads, dtype=self.dtype,
                name="self_attn")(q, k, value)
            if method.endswith("direct"):
                return norm2(drop(attn))
            return norm2(tgt + drop(attn))
        raise ValueError(f"unknown feature_update_method: {method}")

    def forward_ffn(self, tgt, train: bool):
        """FFN block (mvp_decoder.py:92-97)."""
        act = nn.relu
        x = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(tgt)
        x = nn.Dropout(self.dropout, deterministic=not train,
                       name="dropout3")(act(x))
        x = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(x)
        x = nn.Dropout(self.dropout, deterministic=not train,
                       name="dropout4")(x)
        return nn.LayerNorm(dtype=self.dtype, name="norm3")(tgt + x)

    @nn.compact
    def __call__(self,
                 tgt: jnp.ndarray,
                 query_pos: Optional[jnp.ndarray],
                 reference_points: jnp.ndarray,
                 src_views: Sequence[jnp.ndarray],
                 spatial_shapes,
                 view_data: ViewData,
                 query_mask: Optional[jnp.ndarray] = None,
                 threshold: float = 0.5,
                 filter_method: str = "threshold",
                 train: bool = False,
                 triangulate_topk: Optional[int] = None,
                 window_plan=None,
                 offset_clamp=None,
                 point_topm: Optional[int] = None):
        """
        Args:
            tgt:              (B, Nq, C) query features, Nq = Q * J.
            query_pos:        (B, Nq, C) or None.
            reference_points: (B, Nq, 3) absolute mm.
            src_views:        list of (V*B, h, w, C) feature maps
                              (view-major fold), finest first.
            spatial_shapes:   static ((h, w), ...).
            view_data:        cameras + crops, fields (B, V, ...).
            query_mask:       (B, Q) bool — gt-match indices (train); if
                              None, derived from class prob vs `threshold`
                              (or all-pass when filter_method == 'all').
        Returns:
            (tgt_update, new_refs (B,Nq,3), refined_2d (B,V,Nq,2),
             projs_2d (B,V,Nq,2), class_prob (B,Q,2))
        """
        B, Nq, C = tgt.shape
        V = view_data.num_views
        J = self.num_joints
        Q = Nq // J
        img_wh = jnp.asarray(self.img_size, dtype=jnp.float32)

        # (1) project query joints into all views
        ref_norm, ref_lvl, bounds = self.project_ref_points(
            reference_points, view_data, spatial_shapes)

        # (1b) optional pre-attention over queries (off in live config).
        # NOTE: in the reference this block lives INSIDE generate_features
        # (dq_decoder.py:532-539) and its result is local there — it only
        # feeds the projective-attention queries; update_feature's
        # residual base stays the ORIGINAL tgt (:882). The reference
        # reuses its single self_attn + norm2 modules here (converter
        # duplicates them into init_self_attn / norm_init).
        tgt_for_attn = tgt
        if self.init_self_attention:
            q = k = with_pos_embed(tgt, query_pos)
            attn0 = nn.MultiHeadDotProductAttention(
                num_heads=self.n_heads, dtype=self.dtype,
                name="init_self_attn")(q, k, tgt)
            tgt_for_attn = nn.LayerNorm(dtype=self.dtype, name="norm_init")(
                tgt + nn.Dropout(self.dropout, deterministic=not train,
                                 name="dropout_init")(attn0))

        # (2) projective attention, all views folded (view-major: v*B + b)
        q_in = with_pos_embed(tgt_for_attn, query_pos)
        q_fold = jnp.broadcast_to(q_in[None], (V, B, Nq, C)).reshape(
            V * B, Nq, C)
        ref_fold = jnp.swapaxes(ref_lvl, 0, 1).reshape(
            V * B, Nq, len(spatial_shapes), 2)
        attn = ProjAttn(d_model=self.d_model, n_levels=self.n_levels,
                        n_heads=self.n_heads, n_points=self.n_points,
                        posembed_mode=self.posembed_mode, dtype=self.dtype,
                        name="proj_attn")(
            q_fold, ref_fold, src_views, spatial_shapes,
            window_plan=window_plan, offset_clamp_px=offset_clamp,
            point_topm=point_topm,
            sample_chunks=(self.train_sample_chunks if train else None))
        attn = attn.reshape(V, B, Nq, C)
        # zero features whose projection fell outside the image (:585-588)
        attn = attn * jnp.swapaxes(bounds, 0, 1)[..., None].astype(attn.dtype)
        # name the sampled features so the decoder's selective-remat policy
        # can save them: re-deriving this tensor is the expensive part of a
        # layer recompute (the deformable gather), while everything
        # downstream (fuse/heads/triangulation) is cheap to rebuild.
        # Outside jax.checkpoint this is a no-op.
        attn = checkpoint_name(attn, "attn_sampled")

        # (3) fuse into query features
        tgt_update = self.update_feature(tgt, jnp.mean(attn, axis=0),
                                         query_pos, train)
        if self.open_forward_ffn:
            tgt_update = self.forward_ffn(tgt_update, train)

        # (4) classify + active-query mask
        logits = nn.Dense(2, dtype=self.dtype, name="class_embed")(tgt_update)
        prob = jax.nn.sigmoid(logits.astype(jnp.float32))
        class_prob = prob.reshape(B, Q, J, 2).mean(axis=2)  # (B, Q, 2)

        if query_mask is None:
            if filter_method == "all":
                query_mask = jnp.ones((B, Q), dtype=bool)
            elif filter_method == "threshold":
                query_mask = class_prob[..., 1] > threshold
            else:
                raise ValueError(filter_method)
        mask_nq = jnp.repeat(query_mask, J, axis=1)  # (B, Nq)

        # (4b) optional in-layer compaction (inference fast path): stages
        # 5-7 (offsets, undistortion, triangulation) run only on the top-K
        # queries by class score; results are scattered back to dense.
        # The decoder reuses the same deterministic top_k for later layers.
        sel = None
        Qc, Nqc = Q, Nq
        if (triangulate_topk is not None and not train
                and triangulate_topk < Q):
            _, sel = jax.lax.top_k(class_prob[..., 1], triangulate_topk)
            Qc = triangulate_topk
            Nqc = Qc * J
            attn = jnp.swapaxes(_take_queries(
                jnp.swapaxes(attn, 0, 1), sel, J, 2), 0, 1)
            ref_norm = _take_queries(ref_norm, sel, J, 2)
            mask_nq = _take_queries(mask_nq, sel, J, 1)
            reference_points = _take_queries(reference_points, sel, J, 1)

        # (5) per-view offsets + confidences
        out2d, conf_logits = OffsetNet(self.d_model,
                                       num_layers=self.pose_embed_layers,
                                       dtype=self.dtype,
                                       name="pose_embed")(attn)
        offset_norm = out2d.astype(jnp.float32) / img_wh  # (V, B, Nq, 2)
        ref_norm_v = jnp.swapaxes(ref_norm, 0, 1)  # (V, B, Nq, 2)
        refined_norm = ref_norm_v + offset_norm
        refined_abs = refined_norm * img_wh
        projs_abs = ref_norm_v * img_wh
        conf = jax.nn.softmax(conf_logits.astype(jnp.float32), axis=0)

        # (6) triangulate (dense; masked-out queries use a safe fallback so
        # degenerate systems never poison gradients through where())
        center_fallback = jnp.broadcast_to(img_wh * 0.5, refined_abs.shape)
        tri_in = jnp.where(mask_nq[None, :, :, None], refined_abs,
                           center_fallback)
        tri_in_bv = jnp.swapaxes(tri_in, 0, 1)  # (B, V, Nq, 2)
        orig = apply_affine(tri_in_bv, view_data.inv_affine)
        orig_undist = undistort_points(orig, view_data.cameras, iter_num=5)
        proj_mats = projection_matrices(view_data.cameras, inv_trans=True)

        if self.triangulation_solver == "st":
            # structural triangulation per person query
            # (learnable_triangulate 'st', dq_decoder.py:463-468)
            pts_p = jnp.swapaxes(orig_undist, 1, 2).reshape(
                B * Qc, J, V, 2).swapaxes(1, 2)  # (B*Qc, V, J, 2)
            conf_p = jnp.transpose(conf, (1, 2, 0)).reshape(
                B * Qc, J, V).swapaxes(1, 2)  # (B*Qc, V, J)
            pm_p = jnp.broadcast_to(
                proj_mats[:, None], (B, Qc, V, 3, 4)).reshape(
                B * Qc, V, 3, 4)
            lengths = jnp.broadcast_to(
                jnp.asarray(self.st_bone_lengths, jnp.float32)[None],
                (B * Qc, J - 1))
            new_refs = structural_triangulate(
                pm_p, pts_p, conf_p, lengths,
                n_steps=self.st_n_steps).reshape(B, Nqc, 3)
        else:
            pts = jnp.swapaxes(orig_undist, 1, 2)  # (B, Nqc, V, 2)
            conf_bqv = jnp.transpose(conf, (1, 2, 0))  # (B, Nqc, V)
            if train and self.tri_grad_clip is not None:
                # from-scratch stabilizer (TRAIN.TRI_GRAD_CLIP): bound the
                # solver-amplified cotangents flowing back into the offset
                # net / confidence head; forward bit-identical
                c = float(self.tri_grad_clip)
                pts = clip_cotangent(pts, c)
                conf_bqv = clip_cotangent(
                    conf_bqv[..., None], c)[..., 0]
            pm = jnp.broadcast_to(proj_mats[:, None], (B, Nqc, V, 3, 4))
            new_refs = triangulate_dlt(pm, pts, conf_bqv,
                                       solver=self.triangulation_solver)

        if self.bayesian_update:
            bconf = jax.nn.sigmoid(nn.Dense(
                1, dtype=self.dtype, name="bayesian_conf")(attn))
            bconf = jnp.mean(bconf, axis=0).astype(jnp.float32)  # (B, Nq, 1)
            prior = reference_points.astype(jnp.float32)
            new_refs = bconf * new_refs + (1 - bconf) * prior

        # (7) masked dense update (reference scatter-to-zeros semantics)
        m3 = mask_nq[..., None]
        new_refs = jnp.where(m3, new_refs, 0.0)
        refined_out = jnp.where(mask_nq[:, None, :, None],
                                jnp.swapaxes(refined_abs, 0, 1), 0.0)
        projs_out = jnp.where(mask_nq[:, None, :, None],
                              jnp.swapaxes(projs_abs, 0, 1), 0.0)
        if sel is not None:
            new_refs = _scatter_queries(new_refs, sel, Q, J, 1)
            refined_out = _scatter_queries(refined_out, sel, Q, J, 2)
            projs_out = _scatter_queries(projs_out, sel, Q, J, 2)

        return tgt_update, new_refs, refined_out, projs_out, class_prob


def _take_queries(x: jnp.ndarray, sel: jnp.ndarray, num_joints: int,
                  q_axis: int) -> jnp.ndarray:
    """Gather per-query slices: x has a Q*J token axis at `q_axis`."""
    Q_times_J = x.shape[q_axis]
    Q = Q_times_J // num_joints
    xq = jnp.moveaxis(x, q_axis, 1)
    xq = xq.reshape((xq.shape[0], Q, num_joints) + xq.shape[2:])
    taken = jnp.take_along_axis(
        xq, sel.reshape(sel.shape + (1,) * (xq.ndim - 2)), axis=1)
    taken = taken.reshape((taken.shape[0], -1) + taken.shape[3:])
    return jnp.moveaxis(taken, 1, q_axis)


def _scatter_queries(x: jnp.ndarray, sel: jnp.ndarray, num_queries: int,
                     num_joints: int, q_axis: int) -> jnp.ndarray:
    """Inverse of _take_queries: place compacted queries into dense zeros."""
    xq = jnp.moveaxis(x, q_axis, 1)
    B = xq.shape[0]
    K = sel.shape[1]
    xq = xq.reshape((B, K, num_joints) + xq.shape[2:])
    dense = jnp.zeros((B, num_queries) + xq.shape[2:], dtype=x.dtype)
    bidx = jnp.arange(B)[:, None]
    dense = dense.at[bidx, sel].set(xq)
    dense = dense.reshape((B, num_queries * num_joints) + xq.shape[3:])
    return jnp.moveaxis(dense, 1, q_axis)


class DQDecoder(nn.Module):
    """Stack of decoder layers collecting per-layer outputs
    (dq_decoder.py:1101-1172). Layers have independent weights unless
    share_layer_weights (mvp_decoder.py:272-275).

    topk_queries (inference fast path, no reference equivalent): after the
    first layer, keep the top-K queries by class score and run layers 2..N
    compacted; outputs are scattered back to dense (dropped queries read as
    zero poses / ~zero probability, matching how the reference's filtered
    queries read in its dense outputs)."""

    num_layers: int = 4
    share_layer_weights: bool = False
    num_joints: int = 15
    layer_kwargs: dict = None
    # optional (x_lo, y_lo, z_lo, x_hi, y_hi, z_hi) mm box: next-layer
    # reference points are clipped into it (DECODER.clamp_refs_to_space).
    # Stabilizer for from-scratch training: early near-parallel-ray
    # triangulations otherwise fly to ~1e6 mm and each layer amplifies
    # the previous one's runaway. Layer OUTPUTS (and thus the loss) keep
    # the raw predictions, so the learning signal is unchanged; only the
    # iterative-refinement input is bounded. None = reference behavior.
    ref_clamp_box: tuple = None
    # rematerialize each layer in the training backward pass — the
    # flagship train step otherwise exceeds v5e HBM (PERF.md "training
    # memory"); inference is unaffected
    remat: bool = False
    # remat policy: 'full' recomputes the whole layer in the backward;
    # 'save_sampled' additionally saves the per-layer sampled attention
    # features (checkpoint_name 'attn_sampled', ~V*Nq*C bf16 ≈ 40 MB per
    # flagship layer) so the backward skips re-running the deformable
    # gather forward. Measured a wash at the flagship training config
    # (PERF.md "selective remat"): the location-gradient VJP re-gathers
    # in the backward either way.
    remat_policy: str = "full"

    @nn.compact
    def __call__(self, tgt, query_pos, reference_points, src_views,
                 spatial_shapes, view_data, query_mask=None, threshold=0.5,
                 filter_method="threshold", train=False, topk_queries=None,
                 window_plan=None, layer1_offset_clamp=None,
                 point_topm=None):
        kw = dict(self.layer_kwargs or {})
        J = self.num_joints
        Q = tgt.shape[1] // J
        outputs = []
        refs = reference_points
        box = self.ref_clamp_box
        if box is not None:
            lo = jnp.asarray(box[:3], jnp.float32)
            hi = jnp.asarray(box[3:], jnp.float32)
        out = tgt
        qpos = query_pos
        qmask = query_mask
        sel = None
        shared = (DQDecoderLayer(name="layer_shared", **kw)
                  if self.share_layer_weights else None)
        for lid in range(self.num_layers):
            layer = shared if shared is not None else DQDecoderLayer(
                name=f"layer_{lid}", **kw)
            tk = topk_queries if lid == 0 else None
            if self.remat and train:
                def body(mdl, out_, qpos_, refs_, view_data_, qmask_,
                         *src, _tk=tk):
                    return DQDecoderLayer.__call__(
                        mdl, out_, qpos_, refs_, list(src), spatial_shapes,
                        view_data_, query_mask=qmask_, threshold=threshold,
                        filter_method=filter_method, train=train,
                        triangulate_topk=_tk)

                policy = (jax.checkpoint_policies.save_only_these_names(
                    "attn_sampled")
                    if self.remat_policy == "save_sampled" else None)
                out, refs, ref2d, projs2d, class_prob = nn.remat(
                    body, prevent_cse=True, policy=policy)(
                    layer, out, qpos, refs, view_data, qmask, *src_views)
            else:
                out, refs, ref2d, projs2d, class_prob = layer(
                    out, qpos, refs, src_views, spatial_shapes, view_data,
                    query_mask=qmask, threshold=threshold,
                    filter_method=filter_method, train=train,
                    triangulate_topk=tk,
                    # the rig-static windowed fast path only applies to
                    # layer 1, whose sampling centers are the static grid
                    window_plan=(window_plan if lid == 0 and not train
                                 else None),
                    # offset clamp: same layer-1 inference-only gating
                    offset_clamp=(layer1_offset_clamp
                                  if lid == 0 and not train else None),
                    # point sparsification applies to EVERY layer's
                    # sampling, inference only (DECODER.inference_point_topm)
                    point_topm=point_topm if not train else None)
            if sel is None:
                outputs.append({"hs": out, "refs": refs, "refs_2d": ref2d,
                                "projs_2d": projs2d,
                                "class_prob": class_prob})
            else:
                outputs.append({
                    "hs": _scatter_queries(out, sel, Q, J, 1),
                    "refs": _scatter_queries(refs, sel, Q, J, 1),
                    "refs_2d": _scatter_queries(ref2d, sel, Q, J, 2),
                    "projs_2d": _scatter_queries(projs2d, sel, Q, J, 2),
                    "class_prob": _scatter_queries(class_prob, sel, Q, 1, 1),
                })

            if box is not None:
                # bound only the NEXT layer's input; outputs above keep
                # the raw predictions (see ref_clamp_box)
                refs = jnp.clip(refs, lo, hi)

            use_topk = (topk_queries is not None and not train
                        and sel is None and lid == 0
                        and topk_queries < Q)
            if use_topk:
                scores = class_prob[..., 1]  # (B, Q)
                _, sel = jax.lax.top_k(scores, topk_queries)
                out = _take_queries(out, sel, J, 1)
                refs = _take_queries(refs, sel, J, 1)
                if qpos is not None:
                    qpos = _take_queries(qpos, sel, J, 1)
                if qmask is not None:
                    qmask = jnp.take_along_axis(qmask, sel, axis=1)
        return outputs
