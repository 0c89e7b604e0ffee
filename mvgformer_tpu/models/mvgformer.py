"""MVGFormer top model: backbone -> queries -> iterative-geometry decoder.

TPU-native rebuild of DyanmicQueryTransformer [sic]
(/root/reference/lib/models/dq_transformer.py:120-754) on top of its parent
MultiviewPosetransformer (multi_view_pose_transformer.py:109-488):

  * PoseResNet-50 features for all (batch, view) images in one folded pass
    (dq_transformer.py:352-354), levels reversed to finest-first;
  * person_joint query embeddings: joint-embed (+) instance-embed outer sum,
    split into positional / content halves (dq_transformer.py:394-432);
  * reference-point init 'sample_space': ceil(sqrt(Q))^2 grid over (x, y) at
    z=0.5 in normalized space, T-pose offsets added (dq_transformer.py:
    298-323); T-pose asset: mvgformer_tpu/assets/tpose.npy;
  * DQDecoder stack; per-layer outputs converted to
    {pred_logits, pred_poses, pred_poses_2d, pred_poses_2d_proj}
    (dq_transformer.py:569-603), with inverse-sigmoid on the averaged
    per-joint class probability and optional joint-format conversion for
    Shelf/Campus transfer (:582-594).

Matching / loss live outside the module (core.criterion) so the model apply
stays a pure function; the gt-match query mask is an input.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mvgformer_tpu.config import Config
from mvgformer_tpu.data.meta import Batch, ViewData
from mvgformer_tpu.models.decoder import DQDecoder
from mvgformer_tpu.models.pose_resnet import PoseResNet


def load_tpose(path: Optional[str] = None) -> np.ndarray:
    """(15, 3) root-relative T-pose offsets in mm."""
    candidates = []
    if path:
        candidates.append(path)
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "assets", "tpose.npy")
    candidates.append(os.path.normpath(here))
    for cand in candidates:
        if cand and os.path.isfile(cand):
            if cand.endswith(".pt"):
                import torch

                return torch.load(
                    cand, map_location="cpu",
                    weights_only=False).numpy().astype(np.float32)
            return np.load(cand).astype(np.float32)
    from mvgformer_tpu.data.synthetic import T_POSE

    return T_POSE


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """models/util/misc.py:608-612."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.maximum(x, eps)
    x2 = jnp.maximum(1.0 - x, eps)
    return jnp.log(x1 / x2)


def _tpose_bone_lengths(t_pose: np.ndarray) -> np.ndarray:
    """Default target bone lengths for structural triangulation, derived
    from the T-pose asset (the reference loads them from an unshipped
    bone_length.pth, lib/structural/adapter.py:46-50)."""
    from mvgformer_tpu.geometry.structural import HumanTree

    return HumanTree("cmupanoptic").bone_lengths(
        t_pose[None]).reshape(-1).astype(np.float32)


def sample_space_reference_points(num_instance: int, t_pose: np.ndarray,
                                  space_size, space_center) -> np.ndarray:
    """'sample_space' init (dq_transformer.py:298-323): ceil(sqrt(Q))^2 grid
    over normalized (x, y), z = 0.5, mapped to mm, plus T-pose offsets.
    Returns (Q * J, 3) float32 — a compile-time constant."""
    n = math.ceil(num_instance ** 0.5)
    lin = np.linspace(0.0, 1.0, n, dtype=np.float32)
    # torch.meshgrid default 'ij': x varies along rows, y along cols
    gx, gy = np.meshgrid(lin, lin, indexing="ij")
    roots_norm = np.stack(
        [gx.reshape(-1), gy.reshape(-1),
         np.full(n * n, 0.5, dtype=np.float32)], axis=-1)[:num_instance]
    gs = np.asarray(space_size, dtype=np.float32)
    gc = np.asarray(space_center, dtype=np.float32)
    roots_abs = roots_norm * gs + gc - gs / 2.0
    joints = roots_abs[:, None, :] + t_pose[None, :, :]
    return joints.reshape(-1, 3).astype(np.float32)


class MVGFormer(nn.Module):
    """Full model. Call with a Batch; returns per-layer output dicts."""

    cfg: Config

    def setup(self):
        dec = self.cfg.DECODER
        net = self.cfg.NETWORK
        dtype = (jnp.bfloat16
                 if self.cfg.PARALLEL.COMPUTE_DTYPE == "bfloat16"
                 else jnp.float32)
        self.compute_dtype = dtype
        self.num_joints = dec.num_keypoints
        self.num_instance = dec.num_instance
        self.use_feat_level = tuple(dec.use_feat_level)

        resnet_blocks = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3),
                         50: (3, 4, 6, 3), 101: (3, 4, 23, 3),
                         152: (3, 8, 36, 3)}[self.cfg.POSE_RESNET.NUM_LAYERS]
        self.backbone = PoseResNet(
            block_counts=resnet_blocks,
            deconv_filters=tuple(self.cfg.POSE_RESNET.NUM_DECONV_FILTERS),
            dtype=dtype, name="backbone")

        # torch nn.Embedding default init: N(0, 1)
        emb_init = nn.initializers.normal(stddev=1.0)
        self.joint_embedding = self.param(
            "joint_embedding", emb_init,
            (dec.num_keypoints, dec.d_model * 2))
        self.instance_embedding = self.param(
            "instance_embedding", emb_init,
            (dec.num_instance, dec.d_model * 2))

        ref_clamp_box = None
        if dec.clamp_refs_to_space:
            # capture-space box with 50% slack on the half-extent
            c = self.cfg.MULTI_PERSON.SPACE_CENTER
            s = self.cfg.MULTI_PERSON.SPACE_SIZE
            ref_clamp_box = tuple(c[i] - 0.75 * s[i] for i in range(3)) \
                + tuple(c[i] + 0.75 * s[i] for i in range(3))
        self.decoder = DQDecoder(
            num_layers=dec.num_decoder_layers,
            share_layer_weights=dec.share_layer_weights,
            num_joints=dec.num_keypoints,
            ref_clamp_box=ref_clamp_box,
            remat=self.cfg.PARALLEL.REMAT_DECODER,
            remat_policy=self.cfg.PARALLEL.REMAT_POLICY,
            layer_kwargs=dict(
                d_model=dec.d_model,
                d_ffn=dec.dim_feedforward,
                dropout=dec.dropout,
                n_levels=dec.num_feature_levels,
                n_heads=dec.nhead,
                n_points=dec.dec_n_points,
                img_size=tuple(net.IMAGE_SIZE),
                num_joints=dec.num_keypoints,
                detach_refpoints=dec.detach_refpoints_cameraprj_firstlayer,
                feature_update_method=dec.feature_update_method,
                init_self_attention=dec.init_self_attention,
                open_forward_ffn=dec.open_forward_ffn,
                posembed_mode=dec.projattn_posembed_mode,
                # 'linalg'/'batch'/'default' (reference SVD variants) -> svd;
                # 'eigh'/'jacobi' are this framework's fast TPU options
                # (4x4 Gram eigendecomposition; jacobi = fixed-sweep
                # scalarized rotations, ~15x faster than svd on v5e);
                # 'st' = structural triangulation with bone-length
                # constraints (lib/structural)
                triangulation_solver=(
                    dec.triangulation_method
                    if dec.triangulation_method in ("eigh", "st", "jacobi")
                    else "svd"),
                st_bone_lengths=tuple(_tpose_bone_lengths(
                    load_tpose(dec.t_pose_dir))),
                bayesian_update=dec.bayesian_update,
                pose_embed_layers=dec.pose_embed_layer,
                tri_grad_clip=self.cfg.TRAIN.TRI_GRAD_CLIP,
                train_sample_chunks=self.cfg.TRAIN.SAMPLE_CHUNKS,
                dtype=dtype,
            ),
            name="decoder",
        )

        t_pose = load_tpose(dec.t_pose_dir)
        self.t_pose = jnp.asarray(t_pose)
        self.init_reference = jnp.asarray(sample_space_reference_points(
            dec.num_instance, t_pose,
            self.cfg.MULTI_PERSON.SPACE_SIZE,
            self.cfg.MULTI_PERSON.SPACE_CENTER))  # (Q*J, 3)

        if dec.init_ref_method in ("query_adapt", "query_adapt_center"):
            # query-adaptation heads (dq_transformer.py:204-210, 440-474)
            self.reference_feats = nn.Dense(
                dec.d_model, name="reference_feats")
            self.reference_points_head = nn.Dense(
                3, name="reference_points")

    def initial_reference_points(self, batch_size: int) -> jnp.ndarray:
        """(B, Q*J, 3) absolute-mm initial query poses."""
        return jnp.broadcast_to(
            self.init_reference[None],
            (batch_size, self.init_reference.shape[0], 3))

    def initial_reference_points_static(self, batch_size: int) -> jnp.ndarray:
        """Same as initial_reference_points but usable on the unbound module
        (no parameters involved — the init grid is a config constant)."""
        dec = self.cfg.DECODER
        refs = sample_space_reference_points(
            dec.num_instance, load_tpose(dec.t_pose_dir),
            self.cfg.MULTI_PERSON.SPACE_SIZE,
            self.cfg.MULTI_PERSON.SPACE_CENTER)
        return jnp.broadcast_to(jnp.asarray(refs)[None],
                                (batch_size, refs.shape[0], 3))

    def __call__(self, batch: Batch,
                 query_mask: Optional[jnp.ndarray] = None,
                 threshold: float = 0.5,
                 train: bool = False,
                 window_plan=None):
        """Returns a list (per decoder layer) of output dicts:
            pred_logits:        (B, Q, 2) inverse-sigmoid of avg joint prob
            pred_poses:         (B, Q*J, 3) absolute mm
            pred_poses_2d:      (B, V, Q*J, 2) refined 2D (net image, px)
            pred_poses_2d_proj: (B, V, Q*J, 2) projected 2D (net image, px)
        """
        dec = self.cfg.DECODER
        B, V = batch.views.shape[:2]

        # backbone on the view-major fold (dq_transformer.py:352-354)
        imgs = jnp.swapaxes(batch.views, 0, 1).reshape(
            (V * B,) + batch.views.shape[2:])
        feats = self.backbone(imgs.astype(self.compute_dtype),
                              use_feat_level=self.use_feat_level)
        feats = feats[::-1]  # finest-first
        # the backbone is architecturally frozen (reference
        # run/train_3d.py:118-121, dq_transformer.py:763-766): cutting the
        # gradient here lets XLA skip the whole backbone backward and free
        # its activations instead of holding them for the train step.
        # TRAIN.TRAIN_BACKBONE=True (no reference equivalent) keeps the
        # gradient for from-scratch training on synthetic data.
        if not self.cfg.TRAIN.TRAIN_BACKBONE:
            feats = [jax.lax.stop_gradient(f) for f in feats]
        spatial_shapes = tuple(
            (int(f.shape[1]), int(f.shape[2])) for f in feats)

        # person_joint query embeddings (dq_transformer.py:394-432)
        query_embeds = (self.joint_embedding[None]
                        + self.instance_embedding[:, None]).reshape(
            self.num_instance * self.num_joints, -1)
        c = dec.d_model
        query_embed, tgt = query_embeds[:, :c], query_embeds[:, c:]
        if dec.close_pose_embedding:
            query_pos = None
        else:
            query_pos = jnp.broadcast_to(
                query_embed[None], (B,) + query_embed.shape)
        tgt = jnp.broadcast_to(tgt[None], (B,) + tgt.shape)

        # reference-point initialization (dq_transformer.py:250-333,440-474)
        method = dec.init_ref_method
        if method == "sample_space":
            refs0 = self.initial_reference_points(B)
        elif method == "gt_noise":
            # debug init: gt poses + N(0, value) noise; padded query slots 0.
            # value >= 0 (INCLUDING 0) is the std, else 100
            # (dq_transformer.py:274-283); no visibility masking there
            assert batch.targets is not None
            v = dec.init_ref_method_value
            std = float(v) if (v is not None and v >= 0) else 100.0
            gt = batch.targets.joints_3d.astype(jnp.float32)  # (B, M, J, 3)
            noise = std * jax.random.normal(
                self.make_rng("init_ref"), gt.shape)
            noisy = gt + noise
            Bq = self.num_instance
            M = gt.shape[1]
            pad = jnp.zeros((B, Bq - M, gt.shape[2], 3))
            refs0 = jnp.concatenate([noisy, pad], axis=1).reshape(B, -1, 3)
        elif method in ("query_adapt", "query_adapt_center"):
            pooled = jnp.concatenate(
                [jnp.mean(f, axis=(1, 2)) for f in feats], axis=-1)
            # feats are the VIEW-MAJOR (V*B) fold: regroup per batch item
            # before flattening (the reference's view(nview, batch, 3, c)
            # .transpose(0, 1), dq_transformer.py:440-474) — a plain
            # reshape(B, -1) would mix features across batch samples
            pooled = pooled.reshape(V, B, -1).swapaxes(0, 1).reshape(
                B, -1).astype(jnp.float32)
            ref_feats = self.reference_feats(pooled)[:, None]  # (B, 1, C)
            base = (tgt if query_pos is None else query_pos).astype(
                jnp.float32)
            if method == "query_adapt":
                refs0 = self.reference_points_head(base + ref_feats)
            else:
                centers = self.reference_points_head(
                    base.reshape(B, self.num_instance, self.num_joints, -1)
                    .mean(axis=2) + ref_feats)  # (B, Q, 3)
                refs0 = (centers[:, :, None, :]
                         + self.t_pose[None, None]).reshape(B, -1, 3)
        elif method == "voxcel_pose_base":
            # reference points = voxelpose predicted poses, reshaped
            # (B, M*J, 3) (dq_transformer.py:260-263,325-327). The
            # reference views the (B, M, J, 3) preds straight into the
            # query layout, so the query count must equal the voxelpose
            # slot count (the ablation configs set num_instance =
            # MAX_PEOPLE_NUM for this init).
            vp = (batch.targets.voxelpose_pred
                  if batch.targets is not None else None)
            if vp is None:
                raise ValueError(
                    "voxcel_pose_base needs voxelpose predictions in the "
                    "batch (DATASET.ADD_VOXEL_PRED attaches them; "
                    "reference dq_transformer.py:325-327)")
            refs0 = vp[..., :3].astype(jnp.float32).reshape(B, -1, 3)
            if refs0.shape[1] != self.num_instance * self.num_joints:
                raise ValueError(
                    "voxcel_pose_base: DECODER.num_instance (%d) must "
                    "equal MAX_PEOPLE_NUM (%d) so voxelpose slots map "
                    "1:1 onto queries" % (self.num_instance,
                                          vp.shape[1]))
        else:
            raise ValueError(f"unknown init_ref_method: {method}")

        if window_plan is not None and method != "sample_space":
            raise ValueError(
                "windowed layer-1 sampling requires the rig-static "
                "'sample_space' reference init (got %r)" % method)
        filter_method = (dec.query_filter_method if dec.filter_query
                         else "all")
        layer_outputs = self.decoder(
            tgt.astype(self.compute_dtype),
            None if query_pos is None
            else query_pos.astype(self.compute_dtype),
            refs0, feats, spatial_shapes, batch.view_data,
            query_mask=query_mask, threshold=threshold,
            filter_method=filter_method, train=train,
            topk_queries=dec.inference_topk_queries,
            window_plan=window_plan,
            layer1_offset_clamp=dec.layer1_offset_clamp,
            point_topm=dec.inference_point_topm)

        cji = dec.convert_joint_format_indices
        outs = []
        for lo in layer_outputs:
            coords = lo["refs"]
            coords_2d = lo["refs_2d"]
            coords_2d_proj = lo["projs_2d"]
            if cji is not None:
                idx = jnp.asarray(cji, dtype=jnp.int32)
                J = self.num_joints
                coords = coords.reshape(B, -1, J, 3)[:, :, idx].reshape(
                    B, -1, 3)
                coords_2d = coords_2d.reshape(B, V, -1, J, 2)[
                    :, :, :, idx].reshape(B, V, -1, 2)
                coords_2d_proj = coords_2d_proj.reshape(B, V, -1, J, 2)[
                    :, :, :, idx].reshape(B, V, -1, 2)
            outs.append({
                "pred_logits": inverse_sigmoid(lo["class_prob"]),
                "pred_poses": coords,
                "pred_poses_2d": coords_2d,
                "pred_poses_2d_proj": coords_2d_proj,
            })
        return outs


def build_model(cfg: Config) -> MVGFormer:
    return MVGFormer(cfg=cfg)


def feature_spatial_shapes(cfg: Config):
    """Static (h, w) of each selected backbone level, finest-first —
    matches what MVGFormer.__call__ derives from the actual features
    (backbone levels come out at strides 16, 8, 4 and are reversed)."""
    W, H = cfg.NETWORK.IMAGE_SIZE
    strides = [16, 8, 4]
    # the backbone filters by MEMBERSHIP in deconv order (pose_resnet.py
    # `if i in use_feat_level`), so config order never matters
    sel = [s for i, s in enumerate(strides)
           if i in tuple(cfg.DECODER.use_feat_level)][::-1]
    return tuple((H // s, W // s) for s in sel)


def build_layer1_window_plan(cfg: Config, view_data,
                             tile: Optional[int] = None,
                             halo: Optional[int] = None):
    """Host-side, once per rig: bucket the static layer-1 sampling
    centers (projected sample_space grid) into feature-map tiles for the
    windowed fast path (ops/window_sampling.py).

    view_data: a ViewData whose cameras/affines define the rig; only the
    first batch item is used (a rig is batch-constant by definition).
    halo defaults to dec_n_points + 2, which makes the windowed op exact
    at offset init (radial bias <= n_points px, projattn.py:96-107).
    """
    import numpy as np

    from mvgformer_tpu.models.decoder import project_reference_points
    from mvgformer_tpu.ops.window_sampling import build_window_plan

    dec = cfg.DECODER
    shapes = feature_spatial_shapes(cfg)
    refs = sample_space_reference_points(
        dec.num_instance, load_tpose(dec.t_pose_dir),
        cfg.MULTI_PERSON.SPACE_SIZE, cfg.MULTI_PERSON.SPACE_CENTER)
    vd0 = jax.tree_util.tree_map(lambda a: a[:1], view_data)
    _, lvl, _ = project_reference_points(
        jnp.asarray(refs)[None], vd0, shapes, cfg.NETWORK.IMAGE_SIZE,
        detach=True)
    lvl = np.asarray(lvl[0])  # (V, Nq, L, 2) normalized per-level
    centers_px = np.empty_like(lvl)
    for li, (h, w) in enumerate(shapes):
        centers_px[:, :, li, 0] = lvl[:, :, li, 0] * w - 0.5
        centers_px[:, :, li, 1] = lvl[:, :, li, 1] * h - 0.5
    if tile is None:
        tile = dec.layer1_window_tile
    if halo is None:
        halo = dec.layer1_window_halo
    if halo is None:
        if dec.layer1_offset_clamp is not None:
            # clamped offsets: the window is exact once it covers
            # clamp + 2 px (bilinear stencil + border) past the tile
            halo = int(np.ceil(dec.layer1_offset_clamp)) + 2
        else:
            halo = dec.dec_n_points + 2
    if (dec.layer1_offset_clamp is not None
            and dec.layer1_offset_clamp > halo - 2):
        raise ValueError(
            "layer1_offset_clamp=%g exceeds halo-2=%d: escaped samples "
            "would read zero; raise layer1_window_halo" %
            (dec.layer1_offset_clamp, halo - 2))
    return build_window_plan(centers_px, shapes, tile=tile, halo=halo,
                             impl=dec.layer1_window_impl)
