"""Model layer: backbone, decoders, top-level MVGFormer, matcher, losses."""

from __future__ import annotations

from mvgformer_tpu.config import Config

# cfg.TRANSFORMER values accepted by the reference dispatch
# (/root/reference/run/train_3d.py:245-250): the paper model and the vendored
# MvP baseline.
DQ_TRANSFORMER = "dq_transformer"
MVP_TRANSFORMER = "multi_view_pose_transformer"


def build_model(cfg: Config):
    """Construct the top-level model selected by cfg.TRANSFORMER
    (reference dispatch: /root/reference/run/train_3d.py:245-250)."""
    if cfg.TRANSFORMER == DQ_TRANSFORMER:
        from mvgformer_tpu.models.mvgformer import MVGFormer

        return MVGFormer(cfg=cfg)
    if cfg.TRANSFORMER == MVP_TRANSFORMER:
        from mvgformer_tpu.models.mvp_decoder import MvPTransformer

        return MvPTransformer(cfg=cfg)
    raise ValueError(
        f"unknown TRANSFORMER {cfg.TRANSFORMER!r}; expected "
        f"{DQ_TRANSFORMER!r} or {MVP_TRANSFORMER!r}")
