"""Config-surface contract: which keys are honored vs deliberately inert.

The reference carries ~150 config knobs (lib/core/config.py:32-330), many of
which its own live path never reads. This rebuild keeps the key names for
YAML compatibility, which risks silent drift: "config loads" is not "config
works". This test pins the contract — every key NOT in the inert table must
be referenced by non-config source, and every inert entry must still exist
(so the table can't go stale). Adding a new knob forces a decision: wire it
or document why it is inert.
"""

import dataclasses
import pathlib
import re

from mvgformer_tpu.config import Config

REPO = pathlib.Path(__file__).resolve().parent.parent

# Deliberately-inert keys. Accepted so the reference's YAML configs load
# unmodified; each entry names why it has no TPU-side behavior.
INERT = {
    # -- selection constants the rebuild fixes structurally
    "BACKBONE_MODEL": "single backbone family (pose_resnet); depth via "
                      "POSE_RESNET.NUM_LAYERS",
    "MODEL": "reference-side module name; dispatch is TRANSFORMER",
    "GPUS": "CUDA device list; TPU topology comes from jax.devices()",
    "LOG_DIR": "tensorboard dir in the reference; JSONL tracker logs to "
               "OUTPUT_DIR",
    "WORKERS": "DataLoader workers; the prefetcher is single-producer",
    # -- dead heatmap-supervision surface (live path never reads them,
    #    SURVEY.md 2.4 'heatmap MSE losses unused')
    "NETWORK.PRETRAINED": "reference loads full-model pretrain via "
                          "validate --model_path / TRAIN.FINETUNE_MODEL",
    "NETWORK.HEATMAP_SIZE": "heatmap targets unused in live path",
    "NETWORK.SIGMA": "heatmap targets unused in live path",
    "NETWORK.TARGET_TYPE": "heatmap targets unused in live path",
    "NETWORK.AGGRE": "multiview-aggregation flag of dead heatmap path",
    "NETWORK.USE_GT": "dead heatmap path",
    "NETWORK.BETA": "soft-argmax beta of dead heatmap path",
    "NETWORK.INPUT_SIZE": "dead duplicate of IMAGE_SIZE",
    "LOSS.USE_TARGET_WEIGHT": "heatmap MSE loss weight flag, dead path",
    # -- PoseResNet details fixed by the architecture rebuild
    "POSE_RESNET.DECONV_WITH_BIAS": "always False in shipped configs; "
                                    "deconv layout fixed in pose_resnet.py",
    "POSE_RESNET.NUM_DECONV_LAYERS": "3, fixed by NUM_DECONV_FILTERS len",
    "POSE_RESNET.NUM_DECONV_KERNELS": "always 4,4,4 in shipped configs",
    "POSE_RESNET.FINAL_CONV_KERNEL": "final heatmap conv exists but is "
                                     "unused (pose_resnet.py:215)",
    # -- data augmentation the reference defines but disables everywhere
    "DATASET.DATA_FORMAT": "image extension is derived from the db paths",
    "DATASET.DATA_AUGMENTATION": "False in every shipped config",
    "DATASET.FLIP": "False in every shipped config",
    "DATASET.ROT_FACTOR": "augmentation off",
    "DATASET.SCALE_FACTOR": "augmentation off",
    # -- voxel-grid knobs of the voxelpose-style init the paper model
    #    doesn't use (sample_space init reads SPACE_SIZE/CENTER only)
    "MULTI_PERSON.INITIAL_CUBE_SIZE": "voxel grid of dead heatmap path",
    "MULTI_PERSON.THRESHOLD": "root-score threshold of dead voxel path",
    # -- decoder knobs that are constants in every shipped config and
    #    whose alternatives the reference itself never exercises
    "DECODER.activation": "relu everywhere; FFN is hard-wired relu",
    "DECODER.return_intermediate_dec": "True everywhere; per-layer "
                                       "outputs are structural here",
    "DECODER.aux_loss": "False everywhere; per-layer loss is the "
                        "decay-weighted sum instead",
    "DECODER.loss_pose_normalize": "False everywhere; losses in mm",
    "DECODER.pred_class_fuse": "mean everywhere; hard-wired mean over "
                               "joints",
    "DECODER.match_coord_est": "abs everywhere",
    "DECODER.epipolar_encoder": "False everywhere; encoder not built",
    "DECODER.use_loss_pose_perjoint_aligned": "False everywhere; "
                                              "Procrustes loss dead",
    "DECODER.use_quality_focal_loss": "False everywhere",
    "DECODER.loss_pose_perjoint_aligned": "weight of dead aligned loss",
    "DECODER.loss_heatmap2d": "weight of dead heatmap loss",
    "DECODER.query_embed_type": "person_joint everywhere; other embed "
                                "schemes dead in reference too",
    "DECODER.with_pose_refine": "True everywhere; per-layer cloned heads "
                                "are structural in the rebuild "
                                "(multi_view_pose_transformer.py:195-215)",
    "DECODER.lr_decay_epoch": "reference only isinstance-checks it when "
                              "saving (train_3d.py:406-424)",
    # -- optimizer surface beyond the shipped Adam recipe
    "TRAIN.OPTIMIZER": "adam fixed (DECODER.optimizer is the live knob "
                       "in the reference; both always adam)",
    "TRAIN.MOMENTUM": "SGD-only knob, SGD never shipped",
    "TRAIN.WD": "reference Adam is constructed without weight decay",
    "TRAIN.NESTEROV": "SGD-only knob",
    # -- test-state selection the rebuild replaces with explicit paths
    "TEST.STATE": "best/latest selection; orbax keeps best + latest and "
                  "validate takes an explicit path",
    # -- debug/visualization toggles with no rebuild equivalent
    "DEBUG.PRINT_TO_FILE": "stdout redirect; logging already tees to file",
    "DEBUG.WANDB_KEY": "wandb replaced by the JSONL ExperimentTracker",
    "DEBUG.WANDB_NAME": "wandb replaced by the JSONL ExperimentTracker",
    "DEBUG.SAVE_BATCH_IMAGES_GT": "heatmap debug savers, dead path",
    "DEBUG.SAVE_BATCH_IMAGES_PRED": "heatmap debug savers, dead path",
    "DEBUG.SAVE_HEATMAPS_GT": "heatmap debug savers, dead path",
    "DEBUG.SAVE_HEATMAPS_PRED": "heatmap debug savers, dead path",
    # -- whole sections accepted purely for YAML compatibility
    "CUDNN.BENCHMARK": "no cudnn on TPU",
    "CUDNN.DETERMINISTIC": "no cudnn on TPU",
    "CUDNN.ENABLED": "no cudnn on TPU",
    "PICT_STRUCT.GRID_SIZE": "pictorial-structures module not in live path",
    "PICT_STRUCT.CUBE_SIZE": "see GRID_SIZE",
    "PICT_STRUCT.FIRST_NBINS": "see GRID_SIZE",
    "PICT_STRUCT.PAIRWISE_FILE": "see GRID_SIZE",
    "PICT_STRUCT.RECUR_NBINS": "see GRID_SIZE",
    "PICT_STRUCT.RECUR_DEPTH": "see GRID_SIZE",
    "PICT_STRUCT.LIMB_LENGTH_TOLERANCE": "see GRID_SIZE",
    "PICT_STRUCT.TEST_PAIRWISE": "see GRID_SIZE",
    "PICT_STRUCT.SHOW_ORIIMG": "see GRID_SIZE",
    "PICT_STRUCT.SHOW_CROPIMG": "see GRID_SIZE",
    "PICT_STRUCT.SHOW_HEATIMG": "see GRID_SIZE",
    # -- TPU-native knobs documented as reserved
    "PARALLEL.MESH_AXES": "mesh axis naming is fixed ('data','view') by "
                          "parallel/mesh.py; reserved for future layouts",
    "PARALLEL.PARAM_DTYPE": "params are f32; bf16 params would break "
                            "optimizer parity (reserved)",
    "PARALLEL.REMAT_BACKBONE": "moot while the backbone is frozen "
                               "(stop_gradient already frees activations)",
}


def _source_blob() -> str:
    paths = [p for p in (REPO / "mvgformer_tpu").rglob("*.py")
             if p.name != "config.py"]
    paths += list((REPO / "run").glob("*.py"))
    paths += [REPO / "bench.py", REPO / "bench_detail.py",
              REPO / "__graft_entry__.py"]
    return "\n".join(p.read_text() for p in paths)


def _leaf_keys():
    keys = []

    def walk(obj, prefix):
        for f in dataclasses.fields(obj):
            v = getattr(obj, f.name)
            if dataclasses.is_dataclass(v):
                walk(v, prefix + f.name + ".")
            else:
                keys.append(prefix + f.name)

    walk(Config(), "")
    return keys


class TestConfigSurface:
    def test_every_non_inert_key_is_referenced(self):
        src = _source_blob()
        missing = [k for k in _leaf_keys()
                   if k not in INERT
                   and not re.search(
                       r"\b%s\b" % re.escape(k.rsplit(".", 1)[-1]), src)]
        assert not missing, (
            "config keys neither referenced in source nor documented as "
            f"inert: {missing} — wire them or add them to INERT with a "
            "reason")

    def test_inert_table_is_not_stale(self):
        keys = set(_leaf_keys())
        stale = [k for k in INERT if k not in keys]
        assert not stale, f"INERT entries no longer in Config: {stale}"
