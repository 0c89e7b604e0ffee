"""Panoptic loader against real CMU-format files (synthetic fixture).

The PanopticDataset parser (calibration json, hdPose3d_stage1_coco19
body jsons, hdImgs layout, interval subsampling, axis swap, cm->mm, db
pickle cache — lib/dataset/panoptic.py:242-452) had only ever run
against in-memory synthetic batches. This builds a byte-level CMU-format
dataset on disk (inverting the loader's own coordinate conventions) and
drives the loader end-to-end: frame assembly, image loading + affine
warp, the voxelpose-pred attach hook, the pickle cache round trip, and a
perfect-prediction evaluation.
"""

import json
import os

import numpy as np
import pytest

from mvgformer_tpu.data.datasets import (CAM_LIST, PANOPTIC_M,
                                         PANOPTIC_VAL_SEQS,
                                         PanopticDataset)
from mvgformer_tpu.data.synthetic import make_camera_ring, make_people

from test_model import small_cfg

ANNO_SEQ = PANOPTIC_VAL_SEQS[0]
N_FILES = 13          # val interval 12 -> frames at indices 0 and 12
N_PEOPLE = 2


def _camera_json(cams, cam_list):
    """Invert parse_panoptic_camera: R' = R_json @ M, T = -R'.T @ t * 10."""
    entries = []
    for v, (panel, node) in enumerate(cam_list):
        R = np.asarray(cams.R[v], np.float64)
        T = np.asarray(cams.T[v], np.float64)
        K = np.zeros((3, 3))
        K[0, 0], K[1, 1] = cams.f[v]
        K[0, 2], K[1, 2] = cams.c[v]
        K[2, 2] = 1.0
        k = np.asarray(cams.k[v], np.float64)
        p = np.asarray(cams.p[v], np.float64)
        entries.append({
            "panel": panel, "node": node,
            "K": K.tolist(),
            "R": (R @ PANOPTIC_M.T).tolist(),
            "t": (-(R @ T) / 10.0).reshape(3, 1).tolist(),
            "distCoef": [k[0], k[1], p[0], p[1], k[2]],
        })
    return {"cameras": entries}


def _body_json(poses_mm, vis):
    """Invert the loader's joints19 parsing: xyz = (p @ M) * 10."""
    bodies = []
    for g, pose in enumerate(poses_mm):
        j19 = np.zeros((19, 4), np.float64)
        j19[:15, :3] = (pose / 10.0) @ PANOPTIC_M.T
        j19[:15, 3] = vis[g]
        bodies.append({"id": g, "joints19": j19.reshape(-1).tolist()})
    return {"bodies": bodies}


@pytest.fixture(scope="module")
def panoptic_root(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("panoptic")
    cam_list = CAM_LIST["CMU0"][:5]
    cams = make_camera_ring(5, image_size=(1920, 1080))
    people = make_people(N_PEOPLE, seed=3)
    vis = np.ones((N_PEOPLE, 15), np.float32)
    img = np.zeros((1080, 1920, 3), np.uint8)
    img[::64] = 128

    for seq in PANOPTIC_VAL_SEQS:
        seq_dir = root / seq
        seq_dir.mkdir()
        with open(seq_dir / f"calibration_{seq}.json", "w") as f:
            json.dump(_camera_json(cams, cam_list), f)
        (seq_dir / "hdPose3d_stage1_coco19").mkdir()

    anno_dir = root / ANNO_SEQ / "hdPose3d_stage1_coco19"
    for i in range(N_FILES):
        with open(anno_dir / f"body3DScene_{i:08d}.json", "w") as f:
            json.dump(_body_json(people, vis), f)
    for (panel, node) in cam_list:
        prefix = f"{panel:02d}_{node:02d}"
        img_dir = root / ANNO_SEQ / "hdImgs" / prefix
        img_dir.mkdir(parents=True)
        for i in (0, 12):
            cv2.imwrite(str(img_dir / f"{prefix}_{i:08d}.jpg"), img)
    return root, people


def _cfg_for(root):
    cfg = small_cfg()
    cfg.DATA_DIR = str(root)
    cfg.DATASET.ROOT = ""
    cfg.DATASET.CAMERA_NUM = 5
    cfg.DATASET.TEST_DATASET = "panoptic"
    return cfg


class TestPanopticFiles:
    def test_build_frames_and_conventions(self, panoptic_root):
        root, people = panoptic_root
        ds = PanopticDataset(_cfg_for(root), "validation", is_train=False)
        # 13 files at interval 12 -> indices 0 and 12
        assert len(ds.frames) == 2
        f0 = ds.frames[0]
        assert f0["key"] == f"{ANNO_SEQ}__00000000"
        # cm->mm + axis swap must round-trip through the json encoding
        np.testing.assert_allclose(f0["joints_3d"], people, atol=1e-2)
        # everyone is inside the ring of cameras
        assert f0["joints_2d_vis"].shape == (5, N_PEOPLE, 15)
        assert f0["joints_2d_vis"].mean() > 0.9
        assert f0["images"][0].endswith("00_03/00_03_00000000.jpg")
        assert os.path.isfile(f0["images"][0])

    def test_cache_roundtrip(self, panoptic_root):
        root, people = panoptic_root
        cfg = _cfg_for(root)
        ds1 = PanopticDataset(cfg, "validation", is_train=False)
        cache = [p for p in os.listdir(root) if p.endswith(".pkl")]
        assert cache, "db pickle cache not written"
        ds2 = PanopticDataset(cfg, "validation", is_train=False)
        np.testing.assert_array_equal(ds1.frames[0]["joints_3d"],
                                      ds2.frames[0]["joints_3d"])

    def test_load_batch_with_images(self, panoptic_root):
        root, _ = panoptic_root
        ds = PanopticDataset(_cfg_for(root), "validation", is_train=False)
        idx, batch = next(iter(ds.batches(2, shuffle=False,
                                          drop_last=False)))
        assert batch.views.shape[:2] == (2, 5)
        W, H = 96, 64
        assert batch.views.shape[2:] == (H, W, 3)
        # the striped test image must survive load + warp (not all-zero)
        assert float(np.abs(np.asarray(batch.views)).max()) > 0
        assert batch.targets.joints_3d.shape[2] == 15

    def test_perfect_predictions_evaluate_to_ap1(self, panoptic_root):
        root, people = panoptic_root
        ds = PanopticDataset(_cfg_for(root), "validation", is_train=False)
        pred = np.zeros((N_PEOPLE, 15, 5), np.float32)
        pred[:, :, :3] = people
        pred[:, :, 3] = 0.0
        pred[:, :, 4] = 0.95
        metrics = ds.evaluate([pred, pred])
        # the reference AP integration carries +1e-5 denominators, so
        # perfect predictions read 0.99999x, not exactly 1
        assert metrics["ap@25"] > 0.999, metrics
        assert metrics["mpjpe"] < 1.0, metrics

    def test_voxelpose_pred_attach(self, panoptic_root):
        import pickle

        root, people = panoptic_root
        cfg = _cfg_for(root)
        vp = np.zeros((N_PEOPLE, 15, 5), np.float32)
        vp[:, :, :3] = people
        db = [{"key": f"{ANNO_SEQ}__00000000",
               "joints_3d_voxelpose_pred": vp}]
        with open(root / "vp_preds.pkl", "wb") as f:
            pickle.dump({"db": db}, f)
        cfg.DATASET.ADD_VOXEL_PRED = str(root / "vp_preds.pkl")
        ds = PanopticDataset(cfg, "validation", is_train=False)
        np.testing.assert_array_equal(
            ds.frames[0]["joints_3d_voxelpose_pred"], vp)
        # missing entries forward-fill (panoptic.py:284-301)
        np.testing.assert_array_equal(
            ds.frames[1]["joints_3d_voxelpose_pred"], vp)


class TestSubsetSelection:
    """DATASET.SUBSET_SELECTION picks sequence-subset ablation lists
    (panoptic.py:231-234 with the TRAIN_LISTS/VAL_LISTS variants)."""

    def test_subset_restricts_sequences(self, panoptic_root):
        root, _ = panoptic_root
        cfg = _cfg_for(root)
        cfg.DATASET.SUBSET_SELECTION = "dbg"  # val 'dbg' -> pizza1 only
        ds = PanopticDataset(cfg, "validation", is_train=False)
        assert ds.sequences == [ANNO_SEQ]
        assert len(ds.frames) == 2

    def test_subset_without_annotations_is_empty(self, panoptic_root):
        root, _ = panoptic_root
        cfg = _cfg_for(root)
        cfg.DATASET.SUBSET_SELECTION = "hag"  # haggling1: no annos here
        ds = PanopticDataset(cfg, "validation", is_train=False)
        assert ds.sequences == ["160422_haggling1"]
        assert len(ds.frames) == 0

    def test_unknown_subset_raises(self, panoptic_root):
        root, _ = panoptic_root
        cfg = _cfg_for(root)
        cfg.DATASET.SUBSET_SELECTION = "nope"
        with pytest.raises(KeyError):
            PanopticDataset(cfg, "validation", is_train=False)

    def test_list_tables_cover_reference_keys(self):
        from mvgformer_tpu.data.datasets import (PANOPTIC_TRAIN_LISTS,
                                                 PANOPTIC_VAL_LISTS)

        for key in ("all", "seq1", "seq2", "dbg", "seq2-2", "seq2-8",
                    "ian-1", "ian-3", "dbg-val"):
            assert key in PANOPTIC_TRAIN_LISTS
        for key in ("all", "hag", "band", "all-val", "seq2-5", "ian-2"):
            assert key in PANOPTIC_VAL_LISTS


class TestFilterValidObservations:
    """DATASET.FILTER_VALID_OBSERVATIONS drops frames where any joint of
    any person is observable by fewer than 3 cameras (panoptic.py:422-443).
    """

    @pytest.fixture()
    def filtered_root(self, tmp_path):
        cam_list = CAM_LIST["CMU0"][:5]
        cams = make_camera_ring(5, image_size=(1920, 1080))
        good = make_people(1, seed=3)
        # a person far outside the capture space: projects out of bounds
        # in (at least) 3 of the ring cameras
        bad = good + np.array([50000.0, 0.0, 0.0], np.float32)
        vis = np.ones((1, 15), np.float32)

        seq_dir = tmp_path / ANNO_SEQ
        seq_dir.mkdir()
        with open(seq_dir / f"calibration_{ANNO_SEQ}.json", "w") as f:
            json.dump(_camera_json(cams, cam_list), f)
        anno = seq_dir / "hdPose3d_stage1_coco19"
        anno.mkdir()
        with open(anno / "body3DScene_00000000.json", "w") as f:
            json.dump(_body_json(good, vis), f)
        with open(anno / "body3DScene_00000012.json", "w") as f:
            json.dump(_body_json(bad, vis), f)
        # pad the file list so interval-12 sampling reaches index 12
        for i in range(1, 12):
            with open(anno / f"body3DScene_{i:08d}.json", "w") as f:
                json.dump({"bodies": []}, f)
        for seq in PANOPTIC_VAL_SEQS[1:]:
            d = tmp_path / seq
            d.mkdir()
            with open(d / f"calibration_{seq}.json", "w") as f:
                json.dump(_camera_json(cams, cam_list), f)
            (d / "hdPose3d_stage1_coco19").mkdir()
        return tmp_path

    def test_filter_drops_underobserved_frames(self, filtered_root):
        cfg = _cfg_for(filtered_root)
        ds_all = PanopticDataset(cfg, "validation", is_train=False)
        assert len(ds_all.frames) == 2

        cfg2 = _cfg_for(filtered_root)
        cfg2.DATASET.FILTER_VALID_OBSERVATIONS = True
        ds_filt = PanopticDataset(cfg2, "validation", is_train=False)
        assert len(ds_filt.frames) == 1
        assert ds_filt.frames[0]["key"].endswith("00000000")
