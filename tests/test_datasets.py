"""Dataset layer tests (no image data on disk; calibration files shipped)."""

import os.path as osp

import numpy as np
import pytest

from mvgformer_tpu.config import load_config
from mvgformer_tpu.data.datasets import (
    CAM_LIST, CampusDataset, ShelfDataset, parse_panoptic_camera,
    parse_plain_camera)

CAMPUS_ROOT = "/root/reference/data/CampusSeq1"
SHELF_ROOT = "/root/reference/data/Shelf"

needs_campus = pytest.mark.skipif(
    not osp.isfile(osp.join(CAMPUS_ROOT, "calibration_campus.json")),
    reason="campus calibration not available")
needs_shelf = pytest.mark.skipif(
    not osp.isfile(osp.join(SHELF_ROOT, "calibration_shelf.json")),
    reason="shelf calibration not available")


def _campus_cfg():
    cfg = load_config()
    cfg.DATA_DIR = "/root/reference/data"
    cfg.DATASET.ROOT = "CampusSeq1"
    cfg.DATASET.TEST_DATASET = "campus"
    cfg.DATASET.CAMERA_NUM = 3
    cfg.NETWORK.IMAGE_SIZE = [800, 640]
    cfg.DECODER.num_keypoints = 15
    return cfg


class TestCalibration:
    @needs_campus
    def test_campus_cameras(self):
        import json
        with open(osp.join(CAMPUS_ROOT, "calibration_campus.json")) as f:
            calib = json.load(f)
        cams = [parse_plain_camera(calib[k]) for k in sorted(calib)]
        assert len(cams) == 3
        for c in cams:
            assert c["R"].shape == (3, 3)
            # rotation must be orthonormal
            np.testing.assert_allclose(c["R"] @ c["R"].T, np.eye(3),
                                       atol=1e-4)
            assert c["T"].shape == (3, 1)
            assert c["f"].shape == (2,) and (c["f"] > 100).all()

    def test_panoptic_camera_convention(self):
        """Axis swap + cm->mm + position flip (panoptic.py:395-407)."""
        rng = np.random.RandomState(0)
        R = np.linalg.qr(rng.randn(3, 3))[0]
        t = rng.randn(3, 1) * 100
        K = np.array([[1400.0, 0, 960], [0, 1410.0, 540], [0, 0, 1]])
        cam = {"K": K, "distCoef": [0.1, -0.2, 1e-3, -1e-3, 0.05],
               "R": R, "t": t}
        out = parse_panoptic_camera(cam)
        M = np.array([[1., 0, 0], [0, 0, -1], [0, 1, 0]])
        np.testing.assert_allclose(out["R"], R @ M, rtol=1e-5)
        np.testing.assert_allclose(
            out["T"], -(R @ M).T @ t * 10.0, rtol=1e-4)
        np.testing.assert_allclose(out["k"], [0.1, -0.2, 0.05], rtol=1e-6)
        np.testing.assert_allclose(out["p"], [1e-3, -1e-3], rtol=1e-6)


class TestCampusDataset:
    @needs_campus
    def test_builds_frames_and_batches(self):
        cfg = _campus_cfg()
        ds = CampusDataset(cfg)
        assert len(ds) == 222  # 350-470 + 650-750 (campus.py:104-112)
        assert ds.num_views == 3
        batch = ds.load_batch([0, 1], load_images=False)
        assert batch.views.shape[:2] == (2, 3)
        assert batch.view_data.cameras.R.shape == (2, 3, 3, 3)
        assert batch.view_data.affine.shape == (2, 3, 2, 3)
        # no actorsGT.mat in this checkout -> empty gt
        assert int(np.asarray(batch.targets.num_person).sum()) == 0

    @needs_campus
    def test_batch_iterator_pads_static(self):
        cfg = _campus_cfg()
        ds = CampusDataset(cfg)
        seen = 0
        for idx, batch in ds.batches(64, load_images=False,
                                     drop_last=False):
            assert batch.views.shape[0] == 64
            seen += 1
            if seen >= 2:
                break


class TestShelfDataset:
    @needs_shelf
    def test_builds(self):
        cfg = _campus_cfg()
        cfg.DATASET.ROOT = "Shelf"
        cfg.DATASET.TEST_DATASET = "shelf"
        cfg.DATASET.CAMERA_NUM = 5
        ds = ShelfDataset(cfg)
        assert ds.num_views == 5
        assert len(ds) == 301


def test_cam_list_matches_reference():
    assert CAM_LIST["CMU0"] == [(0, 3), (0, 6), (0, 12), (0, 13), (0, 23)]
    assert len(CAM_LIST["CMU4"]) == 10


class TestShelfFinetune:
    @needs_shelf
    @pytest.mark.slow
    def test_pseudo_gt_train_frames(self, tmp_path):
        """Finetune db from a voxelpose pseudo-GT pickle
        (shelf.py:151-187): 15-joint poses, per-view visibility."""
        import pickle
        import shutil

        root = tmp_path / "Shelf"
        (root / "pesudo_gt").mkdir(parents=True)
        shutil.copy(osp.join(SHELF_ROOT, "calibration_shelf.json"),
                    root / "calibration_shelf.json")
        rng = np.random.RandomState(0)
        pgt = {}
        for fi in (0, 1, 2):
            poses = [rng.randn(15, 3).astype(np.float32) * 100
                     + np.array([500.0, 500.0, 1000.0], np.float32)
                     for _ in range(2)]
            pgt[f"img_{fi:06d}.png"] = poses
        with open(root / "pesudo_gt" / "vp.pickle", "wb") as f:
            pickle.dump(pgt, f)

        cfg = _campus_cfg()
        cfg.DATA_DIR = str(tmp_path)
        cfg.DATASET.ROOT = "Shelf"
        cfg.DATASET.TRAIN_DATASET = "shelf"
        cfg.DATASET.CAMERA_NUM = 5
        cfg.DATASET.PESUDO_GT = "vp.pickle"
        ds = ShelfDataset(cfg, "train", is_train=True)
        assert ds.gt_num_joints == 15
        # train range is 0-299 + 601-3199; first three frames have gt
        assert len(ds) == 300 + 3200 - 601
        f0 = ds.frames[0]
        assert f0["joints_3d"].shape == (2, 15, 3)
        assert f0["joints_2d_vis"].shape == (5, 2, 15)
        # frames without pseudo-gt entries carry empty gt
        assert ds.frames[10]["joints_3d"].shape == (0, 15, 3)
        batch = ds.load_batch([0, 10], load_images=False)
        assert batch.targets.joints_3d.shape[2] == 15
        assert int(np.asarray(batch.targets.num_person)[0]) == 2
        assert int(np.asarray(batch.targets.num_person)[1]) == 0

    def test_requires_pseudo_gt_config(self, tmp_path):
        import json
        import shutil

        if not osp.isfile(osp.join(SHELF_ROOT, "calibration_shelf.json")):
            pytest.skip("shelf calibration not available")
        root = tmp_path / "Shelf"
        root.mkdir(parents=True)
        shutil.copy(osp.join(SHELF_ROOT, "calibration_shelf.json"),
                    root / "calibration_shelf.json")
        cfg = _campus_cfg()
        cfg.DATA_DIR = str(tmp_path)
        cfg.DATASET.ROOT = "Shelf"
        cfg.DATASET.CAMERA_NUM = 5
        with pytest.raises(ValueError, match="PESUDO_GT"):
            ShelfDataset(cfg, "train", is_train=True)
