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
