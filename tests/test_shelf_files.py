"""Shelf loader against real-format files (synthetic fixture).

Builds a byte-level Shelf dataset on disk — actorsGT.mat in the
reference's nested-cell layout, plain-json calibration, Camera{v}/ image
tree — and drives ShelfDataset end-to-end: eval frame assembly, image
loading, PCP evaluation on perfect predictions, and the voxelpose
pseudo-GT finetuning db (shelf.py:104-187, 255-332).
"""

import json
import pickle

import numpy as np
import pytest

from mvgformer_tpu.data.datasets import ShelfDataset
from mvgformer_tpu.data.synthetic import make_camera_ring, make_people

from test_model import small_cfg

N_ACTORS = 3
N_FRAMES = 601 + 1  # eval range is 300..600 inclusive


def _plain_calib(cams, n):
    out = {}
    for v in range(n):
        out[str(v)] = {
            "R": np.asarray(cams.R[v]).tolist(),
            "T": np.asarray(cams.T[v]).reshape(-1).tolist(),
            "fx": float(cams.f[v, 0]), "fy": float(cams.f[v, 1]),
            "cx": float(cams.c[v, 0]), "cy": float(cams.c[v, 1]),
            "k": np.asarray(cams.k[v]).tolist(),
            "p": np.asarray(cams.p[v]).tolist(),
        }
    return out


@pytest.fixture(scope="module")
def shelf_root(tmp_path_factory):
    import cv2
    import scipy.io as scio

    root = tmp_path_factory.mktemp("shelf")
    cams = make_camera_ring(5, image_size=(1032, 776))
    with open(root / "calibration_shelf.json", "w") as f:
        json.dump(_plain_calib(cams, 5), f)

    # 14-joint gt in meters, actor 2 absent in frame 301
    people15 = make_people(N_ACTORS, seed=5)
    people14 = people15[:, :14] / 1000.0
    actor3d = np.empty((1, N_ACTORS), object)
    for a in range(N_ACTORS):
        cells = np.empty((N_FRAMES, 1), object)
        for fi in range(N_FRAMES):
            if a == 2 and fi == 301:
                cells[fi, 0] = np.zeros((1, 0))
            else:
                cells[fi, 0] = people14[a].astype(np.float64)
        actor3d[0, a] = cells
    scio.savemat(root / "actorsGT.mat", {"actor3D": actor3d})

    img = np.zeros((776, 1032, 3), np.uint8)
    img[::32] = 200
    for v in range(5):
        (root / f"Camera{v}").mkdir()
        for fi in (300, 301):
            cv2.imwrite(str(root / f"Camera{v}" / f"img_{fi:06d}.png"),
                        img)
    return root, people14 * 1000.0, people15


def _cfg_for(root):
    cfg = small_cfg()
    cfg.DATA_DIR = str(root)
    cfg.DATASET.ROOT = ""
    cfg.DATASET.CAMERA_NUM = 5
    cfg.DATASET.TEST_DATASET = "shelf"
    return cfg


class TestShelfFiles:
    def test_eval_frames_and_gt(self, shelf_root):
        root, people_mm, _ = shelf_root
        ds = ShelfDataset(_cfg_for(root), "validation", is_train=False)
        assert len(ds.frames) == 301  # frames 300..600
        f0 = ds.frames[0]
        assert f0["frame_index"] == 300
        np.testing.assert_allclose(f0["joints_3d"], people_mm, atol=1e-3)
        # frame 301: actor 2's empty cell drops from the stacked gt
        assert ds.frames[1]["joints_3d"].shape[0] == N_ACTORS - 1

    def test_load_batch_with_images(self, shelf_root):
        root, _, _ = shelf_root
        ds = ShelfDataset(_cfg_for(root), "validation", is_train=False)
        idx, batch = next(iter(ds.batches(2, shuffle=False,
                                          drop_last=False)))
        assert batch.views.shape[:2] == (2, 5)
        assert float(np.abs(np.asarray(batch.views)).max()) > 0

    def test_perfect_predictions_pcp(self, shelf_root):
        root, people_mm, people15 = shelf_root
        ds = ShelfDataset(_cfg_for(root), "validation", is_train=False)
        # predictions in the 14-joint converted format + score columns
        pred = np.zeros((N_ACTORS, 14, 5), np.float32)
        pred[:, :, :3] = people_mm
        pred[:, :, 3] = 0.0
        pred[:, :, 4] = 0.95
        actor_pcp, avg_pcp, bone_pcp, recall = ds.evaluate([pred])
        assert avg_pcp > 0.99, (actor_pcp, avg_pcp)
        assert all(p > 0.99 for p in actor_pcp[:N_ACTORS])

    def test_finetune_db_from_pseudo_gt(self, shelf_root):
        root, _, people15 = shelf_root
        cfg = _cfg_for(root)
        cfg.DATASET.PESUDO_GT = "shelf_pgt.pkl"
        (root / "pesudo_gt").mkdir(exist_ok=True)
        pgt = {"img_000000.png": [p for p in people15],
               "img_000005.png": [people15[0]]}
        with open(root / "pesudo_gt" / "shelf_pgt.pkl", "wb") as f:
            pickle.dump(pgt, f)
        ds = ShelfDataset(cfg, "train", is_train=True)
        by_idx = {f["frame_index"]: f for f in ds.frames}
        assert by_idx[0]["joints_3d"].shape == (N_ACTORS, 15, 3)
        np.testing.assert_allclose(by_idx[0]["joints_3d"], people15,
                                   atol=1e-4)
        assert by_idx[5]["joints_3d"].shape[0] == 1
        assert by_idx[7]["joints_3d"].shape[0] == 0
        # 2D visibility computed by projecting the pseudo-GT
        assert by_idx[0]["joints_2d_vis"].shape == (5, N_ACTORS, 15)
