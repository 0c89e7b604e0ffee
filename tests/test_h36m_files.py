"""H36M loader against real-format annot pickles (synthetic fixture).

Builds annot/h36m_validation.pkl in the reference's record layout
(per-(camera, frame) dicts with camera-frame joints_3d and camera
intrinsics/extrinsics — lib/dataset/h36m.py:95-197) and drives
H36MDataset: 4-view grouping, damaged-action filtering, ::64 eval
subsampling, camera->world conversion and the Panoptic joint remap.
"""

import os
import pickle

import numpy as np
import pytest

from mvgformer_tpu.data.datasets import H36M_TO_PANOPTIC, H36MDataset
from mvgformer_tpu.data.synthetic import make_camera_ring, make_people
from mvgformer_tpu.geometry.cameras import world_to_camera

from test_model import small_cfg

N_IMAGE_IDS = 65  # ::64 eval sampling -> frames 0 and 64


@pytest.fixture(scope="module")
def h36m_root(tmp_path_factory):
    import jax.numpy as jnp

    root = tmp_path_factory.mktemp("h36m")
    (root / "annot").mkdir()
    cams = make_camera_ring(4, image_size=(1000, 1002))
    person = make_people(1, seed=9)[0]  # (15, 3) world mm
    # invert the loader's remap: world17-ish h36m-order joints such that
    # world[H36M_TO_PANOPTIC] == person
    world = np.zeros((17, 3), np.float32)
    world[H36M_TO_PANOPTIC] = person

    db = []
    for image_id in range(N_IMAGE_IDS):
        for v in range(4):
            cp = type(cams)(R=cams.R[v], T=cams.T[v], f=cams.f[v],
                            c=cams.c[v], k=cams.k[v], p=cams.p[v])
            cam_joints = np.asarray(world_to_camera(
                jnp.asarray(world[None]), cp))[0]
            db.append({
                "subject": 11, "action": 2, "subaction": 1,
                "image_id": image_id, "camera_id": v,
                "image": f"s11_act2/cam{v}_{image_id:06d}.jpg",
                "joints_3d": cam_joints,
                "camera": {
                    "R": np.asarray(cams.R[v]),
                    "T": np.asarray(cams.T[v]),
                    "fx": float(cams.f[v, 0]), "fy": float(cams.f[v, 1]),
                    "cx": float(cams.c[v, 0]), "cy": float(cams.c[v, 1]),
                    "k": np.asarray(cams.k[v]),
                    "p": np.asarray(cams.p[v]),
                },
            })
    # a damaged-action record that must be filtered (h36m.py:192-197)
    for v in range(4):
        rec = dict(db[v])
        rec.update(subject=9, action=5, subaction=2, image_id=0)
        db.append(rec)
    with open(root / "annot" / "h36m_validation.pkl", "wb") as f:
        pickle.dump(db, f)
    return root, person


def _cfg_for(root):
    cfg = small_cfg()
    cfg.DATA_DIR = str(root)
    cfg.DATASET.ROOT = ""
    cfg.DATASET.CAMERA_NUM = 4
    cfg.DATASET.TEST_DATASET = "h36m"
    return cfg


class TestH36MFiles:
    def test_grouping_and_world_conversion(self, h36m_root):
        root, person = h36m_root
        ds = H36MDataset(_cfg_for(root), "validation", is_train=False)
        # 65 image ids at ::64 -> 2 frames; the damaged s9 record filtered
        assert len(ds.frames) == 2
        f0 = ds.frames[0]
        assert len(f0["images"]) == 4
        assert f0["joints_3d"].shape == (1, 15, 3)
        # camera-frame joints must convert back to the world pose
        np.testing.assert_allclose(f0["joints_3d"][0], person, atol=0.1)

    def test_missing_annotations_warns_empty(self, tmp_path):
        cfg = _cfg_for(tmp_path)
        ds = H36MDataset(cfg, "validation", is_train=False)
        assert len(ds.frames) == 0
