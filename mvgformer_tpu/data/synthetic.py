"""Synthetic multi-view scenes: cameras, people, rendered feature images.

Used by tests and the benchmark harness. Geometry (camera ring, people in a
Panoptic-like space, mm units) mimics the CMU Panoptic setup the reference
evaluates on (/root/reference/lib/dataset/panoptic.py) without requiring the
dataset on disk.
"""

from __future__ import annotations

import numpy as np

from mvgformer_tpu.geometry.cameras import CameraParams

# Panoptic 15-joint skeleton (reference lib/dataset/panoptic.py:174-205)
JOINT_NAMES = [
    "neck", "nose", "mid-hip", "l-shoulder", "l-elbow", "l-wrist",
    "l-hip", "l-knee", "l-ankle", "r-shoulder", "r-elbow", "r-wrist",
    "r-hip", "r-knee", "r-ankle",
]
LIMBS15 = [[0, 1], [0, 2], [0, 3], [3, 4], [4, 5], [0, 9], [9, 10],
           [10, 11], [2, 6], [2, 12], [6, 7], [7, 8], [12, 13], [13, 14]]

# A canonical standing pose in mm, root (mid-hip, index 2) at the origin.
# Derived from average Panoptic limb proportions; serves the same role as the
# reference's tpose.pt asset (15x3 root-relative offsets).
T_POSE = np.array(
    [
        [0.0, 0.0, 560.0],      # neck
        [0.0, 80.0, 680.0],     # nose
        [0.0, 0.0, 0.0],        # mid-hip (root)
        [170.0, 0.0, 540.0],    # l-shoulder
        [260.0, 0.0, 300.0],    # l-elbow
        [330.0, 0.0, 80.0],     # l-wrist
        [100.0, 0.0, -20.0],    # l-hip
        [110.0, 0.0, -460.0],   # l-knee
        [120.0, 0.0, -870.0],   # l-ankle
        [-170.0, 0.0, 540.0],   # r-shoulder
        [-260.0, 0.0, 300.0],   # r-elbow
        [-330.0, 0.0, 80.0],    # r-wrist
        [-100.0, 0.0, -20.0],   # r-hip
        [-110.0, 0.0, -460.0],  # r-knee
        [-120.0, 0.0, -870.0],  # r-ankle
    ],
    dtype=np.float32,
)


def look_at_rotation(cam_pos: np.ndarray, target: np.ndarray,
                     up=(0.0, 0.0, 1.0)) -> np.ndarray:
    """World->camera rotation with +z looking from cam_pos toward target."""
    fwd = target - cam_pos
    fwd = fwd / np.linalg.norm(fwd)
    up = np.asarray(up, dtype=np.float64)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    # rows: camera x (right), y (down), z (forward)
    return np.stack([right, down, fwd], axis=0).astype(np.float32)


def make_camera_ring(num_views: int,
                     radius_mm: float = 4500.0,
                     height_mm: float = 1200.0,
                     center=(0.0, -500.0, 800.0),
                     image_size=(1920, 1080),
                     focal: float = 1630.0,
                     distortion: bool = True,
                     seed: int = 0) -> CameraParams:
    """A ring of V cameras looking at the space center; returns (V, ...)."""
    rng = np.random.RandomState(seed)
    center = np.asarray(center, dtype=np.float64)
    Rs, Ts = [], []
    for i in range(num_views):
        ang = 2.0 * np.pi * i / num_views + rng.uniform(-0.1, 0.1)
        pos = center + np.array([
            radius_mm * np.cos(ang),
            radius_mm * np.sin(ang),
            height_mm + rng.uniform(-200, 200),
        ])
        Rs.append(look_at_rotation(pos, center))
        Ts.append(pos.astype(np.float32).reshape(3, 1))
    f = np.tile(
        np.array([focal, focal], dtype=np.float32), (num_views, 1)
    ) * rng.uniform(0.95, 1.05, size=(num_views, 1)).astype(np.float32)
    c = np.tile(
        np.array([image_size[0] / 2.0, image_size[1] / 2.0],
                 dtype=np.float32), (num_views, 1)
    ) + rng.uniform(-20, 20, size=(num_views, 2)).astype(np.float32)
    if distortion:
        k = np.stack([
            rng.uniform(-0.3, -0.1, num_views),
            rng.uniform(0.05, 0.2, num_views),
            rng.uniform(-0.01, 0.01, num_views),
        ], axis=-1).astype(np.float32)
        p = rng.uniform(-2e-3, 2e-3, size=(num_views, 2)).astype(np.float32)
    else:
        k = np.zeros((num_views, 3), dtype=np.float32)
        p = np.zeros((num_views, 2), dtype=np.float32)
    return CameraParams(
        R=np.stack(Rs), T=np.stack(Ts), f=f, c=c, k=k, p=p
    )


def tile_cameras(cams: CameraParams, batch_size: int) -> CameraParams:
    """(V, ...) cameras -> (B, V, ...)."""
    def tile(x):
        x = np.asarray(x)
        return np.broadcast_to(x, (batch_size,) + x.shape).copy()

    return CameraParams(R=tile(cams.R), T=tile(cams.T), f=tile(cams.f),
                        c=tile(cams.c), k=tile(cams.k), p=tile(cams.p))


def make_batch(cfg, batch_size: int = 1, seed: int = 0,
               num_people: int = 3, image_size=(1920, 1080),
               render: bool = False, cam_seed=None):
    """A synthetic Batch at the configured shapes (random images by default;
    render=True draws gaussian blobs at projected joints so a model can
    actually fit the data in learning tests).

    cam_seed: seed for the camera ring alone; None reuses `seed`.
    SyntheticDataset pins it so all frames share ONE rig, like a real
    capture studio (panoptic.py's fixed CMU rig) — required by the
    rig-static windowed layer-1 plan and representative of serving."""
    import jax.numpy as jnp

    from mvgformer_tpu.data.meta import (
        Batch, Targets, build_view_data, pad_targets)
    from mvgformer_tpu.geometry.cameras import project_points

    rng = np.random.RandomState(seed)
    V = cfg.DATASET.CAMERA_NUM
    W, H = cfg.NETWORK.IMAGE_SIZE
    J = cfg.DECODER.num_keypoints
    M = cfg.MULTI_PERSON.MAX_PEOPLE_NUM
    center = tuple(cfg.MULTI_PERSON.SPACE_CENTER)

    cams = tile_cameras(
        make_camera_ring(V, image_size=image_size,
                         seed=seed if cam_seed is None else cam_seed,
                         center=center), batch_size)
    image_wh = np.tile(np.asarray(image_size, np.float32),
                       (batch_size, V, 1))

    people = [make_people(num_people, seed=seed + 7 * b,
                          space_center=center)
              for b in range(batch_size)]
    targets = pad_targets(people, M, J)

    # per-view 2D visibility: projected joint inside the full image
    gt = np.asarray(targets.joints_3d)  # (B, M, J, 3)
    gt_flat = np.broadcast_to(
        gt.reshape(batch_size, 1, M * J, 3), (batch_size, V, M * J, 3))
    pix = np.asarray(project_points(jnp.asarray(gt_flat), cams)).reshape(
        batch_size, V, M, J, 2)
    inb = ((pix[..., 0] >= 0) & (pix[..., 0] < image_wh[:, :, None, None, 0])
           & (pix[..., 1] >= 0)
           & (pix[..., 1] < image_wh[:, :, None, None, 1]))
    vis2d = (inb & (np.asarray(targets.joints_3d_vis)[:, None] > 0)
             ).astype(np.float32)

    view_data = build_view_data(cams, image_wh, (W, H),
                                joints_vis_2d=vis2d, max_people=M,
                                num_joints=J)

    if render:
        from mvgformer_tpu.geometry.transforms import apply_affine

        net_pix = np.asarray(apply_affine(
            jnp.asarray(pix.reshape(batch_size, V, M * J, 2)),
            view_data.affine)).reshape(batch_size, V, M, J, 2)
        views = np.zeros((batch_size, V, H, W, 3), dtype=np.float32)
        yy, xx = np.mgrid[0:H, 0:W]
        for b in range(batch_size):
            for v in range(V):
                img = np.zeros((H, W), dtype=np.float32)
                for m in range(min(num_people, M)):
                    for j in range(J):
                        if vis2d[b, v, m, j] > 0:
                            px, py = net_pix[b, v, m, j]
                            d2 = (xx - px) ** 2 + (yy - py) ** 2
                            img += np.exp(-d2 / (2 * 3.0 ** 2))
                views[b, v] = img[..., None] * np.array([2.0, 1.0, -1.0])
    else:
        views = rng.randn(batch_size, V, H, W, 3).astype(np.float32) * 0.1

    return Batch(views=jnp.asarray(views), view_data=view_data,
                 targets=targets)


def make_people(num_people: int, seed: int = 0,
                space_center=(0.0, -500.0, 800.0),
                spread_mm: float = 2000.0) -> np.ndarray:
    """Random posed people (num_people, 15, 3) world mm."""
    rng = np.random.RandomState(seed)
    center = np.asarray(space_center, dtype=np.float32)
    poses = []
    for _ in range(num_people):
        root = center + np.array([
            rng.uniform(-spread_mm, spread_mm),
            rng.uniform(-spread_mm, spread_mm),
            rng.uniform(-50.0, 50.0) + 100.0,
        ], dtype=np.float32)
        jitter = rng.normal(0, 40.0, size=T_POSE.shape).astype(np.float32)
        ang = rng.uniform(0, 2 * np.pi)
        rot = np.array([
            [np.cos(ang), -np.sin(ang), 0.0],
            [np.sin(ang), np.cos(ang), 0.0],
            [0.0, 0.0, 1.0],
        ], dtype=np.float32)
        poses.append((T_POSE + jitter) @ rot.T + root)
    return np.stack(poses) if poses else np.zeros((0, 15, 3), np.float32)
