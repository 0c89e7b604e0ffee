"""Offline tool: average GT bone lengths + T-pose offsets from a dataset.

Rebuild of the reference's dataset-analysis tooling
(/root/reference/process/extract_dataset.py:169-207 `poses_to_bone_length`
/ `average_bone_length`): iterates a dataset's ground-truth 3D poses,
converts joints->bones with the kinematic-tree matrix, and saves the mean
bone lengths (the ST triangulation prior) plus mean root-relative joint
offsets (the T-pose asset consumed by DECODER.t_pose_dir).

Usage:
    python tools/extract_bone_lengths.py --cfg configs/<exp>.yaml \
        [--subset train] [--max_frames 300] [--out assets/]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--subset", default=None,
                    help="dataset subset (default: cfg TRAIN_SUBSET)")
    ap.add_argument("--max_frames", type=int, default=300,
                    help="frames to average over (extract_dataset.py "
                         "consider_n=300)")
    ap.add_argument("--out", default="assets")
    ap.add_argument("--tree", default="cmupanoptic")
    args, overrides = ap.parse_known_args()

    import numpy as np

    from mvgformer_tpu.config import load_config
    from mvgformer_tpu.data.datasets import get_dataset
    from mvgformer_tpu.geometry.structural import HumanTree

    cfg = load_config(args.cfg, overrides)
    ds = get_dataset(cfg, args.subset or cfg.DATASET.TRAIN_SUBSET,
                     is_train=True)
    tree = HumanTree(args.tree)

    poses = []
    for fr in getattr(ds, "frames", []):
        gt = fr.get("joints_3d") if isinstance(fr, dict) else None
        if gt is None or not np.asarray(gt).size:
            continue
        for p in np.asarray(gt, dtype=np.float32):
            if p.shape[0] == tree.size:
                poses.append(p)
        if len(poses) >= args.max_frames:
            break
    if not poses:
        # datasets with lazy frames (synthetic): pull batches
        for i in range(min(len(ds), args.max_frames)):
            b = ds.load_batch([i], load_images=False)
            n = int(np.asarray(b.targets.num_person)[0])
            for p in np.asarray(b.targets.joints_3d)[0][:n]:
                poses.append(np.asarray(p, np.float32))
    if not poses:
        raise SystemExit("no ground-truth poses found")

    poses = np.stack(poses[:args.max_frames])
    lengths = tree.bone_lengths(poses)  # (F, J-1)
    mean_len = lengths.mean(axis=0)
    std_len = lengths.std(axis=0)

    root = cfg.DATASET.ROOTIDX
    tpose = (poses - poses[:, root:root + 1]).mean(axis=0)  # (J, 3)

    os.makedirs(args.out, exist_ok=True)
    np.save(os.path.join(args.out, "bone_lengths.npy"), mean_len)
    np.save(os.path.join(args.out, "tpose.npy"), tpose)
    print(f"poses used: {len(poses)}")
    for i, (m, s) in enumerate(zip(mean_len, std_len)):
        print(f"bone {i:2d}: {m:8.2f} mm +- {s:6.2f}")
    print(f"saved {args.out}/bone_lengths.npy and {args.out}/tpose.npy")


if __name__ == "__main__":
    main()
