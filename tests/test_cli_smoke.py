"""End-to-end CLI smoke: train.py + validate.py on the synthetic dataset."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args):
    env = dict(os.environ)
    # the axon sitecustomize rewrites JAX_PLATFORMS at import; the run
    # scripts honor this dedicated override via jax.config.update instead
    # (the tests/conftest.py recipe)
    env["MVGFORMER_FORCE_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "run", script),
         "--cfg", os.path.join(REPO, "configs/synthetic_smoke.yaml"),
         *args],
        capture_output=True, text=True, cwd=REPO, timeout=480, env=env)


@pytest.mark.slow
def test_train_cli_smoke(tmp_path):
    res = _run("train.py", "--max_steps", "2",
               f"OUTPUT_DIR={tmp_path}")
    assert res.returncode == 0, res.stderr[-2000:]
    assert "eval epoch 0" in res.stderr or "eval epoch 0" in res.stdout


@pytest.mark.slow
def test_validate_cli_smoke(tmp_path):
    res = _run("validate.py", f"OUTPUT_DIR={tmp_path}")
    assert res.returncode == 0, res.stderr[-2000:]
    combined = res.stderr + res.stdout
    assert "mpjpe" in combined


def test_generate_video_cli(tmp_path):
    """run/generate_video.py stitches numbered frames into an mp4
    (reference run/generate_video.py:29-67)."""
    import cv2
    import numpy as np

    for i in range(4):
        img = np.full((64, 96, 3), i * 40, np.uint8)
        cv2.imwrite(str(tmp_path / f"{i}_joints3d.png"), img)
    out = tmp_path / "vid.mp4"
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "run", "generate_video.py"),
         "--image_dir", str(tmp_path), "--out", str(out),
         "--pattern", "*_joints3d.png"],
        capture_output=True, text=True, cwd=REPO, timeout=120)
    assert res.returncode == 0, res.stderr[-2000:]
    assert out.exists() and out.stat().st_size > 0


@pytest.mark.slow
def test_train_cli_mvp_baseline(tmp_path):
    """TRANSFORMER=multi_view_pose_transformer trains + evals end-to-end
    (reference dispatch run/train_3d.py:245-250)."""
    res = _run("train.py", "--max_steps", "1",
               f"OUTPUT_DIR={tmp_path}",
               "TRANSFORMER=multi_view_pose_transformer")
    assert res.returncode == 0, res.stderr[-2000:]
    combined = res.stderr + res.stdout
    assert "eval epoch 0" in combined


@pytest.mark.slow
def test_validate_cli_log_val_loss(tmp_path):
    """DEBUG.LOG_VAL_LOSS prints the criterion dict on eval batches
    (reference lib/core/function.py:413-576)."""
    res = _run("validate.py", f"OUTPUT_DIR={tmp_path}",
               "DEBUG.LOG_VAL_LOSS=true")
    assert res.returncode == 0, res.stderr[-2000:]
    combined = res.stderr + res.stdout
    assert "val loss" in combined
    assert "loss_pose_perjoint" in combined
