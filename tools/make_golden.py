"""Generate the committed golden-output pack (tests/golden/*.npz).

VERDICT r3 item 8: the torch-oracle parity tier takes ~30 min; these
small fixed-seed golden files let the quick test tier catch parity
regressions from refactors in seconds. Each file records the toy-shape
MVGFormer forward (fixed init seed, fixed synthetic batch, f32 on the
CPU platform — the same platform the test tier runs on) for a
decision-relevant config:

  dense_linalg      — the reference-parity path (all queries, SVD DLT)
  topk_jacobi       — the production inference path (top-K compaction +
                      scalarized Jacobi solver)
  topk_jacobi_ptop4 — the shipping headline semantics (adds point-top-m
                      sparsification P=8 -> m=4 with the one-hot-einsum
                      selection; VERDICT r4 weak #5)

Tolerances in tests/test_golden.py come from PARITY.md's noise-floor
analysis: LSB-level reduction-order changes move toy-shape 3D outputs
by up to a few mm on ill-conditioned tail joints, so the test asserts
p99/max classes, not bitwise equality.

Regenerate (only when an INTENDED semantics change lands, and say so in
the commit message):
    python tools/make_golden.py
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# golden files are platform-pinned to CPU (same recipe as tests/conftest.py)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from mvgformer_tpu.config import load_config
from mvgformer_tpu.data.synthetic import make_batch
from mvgformer_tpu.models.mvgformer import MVGFormer

GOLDEN_DIR = os.path.join(REPO, "tests", "golden")

CONFIGS = {
    "dense_linalg": dict(topk=None, solver="linalg"),
    "topk_jacobi": dict(topk=8, solver="jacobi"),
    # production P=8 -> m=4, same ratio+code path as the flagship headline
    "topk_jacobi_ptop4": dict(topk=8, solver="jacobi", n_points=8, ptop=4),
}


def toy_cfg(topk, solver, n_points=2, ptop=None):
    cfg = load_config()
    cfg.NETWORK.IMAGE_SIZE = [96, 64]
    cfg.DECODER.d_model = 32
    cfg.DECODER.dim_feedforward = 64
    cfg.DECODER.nhead = 4
    cfg.DECODER.dec_n_points = n_points
    cfg.DECODER.num_decoder_layers = 2
    cfg.DECODER.num_instance = 16
    cfg.DECODER.inference_topk_queries = topk
    cfg.DECODER.triangulation_method = solver
    cfg.DECODER.inference_point_topm = ptop
    cfg.POSE_RESNET.NUM_DECONV_FILTERS = [32, 32, 32]
    cfg.DATASET.CAMERA_NUM = 3
    cfg.MULTI_PERSON.MAX_PEOPLE_NUM = 4
    cfg.PARALLEL.COMPUTE_DTYPE = "float32"
    return cfg


def forward(name, **kw):
    cfg = toy_cfg(**kw)
    model = MVGFormer(cfg=cfg)
    batch = make_batch(cfg, batch_size=2, seed=7, num_people=2)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    outs = model.apply(variables, batch, threshold=0.1)
    first, last = outs[0], outs[-1]
    return {
        "pred_logits": np.asarray(last["pred_logits"], np.float32),
        "pred_poses": np.asarray(last["pred_poses"], np.float32),
        "pred_poses_2d": np.asarray(last["pred_poses_2d"], np.float32),
        "layer0_pred_poses": np.asarray(first["pred_poses"], np.float32),
    }


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, kw in CONFIGS.items():
        arrays = forward(name, **kw)
        path = os.path.join(GOLDEN_DIR, f"{name}.npz")
        np.savez_compressed(path, **arrays)
        sizes = {k: v.shape for k, v in arrays.items()}
        print(f"wrote {path}: {sizes} "
              f"({os.path.getsize(path) / 1024:.1f} KiB)")


if __name__ == "__main__":
    main()
