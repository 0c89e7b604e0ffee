"""Close the flagship-parity tail: prove the >2 mm outliers are DLT
conditioning, not a bug (VERDICT r2 item 9).

Method: run the flagship-shape parity comparison (dense mode, like
tools/flagship_parity.py) with the reference's own triangulation patched to
ALSO solve each layer's DLT system in float64 on identical inputs. If the
reference's f32 solution disagrees with its own f64 solution by the same
magnitude as it disagrees with this framework — and only on the same
ill-conditioned joints — the cross-framework tail is numerically forced,
not a semantic divergence.

Reference solver: triangulate_point_from_multiple_views_linear_torch_batch
(/root/reference/lib/mvn/utils/multiview.py:170-228), called per layer from
dq_decoder.py:433/457.
"""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from flagship_parity import flagship_cfgs


def main():
    import torch

    torch.set_num_threads(os.cpu_count() or 8)

    import oracles
    from oracles import make_ref_meta, ref_dq_transformer
    from mvgformer_tpu.data.synthetic import make_batch
    from mvgformer_tpu.models.mvgformer import MVGFormer
    from mvgformer_tpu.utils.torch_convert import \
        convert_mvgformer_state_dict

    oracles._init_paths()
    from mvn.utils import multiview

    # --- patch: record (f32, f64) DLT solutions per call
    records = []
    orig_batch_version = multiview.triangulate_batch_of_points_batch_version
    inner = multiview.triangulate_point_from_multiple_views_linear_torch_batch

    def patched(proj, points, confidences_batch=None, solver="default"):
        out32 = orig_batch_version(proj, points,
                                   confidences_batch=confidences_batch,
                                   solver=solver)
        outs64 = []
        for b in range(points.shape[0]):
            conf = (confidences_batch[b].double()
                    if confidences_batch is not None else None)
            outs64.append(inner(proj[b].double(), points[b].double(),
                                confidences=conf, solver=solver))
        records.append((out32.detach().numpy().copy(),
                        torch.stack(outs64).detach().numpy().copy()))
        return out32

    multiview.triangulate_batch_of_points_batch_version = patched

    cfg, rc = flagship_cfgs("all")
    torch.manual_seed(0)
    t0 = time.time()
    ref = ref_dq_transformer(rc).eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.3)
    print(f"built reference in {time.time()-t0:.0f}s", flush=True)

    batch = make_batch(cfg, batch_size=1, seed=2, num_people=3)
    views, meta = make_ref_meta(batch, cfg)
    t0 = time.time()
    with torch.no_grad():
        out_ref = ref(views=views, meta=meta, threshold=0.0, frame_id=0)
    print(f"torch forward {time.time()-t0:.0f}s "
          f"({len(records)} DLT calls recorded)", flush=True)

    model = MVGFormer(cfg=cfg)
    variables = convert_mvgformer_state_dict(ref.state_dict(), cfg)
    t0 = time.time()
    outs = model.apply(variables, batch, threshold=0.0)
    print(f"jax forward {time.time()-t0:.0f}s", flush=True)

    ref_poses = out_ref["pred_poses"]["outputs_coord"].numpy().reshape(
        1024, 15, 3)
    ours_poses = np.asarray(outs[-1]["pred_poses"]).reshape(1024, 15, 3)
    cross = np.linalg.norm(ours_poses - ref_poses, axis=-1)  # (1024, 15)

    # last record = final decoder layer; dense 'all' mode keeps all queries
    # (the decoder batches the DLT per query-person: (Q, J, 3))
    out32, out64 = records[-1]
    assert out32.size == 1024 * 15 * 3, out32.shape
    self_err = np.linalg.norm(
        out32.reshape(1024, 15, 3) - out64.reshape(1024, 15, 3),
        axis=-1)  # reference f32-vs-f64 on identical DLT inputs

    outlier = cross > 2.0
    n_out = int(outlier.sum())
    print(f"\ncross-framework error: p50={np.percentile(cross, 50):.4f} "
          f"p99={np.percentile(cross, 99):.4f} max={cross.max():.3f} mm; "
          f">2mm: {n_out}/{cross.size}")
    print(f"reference f32-vs-f64 self-error (same DLT inputs): "
          f"p50={np.percentile(self_err, 50):.4f} "
          f"p99={np.percentile(self_err, 99):.4f} "
          f"max={self_err.max():.3f} mm")
    if n_out:
        print(f"  on the {n_out} cross-outlier joints: self-error "
              f"p50={np.percentile(self_err[outlier], 50):.4f} "
              f"max={self_err[outlier].max():.3f} mm")
        print(f"  on the rest: self-error "
              f"p50={np.percentile(self_err[~outlier], 50):.4f} "
              f"p99={np.percentile(self_err[~outlier], 99):.4f} mm")
        ratio = (self_err[outlier].mean()
                 / max(self_err[~outlier].mean(), 1e-12))
        print(f"  mean self-error ratio (outliers vs rest): {ratio:.1f}x")

    # --- second experiment: full-model sensitivity to an LSB-level
    # perturbation of OUR OWN pipeline. MVG_GATHER_CHUNKS changes only the
    # f32 reduction ORDER of the deformable-sampling epilogue (bit-exact
    # math, different association); if that alone moves the 4-layer tail
    # by millimetres, the cross-framework tail is numerically forced.
    os.environ["MVG_GATHER_CHUNKS"] = "1"
    t0 = time.time()
    outs1 = model.apply(variables, batch, threshold=0.0)
    print(f"jax forward (chunks=1 perturbation) {time.time()-t0:.0f}s",
          flush=True)
    ours1 = np.asarray(outs1[-1]["pred_poses"]).reshape(1024, 15, 3)
    perturb = np.linalg.norm(ours_poses - ours1, axis=-1)
    print(f"self-perturbation (reduction-order LSB change, full model): "
          f"p50={np.percentile(perturb, 50):.4f} "
          f"p99={np.percentile(perturb, 99):.4f} "
          f"max={perturb.max():.3f} mm")

    # verdict: the tail is conditioning if (a) the cross error is within a
    # small factor of the single-solve f32 DLT noise at the distribution
    # level, and (b) an LSB-level self-perturbation produces a tail of the
    # same order as the cross tail
    q_ratio_p50 = np.percentile(cross, 50) / max(
        np.percentile(self_err, 50), 1e-9)
    q_ratio_p99 = np.percentile(cross, 99) / max(
        np.percentile(self_err, 99), 1e-9)
    tail_ratio = cross.max() / max(perturb.max(), 1e-9)
    print(f"cross/self quantile ratios: p50 {q_ratio_p50:.1f}x, "
          f"p99 {q_ratio_p99:.1f}x; cross-max/perturb-max "
          f"{tail_ratio:.1f}x")
    ok = q_ratio_p50 < 4 and q_ratio_p99 < 4 and tail_ratio < 4
    print("CONDITIONING CONFIRMED: cross-framework divergence is the "
          "same order as the reference's own f32 DLT noise and as our "
          "own reduction-order sensitivity"
          if ok else
          "INCONCLUSIVE: cross error exceeds the numerical-noise scale — "
          "investigate as a real divergence")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
