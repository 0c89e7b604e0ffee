"""Real-index locality statistics for the exact-semantics sorted-window
gather kernel (VERDICT r4 item 1).

probe_sorted_gather_parts.py measures the one-hot-window CORE's ns/row
on synthetic indices; whether the composition can beat the 3.06 ns/row
XLA gather floor hinges on the real data's sorted-block SPANS — the
window width W the kernel must cover per block of BS sorted samples
sets the MXU cost at W*128*2 flops/row (~0.67 ns/row at W=512, break-
even ~W=2300 on v5e bf16).

This probe runs the TRAINED proxy checkpoint (output/ap_ablation,
epoch 199) unjitted on CPU, captures the production sampling locations
at every decoder layer (post-ptop4, the headline semantics), converts
them to flagship-grid corner-table row indices (level-0 130x242 padded,
the 40.4 ms dense-L1 wall from profile_stages5), and reports:

  - per-(view,head) sorted-block spans (p50/p95/max over blocks) for
    sample-sorted order at BS in {512, 1024, 2048}
  - query-sorted order spans (samples kept query-contiguous: no output
    unsort of the S gathered rows needed, only a cheap Lq-row unsort)
  - per-query P-point row spread (the learned-offset locality itself)
  - escape rates vs candidate window widths W

Run (CPU, no TPU needed):
    MVGFORMER_FORCE_PLATFORM=cpu PYTHONPATH=/root/repo:/root/.axon_site \
        python tools/probes/probe_real_index_spans.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
CKPT_ROOT = os.path.join(REPO, "output", "ap_ablation")

# flagship level grids (960x512 image -> stride-4 level 0)
FLAGSHIP_SHAPES = ((128, 240), (64, 120), (32, 60))


def main():
    from mvgformer_tpu.config import load_config
    from mvgformer_tpu.data.datasets import get_dataset
    from mvgformer_tpu.models import build_model
    from mvgformer_tpu.ops import projattn as pa
    from mvgformer_tpu.utils.checkpoint import load_params_checkpoint

    cfg = load_config(os.path.join(REPO, "configs",
                                   "synthetic_ap_ablation.yaml"), [])
    cfg.DECODER.inference_topk_queries = 64
    cfg.DECODER.inference_point_topm = 4
    cfg.DECODER.triangulation_method = "jacobi"

    model = build_model(cfg)
    test_ds = get_dataset(cfg, cfg.DATASET.TEST_SUBSET, is_train=False)
    batch = test_ds.load_batch([0], load_images=False)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    ckpt_dir = None
    for root, dirs, _ in os.walk(CKPT_ROOT):
        if "checkpoints" in dirs:
            ckpt_dir = os.path.join(root, "checkpoints")
            break
    restored = load_params_checkpoint(ckpt_dir)
    params = restored[0]["params"]
    batch_stats = variables.get("batch_stats", {})
    print(f"restored {ckpt_dir} (next epoch {restored[1]})", flush=True)

    captures = []
    orig = pa.deform_sample_corner

    def capture(value, shapes, locations, weights, **kw):
        captures.append((np.asarray(locations), np.asarray(weights)))
        return orig(value, shapes, locations, weights, **kw)

    pa.deform_sample_corner = capture
    try:
        # unjitted apply -> the capture sees concrete arrays
        model.apply({"params": params, "batch_stats": batch_stats},
                    batch, threshold=0.1)
    finally:
        pa.deform_sample_corner = orig
    print(f"captured {len(captures)} sampler calls "
          f"(shapes: {[c[0].shape for c in captures]})", flush=True)

    for li, (loc, _) in enumerate(captures):
        N, Lq, H, L, P, _ = loc.shape
        print(f"\n=== layer {li + 1}: N={N} Lq={Lq} H={H} P={P} ===",
              flush=True)
        for lvl, (h, w) in enumerate(FLAGSHIP_SHAPES):
            hp, wp = h + 2, w + 2
            x = loc[:, :, :, lvl, :, 0] * w - 0.5   # (N, Lq, H, P)
            y = loc[:, :, :, lvl, :, 1] * h - 0.5
            xi = np.clip(np.floor(x).astype(np.int64) + 1, 0, wp - 2)
            yi = np.clip(np.floor(y).astype(np.int64) + 1, 0, hp - 2)
            rows = (yi * wp + xi)                    # (N, Lq, H, P)
            rows = np.transpose(rows, (0, 2, 1, 3))  # (N, H, Lq, P)
            rows = rows.reshape(N * H, Lq, P)

            # per-query P-point row spread (offset locality)
            spread = rows.max(-1) - rows.min(-1)
            print(f"  lvl{lvl} per-query P-row spread: "
                  f"p50={np.percentile(spread, 50):.0f} "
                  f"p95={np.percentile(spread, 95):.0f} "
                  f"max={spread.max()}", flush=True)

            flat = rows.reshape(N * H, Lq * P)
            srt = np.sort(flat, axis=-1)
            for bs in (512, 1024, 2048):
                nblk = (Lq * P) // bs
                if nblk == 0:
                    continue
                blocks = srt[:, :nblk * bs].reshape(N * H, nblk, bs)
                span = blocks[:, :, -1] - blocks[:, :, 0]
                esc = {W: float((span > W - 8).mean())
                       for W in (512, 1024, 2048, 4096)}
                print(f"  lvl{lvl} sample-sorted BS={bs}: span "
                      f"p50={np.percentile(span, 50):.0f} "
                      f"p95={np.percentile(span, 95):.0f} "
                      f"max={span.max()}  esc-rate "
                      + " ".join(f"W{W}:{e:.3f}"
                                 for W, e in esc.items()), flush=True)

            # query-sorted order: sort queries by their min row, keep
            # each query's P samples contiguous
            qkey = rows.min(-1)                      # (NH, Lq)
            order = np.argsort(qkey, axis=-1)
            qs = np.take_along_axis(rows, order[..., None], axis=1)
            qs = qs.reshape(N * H, Lq * P)
            for bs in (512, 1024):
                nblk = (Lq * P) // bs
                if nblk == 0:
                    continue
                blocks = qs[:, :nblk * bs].reshape(N * H, nblk, bs)
                span = blocks.max(-1) - blocks.min(-1)
                print(f"  lvl{lvl} QUERY-sorted BS={bs}: span "
                      f"p50={np.percentile(span, 50):.0f} "
                      f"p95={np.percentile(span, 95):.0f} "
                      f"max={span.max()}", flush=True)


if __name__ == "__main__":
    main()
