"""Custom ops: multi-scale deformable sampling (projective attention core).

`deform_sample` is the TPU-native equivalent of the reference's compiled
CUDA extension (/root/reference/lib/models/ops/src/cuda/
deform_im2col_cuda.cuh:248-311): fused multi-level bilinear gather + weighted
accumulation. Two implementations share one semantics contract:

    - `deform_sample` (ops.sampling): pure-jnp/XLA, differentiable via AD,
      reference implementation (mirrors the role of the repo's own
      deform_core_pytorch, lib/models/ops/functions/deform_func.py:68-99);
    - `deform_sample_corner` (ops.sampling): the PRODUCTION path — exact
      4-corner-table gather formulation, fastest measured on v5e;
    - `deform_sample_pallas` (ops.pallas_deform): correctness-tested
      Pallas prototype (forward only, no custom VJP) kept for future
      toolchains — the XLA corner path beats it here (PERF.md);
    - `window_sample` (ops.window_sampling) + ops.window_pallas: the
      rig-static windowed formulation, opt-in (measured slower; PERF.md
      "windowed ... dead end").
"""

from mvgformer_tpu.ops.sampling import (
    bilinear_sample,
    deform_sample,
    deform_sample_corner,
    flatten_feature_levels,
)
from mvgformer_tpu.ops.projattn import ProjAttn

__all__ = [
    "bilinear_sample",
    "deform_sample",
    "deform_sample_corner",
    "flatten_feature_levels",
    "ProjAttn",
]
