"""PoseResNet-50 backbone in flax (NHWC, TPU-native layout).

Functional mirror of /root/reference/lib/models/pose_resnet.py:109-282:
ResNet-50 bottleneck trunk + 3 stride-2 deconv layers; the forward returns
the three *pre-BatchNorm* deconv outputs (the reference appends x right after
each ConvTranspose2d, pose_resnet.py:209-216) selected by `use_feat_level`.
The final heatmap conv exists in the reference but is unused by the live
path; it is omitted here (checkpoint converter skips it, matching the
reference's own final-layer reinit, lib/utils/utils.py:152-188).

The backbone is frozen during MVGFormer training and kept in eval mode
(run/train_3d.py:118-121, lib/core/function.py:82-94), so BatchNorm always
uses running statistics (use_running_average=True) — stats live in the
'batch_stats' collection and are never updated.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
from flax import linen as nn


class Bottleneck(nn.Module):
    """ResNet bottleneck block (pose_resnet.py:68-106), expansion 4."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda f, k, s, p, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(p, p), (p, p)],
            use_bias=False, dtype=self.dtype, name=name)
        bn = lambda name: nn.BatchNorm(
            use_running_average=True, epsilon=1e-5, momentum=0.9,
            dtype=self.dtype, name=name)

        residual = x
        out = nn.relu(bn("bn1")(conv(self.planes, 1, 1, 0, "conv1")(x)))
        out = nn.relu(bn("bn2")(
            conv(self.planes, 3, self.stride, 1, "conv2")(out)))
        out = bn("bn3")(conv(self.planes * 4, 1, 1, 0, "conv3")(out))
        if self.downsample:
            residual = bn("downsample_bn")(
                conv(self.planes * 4, 1, self.stride, 0, "downsample_conv")(x))
        return nn.relu(out + residual)


class PoseResNet(nn.Module):
    """ResNet-50 trunk + 3 deconv stages; returns pre-BN deconv features.

    Input:  (N, H, W, 3) images (NHWC).
    Output: list of (N, h_i, w_i, 256) maps at strides 16, 8, 4 — i.e. in
    *increasing* resolution, matching the reference's interm_feat order
    (pose_resnet.py:209-214); the caller reverses it (dq_transformer.py:354).
    """

    block_counts: Sequence[int] = (3, 4, 6, 3)
    deconv_filters: Sequence[int] = (256, 256, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 use_feat_level: Sequence[int] = (0, 1, 2)) -> List[jnp.ndarray]:
        bn = lambda name: nn.BatchNorm(
            use_running_average=True, epsilon=1e-5, momentum=0.9,
            dtype=self.dtype, name=name)

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(bn("bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        planes = (64, 128, 256, 512)
        inplanes = 64
        for li, (p, n_blocks) in enumerate(zip(planes, self.block_counts)):
            stride = 1 if li == 0 else 2
            for bi in range(n_blocks):
                first = bi == 0
                x = Bottleneck(
                    planes=p,
                    stride=stride if first else 1,
                    downsample=first and (stride != 1 or inplanes != p * 4),
                    dtype=self.dtype,
                    name=f"layer{li + 1}_{bi}",
                )(x)
                inplanes = p * 4

        feats = []
        for di, f in enumerate(self.deconv_filters):
            # torch ConvTranspose2d(k=4, s=2, p=1) == lax padding (2, 2) with
            # transpose_kernel=True (verified numerically vs torch)
            x = nn.ConvTranspose(
                f, (4, 4), strides=(2, 2), padding=[(2, 2), (2, 2)],
                transpose_kernel=True, use_bias=False, dtype=self.dtype,
                name=f"deconv{di}",
            )(x)
            feats.append(x)  # pre-BN, as in the reference forward
            x = nn.relu(bn(f"deconv_bn{di}")(x))

        return [f for i, f in enumerate(feats) if i in tuple(use_feat_level)]


def convert_torch_state_dict(state_dict) -> dict:
    """Map a reference PoseResNet state_dict (torch or numpy values) onto
    this module's {'params': ..., 'batch_stats': ...} variables.

    Accepts keys with or without the 'module.' / 'backbone.' prefixes
    (the reference strips 'module.' itself, lib/utils/utils.py:160-170).
    The unused final_layer is skipped.
    """
    import numpy as np

    def to_np(v):
        return v.numpy() if hasattr(v, "numpy") else np.asarray(v)

    sd = {}
    for k, v in state_dict.items():
        for prefix in ("module.", "backbone."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        sd[k] = to_np(v)

    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = jnp.asarray(value)

    def conv(src, dst_path):
        # torch OIHW -> flax HWIO
        put(params, dst_path + ("kernel",),
            np.transpose(sd[src + ".weight"], (2, 3, 1, 0)))

    def bn_(src, dst_path):
        put(params, dst_path + ("scale",), sd[src + ".weight"])
        put(params, dst_path + ("bias",), sd[src + ".bias"])
        put(stats, dst_path + ("mean",), sd[src + ".running_mean"])
        put(stats, dst_path + ("var",), sd[src + ".running_var"])

    conv("conv1", ("conv1",))
    bn_("bn1", ("bn1",))

    block_counts = (3, 4, 6, 3)
    for li, n_blocks in enumerate(block_counts):
        for bi in range(n_blocks):
            src = f"layer{li + 1}.{bi}"
            dst = f"layer{li + 1}_{bi}"
            for cname in ("conv1", "conv2", "conv3"):
                conv(f"{src}.{cname}", (dst, cname))
            for bname in ("bn1", "bn2", "bn3"):
                bn_(f"{src}.{bname}", (dst, bname))
            if f"{src}.downsample.0.weight" in sd:
                conv(f"{src}.downsample.0", (dst, "downsample_conv"))
                bn_(f"{src}.downsample.1", (dst, "downsample_bn"))

    for di, idx in enumerate((0, 3, 6)):
        # torch ConvTranspose2d weight (in, out, kh, kw) -> flax
        # transpose_kernel layout (kh, kw, out, in)
        put(params, (f"deconv{di}", "kernel"),
            np.transpose(sd[f"deconv_layers.{idx}.weight"], (2, 3, 1, 0)))
        bn_(f"deconv_layers.{idx + 1}", (f"deconv_bn{di}",))

    return {"params": params, "batch_stats": stats}
