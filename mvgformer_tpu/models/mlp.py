"""Small shared heads: MLP and the per-view offset net."""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class MLP(nn.Module):
    """ReLU MLP; mirrors the reference's MLP
    (/root/reference/lib/models/multi_view_pose_transformer.py:81-102)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            x = nn.Dense(self.output_dim if last else self.hidden_dim,
                         dtype=self.dtype, name=f"layers_{i}")(x)
            if not last:
                x = nn.relu(x)
        return x


class OffsetNet(nn.Module):
    """Per-view 2D offset + confidence head
    (/root/reference/lib/models/dq_decoder.py:97-111): a 3-output MLP whose
    first two channels are the 2D offset and the third the confidence logit.
    """

    d_model: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feature):
        out = MLP(self.d_model, 3, self.num_layers, dtype=self.dtype,
                  name="MLP")(feature)
        return out[..., :2], out[..., 2]
