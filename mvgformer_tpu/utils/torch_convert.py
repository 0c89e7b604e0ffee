"""Convert reference MVGFormer torch checkpoints to this model's variables.

Maps the state_dict of the reference DyanmicQueryTransformer
(/root/reference/lib/models/dq_transformer.py) onto MVGFormer's flax
variables. Used both for loading released checkpoints
(mvgformer_q1024_model.pth.tar) and for parity tests against randomly
initialized reference models.

Reference parameters with no live role in the DQ forward path are skipped:
the top-level cloned pose_embed/class_embed lists, reference_points Linear,
level_embed, and the unused per-layer self_attn when the config never calls
it (SURVEY.md §2.4; DDP trains with find_unused_parameters=True because of
exactly these).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from mvgformer_tpu.models.pose_resnet import convert_torch_state_dict


def _to_np(v):
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def _put(tree: dict, path, value):
    node = tree
    for part in path[:-1]:
        node = node.setdefault(part, {})
    node[path[-1]] = jnp.asarray(value)


def _linear(params, sd, src: str, dst_path):
    _put(params, dst_path + ("kernel",), _to_np(sd[src + ".weight"]).T)
    if src + ".bias" in sd:
        _put(params, dst_path + ("bias",), _to_np(sd[src + ".bias"]))


def _layernorm(params, sd, src: str, dst_path):
    _put(params, dst_path + ("scale",), _to_np(sd[src + ".weight"]))
    _put(params, dst_path + ("bias",), _to_np(sd[src + ".bias"]))


def _mha(params, sd, src: str, dst_path, d_model: int, n_heads: int):
    """torch nn.MultiheadAttention (packed qkv) -> flax
    MultiHeadDotProductAttention {query,key,value,out}."""
    head_dim = d_model // n_heads
    w = _to_np(sd[src + ".in_proj_weight"])  # (3C, C)
    b = _to_np(sd[src + ".in_proj_bias"])  # (3C,)
    for i, name in enumerate(("query", "key", "value")):
        wi = w[i * d_model:(i + 1) * d_model]  # (C, C), out-major
        bi = b[i * d_model:(i + 1) * d_model]
        _put(params, dst_path + (name, "kernel"),
             wi.T.reshape(d_model, n_heads, head_dim))
        _put(params, dst_path + (name, "bias"),
             bi.reshape(n_heads, head_dim))
    wo = _to_np(sd[src + ".out_proj.weight"])  # (C, C)
    bo = _to_np(sd[src + ".out_proj.bias"])
    _put(params, dst_path + ("out", "kernel"),
         wo.T.reshape(n_heads, head_dim, d_model))
    _put(params, dst_path + ("out", "bias"), bo)


def convert_mvgformer_state_dict(state_dict, cfg) -> Dict:
    """Full-model conversion. Returns {'params': ..., 'batch_stats': ...}."""
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        sd[k] = v

    backbone_sd = {k[len("backbone."):]: v for k, v in sd.items()
                   if k.startswith("backbone.")}
    backbone_vars = convert_torch_state_dict(backbone_sd)

    params: dict = {"backbone": backbone_vars["params"]}
    stats: dict = {"backbone": backbone_vars["batch_stats"]}

    _put(params, ("joint_embedding",), _to_np(sd["joint_embedding.weight"]))
    _put(params, ("instance_embedding",),
         _to_np(sd["instance_embedding.weight"]))

    dec = cfg.DECODER
    n_layers = dec.num_decoder_layers
    for i in range(n_layers):
        src = f"decoder.layers.{i}"
        dst = ("decoder",
               "layer_shared" if dec.share_layer_weights else f"layer_{i}")
        pa_dst = dst + ("proj_attn",)
        for lin in ("sampling_offsets", "attention_weights", "rayconv",
                    "output_proj"):
            _linear(params, sd, f"{src}.proj_attn.{lin}", pa_dst + (lin,))
        _linear(params, sd, f"{src}.feature_update_mlp",
                dst + ("feature_update_mlp",))
        _layernorm(params, sd, f"{src}.norm2", dst + ("norm2",))
        if dec.open_forward_ffn:
            _linear(params, sd, f"{src}.linear1", dst + ("linear1",))
            _linear(params, sd, f"{src}.linear2", dst + ("linear2",))
            _layernorm(params, sd, f"{src}.norm3", dst + ("norm3",))
        _linear(params, sd, f"{src}.class_embed", dst + ("class_embed",))
        for j in range(dec.pose_embed_layer):
            _linear(params, sd, f"{src}.pose_embed.MLP.layers.{j}",
                    dst + ("pose_embed", "MLP", f"layers_{j}"))
        if dec.bayesian_update and f"{src}.bayesian_conf.weight" in sd:
            _linear(params, sd, f"{src}.bayesian_conf",
                    dst + ("bayesian_conf",))
        if dec.feature_update_method.startswith("attention"):
            _mha(params, sd, f"{src}.self_attn", dst + ("self_attn",),
                 dec.d_model, dec.nhead)
        if dec.init_self_attention:
            # the reference REUSES its single self_attn + norm2 for the
            # pre-attention block (dq_decoder.py:532-539); this framework
            # names that block init_self_attn/norm_init, so duplicate the
            # weights there (norm2 stays mapped for update_feature)
            _mha(params, sd, f"{src}.self_attn",
                 dst + ("init_self_attn",), dec.d_model, dec.nhead)
            _layernorm(params, sd, f"{src}.norm2", dst + ("norm_init",))
        if dec.share_layer_weights:
            break

    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str, cfg):
    """Load a reference .pth.tar checkpoint file and convert."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return convert_mvgformer_state_dict(sd, cfg)
