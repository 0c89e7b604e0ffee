"""Torch/numpy oracles from the public reference implementation.

These helpers import modules from the read-only reference checkout at
/root/reference (when present) so behavioural parity can be asserted without
copying any reference code into this repository. Every test using them must
call `reference_available()` and skip when the checkout is absent.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"
REFERENCE_LIB = "/root/reference/lib"


def reference_available() -> bool:
    import os

    return os.path.isdir(REFERENCE_LIB)


_initialized = False


def _init_paths():
    global _initialized
    if _initialized:
        return
    # The reference's run/_init_paths.py injects lib/ onto sys.path; its
    # modules import each other as top-level packages (e.g. `utils.transforms`).
    for p in (REFERENCE_LIB, REFERENCE_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)
    # The reference's config module needs easydict, which is not installed;
    # provide a minimal stand-in so importing reference modules that pull in
    # lib.core.config does not fail.
    if "easydict" not in sys.modules:
        try:
            import easydict  # noqa: F401
        except ImportError:
            mod = types.ModuleType("easydict")

            class EasyDict(dict):
                def __init__(self, d=None, **kwargs):
                    super().__init__()
                    for k, v in {**(d or {}), **kwargs}.items():
                        self[k] = v

                def __getattr__(self, name):
                    try:
                        return self[name]
                    except KeyError as e:
                        raise AttributeError(name) from e

                def __setattr__(self, name, value):
                    self[name] = value

                def __setitem__(self, name, value):
                    if isinstance(value, dict) and not isinstance(
                            value, EasyDict):
                        value = EasyDict(value)
                    super().__setitem__(name, value)

            mod.EasyDict = EasyDict
            sys.modules["easydict"] = mod
    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            # models.util.misc only needs __version__ at import time
            tv = types.ModuleType("torchvision")
            tv.__version__ = "0.15.0"
            tv.ops = types.ModuleType("torchvision.ops")
            tv.ops.misc = types.ModuleType("torchvision.ops.misc")
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.ops"] = tv.ops
            sys.modules["torchvision.ops.misc"] = tv.ops.misc
    if "mmcv" not in sys.modules:
        try:
            import mmcv  # noqa: F401
        except ImportError:
            mm = types.ModuleType("mmcv")
            mm.runner = types.ModuleType("mmcv.runner")
            mm.runner.get_dist_info = lambda: (0, 1)
            sys.modules["mmcv"] = mm
            sys.modules["mmcv.runner"] = mm.runner
    if "json_tricks" not in sys.modules:
        try:
            import json_tricks  # noqa: F401
        except ImportError:
            import json as _json

            jt = types.ModuleType("json_tricks")
            jt.load = _json.load
            jt.loads = _json.loads
            jt.dump = _json.dump
            jt.dumps = _json.dumps
            sys.modules["json_tricks"] = jt
    for name in ("wandb", "prettytable"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                stub = types.ModuleType(name)
                stub.log = lambda *a, **k: None
                stub.init = lambda *a, **k: None
                stub.PrettyTable = object
                sys.modules[name] = stub
    _install_deformable_stub()
    _initialized = True


def _install_deformable_stub():
    """Register a `Deformable` module backed by the reference's own
    pure-torch path (deform_core_pytorch), so reference modules that import
    the CUDA extension work on CPU."""
    if "Deformable" in sys.modules:
        return
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_ref_deform_func_src",
        REFERENCE_LIB + "/models/ops/functions/deform_func.py")
    # deform_func.py itself imports Deformable; register a placeholder
    # first, then wire deform_forward to the file's deform_core_pytorch.
    stub = types.ModuleType("Deformable")
    sys.modules["Deformable"] = stub
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sys.modules["_ref_deform_func_src"] = mod

    def deform_forward(value, spatial_shapes, level_start_index,
                       sampling_loc, attn_weight, im2col_step):
        return mod.deform_core_pytorch(
            value, spatial_shapes, sampling_loc, attn_weight)

    stub.deform_forward = deform_forward


def ref_cameras():
    _init_paths()
    import utils.cameras as cameras  # type: ignore

    return cameras


def ref_transforms():
    _init_paths()
    import utils.transforms as transforms  # type: ignore

    return transforms


def ref_multiview():
    _init_paths()
    from mvn.utils import multiview  # type: ignore

    return multiview


def ref_projattn():
    """Import the reference ProjAttn (CUDA ext stubbed, see _init_paths)."""
    _init_paths()
    from models.ops.modules import ProjAttn  # type: ignore

    return ProjAttn


def ref_deform_core():
    _init_paths()
    import _ref_deform_func_src  # type: ignore

    return _ref_deform_func_src.deform_core_pytorch


_torch_cpu_patched = False


def patch_torch_cpu_only():
    """Make the reference's hardcoded .cuda()/.to('cuda') calls no-ops so
    its models run on CPU-only torch builds."""
    global _torch_cpu_patched
    if _torch_cpu_patched:
        return
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    orig_to = torch.nn.Module.to

    def safe_to(self, *args, **kwargs):
        try:
            return orig_to(self, *args, **kwargs)
        except (RuntimeError, AssertionError):
            return self

    torch.nn.Module.to = safe_to

    # newer torch defaults torch.load(weights_only=True), which rejects the
    # reference's pickled assets; restore the old default for oracle runs
    orig_load = torch.load

    def legacy_load(*args, **kwargs):
        kwargs.setdefault("weights_only", False)
        kwargs.setdefault("map_location", "cpu")
        return orig_load(*args, **kwargs)

    torch.load = legacy_load
    _torch_cpu_patched = True


def ref_config():
    """The reference's own config module (defaults), as a fresh edict."""
    _init_paths()
    import copy

    import core.config as ref_config_mod  # type: ignore

    return copy.deepcopy(ref_config_mod.config)


def ref_dq_transformer(cfg_edict):
    """Build the reference DyanmicQueryTransformer on CPU."""
    _init_paths()
    patch_torch_cpu_only()
    import models.dq_transformer as dq  # type: ignore

    return dq.get_mvp(cfg_edict, is_train=False)


def make_ref_meta(batch, cfg):
    """Convert a mvgformer_tpu Batch into the reference's (views, meta)
    format: a list of per-view image tensors and per-view meta dicts
    (JointsDataset.py:197-220 after default collate)."""
    import numpy as np
    import torch

    vd = batch.view_data
    tgt = batch.targets
    B, V = batch.views.shape[:2]
    M, J = np.asarray(tgt.joints_3d).shape[1:3]

    views = [torch.as_tensor(
        np.transpose(np.asarray(batch.views[:, v]), (0, 3, 1, 2)))
        for v in range(V)]

    cams = vd.cameras
    meta = []
    for v in range(V):
        aff = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
        aff[:, :2] = np.asarray(vd.affine[:, v])
        inv_aff = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
        inv_aff[:, :2] = np.asarray(vd.inv_affine[:, v])
        vis3 = np.repeat(np.asarray(tgt.joints_3d_vis)[..., None], 3, -1)
        vis2 = np.repeat(
            np.asarray(vd.joints_vis_2d[:, v])[..., None], 2, -1)
        meta.append({
            "image": [""] * B,
            "camera": {
                "R": torch.as_tensor(np.asarray(cams.R[:, v])),
                "T": torch.as_tensor(np.asarray(cams.T[:, v])),
                "fx": torch.as_tensor(np.asarray(cams.f[:, v, 0])),
                "fy": torch.as_tensor(np.asarray(cams.f[:, v, 1])),
                "cx": torch.as_tensor(np.asarray(cams.c[:, v, 0])),
                "cy": torch.as_tensor(np.asarray(cams.c[:, v, 1])),
                "k": torch.as_tensor(np.asarray(cams.k[:, v])[..., None]),
                "p": torch.as_tensor(np.asarray(cams.p[:, v])[..., None]),
            },
            "center": torch.as_tensor(np.asarray(vd.centers[:, v])),
            "scale": torch.as_tensor(np.asarray(vd.scales[:, v])),
            "rotation": torch.zeros(B),
            "affine_trans": torch.as_tensor(aff),
            "inv_affine_trans": torch.as_tensor(inv_aff),
            "num_person": torch.as_tensor(
                np.asarray(tgt.num_person)).long(),
            "joints_3d": torch.as_tensor(np.asarray(tgt.joints_3d)),
            "joints_3d_vis": torch.as_tensor(vis3),
            "roots_3d": torch.as_tensor(np.asarray(tgt.roots_3d)),
            "joints_3d_voxelpose_pred": torch.zeros(B, M, J, 5),
            "joints": torch.zeros(B, M, J, 2),
            "joints_vis": torch.as_tensor(vis2),
        })
    return views, meta


def make_torch_cam_dict(R, T, f, c, k, p):
    """Build the reference's batched camera dict (B, V, ...) from arrays."""
    import torch

    return {
        "R": torch.as_tensor(R, dtype=torch.float32),
        "T": torch.as_tensor(T, dtype=torch.float32),
        "fx": torch.as_tensor(f[..., 0], dtype=torch.float32),
        "fy": torch.as_tensor(f[..., 1], dtype=torch.float32),
        "cx": torch.as_tensor(c[..., 0], dtype=torch.float32),
        "cy": torch.as_tensor(c[..., 1], dtype=torch.float32),
        "k": torch.as_tensor(k[..., None], dtype=torch.float32),
        "p": torch.as_tensor(p[..., None], dtype=torch.float32),
    }
