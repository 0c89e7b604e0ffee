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
                def __getattr__(self, name):
                    try:
                        return self[name]
                    except KeyError as e:
                        raise AttributeError(name) from e

                def __setattr__(self, name, value):
                    self[name] = value

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
