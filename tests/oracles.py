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
    _initialized = True


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
