"""Native host runtime: C++ input-pipeline kernels with ctypes bindings.

The compute path is JAX/XLA; the host-side data plumbing around it is
native C++ where the reference's pipeline is performance-relevant
(per-view cv2 warp + normalize in the Python dataloader,
/root/reference/lib/dataset/JointsDataset.py:97-116). Build on first use
with g++; falls back to the cv2/numpy path when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from mvgformer_tpu.data.meta import IMAGE_MEAN, IMAGE_STD

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "_libmvgwarp.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    src = os.path.join(_HERE, "warp.cpp")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", src, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native warp library, or None."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.isfile(_LIB_PATH) and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.warp_normalize_batch.restype = ctypes.c_int
        lib.warp_normalize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return load_library() is not None


def warp_normalize_views(images: np.ndarray, affines: np.ndarray,
                         out_size, num_threads: int = 0) -> np.ndarray:
    """Warp + ImageNet-normalize a stack of views with the native kernel.

    images:  (V, H, W, 3) uint8 RGB (same size per view).
    affines: (V, 2, 3) forward source->destination affines.
    out_size: (W, H) destination size.
    Returns (V, dh, dw, 3) float32 normalized. Falls back to cv2 when the
    native library is unavailable.
    """
    lib = load_library()
    V, sh, sw, _ = images.shape
    dw, dh = int(out_size[0]), int(out_size[1])
    if lib is None:
        from mvgformer_tpu.data.datasets import _warp_normalize_cv2

        return np.stack([_warp_normalize_cv2(images[v], affines[v],
                                             (dw, dh)) for v in range(V)])
    images = np.ascontiguousarray(images, dtype=np.uint8)
    aff = np.ascontiguousarray(affines, dtype=np.float32)
    dst = np.empty((V, dh, dw, 3), dtype=np.float32)
    mean = np.ascontiguousarray(IMAGE_MEAN, dtype=np.float32)
    std = np.ascontiguousarray(IMAGE_STD, dtype=np.float32)
    if num_threads <= 0:
        num_threads = min(os.cpu_count() or 1, max(V, 1))
    ret = lib.warp_normalize_batch(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), V, sh, sw,
        aff.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dh, dw,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads)
    if ret != 0:
        raise RuntimeError(f"warp_normalize_batch failed: {ret}")
    return dst
