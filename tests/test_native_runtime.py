"""Native C++ warp+normalize kernel: build, correctness vs cv2."""

import numpy as np
import pytest

from mvgformer_tpu import runtime
from mvgformer_tpu.data.datasets import _warp_normalize_cv2
from mvgformer_tpu.data.meta import build_view_data
from mvgformer_tpu.data.synthetic import make_camera_ring, tile_cameras


@pytest.fixture(scope="module")
def lib():
    lib = runtime.load_library()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_matches_cv2(lib, rng):
    pytest.importorskip("cv2")
    V, sh, sw = 3, 120, 200
    images = rng.randint(0, 255, (V, sh, sw, 3)).astype(np.uint8)
    cams = tile_cameras(make_camera_ring(V, image_size=(sw, sh)), 1)
    vd = build_view_data(cams, np.tile([[sw, sh]], (1, V, 1)).astype(
        np.float32), (96, 64))
    aff = np.asarray(vd.affine)[0]

    ours = runtime.warp_normalize_views(images, aff, (96, 64))
    ref = np.stack([_warp_normalize_cv2(images[v], aff[v], (96, 64))
                    for v in range(V)])
    assert ours.shape == ref.shape == (V, 64, 96, 3)
    # cv2 uses fixed-point bilinear; allow small quantization differences
    np.testing.assert_allclose(ours, ref, atol=0.02)
    assert np.mean(np.abs(ours - ref)) < 0.005


def test_native_zero_border(lib):
    V = 1
    images = np.full((V, 50, 50, 3), 255, np.uint8)
    # affine pushing the source entirely out of frame -> border values
    aff = np.array([[[1.0, 0.0, 500.0], [0.0, 1.0, 500.0]]], np.float32)
    out = runtime.warp_normalize_views(images, aff, (32, 32))
    from mvgformer_tpu.data.meta import IMAGE_MEAN, IMAGE_STD

    expected = (0.0 - IMAGE_MEAN) / IMAGE_STD
    np.testing.assert_allclose(out[0, 0, 0], expected, atol=1e-5)
