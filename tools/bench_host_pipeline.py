"""Host input-pipeline serving-rate benchmark (VERDICT r4 item 7).

Every committed fps number is a device-only measurement over synthetic
resident batches (bench.py). The real serving path pays, per frame:
5 x (JPEG decode of a 1920x1080 camera image -> affine crop-warp to
960x512 -> ImageNet normalize) on the host, then one host->device
transfer — the same work the reference pays per item in
JointsDataset.__getitem__ (/root/reference/lib/dataset/
JointsDataset.py:85-222, cv2 + torchvision Normalize). This tool
measures whether the host can FEED the device headline (~10.4 fps/chip
=> ~52 view-images/s) and writes a JSON summary for PERF.md.

No Panoptic data ships in this environment, so the bench synthesizes
realistic 1920x1080 JPEGs (quality 90, natural-image-ish low-frequency
content so decode cost is representative) and uses the production code
paths: data.datasets._load_image / _load_and_warp_image, the native
ctypes warp runtime when available, and jax.device_put for placement.

Run: PYTHONPATH=/root/repo:/root/.axon_site python \
    tools/bench_host_pipeline.py [--frames 40] [--threads 1 2 4 8]
"""

import argparse
import concurrent.futures as cf
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import numpy as np

V = 5
RAW_WH = (1920, 1080)
NET_WH = (960, 512)


def make_images(tmpdir):
    """Five synthetic camera JPEGs with natural-ish spectra."""
    import cv2

    rng = np.random.RandomState(0)
    paths = []
    for v in range(V):
        small = rng.randint(0, 255, (68, 120, 3), dtype=np.uint8)
        img = cv2.resize(small, RAW_WH, interpolation=cv2.INTER_CUBIC)
        noise = rng.randint(0, 30, img.shape, dtype=np.uint8)
        img = cv2.add(img, noise)
        p = os.path.join(tmpdir, f"cam{v}.jpg")
        cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 90])
        paths.append(p)
    sizes = [os.path.getsize(p) for p in paths]
    print(f"images: {RAW_WH[0]}x{RAW_WH[1]} jpeg, "
          f"{min(sizes)//1024}-{max(sizes)//1024} KB", flush=True)
    return paths


def center_affine():
    """The production center-crop affine (build_view_data's per-view
    2x3), recomputed here for the synthetic camera: scale the 1920x1080
    image onto the 960x512 network canvas about the image center."""
    from mvgformer_tpu.geometry.transforms import (get_affine_transform,
                                                   get_scale)

    c = np.array([RAW_WH[0] / 2.0, RAW_WH[1] / 2.0], dtype=np.float32)
    s = get_scale(RAW_WH, NET_WH)
    return np.asarray(get_affine_transform(c, s, np.asarray(NET_WH)),
                      dtype=np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--threads", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--out", default=None,
                    help="append the JSON summary to this file")
    args = ap.parse_args()

    import tempfile

    from mvgformer_tpu import runtime as native_runtime
    from mvgformer_tpu.data.datasets import (_load_and_warp_image,
                                             _load_image)

    tmpdir = tempfile.mkdtemp(prefix="hostbench_")
    paths = make_images(tmpdir)
    aff = np.stack([center_affine() for _ in range(V)])

    # --- stage timings (single thread)
    t0 = time.perf_counter()
    for _ in range(10):
        raw = [_load_image(p) for p in paths]
    t_decode = (time.perf_counter() - t0) / 10
    raw = np.stack(raw)

    native = native_runtime.native_available()
    t0 = time.perf_counter()
    for _ in range(10):
        if native:
            views = native_runtime.warp_normalize_views(raw, aff, NET_WH)
        else:
            views = np.stack([_load_and_warp_image(paths[v], aff[v],
                                                   NET_WH)
                              for v in range(V)])
    t_warp = (time.perf_counter() - t0) / 10

    import jax

    dev_views = None
    t0 = time.perf_counter()
    for _ in range(10):
        dev_views = jax.device_put(views[None])
        dev_views.block_until_ready()
    t_put = (time.perf_counter() - t0) / 10

    print(f"stage decode 5 views: {t_decode*1e3:8.1f} ms", flush=True)
    print(f"stage warp+norm ({'native' if native else 'cv2'}): "
          f"{t_warp*1e3:8.1f} ms", flush=True)
    print(f"stage device_put:    {t_put*1e3:8.1f} ms", flush=True)

    def one_frame(_):
        raw = np.stack([_load_image(p) for p in paths])
        if native:
            v = native_runtime.warp_normalize_views(raw, aff, NET_WH)
        else:
            v = np.stack([_load_and_warp_image(paths[i], aff[i], NET_WH)
                          for i in range(V)])
        d = jax.device_put(v[None])
        d.block_until_ready()
        return d.shape

    rows = {}
    for nt in args.threads:
        # warm
        one_frame(0)
        t0 = time.perf_counter()
        if nt == 1:
            for i in range(args.frames):
                one_frame(i)
        else:
            with cf.ThreadPoolExecutor(nt) as ex:
                list(ex.map(one_frame, range(args.frames)))
        dt = time.perf_counter() - t0
        fps = args.frames / dt
        rows[nt] = round(fps, 2)
        print(f"end-to-end host pipeline, {nt} thread(s): "
              f"{fps:6.2f} frames/s", flush=True)

    summary = {"bench": "host_input_pipeline",
               "raw_wh": list(RAW_WH), "net_wh": list(NET_WH),
               "views": V, "native_warp": bool(native),
               "stage_ms": {"decode5": round(t_decode * 1e3, 1),
                            "warp5": round(t_warp * 1e3, 1),
                            "device_put": round(t_put * 1e3, 1)},
               "frames_per_s_by_threads": rows}
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
