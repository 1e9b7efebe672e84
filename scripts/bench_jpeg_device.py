"""Host-full vs device-split MJPEG decode throughput.

Builds a synthetic MJPEG AVI (PIL-encoded 4:2:0 frames), then times
(a) the host C++ pixel path (entropy + iDCT + upsample + color on CPU,
    media._read_video_native) and
(b) the device split (host entropy decode only; dequant + batched-matmul
    iDCT + upsample + color on the accelerator,
    media.read_video_frames_device → ops/jpeg.py).

Run: python scripts/bench_jpeg_device.py      (TPU)
     JAX_PLATFORMS=cpu PYTHONPATH=. python scripts/bench_jpeg_device.py
Env: JPEG_FRAMES (64), JPEG_W (448), JPEG_H (448), JPEG_REPEAT (5).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(os.environ.get("JPEG_FRAMES", 64))
W = int(os.environ.get("JPEG_W", 448))
H = int(os.environ.get("JPEG_H", 448))
REPEAT = int(os.environ.get("JPEG_REPEAT", 5))


def main():
    from affectgpt_tpu.data import ingest, media

    rng = np.random.RandomState(0)
    base = rng.randint(0, 255, (H, W, 3), np.uint8)
    frames = [np.roll(base, 7 * i, axis=1) for i in range(N)]
    path = "/tmp/bench_jpeg.avi"
    ingest.write_mjpeg_avi(path, frames, fps=25, quality=90)

    # warm both paths (device path compiles once per geometry)
    host = media._read_video_native(path, N, "uniform", None, None)
    dev = np.asarray(media.read_video_frames_device(path, n_frms=N))
    # ±2 = double rounding at a .5 boundary (plane ±1 amplified through
    # the color matrix); measured 99.9994%-exact on TPU at this geometry
    assert np.abs(dev.astype(int) - host.astype(int)).max() <= 2

    t0 = time.perf_counter()
    for _ in range(REPEAT):
        media._read_video_native(path, N, "uniform", None, None)
    host_dt = (time.perf_counter() - t0) / REPEAT

    t0 = time.perf_counter()
    for _ in range(REPEAT):
        np.asarray(media.read_video_frames_device(path, n_frms=N))  # fence
    dev_dt = (time.perf_counter() - t0) / REPEAT

    print(json.dumps({
        "metric": f"MJPEG decode frames/s ({W}x{H}, {N} frames)",
        "value": round(N / dev_dt, 1),
        "unit": "frames/s (device split)",
        "host_frames_per_s": round(N / host_dt, 1),
        "device_over_host": round(host_dt / dev_dt, 2),
    }))


if __name__ == "__main__":
    main()
