"""Device-side JPEG decode split (ops/jpeg.py + videodec_read_coeffs):
parity against the host C++ pixel path on the same MJPEG bytes."""

import io

import numpy as np
import pytest

from affectgpt_tpu.data import media
from test_videodec_native import _build_avi, _rgb_test_frames


def _device_vs_host(path, n):
    host = media._read_video_native(path, n, "uniform", None, None)
    dev = media.read_video_frames_device(path, n_frms=n)
    assert host is not None and dev is not None
    dev = np.asarray(dev)
    assert dev.shape == host.shape and dev.dtype == np.uint8
    diff = np.abs(dev.astype(int) - host.astype(int))
    # float rounding order differs between the batched-matmul iDCT and the
    # scalar host loop — ±1 LSB on a small fraction of pixels is expected
    # (±2 when a plane .5-boundary flip amplifies through the color matrix)
    assert diff.max() <= 2, diff.max()
    assert (diff == 0).mean() > 0.98, (diff == 0).mean()
    return dev


@pytest.mark.parametrize("subsampling", [0, 1, 2])  # 4:4:4, 4:2:2, 4:2:0
def test_device_decode_matches_host(tmp_path, subsampling):
    from PIL import Image

    path = str(tmp_path / f"sub{subsampling}.avi")
    frames = _rgb_test_frames(n=4, h=33, w=47, seed=subsampling)  # odd dims
    payloads = []
    for f in frames:
        buf = io.BytesIO()
        Image.fromarray(f).save(buf, format="JPEG", quality=92,
                                subsampling=subsampling)
        payloads.append(buf.getvalue())
    _build_avi(path, payloads, 47, 33, b"MJPG")
    _device_vs_host(path, 4)


def test_device_decode_cv2_writer(tmp_path):
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path / "clip.avi")
    frames = _rgb_test_frames(n=6, h=40, w=56)
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (56, 40))
    for f in frames:
        writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    writer.release()
    dev = _device_vs_host(path, 4)
    # and it really decoded the content, not padding
    ref = media._read_video_cv2(path, 4, "uniform", None, None)
    assert np.abs(dev.astype(int) - ref.astype(int)).mean() < 5.0


def test_device_decode_grayscale(tmp_path):
    from PIL import Image

    path = str(tmp_path / "gray.avi")
    f = _rgb_test_frames(n=1, h=32, w=48)[0]
    buf = io.BytesIO()
    Image.fromarray(f).convert("L").save(buf, format="JPEG", quality=92)
    _build_avi(path, [buf.getvalue()], 48, 32, b"MJPG")
    _device_vs_host(path, 1)


def test_raw_avi_returns_none(tmp_path):
    """The coeff split is JPEG-only: raw-BGR AVIs fall back to the host."""
    path = str(tmp_path / "raw.avi")
    f = _rgb_test_frames(n=1, h=16, w=16)[0]
    row_bytes = (16 * 3 + 3) & ~3
    rows = []
    bgr = f[:, :, ::-1]
    for y in range(15, -1, -1):
        rows.append(bgr[y].tobytes() + b"\x00" * (row_bytes - 48))
    _build_avi(path, [b"".join(rows)], 16, 16, b"\x00\x00\x00\x00")
    assert media.read_video_frames_device(path) is None
    assert media._read_video_native(path, 1, "uniform", None, None) is not None


def test_mixed_quality_stream_falls_back(tmp_path):
    """Per-frame DQT variation: the coeff split must refuse (the device
    path would dequantize with frame 0's tables) and the host path still
    decodes each frame with its own tables."""
    from PIL import Image

    f = _rgb_test_frames(n=1, h=32, w=48)[0]
    payloads = []
    for q in (92, 50):  # different quality → different DQT
        buf = io.BytesIO()
        Image.fromarray(f).save(buf, format="JPEG", quality=q, subsampling=2)
        payloads.append(buf.getvalue())
    path = str(tmp_path / "mixedq.avi")
    _build_avi(path, payloads, 48, 32, b"MJPG")
    assert media.read_video_frames_device(path, n_frms=2) is None
    assert media._read_video_native(path, 2, "uniform", None, None) is not None


def test_mixed_geometry_stream_falls_back(tmp_path):
    """A frame with different dimensions must be rejected BEFORE any
    coefficients are written (the caller sized the buffer from frame 0)."""
    from PIL import Image

    buf_small = io.BytesIO()
    Image.fromarray(_rgb_test_frames(n=1, h=32, w=48)[0]).save(
        buf_small, format="JPEG", quality=92, subsampling=2)
    big = np.tile(_rgb_test_frames(n=1, h=32, w=48)[0], (4, 4, 1))  # 128x192
    buf_big = io.BytesIO()
    Image.fromarray(big).save(buf_big, format="JPEG", quality=92, subsampling=2)
    path = str(tmp_path / "mixedg.avi")
    _build_avi(path, [buf_small.getvalue(), buf_big.getvalue()], 48, 32, b"MJPG")
    assert media.read_video_frames_device(path, n_frms=2) is None


def test_corrupted_payload_fuzz(tmp_path):
    """Bit-flipped / truncated MJPEG payloads through BOTH the pixel and
    the coefficient path: every case must return cleanly (frames or a
    fallback None), never crash — the coeff reader validates headers
    before writing into the caller's buffer."""
    from PIL import Image

    rng = np.random.RandomState(7)
    f = _rgb_test_frames(n=1, h=40, w=56, seed=3)[0]
    buf = io.BytesIO()
    Image.fromarray(f).save(buf, format="JPEG", quality=90, subsampling=2)
    good = bytearray(buf.getvalue())

    for case in range(40):
        payload = bytearray(good)
        if case % 3 == 0:  # truncate
            payload = payload[: rng.randint(2, len(payload))]
        elif case % 3 == 1:  # single-byte corruption
            payload[rng.randint(0, len(payload))] = rng.randint(0, 256)
        else:  # corrupt a run in the entropy segment
            start = rng.randint(len(payload) // 2, len(payload) - 8)
            for j in range(start, min(start + 8, len(payload))):
                payload[j] = rng.randint(0, 256)
        path = str(tmp_path / f"fuzz{case}.avi")
        _build_avi(path, [bytes(payload)], 56, 40, b"MJPG")
        host = media._read_video_native(path, 1, "uniform", None, None)
        dev = media.read_video_frames_device(path, n_frms=1)
        assert host is None or host.shape == (1, 40, 56, 3)
        assert dev is None or np.asarray(dev).shape == (1, 40, 56, 3)
