"""Native C++ video decoder (native/videodec.cpp): AVI demux + baseline
JPEG parity against PIL/cv2 encoders, raw-BGR streams, backend fallback."""

import io
import struct

import numpy as np
import pytest

from affectgpt_tpu.data import media

cv2 = pytest.importorskip("cv2")


def _build_avi(path, frame_payloads, width, height, compression):
    """Minimal RIFF/AVI writer: one video stream, one '00dc' chunk per
    frame payload (already-encoded JPEG bytes or raw BGR rows)."""
    def chunk(fourcc, body):
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(list_type, body):
        return chunk(b"LIST", list_type + body)

    avih = struct.pack("<14I", 40000, 0, 0, 0x10, len(frame_payloads), 0, 1, 0,
                       width, height, 0, 0, 0, 0)
    strh = (b"vids" + compression +
            struct.pack("<IHH8I", 0, 0, 0, 0, 1, 25, 0, len(frame_payloads),
                        0, 0xFFFFFFFF, 0) +
            struct.pack("<4H", 0, 0, width, height))
    strf = struct.pack("<IiiHH4I2i", 40, width, height, 1, 24,
                       0 if compression == b"\x00\x00\x00\x00" else
                       struct.unpack("<I", compression)[0],
                       width * height * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) +
               lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in frame_payloads))
    body = b"AVI " + hdrl + movi
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)


def _rgb_test_frames(n=6, h=40, w=56, seed=0):
    rng = np.random.RandomState(seed)
    frames = []
    for i in range(n):
        f = np.zeros((h, w, 3), np.uint8)
        f[:, :, 0] = 30 * i
        f[: h // 3, : w // 3] = (220, 40, 40)
        f[h // 2 :, w // 2 :] = rng.randint(0, 255, (h - h // 2, w - w // 2, 3))
        frames.append(f)
    return frames


def test_mjpeg_avi_via_cv2_writer(tmp_path):
    path = str(tmp_path / "clip.avi")
    frames = _rgb_test_frames()
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10,
                             (frames[0].shape[1], frames[0].shape[0]))
    for f in frames:
        writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    writer.release()

    out = media._read_video_native(path, 4, "uniform", None, None)
    assert out is not None and out.shape == (4, 40, 56, 3)
    # parity vs cv2's decode of the same lossy bytes. cv2 upsamples chroma
    # with a simpler filter than our libjpeg-style bilinear (we match PIL
    # to <0.3 — see test_pil_jpeg_subsampling_parity), hence the margin.
    ref = media._read_video_cv2(path, 4, "uniform", None, None)
    err = np.abs(out.astype(int) - ref.astype(int)).mean()
    assert err < 5.0, err

    # the public entry picks the MJPEG demux + cv2.imdecode fast rung for
    # this container (media.py ladder); its libjpeg-turbo decode differs
    # from the in-tree scalar decoder by JPEG-rounding LSBs only
    via_entry = media.read_video_frames(path, n_frms=4)
    fast = media._read_video_avi_cv2(path, 4, "uniform", None, None)
    np.testing.assert_array_equal(via_entry, fast)
    assert np.abs(via_entry.astype(int) - out.astype(int)).max() <= 3


@pytest.mark.parametrize("subsampling", [0, 1, 2])  # 4:4:4, 4:2:2, 4:2:0
def test_pil_jpeg_subsampling_parity(tmp_path, subsampling):
    from PIL import Image

    path = str(tmp_path / f"sub{subsampling}.avi")
    frames = _rgb_test_frames(n=3, h=33, w=47, seed=subsampling)  # odd dims
    payloads = []
    for f in frames:
        buf = io.BytesIO()
        Image.fromarray(f).save(buf, format="JPEG", quality=92,
                                subsampling=subsampling)
        payloads.append(buf.getvalue())
    _build_avi(path, payloads, 47, 33, b"MJPG")

    out = media._read_video_native(path, 3, "uniform", None, None)
    assert out is not None and out.shape == (3, 33, 47, 3)
    for row, f, payload in zip(out, frames, payloads):
        ref = np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
        err = np.abs(row.astype(int) - ref.astype(int)).mean()
        assert err < 1.0, err  # vs PIL's own decode of the same bytes


def test_restart_markers(tmp_path):
    from PIL import Image

    path = str(tmp_path / "rst.avi")
    f = _rgb_test_frames(n=1, h=48, w=64)[0]
    buf = io.BytesIO()
    Image.fromarray(f).save(buf, format="JPEG", quality=90, restart_marker_rows=1)
    _build_avi(path, [buf.getvalue()], 64, 48, b"MJPG")
    out = media._read_video_native(path, 1, "uniform", None, None)
    assert out is not None
    ref = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
    assert np.abs(out[0].astype(int) - ref.astype(int)).mean() < 3.0


def test_raw_bgr_avi_exact(tmp_path):
    path = str(tmp_path / "raw.avi")
    frames = _rgb_test_frames(n=4, h=30, w=31)  # odd width → row padding
    payloads = []
    row_bytes = (31 * 3 + 3) & ~3
    for f in frames:
        bgr = f[:, :, ::-1]
        rows = []
        for y in range(29, -1, -1):  # bottom-up
            row = bgr[y].tobytes()
            rows.append(row + b"\x00" * (row_bytes - len(row)))
        payloads.append(b"".join(rows))
    _build_avi(path, payloads, 31, 30, b"\x00\x00\x00\x00")
    out = media._read_video_native(path, 4, "uniform", None, None)
    assert out is not None
    for row, f in zip(out, frames):
        np.testing.assert_array_equal(row, f)


def test_unsupported_falls_through(tmp_path):
    bad = tmp_path / "notavideo.avi"
    bad.write_bytes(b"RIFF\x10\x00\x00\x00AVI garbage")
    assert media._read_video_native(str(bad), 2, "uniform", None, None) is None

    # full fallback chain still lands on the npy dump
    dump = tmp_path / "clip.mp4"
    dump.write_bytes(b"\x00" * 64)
    frames = np.stack(_rgb_test_frames(n=5))
    np.save(str(dump) + ".frames.npy", frames)
    out = media.read_video_frames(str(dump), n_frms=2)
    assert out.shape[0] == 2


def test_cv2_backend(tmp_path):
    path = str(tmp_path / "cv2clip.avi")
    frames = _rgb_test_frames()
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (56, 40))
    for f in frames:
        writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    writer.release()
    out = media._read_video_cv2(path, 4, "uniform", None, None)
    assert out is not None and out.shape == (4, 40, 56, 3)
    native = media._read_video_native(path, 4, "uniform", None, None)
    assert np.abs(out.astype(int) - native.astype(int)).mean() < 5.0
