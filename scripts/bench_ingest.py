"""Host ingest throughput: sampling-mode overhead (uniform vs emotion_peak).

The reference's realtime table (MER-UniBench/README.md:319-324) shows
emotion_peak sampling costing 4-8x over uniform (~2-4 min vs ~30 s for
411 clips): its decord path re-seeks scattered AU-peak indices and loads
au_info per clip inside the hot loop. On this stack sampling modes only
change the integer index schedule fed to the decoder (ops/sampling.py);
this bench measures whether emotion_peak decodes at uniform speed
through each backend tier.

Host-only (run with JAX_PLATFORMS=cpu PYTHONPATH=/root/repo — no TPU).

  python scripts/bench_ingest.py [--clips 411] [--frames 8]

Outputs one JSON line per (backend, sampling) cell plus the verdict line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REFERENCE_MP4 = "/root/reference/AffectGPT/demo/sample_00000000.mp4"


def synth_au_info(vlen: int) -> dict:
    """AU-peak record in the mer_factory_output JSON shape the sampler
    consumes (peak 2/3 into the clip, 2 neighbours each side)."""
    peak = max(2 * vlen // 3, 0)
    return {
        "total_frames": vlen,
        "peak_frames": [{
            "peak_index": peak,
            "frames_before_peak": peak,
            "frames_after_peak": max(vlen - 1 - peak, 0),
        }],
    }


def bench_cell(reader, path: str, sampling: str, clips: int, n_frms: int, vlen: int):
    au = synth_au_info(vlen) if sampling == "emotion_peak" else None
    # warm (file cache + backend init)
    frames = reader(path, n_frms, sampling, None, au)
    assert frames is not None and frames.shape[0] == n_frms
    t0 = time.perf_counter()
    for _ in range(clips):
        reader(path, n_frms, sampling, None, au)
    dt = time.perf_counter() - t0
    return clips / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=411)  # the reference table's unit
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--src", default=REFERENCE_MP4)
    args = ap.parse_args()

    from affectgpt_tpu.data import ingest, media

    vlen = sum(1 for _ in ingest.iter_video_frames(args.src))

    def ladder(path, n, sampling, rng, au):
        return media.read_video_frames(
            path, n_frms=n, sampling_name=sampling, au_info=au
        )

    # Three tiers, each pinned to ONE backend so the labels stay honest
    # when the read_video_frames ladder is reordered:
    #   avi_demux_cv2 — the production AVI rung (host demux + cv2.imdecode
    #                   of sampled indices; ladder's first rung on AVIs)
    #   native_mjpeg_avi — the in-tree scalar decoder (videodec.cpp),
    #                   forced via media._read_video_native
    #   cv2_mp4 — generic cv2.VideoCapture on the original mp4
    results = {}
    with tempfile.TemporaryDirectory() as tmp:
        avi = os.path.join(tmp, "clip.avi")
        ingest.transcode_video(args.src, avi)
        cells = (
            ("avi_demux_cv2", media._read_video_avi_cv2, avi),
            ("native_mjpeg_avi", media._read_video_native, avi),
            ("cv2_mp4", ladder, args.src),
        )
        for backend, reader, path in cells:
            for sampling in ("uniform", "emotion_peak"):
                cps = bench_cell(reader, path, sampling, args.clips, args.frames, vlen)
                results[f"{backend}/{sampling}"] = cps
                print(json.dumps({
                    "metric": f"ingest clips/s ({backend}, {sampling}, "
                              f"{args.frames} frms)",
                    "value": round(cps, 1),
                    "unit": "clips/s",
                }), flush=True)

    for tier in ("avi_demux_cv2", "native_mjpeg_avi"):
        ratio = results[f"{tier}/emotion_peak"] / results[f"{tier}/uniform"]
        print(json.dumps({
            "metric": f"emotion_peak/uniform ingest throughput ratio ({tier} tier)",
            "value": round(ratio, 3),
            "unit": "x",
            "reference_ratio": "0.125-0.25 (2-4 min vs 30 s, MER-UniBench/README.md:321-322)",
        }), flush=True)


if __name__ == "__main__":
    main()
