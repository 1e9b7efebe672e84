"""Per-sample data-load latency by modality stage (host side).

Counterpart to the reference's per-stage load-latency table
(MER-UniBench/README.md:309-313): frame ~0.5 ms (preextracted), face
2-3 ms (realtime), audio 5-10 ms (realtime), AU 2-3 ms (realtime CLIP
text). Here each stage is the HOST data path this framework's datasets
actually run per sample (pixel/feature work happens on device and is
covered by the realtime/e2e benches):

  frame  — np.load of a preextracted [8, d] feature .npy
  face   — read_face_crops from an OpenFace [vlen, 112, 112, 3] crop .npy
  audio  — native WAV demux (native/wavio.cpp) of a 16 kHz mono clip
  au     — mer_factory_output {name}_au_analysis.json load + AU text build

Host-only: run with JAX_PLATFORMS=cpu PYTHONPATH=/root/repo.

  python scripts/bench_stage_latency.py [--samples 400]
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

REFERENCE_MS = {"frame": "0.5", "face": "2-3", "audio": "5-10", "au": "2-3"}


def time_stage(fn, samples: int) -> float:
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(samples):
        fn()
    return (time.perf_counter() - t0) / samples * 1e3  # ms/sample


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=400)
    args = ap.parse_args()

    from affectgpt_tpu.data import media

    rng = np.random.RandomState(0)
    with tempfile.TemporaryDirectory() as tmp:
        # frame: preextracted features (the reference caches [n_frms, d])
        frame_npy = os.path.join(tmp, "frame.npy")
        np.save(frame_npy, rng.randn(8, 1024).astype(np.float32))

        # face: OpenFace crop sequence, a typical ~3 s clip at 25 fps
        face_npy = os.path.join(tmp, "face.npy")
        np.save(face_npy, rng.randint(0, 255, (75, 112, 112, 3), dtype=np.uint8))

        # audio: 4 s of 16 kHz mono PCM through the native WAV demuxer
        wav_path = os.path.join(tmp, "clip.wav")
        try:
            import wave

            with wave.open(wav_path, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes(
                    (rng.randn(64000) * 3000).astype(np.int16).tobytes()
                )
        except Exception as exc:  # pragma: no cover
            raise SystemExit(f"wav fixture failed: {exc}")

        # au: mer_factory_output AU-analysis JSON (the emotion_peak wiring)
        au_dir = os.path.join(tmp, "sample_0")
        os.makedirs(au_dir)
        au_json = os.path.join(au_dir, "sample_0_au_analysis.json")
        with open(au_json, "w") as handle:
            json.dump({
                "au_info": {
                    "total_frames": 75,
                    "peak_frames": [{"peak_index": 50,
                                     "frames_before_peak": 50,
                                     "frames_after_peak": 24}],
                    "aus": {"AU06": 0.8, "AU12": 0.9, "AU04": 0.1},
                }
            }, handle)

        stages = {
            "frame": lambda: np.load(frame_npy),
            "face": lambda: media.read_face_crops(face_npy, n_frms=8),
            "audio": lambda: media.read_wav(wav_path),
            "au": lambda: json.load(open(au_json)).get("au_info"),
        }
        for name, fn in stages.items():
            ms = time_stage(fn, args.samples)
            print(json.dumps({
                "metric": f"per-sample host load latency: {name}",
                "value": round(ms, 3),
                "unit": "ms",
                "reference_ms": REFERENCE_MS[name],
            }), flush=True)


if __name__ == "__main__":
    main()
