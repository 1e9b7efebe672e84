"""Build a synthetic corpus + YAML config for scripts/quality_run.sh
--synthetic mode (CI staging of the quality-run sequence with random
weights). Prints the written cfg path on stdout."""

from __future__ import annotations

import pathlib
import sys

import yaml

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tests.synth_corpus import build_corpus  # noqa: E402


def main(workdir: str) -> None:
    work = pathlib.Path(workdir)
    work.mkdir(parents=True, exist_ok=True)
    overrides, feat_root = build_corpus(work)
    cfg = {
        "model": {
            "llama_model": "tiny",
            "skip_encoders": True,
            "preextracted_visual_dim": 12,
            "preextracted_acoustic_dim": 16,
            "num_video_query_token": 2,
            "num_audio_query_token": 2,
            "num_multi_query_token": 1,
            "lora_r": 2,
            "max_length": 640,
        },
        "datasets": {
            "mer2023": {
                "face_or_frame": "frame_text",
                "label_type": "onehot_wo_candidates",
                "use_preextracted_frame": True,
                "preextracted_root": feat_root,
                "max_length": 640,
            },
        },
        "run": {"output_dir": str(work / "output"), "seed": 0},
        "inference": {"face_or_frame": "frame_text"},
        "paths": overrides,
    }
    cfg_path = work / "quality_run.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    print(cfg_path)


if __name__ == "__main__":
    main(sys.argv[1])
