"""Image-caption training path end-to-end: MiniGPT4-style corpus (jpg +
captions.csv) → realtime visual encoding on device → LoRA SFT step
(reference minigpt4/cc_sbu stage-1 style training, datasets/ caption
branch)."""

import sys

import pytest
import yaml

from affectgpt_tpu import paths

PIL = pytest.importorskip("PIL")


@pytest.fixture()
def caption_corpus(tmp_path):
    import numpy as np
    import pandas as pd
    from PIL import Image

    root = tmp_path / "minigpt4"
    (root / "image").mkdir(parents=True)
    names = [f"img{i:03d}" for i in range(4)]
    rng = np.random.RandomState(0)
    for name in names:
        Image.fromarray(rng.randint(0, 255, (32, 40, 3), np.uint8)).save(
            root / "image" / f"{name}.jpg"
        )
    pd.DataFrame({
        "name": names,
        "caption": [f"a photo of thing {i}" for i in range(4)],
    }).to_csv(root / "captions.csv", index=False)

    saved = dict(paths.DATA_DIR)
    paths.update_from_dict({"DATA_DIR": {"MiniGPT4": str(root)}})
    yield names
    paths.DATA_DIR.clear()
    paths.DATA_DIR.update(saved)


def test_image_caption_training(caption_corpus, tmp_path, monkeypatch):
    cfg = {
        "model": {
            "llama_model": "tiny",
            # realtime encoders: tiny CLIP tower encodes the jpgs on device
            "num_video_query_token": 2,
            "num_audio_query_token": 2,
            "num_multi_query_token": 1,
            "num_image_query_token": 2,
            "lora_r": 2,
            "max_length": 640,
        },
        "datasets": {
            "minigpt4": {
                "face_or_frame": "image",
                "label_type": "caption",
                "max_length": 640,
                "ratio": 1.0,
            },
        },
        "run": {
            "max_epoch": 1,
            "iters_per_epoch": 2,
            "batch_size_train": 2,
            "init_lr": 1e-3,
            "min_lr": 1e-4,
            "warmup_steps": 0,
            "seed": 0,
            "log_freq": 1,
            "tp": 1,
            "output_dir": str(tmp_path / "output"),
        },
        "inference": {},
    }
    cfg_path = tmp_path / "caption_exp.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    monkeypatch.setattr(sys, "argv", ["train.py", "--cfg-path", str(cfg_path)])
    sys.path.insert(0, "/root/repo")
    import train as train_entry

    train_entry.main()

    out_root = tmp_path / "output" / "caption_exp"
    ckpts = [p for job in out_root.iterdir() for p in job.iterdir()
             if p.name.startswith("checkpoint_")]
    assert ckpts, "image-caption training produced no checkpoints"
