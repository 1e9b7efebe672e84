"""Full-entry integration: train.py main → runner → checkpoints on a
synthetic corpus with a tiny model, then inference_hybird-style batch
answers from the trained checkpoint."""

import os
import sys

import numpy as np
import pytest
import yaml

from affectgpt_tpu import paths
from tests.synth_corpus import NAMES, build_corpus


@pytest.fixture()
def corpus(tmp_path):
    overrides, feat_root = build_corpus(tmp_path)
    saved = {k: dict(getattr(paths, k)) for k in overrides}
    paths.update_from_dict(overrides)
    yield feat_root
    for k, v in saved.items():
        getattr(paths, k).clear()
        getattr(paths, k).update(v)


def make_cfg(tmp_path, feat_root):
    cfg = {
        "model": {
            "llama_model": "tiny",
            "skip_encoders": True,
            "preextracted_visual_dim": 12,
            "preextracted_acoustic_dim": 16,
            "multi_fusion_type": "attention",
            "video_fusion_type": "attention",
            "audio_fusion_type": "attention",
            "num_video_query_token": 2,
            "num_audio_query_token": 2,
            "num_multi_query_token": 1,
            "num_image_query_token": 2,
            "lora_r": 2,
            "max_length": 640,
        },
        "datasets": {
            "mercaptionplus": {
                "face_or_frame": "multiface_audio_face_text",
                "label_type": "hybird",
                "use_preextracted_face": True,
                "use_preextracted_audio": True,
                "preextracted_root": feat_root,
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
    cfg_path = tmp_path / "tiny_exp.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return str(cfg_path)


class TestTrainEntry:
    def test_train_main_produces_checkpoints(self, corpus, tmp_path, monkeypatch):
        cfg_path = make_cfg(tmp_path, corpus)
        monkeypatch.setattr(
            sys, "argv", ["train.py", "--cfg-path", cfg_path, "--options", "run.max_epoch=1"]
        )
        sys.path.insert(0, "/root/repo")
        import train as train_entry

        train_entry.main()

        out_root = tmp_path / "output" / "tiny_exp"
        ckpts = []
        for job in out_root.iterdir():
            ckpts += [p for p in job.iterdir() if p.name.startswith("checkpoint_")]
            assert (job / "log.txt").exists()
        # epoch-0 zero-shot ckpt + epoch-1 ckpt
        epochs = sorted(int(p.name.split("_")[1]) for p in ckpts)
        assert epochs == [0, 1]

    def test_validation_best_checkpoint(self, corpus, tmp_path, monkeypatch):
        cfg_path = make_cfg(tmp_path, corpus)
        monkeypatch.setattr(
            sys, "argv",
            ["train.py", "--cfg-path", cfg_path,
             "--options", "run.evaluate=true", "run.val_iters=1"],
        )
        sys.path.insert(0, "/root/repo")
        import train as train_entry

        train_entry.main()
        out_root = tmp_path / "output" / "tiny_exp"
        best = list(out_root.glob("*/best/checkpoint_*"))
        assert best, "expected a best-val checkpoint"

    def test_checkpoint_overlay_roundtrip(self, corpus, tmp_path):
        import jax

        from affectgpt_tpu.models import affectgpt
        from affectgpt_tpu.training import checkpoint

        cfg = affectgpt.AffectGPTConfig.tiny()
        trainable = affectgpt.init_trainable(jax.random.PRNGKey(0), cfg)
        path = checkpoint.save_checkpoint(str(tmp_path), 3, trainable, loss=1.25)
        assert "checkpoint_000003_loss_1.2500" in path

        other = affectgpt.init_trainable(jax.random.PRNGKey(9), cfg)
        merged = checkpoint.apply_checkpoint_overlays(other, path)
        np.testing.assert_array_equal(
            np.asarray(merged["mergers"]["audio"]["proj"]["w"]),
            np.asarray(trainable["mergers"]["audio"]["proj"]["w"]),
        )
        assert checkpoint.list_checkpoints(str(tmp_path))[0][0] == 3

    def test_legacy_modality_keyed_checkpoint_migrates(self, corpus, tmp_path):
        """A pre-round-3 checkpoint keyed mergers by MODALITY (frame/face);
        the live tree keys them by GROUP (video). Restoring it must load the
        frame weights into the shared video merger — not leave it at random
        init behind dead frame/face keys (ADVICE r3)."""
        import jax

        from affectgpt_tpu.models import affectgpt
        from affectgpt_tpu.training import checkpoint

        cfg = affectgpt.AffectGPTConfig.tiny()
        trainable = affectgpt.init_trainable(jax.random.PRNGKey(0), cfg)
        # forge a legacy payload: modality-keyed mergers, video absent
        legacy = jax.tree.map(lambda x: x, trainable)
        legacy["mergers"] = dict(legacy["mergers"])
        video = legacy["mergers"].pop("video")
        legacy["mergers"]["frame"] = video
        legacy["mergers"]["face"] = jax.tree.map(lambda x: x * 7.0, video)
        path = checkpoint.save_checkpoint(str(tmp_path), 0, legacy, loss=0.5)

        fresh = affectgpt.init_trainable(jax.random.PRNGKey(9), cfg)
        merged = checkpoint.apply_checkpoint_overlays(fresh, path)
        assert set(merged["mergers"]) == set(fresh["mergers"]), (
            "no dead frame/face keys may be inserted"
        )
        leaf = lambda t: np.asarray(jax.tree.leaves(t["mergers"]["video"])[0])
        np.testing.assert_array_equal(leaf(merged), leaf(trainable))
