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

    def test_resume_continues_from_next_epoch(self, corpus, tmp_path, monkeypatch):
        """Crash/resume semantics: checkpoints store epoch = EPOCHS
        COMPLETED, so resuming checkpoint_000001 must train epoch 1 next
        (not skip it), and the orbax-restored opt_state must come back
        with its optax NamedTuple structure (MultiSteps + adam) so the
        compiled step accepts it."""
        cfg_path = make_cfg(tmp_path, corpus)
        sys.path.insert(0, "/root/repo")
        import train as train_entry

        # grad accumulation on → resume exercises MultiStepsState restore
        monkeypatch.setattr(
            sys, "argv",
            ["train.py", "--cfg-path", cfg_path,
             "--options", "run.max_epoch=1", "run.accum_grad_iters=2",
             "run.job_id=resume_job"],
        )
        train_entry.main()
        out = tmp_path / "output" / "tiny_exp" / "resume_job"
        ck1 = next(p for p in out.iterdir() if p.name.startswith("checkpoint_000001"))

        monkeypatch.setattr(
            sys, "argv",
            ["train.py", "--cfg-path", cfg_path,
             "--options", "run.max_epoch=2", "run.accum_grad_iters=2",
             f"run.resume_ckpt_path={ck1}", "run.job_id=resume_job2"],
        )
        train_entry.main()
        out2 = tmp_path / "output" / "tiny_exp" / "resume_job2"
        epochs = sorted(
            int(p.name.split("_")[1]) for p in out2.iterdir()
            if p.name.startswith("checkpoint_")
        )
        # resumed run trains exactly epoch 1 → saves checkpoint_000002
        # (and no zero-shot epoch-0 checkpoint, since start_epoch == 1)
        assert epochs == [2], epochs

    def test_rerun_same_output_dir_overwrites(self, corpus, tmp_path):
        # deterministic checkpoint names must not crash a re-run over the
        # same output_dir (orbax raises on existing paths without force)
        import jax

        from affectgpt_tpu.models import affectgpt
        from affectgpt_tpu.training import checkpoint

        cfg = affectgpt.AffectGPTConfig.tiny()
        trainable = affectgpt.init_trainable(jax.random.PRNGKey(0), cfg)
        p1 = checkpoint.save_checkpoint(str(tmp_path), 0, trainable)
        p2 = checkpoint.save_checkpoint(str(tmp_path), 0, trainable)
        assert p1 == p2

    def test_discover_root_ignores_checkpointless_dirs(self, tmp_path):
        from affectgpt_tpu.training import checkpoint

        (tmp_path / "tb").mkdir()
        (tmp_path / "logs").mkdir()
        assert checkpoint.discover_checkpoint_root(str(tmp_path)) is None

    def test_accum_schedule_at_iteration_resolution(self):
        """With accum_grad_iters=k the applied lr at update u must equal
        the iteration-resolution schedule at u·k (the reference steps its
        scheduler per iteration) — not schedule(u), which would stretch
        warmup/decay by k×."""
        import jax
        import jax.numpy as jnp
        import optax

        from affectgpt_tpu.training import optim

        # lr 1.0 for micro-steps 0..1, then 0: with k=2 the SECOND update
        # (inner count 1) must see schedule(2) == 0 → params frozen
        schedule = lambda s: jnp.where(s < 2, 1.0, 0.0)  # noqa: E731
        tx = optim.make_optimizer(schedule, weight_decay=0.0, accum_steps=2)
        params = {"w": jnp.ones(3)}
        state = tx.init(params)
        grads = {"w": jnp.ones(3)}
        snapshots = [params["w"]]
        for _ in range(4):  # 4 micro-steps = 2 real updates
            updates, state = tx.update(grads, state, params)
            params = optax.apply_updates(params, updates)
            snapshots.append(params["w"])
        # update 1 (after micro-step 2) moved params; update 2 (after
        # micro-step 4) saw lr 0 and left them unchanged
        assert not np.allclose(np.asarray(snapshots[2]), np.asarray(snapshots[0]))
        np.testing.assert_allclose(
            np.asarray(snapshots[4]), np.asarray(snapshots[2]), atol=1e-7
        )
        del jax

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

    def test_legacy_face_only_checkpoint_migrates(self, corpus, tmp_path):
        """A face-only legacy run (mergers has face, no frame) must migrate
        its trained face merger into the shared video slot — not drop its
        only trained merger and leave video at random init."""
        import jax

        from affectgpt_tpu.models import affectgpt
        from affectgpt_tpu.training import checkpoint

        cfg = affectgpt.AffectGPTConfig.tiny()
        trainable = affectgpt.init_trainable(jax.random.PRNGKey(0), cfg)
        legacy = jax.tree.map(lambda x: x, trainable)
        legacy["mergers"] = dict(legacy["mergers"])
        video = legacy["mergers"].pop("video")
        legacy["mergers"]["face"] = video  # face-only: frame absent
        path = checkpoint.save_checkpoint(str(tmp_path), 0, legacy, loss=0.5)

        fresh = affectgpt.init_trainable(jax.random.PRNGKey(9), cfg)
        merged = checkpoint.apply_checkpoint_overlays(fresh, path)
        assert set(merged["mergers"]) == set(fresh["mergers"])
        leaf = lambda t: np.asarray(jax.tree.leaves(t["mergers"]["video"])[0])
        np.testing.assert_array_equal(leaf(merged), leaf(trainable))
