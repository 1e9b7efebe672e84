"""Full pipeline chain: train.py → checkpoint auto-discovery →
inference_hybird.py on the trained weights → evaluation scoring of its
npz output. Verifies every entry-point handoff (the reference's
train → inference_hybird → evaluation flow, SURVEY §3)."""

import sys

import numpy as np
import pytest
import yaml

from affectgpt_tpu import paths
from tests.synth_corpus import NAMES, build_corpus


@pytest.fixture()
def corpus(tmp_path, monkeypatch):
    import pandas as pd

    from tests.test_evaluation_wheel import write_xlsx

    overrides, feat_root = build_corpus(tmp_path)
    saved = {k: dict(getattr(paths, k)) for k in overrides}
    paths.update_from_dict(overrides)

    # tiny emotion-wheel assets for the evaluation stage
    wheel_dir = tmp_path / "wheels"
    wheel_dir.mkdir()
    rows = [["joy", "happy", "cheerful"], ["sadness", "sad", "gloomy"],
            ["neutral", "calm", "composed"]]
    for i in range(1, 6):
        write_xlsx(wheel_dir / f"wheel{i}.xlsx", ["level1", "level2", "level3"], rows)
    words = [w for row in rows for w in row]
    header = []
    for run in range(1, 9):
        header += [f"word_run{run}", f"synonym_run{run}"]
    write_xlsx(wheel_dir / "synonym.xlsx", header, [[w, "[]"] * 8 for w in words])
    pd.DataFrame({"name": words, "format": ["[]"] * len(words)}).to_csv(
        wheel_dir / "format.csv", index=False
    )
    monkeypatch.setattr(paths, "EMOTION_WHEEL_ROOT", str(wheel_dir))

    yield feat_root
    for k, v in saved.items():
        getattr(paths, k).clear()
        getattr(paths, k).update(v)


def test_train_then_infer_then_evaluate(corpus, tmp_path, monkeypatch):
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
                "preextracted_root": corpus,
                "max_length": 640,
                "ratio": 1.0,
            },
        },
        "run": {
            "max_epoch": 1, "iters_per_epoch": 2, "batch_size_train": 2,
            "init_lr": 1e-3, "min_lr": 1e-4, "warmup_steps": 0,
            "seed": 0, "log_freq": 1, "tp": 1,
            "output_dir": str(tmp_path / "output"),
        },
        "inference": {"face_or_frame": "frame_text"},
    }
    cfg_path = tmp_path / "chain_exp.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    sys.path.insert(0, "/root/repo")
    monkeypatch.chdir(tmp_path)

    # 1) train — writes checkpoints under output/chain_exp/<job>/
    monkeypatch.setattr(sys, "argv", ["train.py", "--cfg-path", str(cfg_path)])
    import train as train_entry

    train_entry.main()
    ckpts = list((tmp_path / "output" / "chain_exp").glob("*/checkpoint_*"))
    assert ckpts, "training produced no checkpoints"

    # 2) inference — must auto-discover the trained run dir and load the
    # last epoch's weights (not epoch tag '0')
    monkeypatch.setattr(
        sys, "argv",
        ["inference_hybird.py", "--cfg-path", str(cfg_path), "--dataset", "MER2023",
         "--batch_size", "2", "--max_new_tokens", "4"],
    )
    import inference_hybird as infer_entry

    infer_entry.main()
    result_dir = tmp_path / "output" / "results" / "chain_exp" / "result-mer2023"
    produced = sorted(result_dir.glob("*.npz"))
    assert produced, "inference produced no results"
    assert produced[-1].stem != "0", "expected a trained-epoch tag, got zero-shot"
    name2reason = np.load(produced[-1], allow_pickle=True)["name2reason"].tolist()
    assert set(name2reason) == set(NAMES)

    # 3) evaluation — scores the produced npz via the lexicon judge
    import evaluation as eval_entry

    results = eval_entry.main_zeroshot_scores(
        str(tmp_path / "output" / "results" / "chain_exp"), use_llm=False
    )
    assert "mer2023" in {k.lower().replace("result-", "") for k in results}
