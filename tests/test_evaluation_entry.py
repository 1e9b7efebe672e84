"""evaluation.py end-to-end: synthetic results dir + synthetic wheels +
lexicon judge → per-dataset best-epoch scores."""

import os
import sys

import numpy as np
import pytest

from affectgpt_tpu import paths
from tests.synth_corpus import NAMES, build_corpus
from tests.test_evaluation_wheel import write_xlsx


@pytest.fixture()
def full_env(tmp_path, monkeypatch):
    overrides, feat_root = build_corpus(tmp_path)
    saved = {k: dict(getattr(paths, k)) for k in overrides}
    paths.update_from_dict(overrides)

    # tiny wheel assets
    import pandas as pd

    wheel_dir = tmp_path / "wheels"
    wheel_dir.mkdir()
    for i in range(1, 6):
        write_xlsx(
            wheel_dir / f"wheel{i}.xlsx",
            ["level1", "level2", "level3"],
            [["joy", "happy", "cheerful"], ["sadness", "sad", "gloomy"],
             ["neutral", "calm", "composed"]],
        )
    words = ["joy", "happy", "cheerful", "sadness", "sad", "gloomy", "neutral", "calm", "composed"]
    header = []
    for run in range(1, 9):
        header += [f"word_run{run}", f"synonym_run{run}"]
    write_xlsx(
        wheel_dir / "synonym.xlsx", header,
        [[w, "[]"] * 8 for w in words],
    )
    pd.DataFrame({"name": words, "format": ["[]"] * len(words)}).to_csv(
        wheel_dir / "format.csv", index=False
    )
    saved_wheel = paths.EMOTION_WHEEL_ROOT
    monkeypatch.setattr(paths, "EMOTION_WHEEL_ROOT", str(wheel_dir))

    yield tmp_path
    for k, v in saved.items():
        getattr(paths, k).clear()
        getattr(paths, k).update(v)
    paths.EMOTION_WHEEL_ROOT = saved_wheel


def test_main_zeroshot_scores(full_env, tmp_path):
    sys.path.insert(0, "/root/repo")
    import evaluation as eval_entry

    # synthetic inference results for MER2023: epoch 1 is wrong, epoch 2 right
    result_root = tmp_path / "results"
    ds_dir = result_root / "result-mer2023"
    ds_dir.mkdir(parents=True)
    # gt is 'happy' for all three test clips (synth corpus)
    np.savez_compressed(
        ds_dir / "1.npz",
        name2reason={n: "The person seems sad and gloomy." for n in NAMES},
    )
    np.savez_compressed(
        ds_dir / "2.npz",
        name2reason={n: "The person is clearly happy and cheerful." for n in NAMES},
    )

    results = eval_entry.main_zeroshot_scores(str(result_root), use_llm=False)
    assert "MER2023" in results
    best_epoch, best_score = results["MER2023"]
    assert best_epoch == "2.npz"
    assert best_score > 0.9  # all clips map to the 'joy' cluster


def test_llm_judge_refused_without_weights(full_env, tmp_path, caplog):
    """use_llm=True with no pretrained weights mounted must NOT hand
    extraction to a random-weight LLM — build_judge falls back to the
    deterministic LexiconJudge loudly (VERDICT r3 item 4)."""
    import logging

    sys.path.insert(0, "/root/repo")
    import evaluation as eval_entry
    from affectgpt_tpu.evaluation.judge import LexiconJudge

    assert not os.path.isdir(paths.PATH_TO_LLM.get("Qwen25", ""))
    with caplog.at_level(logging.WARNING):
        judge = eval_entry.build_judge(use_llm=True)
    assert isinstance(judge, LexiconJudge)
    assert any("random-weight" in rec.message for rec in caplog.records)

    # and the end-to-end default path (use_llm defaults True) scores via
    # the lexicon judge instead of random-LLM output
    result_root = tmp_path / "results"
    ds_dir = result_root / "result-mer2023"
    ds_dir.mkdir(parents=True)
    np.savez_compressed(
        ds_dir / "1.npz",
        name2reason={n: "The person is clearly happy and cheerful." for n in NAMES},
    )
    results = eval_entry.main_zeroshot_scores(str(result_root), use_llm=True)
    assert results["MER2023"][1] > 0.9
