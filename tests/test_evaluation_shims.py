"""The two evaluation entry variants run through EXPLICIT interfaces
(judge= parameter, ew_metric.set_reason_normalizer) instead of module
attribute surgery: score-only reuses cached judge artifacts, and the
Emotion-LLaMA variant strips third-party answer decorations before
judging."""

import runpy
import sys

import numpy as np
import pytest

from affectgpt_tpu import paths
from affectgpt_tpu.evaluation import ew_metric
from tests.synth_corpus import NAMES, build_corpus


@pytest.fixture()
def results_dir(tmp_path):
    overrides, _ = build_corpus(tmp_path)
    saved = {k: dict(getattr(paths, k)) for k in overrides}
    paths.update_from_dict(overrides)
    res = tmp_path / "results" / "result-mer2023"
    res.mkdir(parents=True)
    np.savez_compressed(
        res / "0.npz",
        name2reason={n: "Answer: happy joyful ###extra" for n in NAMES},
    )
    yield tmp_path / "results"
    ew_metric.set_reason_normalizer(None)
    for k, v in saved.items():
        getattr(paths, k).clear()
        getattr(paths, k).update(v)


def test_emotion_llama_then_scoreonly(results_dir, monkeypatch):
    res = results_dir / "result-mer2023"
    monkeypatch.setattr(
        sys, "argv",
        ["evaluation_emotion_llama.py", "--input-dir", str(results_dir), "--no-llm"],
    )
    runpy.run_path("/root/repo/evaluation_emotion_llama.py", run_name="__main__")
    ew_metric.set_reason_normalizer(None)
    data = np.load(res / "0-openset.npz", allow_pickle=True)
    opensets = dict(zip(data["filenames"].tolist(), data["fileitems"].tolist()))
    # the normalizer stripped "Answer:" and the ###-suffix before judging
    for v in opensets.values():
        assert "Answer" not in v and "extra" not in v
        assert "happy" in v

    # score-only now reuses the cached artifacts without any judge
    monkeypatch.setattr(
        sys, "argv", ["evaluation_scoreonly.py", "--input-dir", str(results_dir)],
    )
    runpy.run_path("/root/repo/evaluation_scoreonly.py", run_name="__main__")


def test_scoreonly_raises_without_cache(results_dir, monkeypatch):
    monkeypatch.setattr(
        sys, "argv", ["evaluation_scoreonly.py", "--input-dir", str(results_dir)],
    )
    with pytest.raises(RuntimeError, match="judge cache missing"):
        runpy.run_path("/root/repo/evaluation_scoreonly.py", run_name="__main__")
