"""Judge tests: prompt parity strings, postprocess cleanup, lexicon
fallback, and end-to-end extraction caching."""

import numpy as np
import pytest

from affectgpt_tpu.evaluation import ew_metric
from affectgpt_tpu.evaluation.judge import (
    LexiconJudge,
    postprocess_response,
    prompt_openset_to_sentiment,
    prompt_reason_to_openset,
)


class TestPrompts:
    def test_openset_prompt_contains_fewshot(self):
        p = prompt_reason_to_openset("He smiles warmly.")
        assert "Output: [happy, sad, angry]" in p
        assert p.endswith("Input: He smiles warmly.; Output: ")

    def test_sentiment_prompt(self):
        p = prompt_openset_to_sentiment("[joyful]")
        assert "[positive, negative, neutral]" in p


class TestPostprocess:
    def test_strips_prefixes(self):
        assert postprocess_response("Output: [happy]") == "[happy]"
        assert postprocess_response("  output: x\n") == "x"
        assert postprocess_response("[sad, angry]") == "[sad, angry]"


class TestLexiconJudge:
    def test_extraction(self):
        judge = LexiconJudge(vocabulary=["happy", "sad", "very happy"])
        out = judge.reason_to_openset(
            ["He is very happy today.", "Nothing emotional here.", "sad and Happy"]
        )
        assert out[0] == "[very happy, happy]"
        assert out[1] == "[]"
        assert set(out[2][1:-1].split(", ")) == {"sad", "happy"}

    def test_sentiment(self):
        judge = LexiconJudge(vocabulary=[])
        assert judge.openset_to_sentiment(["[joyful, happy]"])[0] == "positive"
        assert judge.openset_to_sentiment(["[sad]"])[0] == "negative"
        assert judge.openset_to_sentiment(["[]"])[0] == "neutral"


class TestEwMetric:
    def test_extract_openset_cached(self, tmp_path):
        npz = tmp_path / "3.npz"
        np.savez_compressed(
            npz, name2reason={"a": "He looks happy.", "b": "She seems sad."}
        )
        judge = LexiconJudge(vocabulary=["happy", "sad"])
        out = ew_metric.extract_openset(str(npz), judge)
        assert out == {"a": "[happy]", "b": "[sad]"}
        # second call must hit the cache (judge not needed)
        out2 = ew_metric.extract_openset(str(npz), judge=None)
        assert out2 == out

    def test_score_dimension(self, tmp_path):
        npz = tmp_path / "1.npz"
        np.savez_compressed(
            npz,
            name2reason={
                "a": "clearly happy person", "b": "a very sad scene", "c": "neutral",
            },
        )
        judge = LexiconJudge(vocabulary=["happy", "sad"])
        name2gt = {"a": 0.8, "b": -0.5, "c": 0.0}
        f1, acc = ew_metric.score_dimension(str(npz), name2gt, judge)
        assert f1 == pytest.approx(1.0)
        assert acc == pytest.approx(1.0)
