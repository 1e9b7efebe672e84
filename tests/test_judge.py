"""Judge tests: prompt parity strings, postprocess cleanup, lexicon
fallback, and end-to-end extraction caching."""

import numpy as np
import pytest

from affectgpt_tpu.evaluation import ew_metric
from affectgpt_tpu.evaluation.judge import (
    LexiconJudge,
    postprocess_response,
    prompt_openset_to_sentiment,
    prompt_reason_merge,
    prompt_reason_to_onehot,
    prompt_reason_to_openset,
    prompt_reason_to_rank,
)


class TestPrompts:
    def test_openset_prompt_contains_fewshot(self):
        p = prompt_reason_to_openset("He smiles warmly.")
        assert "Output: [happy, sad, angry]" in p
        assert p.endswith("Input: He smiles warmly.; Output: ")

    def test_sentiment_prompt(self):
        p = prompt_openset_to_sentiment("[joyful]")
        assert "[positive, negative, neutral]" in p

    def test_reason_merge_prompt(self):
        p = prompt_reason_merge("He smiles.", "I am fine.")
        assert "Clue: He smiles." in p and "Subtitle: I am fine." in p
        # subtitle-only variant drops the clue wording entirely
        p2 = prompt_reason_merge("", "I am fine.")
        assert "Clue" not in p2 and "Subtitle: I am fine." in p2
        with pytest.raises(ValueError):
            prompt_reason_merge("clue", "")

    def test_rank_and_onehot_prompts(self):
        p = prompt_reason_to_rank("He cries.")
        assert "rank them in order of likelihood" in p
        assert "[happy, angry, worried, sad, surprise, neutral]" in p
        p2 = prompt_reason_to_onehot("He cries.", candidates="happy, sad")
        assert "[happy, sad]" in p2
        assert "Output: neutral" in p2  # few-shot examples retained


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

    def test_reason_merge(self):
        judge = LexiconJudge(vocabulary=[])
        out = judge.reason_merge(["He frowns.", ""], ["I quit.", "Hello."])
        assert out[0] == "He frowns. The subtitle says: I quit."
        assert out[1] == "The subtitle says: Hello."

    def test_rank(self):
        judge = LexiconJudge(vocabulary=[])
        out = judge.reason_to_rank(["She looks sad and worried."])[0]
        ranked = out.split(", ")
        assert set(ranked[:2]) == {"sad", "worried"}
        assert sorted(ranked) == sorted(
            ["happy", "angry", "worried", "sad", "surprise", "neutral"]
        )

    def test_onehot(self):
        judge = LexiconJudge(vocabulary=[])
        assert judge.reason_to_onehot(["clearly angry tone"])[0] == "angry"
        assert judge.reason_to_onehot(["nothing to see"])[0] == "neutral"
        assert judge.reason_to_onehot(["joyful"], candidates="joyful, sad")[0] == "joyful"


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


def test_lexicon_nonword_edge_candidates():
    """Candidates with non-word edge chars must still match (\\b fails on
    them; the matcher uses lookarounds)."""
    judge = LexiconJudge(vocabulary=["happy (very)", "sad"])
    out = judge.reason_to_openset(["he is happy (very) today"])
    assert out == ["[happy (very)]"]
    one = judge.reason_to_onehot(["she is happy (very)"], candidates="happy (very), sad")
    assert one == ["happy (very)"]
