"""Judge A/B harness: agreement report between two label-extraction
judges over a captured description set (scripts/judge_ab.py)."""

import json
import os
import subprocess

import pytest

from affectgpt_tpu.evaluation.judge import LexiconJudge
from scripts.judge_ab import compare_judges

REASONS = {
    "clip1": "The person smiles broadly and sounds happy and excited.",
    "clip2": "He looks sad, almost crying; the tone is gloomy.",
    "clip3": "She is angry, shouting with a furious expression.",
    "clip4": "A calm, neutral delivery without strong emotion.",
    "clip5": "Nervous laughter suggests she is worried and anxious.",
}


class TestCompareJudges:
    def test_self_agreement_is_perfect(self):
        judge = LexiconJudge()
        report = compare_judges(REASONS, judge, judge)
        assert report["openset_jaccard_mean"] == 1.0
        assert report["openset_exact_match_rate"] == 1.0
        assert report["sentiment_match_rate"] == 1.0
        assert report["samples"] == len(REASONS)

    def test_biased_judge_detected(self):
        # a judge with a truncated vocabulary extracts fewer labels —
        # the report must show the divergence, not hide it
        full = LexiconJudge()
        biased = LexiconJudge(vocabulary=["happy", "sad"])
        report = compare_judges(REASONS, full, biased)
        assert report["openset_jaccard_mean"] < 1.0
        assert report["labels_per_sample_b"] < report["labels_per_sample_a"]

    def test_wheel_mapping_merges_synonyms(self):
        # wheel-mapped comparison: "joyful" vs "happy" count as agreement
        class JoyJudge(LexiconJudge):
            def reason_to_openset(self, reasons):
                return ["['joyful']" for _ in reasons]

        class HappyJudge(LexiconJudge):
            def reason_to_openset(self, reasons):
                return ["['happy']" for _ in reasons]

        from affectgpt_tpu import paths
        from affectgpt_tpu.evaluation.wheel import WheelMetrics

        if not os.path.isdir(paths.EMOTION_WHEEL_ROOT):
            pytest.skip("no wheel assets")
        wheel = WheelMetrics(paths.EMOTION_WHEEL_ROOT)
        raw = compare_judges(REASONS, JoyJudge(), HappyJudge())
        mapped = compare_judges(REASONS, JoyJudge(), HappyJudge(), wheel)
        assert raw["openset_jaccard_mean"] == 0.0
        assert mapped["openset_jaccard_mean"] == 1.0


def test_cli_end_to_end(tmp_path):
    """The CLI runs the full A/B (random-weight tiny LLMJudge vs lexicon)
    and prints one JSON report line."""
    captured = tmp_path / "reasons.json"
    captured.write_text(json.dumps(REASONS))
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        ["python", "scripts/judge_ab.py", "--json", str(captured),
         "--max_new_tokens", "16"],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["samples"] == len(REASONS)
    assert 0.0 <= report["openset_jaccard_mean"] <= 1.0
