"""API helper / annotation harness / zero-shot harness tests with stub
transports."""

import sys

import numpy as np
import pytest

from affectgpt_tpu.toolkit import api_helpers


class TestApiHelpers:
    def test_retry_then_success(self):
        calls = {"n": 0}

        def flaky(messages):
            calls["n"] += 1
            if calls["n"] < 3:
                raise RuntimeError("boom")
            return "ok"

        out = api_helpers.complete_with_retry(flaky, [], max_retries=5, backoff_s=0)
        assert out == "ok" and calls["n"] == 3

    def test_retry_exhausted_returns_none(self):
        def always_fail(messages):
            raise RuntimeError("nope")

        assert api_helpers.complete_with_retry(always_fail, [], max_retries=2, backoff_s=0) is None

    def test_annotate_dataset_resumable(self, tmp_path):
        import pandas as pd

        # fake frames (files only read for base64 packing)
        frame = tmp_path / "f.jpg"
        frame.write_bytes(b"\xff\xd8fake")
        csv = str(tmp_path / "ann.csv")

        def fake_complete(messages):
            return "[happy]"

        out = api_helpers.annotate_dataset(
            fake_complete, {"a": [str(frame)], "b": [str(frame)]}, csv
        )
        assert out == {"a": "[happy]", "b": "[happy]"}
        # resume: existing rows are not re-annotated
        def exploding(messages):
            raise AssertionError("should not be called")

        out2 = api_helpers.annotate_dataset(exploding, {"a": [str(frame)]}, csv)
        assert out2["a"] == "[happy]"
        assert len(pd.read_csv(csv)) == 2

    def test_translate_prompt(self):
        seen = {}

        def capture(messages):
            seen["prompt"] = messages[0]["content"]
            return "hello"

        assert api_helpers.translate_text(capture, "你好") == "hello"
        assert "Input: 你好" in seen["prompt"]


class TestZeroShotHarness:
    def test_run_zero_shot(self, tmp_path, monkeypatch):
        from affectgpt_tpu import paths
        from tests.synth_corpus import NAMES, build_corpus

        overrides, _ = build_corpus(tmp_path)
        saved = {k: dict(getattr(paths, k)) for k in overrides}
        paths.update_from_dict(overrides)
        try:
            sys.path.insert(0, "/root/repo")
            from ovmer.zero_shot_harness import run_zero_shot

            def model_fn(video, audio, subtitle, prompt):
                assert prompt
                return f"label for {subtitle!r}"

            save = str(tmp_path / "out" / "0.npz")
            out = run_zero_shot("MER2023", model_fn, save)
            assert set(out) == set(NAMES)
            loaded = np.load(save, allow_pickle=True)["name2reason"].tolist()
            assert loaded == out
        finally:
            for k, v in saved.items():
                getattr(paths, k).clear()
                getattr(paths, k).update(v)
