"""Metric-stack oracle: run the reference's OWN evaluation code as ground
truth.

Imports the UNMODIFIED reference `my_affectgpt/evaluation/wheel.py`
(reference wheel.py:17-632) against the real vendored emotion-wheel assets
(byte-identical to the reference's, assets/emotion_wheel) and asserts the
repo's `WheelMetrics` reproduces EVERY stage of the label-mapping chain and
every downstream score:

- the 253-label candidate set from the five 3-level wheels,
- the 8-run GPT-synonym merge (253 → 1255 labels),
- the format-augmentation table (1255 → 7386 surface forms),
- the case1/case2/case3 backward mappings for all 7386 forms,
- wheel cluster maps (5 wheels x 2 levels),
- set-overlap precision/recall (calculate_openset_overlap_rate) and the
  headline 5-wheel EW (F, P, R) (wheel_metric_calculation),
- one-hot hitrate/mscore (calculate_openset_onehot_hitrate),
- the EMERCoarse filter predicate (func_hit_or_not / ew_metric.py:199-210),
- the string helpers every score flows through (string_to_list,
  func_postprocess_qwen).

pd.read_excel is backed by the stdlib xlsx reader (no openpyxl in this
image) — the oracle target is the mapping/scoring math, not xlsx parsing,
and the DataFrame handed to the reference preserves pd.isna semantics for
empty cells.
"""

from __future__ import annotations

import numpy as np
import pytest

WHEEL_ROOT = "/root/repo/assets/emotion_wheel"  # byte-identical to reference's

CASE_METRICS = (
    "case1", "case2",
    "case3_wheel1_level1", "case3_wheel2_level1", "case3_wheel3_level1",
    "case3_wheel4_level1", "case3_wheel5_level1",
    "case3_wheel1_level2", "case3_wheel4_level2",
)


@pytest.fixture(scope="module")
def ref():
    """The reference wheel module, imported unmodified with its eager
    module-level 253→1255→7386 chain built on the vendored assets."""
    import pandas as pd

    from affectgpt_tpu.utils import xlsx as myxlsx
    from tests import refstubs

    refstubs.install()

    def fake_read_excel(path, *a, **k):
        rows = myxlsx.read_rows(path)
        header = [h if h is not None else f"col{i}" for i, h in enumerate(rows[0])]
        data = [[np.nan if v is None else v for v in r] for r in rows[1:]]
        return pd.DataFrame(data, columns=header)

    saved_read_excel = pd.read_excel
    pd.read_excel = fake_read_excel
    try:
        import config

        saved_root = config.EMOTION_WHEEL_ROOT
        config.EMOTION_WHEEL_ROOT = WHEEL_ROOT
        try:
            import my_affectgpt.evaluation.wheel as ref_wheel

            yield ref_wheel
        finally:
            config.EMOTION_WHEEL_ROOT = saved_root
    finally:
        pd.read_excel = saved_read_excel
        refstubs.remove_path()


@pytest.fixture(scope="module")
def mine():
    from affectgpt_tpu.evaluation.wheel import WheelMetrics

    return WheelMetrics(WHEEL_ROOT)


def _synth_pairs(ref, n=300, seed=0, onehot=False):
    """Adversarial synthetic prediction/gt strings: real surface forms in
    both bare and bracketed-list syntax, mixed case, stray whitespace, and
    out-of-vocabulary junk words."""
    rng = np.random.default_rng(seed)
    surface = sorted(ref.format_mapping)
    junk = ["blorptastic", "qwertish", "unmappable-word", "neutral"]

    def draw():
        k = int(rng.integers(1, 5))
        words = [surface[int(i)] for i in rng.integers(0, len(surface), k)]
        if rng.random() < 0.4:
            words.append(junk[int(rng.integers(0, len(junk)))])
        words = [
            w.upper() if rng.random() < 0.25 else (f"  {w} " if rng.random() < 0.25 else w)
            for w in words
        ]
        if rng.random() < 0.5:
            return "[" + ", ".join(f"'{w}'" for w in words) + "]"
        return ", ".join(words)

    def draw_onehot():
        return surface[int(rng.integers(0, len(surface)))]

    name2gt = {f"s{i:04d}": (draw_onehot() if onehot else draw()) for i in range(n)}
    name2pred = {f"s{i:04d}": draw() for i in range(n)}
    return name2gt, name2pred


class TestLabelSpaceParity:
    def test_candidate_labels(self, ref, mine):
        ref_labels = sorted(set(ref.convert_all_wheels_to_candidate_labels()))
        assert mine.candidate_labels() == ref_labels
        assert len(ref_labels) == 253

    def test_synonym_mapping_253_to_1255(self, ref, mine):
        ref_map = ref.raw_mapping  # read_candidate_synonym_merge(), built at import
        my_map = mine.synonym_mapping()
        assert set(ref_map) == set(my_map)
        assert len(ref_map) == 1255
        for key in ref_map:
            assert set(ref_map[key]) == set(my_map[key]), key

    def test_format_mapping_1255_to_7386(self, ref, mine):
        ref_map = ref.format_mapping  # read_format2raws(), built at import
        my_map = mine.format_mapping()
        assert set(ref_map) == set(my_map)
        assert len(ref_map) == 7386
        for key in ref_map:
            assert set(ref_map[key]) == set(my_map[key]), key

    @pytest.mark.parametrize("wheel", ["wheel1", "wheel2", "wheel3", "wheel4", "wheel5"])
    @pytest.mark.parametrize("level", ["level1", "level2"])
    def test_wheel_cluster(self, ref, mine, wheel, level):
        assert mine.wheel_cluster(wheel, level) == ref.func_get_wheel_cluster(wheel, level)


class TestBackwardMappingParity:
    def test_every_surface_form_all_cases(self, ref, mine):
        """All 7386 surface forms + OOV words through case1/2/3 backward
        mapping (reference func_backward_case1/2/3, wheel.py:312-382)."""
        fm, rm = ref.format_mapping, ref.raw_mapping
        clusters = {
            m: ref.func_get_wheel_cluster(*m.split("_")[1:])
            for m in CASE_METRICS if m.startswith("case3")
        }
        labels = sorted(fm) + ["blorptastic", "", "HAPPY", " happy "]
        for label in labels:
            for metric in CASE_METRICS:
                if metric == "case1":
                    expect = ref.func_backward_case1(label, fm)
                elif metric == "case2":
                    expect = ref.func_backward_case2(label, fm, rm)
                else:
                    expect = ref.func_backward_case3(label, fm, rm, clusters[metric])
                got = mine.backward(label, metric)
                assert got == expect, (label, metric)


class TestScoreParity:
    @pytest.mark.parametrize(
        "metric", ["case1", "case2", "case3_wheel1_level1", "case3_wheel4_level2"]
    )
    def test_overlap_rate(self, ref, mine, metric):
        name2gt, name2pred = _synth_pairs(ref, n=300, seed=17)
        ref_p, ref_r = ref.calculate_openset_overlap_rate(
            name2gt=name2gt, name2pred=name2pred, metric=metric,
            format_mapping=ref.format_mapping, raw_mapping=ref.raw_mapping,
            inter_print=False,
        )
        my_p, my_r = mine.overlap_rate(name2gt, name2pred, metric)
        np.testing.assert_allclose([my_p, my_r], [ref_p, ref_r], rtol=1e-12)

    @pytest.mark.parametrize("level", ["level1", "level2"])
    def test_wheel_metric_headline(self, ref, mine, level):
        """The headline EW score: mean (F, P, R) over the 5 wheels —
        reference wheel_metric_calculation (wheel.py:473-520)."""
        name2gt, name2pred = _synth_pairs(ref, n=250, seed=3)
        expect = ref.wheel_metric_calculation(
            name2gt=name2gt, name2pred=name2pred, inter_print=False, level=level
        )
        got = mine.wheel_metric(name2gt, name2pred, level=level)
        np.testing.assert_allclose(list(got), expect, rtol=1e-12)

    def test_overlap_rate_subset_names(self, ref, mine):
        """process_names subset selection must match (wheel.py:429-430)."""
        name2gt, name2pred = _synth_pairs(ref, n=80, seed=9)
        subset = sorted(name2gt)[::3]
        ref_p, ref_r = ref.calculate_openset_overlap_rate(
            name2gt=name2gt, name2pred=name2pred, metric="case2",
            process_names=subset,
            format_mapping=ref.format_mapping, raw_mapping=ref.raw_mapping,
            inter_print=False,
        )
        my_p, my_r = mine.overlap_rate(name2gt, name2pred, "case2", process_names=subset)
        np.testing.assert_allclose([my_p, my_r], [ref_p, ref_r], rtol=1e-12)

    @pytest.mark.parametrize("metric", ["case1", "case3_wheel2_level1"])
    def test_onehot_hitrate(self, ref, mine, metric):
        name2gt, name2pred = _synth_pairs(ref, n=200, seed=29, onehot=True)
        ref_hit, ref_ms = ref.calculate_openset_onehot_hitrate(
            name2gt=name2gt, name2pred=name2pred, metric=metric,
            format_mapping=ref.format_mapping, raw_mapping=ref.raw_mapping,
            inter_print=False,
        )
        my_hit, my_ms = mine.onehot_hitrate(name2gt, name2pred, metric)
        np.testing.assert_allclose([my_hit, my_ms], [ref_hit, ref_ms], rtol=1e-12)

    def test_hit_or_not(self, ref, mine):
        """EMERCoarse filter predicate per metric AND the any-of-5-wheels
        composition (reference wheel.py:588-632 + ew_metric.py:199-210)."""
        cases = [
            ("happy, sad", "joyful"),
            ("", ""),                      # both empty → both neutral → hit
            ("", "calm, neutral"),
            ("neutral", "blorptastic"),    # raw-'neutral' append path
            ("['angry', 'mad']", "furious"),
            ("Serene", "blorptastic, qwert"),
            ("NEUTRAL", "neutral"),        # case-sensitivity of the raw check
            ("happiness", "sadness"),
        ]
        name2gt, name2pred = _synth_pairs(ref, n=60, seed=41)
        cases += list(zip(name2gt.values(), name2pred.values()))
        metrics = [f"case3_wheel{i}_level1" for i in range(1, 6)]
        for gt_ov, pred_ov in cases:
            for metric in metrics:
                expect = ref.func_hit_or_not(
                    gt_ov=gt_ov, pred_ov=pred_ov, metric=metric,
                    format_mapping=ref.format_mapping, raw_mapping=ref.raw_mapping,
                )
                got = mine.hit_or_not_single(gt_ov, pred_ov, metric)
                assert got == expect, (gt_ov, pred_ov, metric)
            # ew_metric.hit_or_not: any wheel at level1
            expect_any = any(
                ref.func_hit_or_not(
                    gt_ov=gt_ov, pred_ov=pred_ov, metric=m,
                    format_mapping=ref.format_mapping, raw_mapping=ref.raw_mapping,
                )
                for m in metrics
            )
            assert mine.hit_or_not(gt_ov, pred_ov) == expect_any, (gt_ov, pred_ov)


class TestStringHelperParity:
    CASES = [
        "['happy', 'sad']",
        '["happy", "sad"]',
        "happy, sad",
        "happy,sad,  gloomy ",
        "",
        "[]",
        "[happy]",
        "one'two",
        "[a, b], [c]",
        "no-brackets single",
        ["already", "a", "list"],
        np.asarray(["an", "array"]),
        "  spaced  ",
        "',,'",
        "[',']",
    ]

    def test_string_to_list(self, ref, mine):
        """reference toolkit/utils/functions.py:609-626 vs
        affectgpt_tpu.data.datasets.string_to_list."""
        import importlib

        from affectgpt_tpu.data.datasets import string_to_list as my_stl

        ref_functions = importlib.import_module("toolkit.utils.functions")
        for case in self.CASES:
            expect = ref_functions.string_to_list(
                case.copy() if isinstance(case, (list, np.ndarray)) else case
            )
            got = my_stl(case.copy() if isinstance(case, (list, np.ndarray)) else case)
            assert list(got) == list(expect), case

    def test_postprocess_qwen(self, ref):
        """reference toolkit/utils/qwen.py:15-31 vs
        affectgpt_tpu.evaluation.judge.postprocess_response."""
        import importlib

        from affectgpt_tpu.evaluation.judge import postprocess_response

        ref_qwen = importlib.import_module("toolkit.utils.qwen")
        cases = [
            "Output: happy",
            "output happy",
            "Input: Output: sad",
            "输出：开心",
            "让我们来翻译一下：nervous",
            ": leading colon",
            "：full-width colon",
            "multi\nline\nresponse",
            "  padded  ",
            "Inputless prefix match",   # startswith('Input') hits here too
            "",
        ]
        for case in cases:
            assert postprocess_response(case) == ref_qwen.func_postprocess_qwen(case), case
