"""Emotion-wheel metric tests on synthetic wheel/synonym/format assets."""

import os
import struct
import zipfile

import numpy as np
import pytest

from affectgpt_tpu.evaluation.wheel import WheelMetrics, read_wheel_to_map
from affectgpt_tpu.utils import xlsx


def write_xlsx(path, header, rows):
    """Minimal xlsx writer using inline strings (enough for our reader)."""

    def col_letter(i):
        letters = ""
        i += 1
        while i:
            i, rem = divmod(i - 1, 26)
            letters = chr(ord("A") + rem) + letters
        return letters

    def row_xml(r_idx, values):
        cells = []
        for c_idx, value in enumerate(values):
            if value is None:
                continue
            ref = f"{col_letter(c_idx)}{r_idx}"
            cells.append(
                f'<c r="{ref}" t="inlineStr"><is><t>{value}</t></is></c>'
            )
        return f'<row r="{r_idx}">{"".join(cells)}</row>'

    all_rows = [header] + rows
    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
        + "".join(row_xml(i + 1, row) for i, row in enumerate(all_rows))
        + "</sheetData></worksheet>"
    )
    content_types = (
        '<?xml version="1.0"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="xml" ContentType="application/xml"/></Types>'
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)


@pytest.fixture()
def wheel_assets(tmp_path):
    """Two tiny wheels + synonym table + format csv."""
    import pandas as pd

    # wheel1: joy -> {happy -> [cheerful, content]}, sadness -> {sad -> [gloomy]}
    write_xlsx(
        tmp_path / "wheel1.xlsx",
        ["level1", "level2", "level3"],
        [
            ["joy", "happy", "cheerful"],
            [None, None, "content"],
            ["sadness", "sad", "gloomy"],
        ],
    )
    for i in range(2, 6):
        write_xlsx(
            tmp_path / f"wheel{i}.xlsx",
            ["level1", "level2", "level3"],
            [
                ["joy", "happy", "cheerful"],
                ["sadness", "sad", "gloomy"],
            ],
        )

    words = ["joy", "happy", "cheerful", "content", "sadness", "sad", "gloomy"]
    synonyms = {
        "happy": "['joyful','glad']",
        "sad": "['unhappy','sorrowful']",
    }
    header = []
    for run in range(1, 9):
        header += [f"word_run{run}", f"synonym_run{run}"]
    rows = []
    for w in words:
        row = []
        for _ in range(1, 9):
            row += [w, synonyms.get(w, "[]")]
        rows.append(row)
    write_xlsx(tmp_path / "synonym.xlsx", header, rows)

    all_words = words + ["joyful", "glad", "unhappy", "sorrowful"]
    pd.DataFrame(
        {
            "name": all_words,
            "format": [f"['{w.capitalize()}','{w}s']".lower() for w in all_words],
        }
    ).to_csv(tmp_path / "format.csv", index=False)
    return str(tmp_path)


class TestXlsxReader:
    def test_roundtrip(self, tmp_path):
        path = tmp_path / "t.xlsx"
        write_xlsx(path, ["a", "b"], [["1", "x"], [None, "y"]])
        rows = xlsx.read_dicts(str(path))
        assert rows == [{"a": "1", "b": "x"}, {"a": None, "b": "y"}]


class TestWheel:
    def test_wheel_map_forward_fill(self, wheel_assets):
        store = read_wheel_to_map(os.path.join(wheel_assets, "wheel1.xlsx"))
        assert store["joy"]["happy"] == ["cheerful", "content"]
        assert store["sadness"]["sad"] == ["gloomy"]

    def test_candidate_labels(self, wheel_assets):
        wm = WheelMetrics(wheel_assets)
        labels = wm.candidate_labels()
        assert set(labels) == {"joy", "happy", "cheerful", "content", "sadness", "sad", "gloomy"}

    def test_backward_cases(self, wheel_assets):
        wm = WheelMetrics(wheel_assets)
        # synonym word maps through synonym table to wheel word, then cluster
        assert wm.backward("joyful", "case3_wheel1_level1") == "joy"
        assert wm.backward("unhappy", "case3_wheel1_level1") == "sadness"
        # format variant ("glads") → glad → happy → joy
        assert wm.backward("glads", "case3_wheel1_level1") == "joy"
        # unknown word drops out
        assert wm.backward("xyzzy", "case3_wheel1_level1") == ""

    def test_wheel_metric_perfect_and_mixed(self, wheel_assets):
        wm = WheelMetrics(wheel_assets)
        name2gt = {"a": "['happy']", "b": "['sad']"}
        perfect = {"a": "['joyful']", "b": "['unhappy']"}  # synonyms of gt
        f, p, r = wm.wheel_metric(name2gt, perfect)
        assert f == pytest.approx(1.0)
        mixed = {"a": "['joyful','unhappy']", "b": "['cheerful']"}
        f2, p2, r2 = wm.wheel_metric(name2gt, mixed)
        # a: pred {joy, sadness} gt {joy} → p=.5 r=1 ; b: pred {joy} gt {sadness} → 0
        assert p2 == pytest.approx(0.25)
        assert r2 == pytest.approx(0.5)
        assert 0 < f2 < 1

    def test_hitrate_metric(self, wheel_assets):
        wm = WheelMetrics(wheel_assets)
        name2gt = {"a": "happy", "b": "sad"}
        name2pred = {"a": "['joyful']", "b": "['cheerful']"}
        score = wm.hitrate_metric(name2gt, name2pred)
        assert score == pytest.approx(0.5)  # a hits, b predicts wrong cluster


class TestVendoredRealScaleAssets:
    """The real wheel data (assets/emotion_wheel, vendored from the
    reference's emotion_wheel directory) at full scale: 253 wheel labels,
    8 synonym runs merged to ~1255 surface forms, format augmentation to
    ~7386 forms — case collisions, dedup, and the full backward chain."""

    @pytest.fixture(scope="class")
    def wm(self):
        from affectgpt_tpu import paths

        if not os.path.isdir(paths.EMOTION_WHEEL_ROOT):
            pytest.skip("no emotion wheel assets")
        return WheelMetrics(paths.EMOTION_WHEEL_ROOT)

    def test_full_scale_label_space(self, wm):
        cands = wm.candidate_labels()
        assert len(cands) == 253
        assert all(c == c.lower().strip() for c in cands)  # normalized+deduped
        syn = wm.synonym_mapping()
        assert len(syn) == 1255
        # every synonym target is a wheel label
        wheel_labels = set(cands)
        assert all(t in wheel_labels for targets in syn.values() for t in targets)
        fmt = wm.format_mapping()
        assert len(fmt) == 7386

    def test_every_wheel_loads_three_levels(self, wm):
        for wheel in ("wheel1", "wheel2", "wheel3", "wheel4", "wheel5"):
            store = wm.wheel_map(wheel)
            assert len(store) >= 4  # level-1 hubs
            assert all(l3s for l2s in store.values() for l3s in l2s.values())
            cluster = wm.wheel_cluster(wheel, "level1")
            # every wheel word maps to a level-1 centre that is itself a key
            assert set(cluster.values()) <= set(store)

    def test_backward_chain_on_real_words(self, wm):
        # format variant → synonym → wheel cluster, against known wheel1 rows
        for word in ("joyful", "happy", "cheerful"):
            mapped = wm.backward(word, "case3_wheel1_level1")
            assert mapped != ""
        assert wm.backward("xyzzy", "case3_wheel1_level1") == ""
        # case1/case2 stages also resolve
        assert wm.backward("happy", "case1") != ""
        assert wm.backward("happy", "case2") != ""

    def test_metric_end_to_end_real_assets(self, wm):
        name2gt = {"a": "happy, excited", "b": "sad", "c": "angry"}
        perfect = {"a": "happy, excited", "b": "sad", "c": "angry"}
        f, p, r = wm.wheel_metric(name2gt, perfect)
        assert f == pytest.approx(1.0)
        synonyms = {"a": "joyful, thrilled", "b": "sorrowful", "c": "furious"}
        f2, p2, r2 = wm.wheel_metric(name2gt, synonyms)
        assert f2 > 0.8  # synonyms land in the same clusters
        wrong = {"a": "sad", "b": "happy", "c": "calm"}
        f3, _, _ = wm.wheel_metric(name2gt, wrong)
        assert f3 < f2
