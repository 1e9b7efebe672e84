"""Instruction/caption/preference dataset family tests on synthetic csv/json."""

import json

import pytest

from affectgpt_tpu import constants, paths, registry
from affectgpt_tpu.data import instruction_datasets  # noqa: F401 — registers
from affectgpt_tpu.data.base_dataset import DatasetConfig, ModelDataConfig
from affectgpt_tpu.tokenization import ByteTokenizer

MODEL_CFG = ModelDataConfig(2, 2, 1, 2)


@pytest.fixture()
def data_root(tmp_path):
    import pandas as pd

    saved = dict(paths.DATA_DIR)
    for ds in ("EMERCoarse", "Preference", "VideoChat", "WavCaps", "Preference3"):
        root = tmp_path / ds.lower()
        root.mkdir()
        paths.DATA_DIR[ds] = str(root)

    pd.DataFrame({
        "name": ["a", "b"],
        "openset": ["['happy']", "[]"],
        "reason": ["He smiles.", "She waits."],
    }).to_csv(tmp_path / "emercoarse" / "emer_coarse.csv", index=False)

    pd.DataFrame({
        "name": ["p1"], "openset": ["['sad']"], "reason": ["Cries."],
        "valence": [-0.5], "a1": ["desc one"], "a2": ["desc two"], "p": ["a1"],
    }).to_csv(tmp_path / "preference" / "preference.csv", index=False)

    pd.DataFrame({
        "name": ["r1"], "reason": ["A description."], "reward": ["reject"],
    }).to_csv(tmp_path / "preference3" / "preference3.csv", index=False)

    with open(tmp_path / "videochat" / "instructions.json", "w") as handle:
        json.dump([{"name": "v1", "question": "What?", "answer": "That.",
                    "subtitle": "hi"}], handle)

    pd.DataFrame({"name": ["w1"], "caption": ["rain falls"]}).to_csv(
        tmp_path / "wavcaps" / "captions.csv", index=False
    )
    yield
    paths.DATA_DIR.clear()
    paths.DATA_DIR.update(saved)


def build(ds_name, label_type, face_or_frame="textonly"):
    cls = registry.get("dataset", ds_name)
    cfg = DatasetConfig(label_type=label_type, face_or_frame=face_or_frame, max_length=640)
    return cls(ByteTokenizer(), cfg, MODEL_CFG)


class TestFamilies:
    def test_emer_coarse(self, data_root):
        ds = build("EMERCoarse", "hybird")
        assert len(ds) == 2
        assert ds.annotation[1]["ovlabel"] == "neutral"
        item = ds[0]
        assert any(l != constants.IGNORE_INDEX for l in item["labels"])

    def test_preference_pair(self, data_root):
        ds = build("Preference", "preference")
        item = ds[0]
        text = ByteTokenizer().decode(item["input_ids"], skip_special_tokens=True)
        assert "desc one" in text and "best one is a1" in text

    def test_preference_reward(self, data_root):
        ds = build("Preference3", "reward")
        text = ByteTokenizer().decode(ds[0]["input_ids"], skip_special_tokens=True)
        assert "reject this sentence" in text

    def test_videochat_direct_qa(self, data_root):
        ds = build("VideoChat", "qa")
        text = ByteTokenizer().decode(ds[0]["input_ids"], skip_special_tokens=True)
        assert "What?" in text and "That.###" in text

    def test_wavcaps_caption(self, data_root):
        ds = build("WavCaps", "caption")
        text = ByteTokenizer().decode(ds[0]["input_ids"], skip_special_tokens=True)
        assert "rain falls" in text
