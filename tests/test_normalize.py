"""Dataset normalizer tests: normalized output must be loadable by the
dataset classes."""

import numpy as np

from affectgpt_tpu import paths
from affectgpt_tpu.data.base_dataset import DatasetConfig, ModelDataConfig
from affectgpt_tpu.data.datasets import MER2023Dataset
from affectgpt_tpu.data.normalize import normalize_corpus, split_by_ratio
from affectgpt_tpu.tokenization import ByteTokenizer


def test_normalize_then_load(tmp_path):
    root = tmp_path / "corpus"
    raw = [
        {"id": f"clip{i}", "emotion": ["happy", "sad", "neutral"][i % 3],
         "text": f"utterance {i}", "part": "train" if i < 8 else "test"}
        for i in range(10)
    ]
    counts = normalize_corpus(
        str(root), raw,
        label_fn=lambda s: {"emo": s["emotion"]},
        name_fn=lambda s: s["id"],
        subtitle_fn=lambda s: s["text"],
        split_fn=lambda s: s["part"],
        label_filename="label-6way.npz",
    )
    assert counts == {"train_corpus": 8, "test_corpus": 2}

    saved = {k: dict(getattr(paths, k)) for k in ("DATA_DIR", "PATH_TO_LABEL", "PATH_TO_TRANSCRIPTIONS")}
    try:
        paths.DATA_DIR["MER2023"] = str(root)
        paths.PATH_TO_LABEL["MER2023"] = str(root / "label-6way.npz")
        paths.PATH_TO_TRANSCRIPTIONS["MER2023"] = str(root / "transcription-engchi-polish.csv")
        ds = MER2023Dataset(
            ByteTokenizer(),
            DatasetConfig(label_type="onehot_wo_candidates", face_or_frame="textonly", max_length=640),
            ModelDataConfig(),
        )
        assert len(ds) == 8
        assert ds.annotation[0]["subtitle"].startswith("utterance")
        item = ds[0]
        assert len(item["input_ids"]) > 0
    finally:
        for k, v in saved.items():
            getattr(paths, k).clear()
            getattr(paths, k).update(v)


def test_split_by_ratio():
    splits = split_by_ratio([f"n{i}" for i in range(10)], 0.7, seed=1)
    assert len(splits["train"]) == 7 and len(splits["test"]) == 3
    assert set(splits["train"]) | set(splits["test"]) == {f"n{i}" for i in range(10)}
