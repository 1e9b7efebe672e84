"""Per-corpus normalizer recipes: synthetic raw trees → processed
contract (label npz splits + transcription csv + media copies)."""

import os
import pickle

import numpy as np
import pandas as pd

from affectgpt_tpu.data import corpus_recipes as cr


def _touch_mp4(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"\x00" * 16)


def _read_corpus(npz_path, key):
    return np.load(npz_path, allow_pickle=True)[key].tolist()


def test_mer2023(tmp_path):
    root = tmp_path / "raw"
    os.makedirs(root, exist_ok=True)
    for split, n in (("train", 3), ("test1", 2), ("test2", 2), ("test3", 2)):
        rows = {"name": [f"{split}_{i:05d}" for i in range(n)],
                "discrete": ["happy"] * n}
        if split != "test3":
            rows["valence"] = [0.5] * n
        pd.DataFrame(rows).to_csv(root / f"{split}-label.csv", index=False)
        for name in rows["name"]:
            _touch_mp4(str(root / split / f"{name}.mp4"))
    counts = cr.normalize_mer2023(str(root), str(tmp_path / "out"))
    assert counts == {"train": 3, "test1": 2, "test2": 2, "test3": 2}
    label = tmp_path / "out" / "label-6way.npz"
    train = _read_corpus(label, "train_corpus")
    assert train["train_00000"] == {"emo": "happy", "val": 0.5}
    test3 = _read_corpus(label, "test3_corpus")
    assert test3["test3_00000"]["val"] == -10.0
    assert (tmp_path / "out" / "video" / "train_00001.mp4").exists()


def test_mer2024_semi_split(tmp_path):
    root = tmp_path / "raw"
    os.makedirs(root, exist_ok=True)
    pd.DataFrame({"name": ["a", "b"], "discrete": ["sad", "happy"]}).to_csv(
        root / "label-disdim.csv", index=False)
    pd.DataFrame({"name": [f"s{i}" for i in range(6)],
                  "discrete": ["neutral"] * 6}).to_csv(
        root / "semi-label.csv", index=False)
    counts = cr.normalize_mer2024(str(root), str(tmp_path / "out"),
                                  seed=1, copy_media=False)
    assert counts == {"train": 2, "test1": 3, "test2": 3}
    label = tmp_path / "out" / "label-6way.npz"
    t1 = set(_read_corpus(label, "test1_corpus"))
    t2 = set(_read_corpus(label, "test2_corpus"))
    assert t1 | t2 == {f"s{i}" for i in range(6)} and not (t1 & t2)


def test_meld(tmp_path):
    root = tmp_path / "raw"
    os.makedirs(root, exist_ok=True)
    for csv_name in ("train_sent_emo.csv", "dev_sent_emo.csv", "test_sent_emo.csv"):
        pd.DataFrame({
            "Dialogue_ID": [0, 0], "Utterance_ID": [0, 1],
            "Emotion": ["joy", "anger"], "Utterance": ["hi", "no"],
        }).to_csv(root / csv_name, index=False)
    counts = cr.normalize_meld(str(root), str(tmp_path / "out"), copy_media=False)
    assert counts == {"train": 2, "val": 2, "test": 2}
    train = _read_corpus(tmp_path / "out" / "label.npz", "train_corpus")
    assert train["train_dia0_utt0"] == {"emo": cr.MELD_EMOS.index("joy"), "val": -10.0}
    trans = pd.read_csv(tmp_path / "out" / "transcription.csv")
    assert set(trans.columns) == {"name", "english"}
    assert dict(zip(trans["name"], trans["english"]))["val_dia0_utt1"] == "no"


def test_sims(tmp_path):
    root = tmp_path / "raw"
    meta = root / "metadata"
    os.makedirs(meta / "sentiment", exist_ok=True)
    pd.DataFrame({"video_id": ["v1", "v1", "v2"], "clip_id": [1, 2, 1],
                  "label": [0.4, -0.6, 0.0]}).to_csv(
        meta / "sentiment" / "label_M.csv", index=False)
    for split, idx in (("train", [0, 1]), ("val", [2]), ("test", [2])):
        pd.DataFrame({"index": idx}).to_csv(meta / f"{split}_index.csv", index=False)
    pd.DataFrame({"video_id": ["v1"], "clip_id": [1],
                  "Chinese": ["你好"], "English": ["hello"]}).to_csv(
        meta / "Translation.csv", index=False)
    counts = cr.normalize_sims(str(root), str(tmp_path / "out"), copy_media=False)
    assert counts == {"train": 2, "val": 1, "test": 1}
    train = _read_corpus(tmp_path / "out" / "label.npz", "train_corpus")
    assert train["v1_0002"] == {"emo": 0, "val": -0.6}
    trans = pd.read_csv(tmp_path / "out" / "transcription.csv")
    assert list(trans["name"]) == ["v1_0001"] and list(trans["chinese"]) == ["你好"]


def test_simsv2(tmp_path):
    root = tmp_path / "raw"
    os.makedirs(root, exist_ok=True)
    pd.DataFrame({
        "video_id": ["a", "a", "b"], "clip_id": [1, 2, 1],
        "text": ["x", "y", "z"], "label": [0.1, 0.2, -0.3],
        "mode": ["train", "valid", "test"],
    }).to_csv(root / "meta.csv", index=False)
    counts = cr.normalize_simsv2(str(root), str(tmp_path / "out"), copy_media=False)
    assert counts == {"train": 1, "val": 1, "test": 1}
    val = _read_corpus(tmp_path / "out" / "label.npz", "val_corpus")
    assert val["a_0002"]["val"] == 0.2


def _write_mosi_pkl(path, seven_tuple):
    with open(path, "wb") as f:
        pickle.dump(seven_tuple, f)


def test_cmumosi(tmp_path):
    root = tmp_path / "raw"
    os.makedirs(root, exist_ok=True)
    video_ids = {"vidA": ["uA_1", "uA_2"], "vidB": ["uB_1"]}
    labels = {"vidA": [0.5, -0.5], "vidB": [1.0]}
    sentences = {"vidA": ["one", "two"], "vidB": ["three"]}
    _write_mosi_pkl(root / "CMUMOSI_features_raw_2way.pkl",
                    (video_ids, labels, None, sentences,
                     {"vidA"}, set(), {"vidB"}))
    counts = cr.normalize_cmumosi(str(root), str(tmp_path / "out"), copy_media=False)
    assert counts == {"train": 2, "val": 0, "test": 1}
    train = _read_corpus(tmp_path / "out" / "label.npz", "train_corpus")
    assert train["uA_2"] == {"emo": 0, "val": -0.5}


def test_iemocap(tmp_path):
    root = tmp_path / "raw"
    trans = root / "Session1" / "dialog" / "transcriptions"
    os.makedirs(trans, exist_ok=True)
    (trans / "Ses01F_impro01.txt").write_text(
        "Ses01F_impro01_F000 [1.00-2.50]: Hello there.\n"
        "garbage line\n"
        "Ses01F_impro01_M000 [3.00-4.00]: Hi.\n"
    )
    video_ids = {"Ses01F_impro01": ["Ses01F_impro01_F000", "Ses01F_impro01_M000"]}
    labels = {"Ses01F_impro01": [2, 3]}
    pkl = tmp_path / "labels.pkl"
    _write_mosi_pkl(pkl, (video_ids, labels, None, None,
                          {"Ses01F_impro01"}, set()))
    calls = []
    counts = cr.normalize_iemocap(
        str(root), str(tmp_path / "out"), str(pkl),
        transcode=lambda src, dst, s, e: calls.append((src, dst, s, e)),
    )
    assert counts == {"whole": 2, "transcribed": 2}
    whole = _read_corpus(tmp_path / "out" / "label.npz", "whole_corpus")
    assert whole["Ses01F_impro01_M000"] == {"emo": 3, "val": -10.0}
    # transcode only called for existing avi files (none here)
    assert calls == []
    trans_csv = pd.read_csv(tmp_path / "out" / "transcription.csv")
    assert len(trans_csv) == 2 and trans_csv["english"][0] == "Hello there."


def test_mer2023_unlabel(tmp_path):
    import numpy as np

    from affectgpt_tpu.data import corpus_recipes as cr

    root = tmp_path / "unlabel"
    face_root = root / "openface_face"
    for name, n in [("sample_a", 40), ("sample_b", 10), ("sample_c", 17)]:
        d = face_root / name
        d.mkdir(parents=True)
        np.save(d / f"{name}.npy", np.zeros((n, 4, 4, 3), dtype=np.uint8))
    bad = face_root / "sample_bad"
    bad.mkdir()
    (bad / "sample_bad.npy").write_bytes(b"not a npy")

    counts = cr.normalize_mer2023_unlabel(str(root), prune=True)
    assert counts == {"total": 4, "kept": 2, "short": 1, "errors": 1}
    # short + unreadable pruned, the rest kept (reference mer2023_unlabel.py:30-36)
    assert not (face_root / "sample_b").exists()
    assert not (face_root / "sample_bad").exists()
    assert (face_root / "sample_a").exists()

    stored = np.load(root / "unlabel-name2len.npz", allow_pickle=True)["name2len"].tolist()
    assert stored["sample_a"] == 40 and stored["sample_c"] == 17
