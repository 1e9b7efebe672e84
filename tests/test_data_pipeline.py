"""End-to-end data pipeline tests on a synthetic on-disk corpus:
dataset classes → sample assembly → collation → tiny-model forward."""

import os
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from affectgpt_tpu import constants, paths
from affectgpt_tpu.data import media
from affectgpt_tpu.data.base_dataset import DatasetConfig, ModelDataConfig
from affectgpt_tpu.data.datasets import (
    MER2023Dataset,
    MERCaptionPlusDataset,
    string_to_list,
)
from affectgpt_tpu.data.loaders import DevicePrefetcher, IterLoader, MultiIterLoader
from affectgpt_tpu.models import affectgpt
from affectgpt_tpu.tokenization import ByteTokenizer


def write_wav(path, samples, rate=16000):
    """Minimal PCM16 RIFF writer."""
    pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16))
        f.write(b"data" + struct.pack("<I", len(pcm)) + pcm)


NAMES = ["sample_0001", "sample_0002", "sample_0003"]


@pytest.fixture()
def corpus(tmp_path):
    """Synthetic MERCaptionPlus + MER2023 corpora + preextracted features."""
    import pandas as pd

    roots = {}
    for ds in ("MERCaptionPlus", "MER2023"):
        root = tmp_path / ds.lower()
        (root / "audio").mkdir(parents=True)
        (root / "video").mkdir()
        (root / "openface_face").mkdir()
        roots[ds] = root
        for name in NAMES:
            write_wav(root / "audio" / f"{name}.wav", np.random.RandomState(0).randn(24000) * 0.1)
            faces = (np.random.RandomState(1).rand(5, 64, 64, 3) * 255).astype(np.uint8)
            if ds == "MERCaptionPlus":
                (root / "openface_face" / name).mkdir()
                np.save(root / "openface_face" / name / f"{name}.npy", faces)
            else:
                np.save(root / "openface_face" / f"{name}.npy", faces)
        pd.DataFrame(
            {"name": NAMES, "english": ["hello there", "", "so sad"]}
        ).to_csv(root / "subtitles.csv", index=False)

    # MERCaptionPlus annotations
    mcp = roots["MERCaptionPlus"]
    pd.DataFrame(
        {"name": NAMES, "openset": ["['happy','excited']", "[]", "['sad']"]}
    ).to_csv(mcp / "track2_train_mercaptionplus.csv", index=False)
    pd.DataFrame(
        {"name": NAMES, "reason": [f"Because {n} smiles." for n in NAMES]}
    ).to_csv(mcp / "track3_train_mercaptionplus.csv", index=False)

    # MER2023 labels
    m23 = roots["MER2023"]
    train_corpus = {n: {"emo": e} for n, e in zip(NAMES, ["happy", "sad", "neutral"])}
    test_corpus = {n: {"emo": "happy"} for n in NAMES}
    np.savez(
        m23 / "label-6way.npz",
        train_corpus=np.array(train_corpus, dtype=object),
        test1_corpus=np.array(test_corpus, dtype=object),
    )

    # preextracted feature caches (frame for both datasets)
    feat_root = tmp_path / "features"
    for ds in ("MERCaptionPlus", "MER2023"):
        d = feat_root / ds / "frame_CLIP_VIT_LARGE_uniform_8frms"
        d.mkdir(parents=True)
        for name in NAMES:
            np.save(d / f"{name}.npy", np.random.RandomState(2).randn(8, 12).astype(np.float32))

    overrides = {
        "DATA_DIR": {ds: str(roots[ds]) for ds in roots},
        "PATH_TO_RAW_AUDIO": {ds: str(roots[ds] / "audio") for ds in roots},
        "PATH_TO_RAW_VIDEO": {ds: str(roots[ds] / "video") for ds in roots},
        "PATH_TO_RAW_FACE": {ds: str(roots[ds] / "openface_face") for ds in roots},
        "PATH_TO_TRANSCRIPTIONS": {ds: str(roots[ds] / "subtitles.csv") for ds in roots},
        "PATH_TO_LABEL": {"MER2023": str(m23 / "label-6way.npz")},
    }
    saved = {k: dict(getattr(paths, k)) for k in overrides}
    paths.update_from_dict(overrides)
    yield {"feat_root": str(feat_root)}
    for k, v in saved.items():
        getattr(paths, k).clear()
        getattr(paths, k).update(v)


MODEL_CFG = ModelDataConfig(
    num_video_query_token=2, num_audio_query_token=2,
    num_multi_query_token=1, num_image_query_token=2,
)


class TestStringToList:
    def test_parsing(self):
        assert string_to_list("['happy', 'sad']") == ["happy", "sad"]
        assert string_to_list("") == []
        assert string_to_list(["already"]) == ["already"]


class TestDatasets:
    def test_mercaptionplus_realtime_face_audio(self, corpus):
        cfg = DatasetConfig(
            label_type="hybird", face_or_frame="multiface_audio_face_text", max_length=512
        )
        ds = MERCaptionPlusDataset(ByteTokenizer(), cfg, MODEL_CFG, seed=0)
        assert len(ds) == 3
        item = ds[0]
        assert item["raw"]["face"].shape[0] == 8  # sampled to n_frms
        assert item["raw"]["audio"].shape == (8, 1, 32000)
        assert any(l != constants.IGNORE_INDEX for l in item["labels"])
        # empty openset falls back to neutral
        assert ds.annotation[1]["ovlabel"] == "neutral"

    def test_smoke_check(self, corpus):
        cfg = DatasetConfig(
            label_type="hybird", face_or_frame="multiface_audio_face_text", max_length=512
        )
        ds = MERCaptionPlusDataset(ByteTokenizer(), cfg, MODEL_CFG, seed=0)
        batch = ds.smoke_check()
        assert batch["input_ids"].shape[0] == 3  # 3 collated samples

    def test_mer2023_preextracted_frame(self, corpus):
        cfg = DatasetConfig(
            label_type="onehot_w_candidates", face_or_frame="frame_text",
            use_preextracted_frame=True, preextracted_root=corpus["feat_root"],
            max_length=512,
        )
        ds = MER2023Dataset(ByteTokenizer(), cfg, MODEL_CFG, seed=0)
        item = ds[0]
        assert item["features"]["frame"].shape == (8, 12)
        assert "happy" in ds.candidate_labels
        assert ds.read_test_names() == NAMES
        assert ds.get_test_name2gt()[NAMES[0]] == "happy"

    def test_collate_offsets_and_forward(self, corpus):
        cfg = DatasetConfig(
            label_type="onehot_wo_candidates", face_or_frame="frame_text",
            use_preextracted_frame=True, preextracted_root=corpus["feat_root"],
            max_length=640,
        )
        tok = ByteTokenizer()
        ds = MER2023Dataset(tok, cfg, MODEL_CFG, seed=0)
        batch = ds.collate([ds[0], ds[1]])
        assert batch["input_ids"].shape == (2, 640)
        assert "frame" in batch["offsets"]
        # patch ids zeroed
        frame_id = tok.patch_token_ids[constants.DEFAULT_FRAME_PATCH_TOKEN]
        assert not np.any(batch["input_ids"] == frame_id)
        # bos at position 0, labels masked on prompt
        assert batch["input_ids"][0, 0] == tok.bos_token_id
        assert batch["labels"][0, 0] == constants.IGNORE_INDEX

        # forward through the tiny model (frame features only)
        mcfg = affectgpt.AffectGPTConfig.tiny()
        frozen = affectgpt.init_frozen(jax.random.PRNGKey(0), mcfg, dtype=jnp.float32)
        trainable = affectgpt.init_trainable(jax.random.PRNGKey(1), mcfg)
        assert ByteTokenizer().vocab_size <= mcfg.llm.vocab_size
        model_batch = {
            "input_ids": jnp.asarray(batch["input_ids"]),
            "attention_mask": jnp.asarray(batch["attention_mask"]),
            "labels": jnp.asarray(batch["labels"]),
            "features": {"frame": jnp.asarray(batch["features"]["frame"])},
            "offsets": {"frame": jnp.asarray(batch["offsets"]["frame"])},
        }
        loss = affectgpt.forward_loss(frozen, trainable, mcfg, model_batch)
        assert np.isfinite(float(loss))

    def test_loaders_mixing(self, corpus):
        cfg = DatasetConfig(
            label_type="hybird", face_or_frame="frame_text",
            use_preextracted_frame=True, preextracted_root=corpus["feat_root"],
            max_length=640,
        )
        tok = ByteTokenizer()
        ds_a = MER2023Dataset(tok, cfg, MODEL_CFG, seed=0)
        cfg_b = DatasetConfig(
            label_type="hybird", face_or_frame="frame_text",
            use_preextracted_frame=True, preextracted_root=corpus["feat_root"],
            max_length=640,
        )
        ds_b = MERCaptionPlusDataset(tok, cfg_b, MODEL_CFG, seed=0)
        multi = MultiIterLoader(
            [IterLoader(ds_a, 2, seed=1), IterLoader(ds_b, 2, seed=2)], ratios=[1, 3], seed=3
        )
        seen = set()
        prefetcher = DevicePrefetcher(multi)
        for _ in range(6):
            batch = next(prefetcher)
            seen.add(batch["dataset"])
        prefetcher.close()
        assert seen == {"mer2023", "mercaptionplus"}


class TestWavIO:
    def test_native_and_python_agree(self, tmp_path):
        path = str(tmp_path / "t.wav")
        sig = np.sin(np.linspace(0, 40, 5000)).astype(np.float32) * 0.7
        write_wav(path, sig, rate=22050)
        wav_py, rate_py = media._read_wav_python(path)
        wav, rate = media.read_wav(path)
        assert rate == rate_py == 22050
        np.testing.assert_allclose(wav, wav_py, atol=1e-6)
        np.testing.assert_allclose(wav[0], sig, atol=1e-3)
