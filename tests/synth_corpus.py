"""Shared synthetic corpus builder for integration tests."""

import struct

import numpy as np

NAMES = ["sample_0001", "sample_0002", "sample_0003"]


def write_wav(path, samples, rate=16000):
    pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16))
        f.write(b"data" + struct.pack("<I", len(pcm)) + pcm)


def build_corpus(tmp_path, visual_dim=12, acoustic_dim=16):
    """Create MERCaptionPlus + MER2023 synthetic corpora with preextracted
    frame/face/audio features; returns path-table overrides + feature root."""
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
        pd.DataFrame({"name": NAMES, "english": ["hello there", "", "so sad"]}).to_csv(
            root / "subtitles.csv", index=False
        )

    mcp = roots["MERCaptionPlus"]
    pd.DataFrame(
        {"name": NAMES, "openset": ["['happy','excited']", "[]", "['sad']"]}
    ).to_csv(mcp / "track2_train_mercaptionplus.csv", index=False)
    pd.DataFrame({"name": NAMES, "reason": [f"Because {n} smiles." for n in NAMES]}).to_csv(
        mcp / "track3_train_mercaptionplus.csv", index=False
    )

    m23 = roots["MER2023"]
    train_corpus = {n: {"emo": e} for n, e in zip(NAMES, ["happy", "sad", "neutral"])}
    test_corpus = {n: {"emo": "happy"} for n in NAMES}
    np.savez(
        m23 / "label-6way.npz",
        train_corpus=np.array(train_corpus, dtype=object),
        test1_corpus=np.array(test_corpus, dtype=object),
    )

    feat_root = tmp_path / "features"
    for ds in ("MERCaptionPlus", "MER2023"):
        for modality, dim in (("frame", visual_dim), ("face", visual_dim)):
            d = feat_root / ds / f"{modality}_CLIP_VIT_LARGE_uniform_8frms"
            if modality == "face":
                d = feat_root / ds / f"{modality}_CLIP_VIT_LARGE_8frms"
            d.mkdir(parents=True)
            for name in NAMES:
                np.save(d / f"{name}.npy", np.random.RandomState(2).randn(8, dim).astype(np.float32))
        d = feat_root / ds / "audio_HUBERT_LARGE_8clips"
        d.mkdir(parents=True)
        for name in NAMES:
            np.save(d / f"{name}.npy", np.random.RandomState(3).randn(8, acoustic_dim).astype(np.float32))

    overrides = {
        "DATA_DIR": {ds: str(roots[ds]) for ds in roots},
        "PATH_TO_RAW_AUDIO": {ds: str(roots[ds] / "audio") for ds in roots},
        "PATH_TO_RAW_VIDEO": {ds: str(roots[ds] / "video") for ds in roots},
        "PATH_TO_RAW_FACE": {ds: str(roots[ds] / "openface_face") for ds in roots},
        "PATH_TO_TRANSCRIPTIONS": {ds: str(roots[ds] / "subtitles.csv") for ds in roots},
        "PATH_TO_LABEL": {"MER2023": str(m23 / "label-6way.npz")},
    }
    return overrides, str(feat_root)
