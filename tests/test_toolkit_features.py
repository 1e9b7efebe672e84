"""Feature-pack loading tests (npy dirs and npz packs)."""

import numpy as np

from affectgpt_tpu.toolkit.train import load_feature_table


def test_npy_dir_and_npz_pack(tmp_path):
    rng = np.random.RandomState(0)
    names = ["c1", "c2", "c3"]
    # audio: directory of per-sample npys (frame-level → mean-pooled)
    (tmp_path / "audio_feat").mkdir()
    for n in names:
        np.save(tmp_path / "audio_feat" / f"{n}.npy", rng.randn(5, 10).astype(np.float32))
    # text: name-keyed npz pack
    np.savez(tmp_path / "text.npz", **{n: rng.randn(12).astype(np.float32) for n in names})
    # video: paired-array npz pack
    np.savez(
        tmp_path / "video.npz",
        name=np.array(names), feature=rng.randn(3, 8).astype(np.float32),
    )
    table = load_feature_table(
        str(tmp_path), "audio_feat", "text.npz", "video.npz",
        name2emo={n: i % 2 for i, n in enumerate(names)},
    )
    assert table.names == names
    assert table.audios.shape == (3, 10)
    assert table.texts.shape == (3, 12)
    assert table.videos.shape == (3, 8)
    assert table.emos.tolist() == [0, 1, 0]
