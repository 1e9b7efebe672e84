"""inference_hybird.py end-to-end on the synthetic corpus with a tiny
model: produces the name2reason npz artifact, resumes on re-run."""

import sys

import numpy as np
import pytest
import yaml

from affectgpt_tpu import paths
from tests.synth_corpus import NAMES, build_corpus


@pytest.fixture()
def corpus(tmp_path):
    overrides, feat_root = build_corpus(tmp_path)
    saved = {k: dict(getattr(paths, k)) for k in overrides}
    paths.update_from_dict(overrides)
    yield feat_root
    for k, v in saved.items():
        getattr(paths, k).clear()
        getattr(paths, k).update(v)


def test_inference_hybird_main(corpus, tmp_path, monkeypatch):
    cfg = {
        "model": {
            "llama_model": "tiny",
            "skip_encoders": True,
            "preextracted_visual_dim": 12,
            "preextracted_acoustic_dim": 16,
            "num_video_query_token": 2,
            "num_audio_query_token": 2,
            "num_multi_query_token": 1,
            "lora_r": 2,
        },
        "datasets": {
            "mer2023": {
                "face_or_frame": "frame_text",
                "use_preextracted_frame": True,
                "preextracted_root": corpus,
                "max_length": 640,
            },
        },
        "run": {"output_dir": str(tmp_path / "output")},
        "inference": {"face_or_frame": "frame_text"},
    }
    cfg_path = tmp_path / "exp_inf.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        sys, "argv",
        ["inference_hybird.py", "--cfg-path", str(cfg_path), "--dataset", "MER2023",
         "--batch_size", "2", "--max_new_tokens", "4"],
    )
    sys.path.insert(0, "/root/repo")
    import inference_hybird as entry

    entry.main()

    out = tmp_path / "output" / "results" / "exp_inf" / "result-mer2023" / "0.npz"
    assert out.exists()
    name2reason = np.load(out, allow_pickle=True)["name2reason"].tolist()
    assert set(name2reason) == set(NAMES)
    assert all(isinstance(v, str) for v in name2reason.values())

    # resume: second run must skip (file timestamp unchanged)
    mtime = out.stat().st_mtime
    entry.main()
    assert out.stat().st_mtime == mtime

    # paged serving path: same artifact contract through PagedBatchServer
    monkeypatch.setattr(
        sys, "argv",
        ["inference_hybird.py", "--cfg-path", str(cfg_path), "--dataset", "MER2023",
         "--batch_size", "2", "--max_new_tokens", "4", "--paged",
         "--paged_block_size", "8", "--paged_num_blocks", "512",
         "--paged_prefill_chunk", "8"],  # chunked prefill through the CLI
    )
    out.unlink()
    entry.main()
    assert out.exists()
    paged = np.load(out, allow_pickle=True)["name2reason"].tolist()
    assert set(paged) == set(NAMES)
    assert all(isinstance(v, str) for v in paged.values())
