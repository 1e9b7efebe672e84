"""Smoke tests for the small operational CLIs that had no coverage:
verify_au_pipeline (AU chain checker) and scripts/ingest_transcode."""

import json
import subprocess
import sys

import numpy as np

_ENV = {"PYTHONPATH": "/root/repo", "JAX_PLATFORMS": "cpu",
        "PATH": "/usr/local/bin:/usr/bin:/bin", "HOME": "/root"}


def _run(args, cwd="/root/repo"):
    return subprocess.run([sys.executable] + args, capture_output=True,
                          text=True, cwd=cwd, env=_ENV)


def test_verify_au_pipeline_cli(tmp_path):
    good = tmp_path / "mf" / "clip_good"
    good.mkdir(parents=True)
    (good / "clip_good_au_analysis.json").write_text(json.dumps({
        "au_info": {
            "peak_frames": [{"peak_index": 4, "frames_before_peak": 2,
                             "frames_after_peak": 2}],
            "frames": [{"summary_description": "brow raise"}],
        },
    }))
    bad = tmp_path / "mf" / "clip_bad"
    bad.mkdir(parents=True)
    (bad / "clip_bad_au_analysis.json").write_text(json.dumps({"oops": 1}))
    nv = tmp_path / "nonverbal.json"
    nv.write_text(json.dumps({"MER2023": {"clip_good": "a raised brow"}}))

    out = _run(["verify_au_pipeline.py",
                "--mer-factory-output", str(tmp_path / "mf"),
                "--nonverbal-json", str(nv)])
    assert out.returncode == 0, out.stderr[-2000:]
    log = out.stdout + out.stderr
    assert "found 2 AU analysis files" in log
    assert "missing au_info" in log
    assert "nonverbal json" in log


def test_ingest_transcode_cli(tmp_path):
    from affectgpt_tpu.data import ingest, media

    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (32, 48, 3), np.uint8) for _ in range(4)]
    src = str(tmp_path / "src.avi")
    ingest.write_mjpeg_avi(src, frames, fps=10, quality=92)
    dst = str(tmp_path / "out.avi")
    out = _run(["scripts/ingest_transcode.py", "--src", src, "--dst", dst])
    assert out.returncode == 0, out.stderr[-2000:]
    decoded = media._read_video_native(dst, 4, "uniform", None, None)
    assert decoded is not None and decoded.shape == (4, 32, 48, 3)


def test_encode_fine_grained_cli(tmp_path):
    mf = tmp_path / "mf" / "vid1"
    mf.mkdir(parents=True)
    (mf / "vid1_au_analysis.json").write_text(json.dumps({
        # '10.5s' sorts lexicographically BEFORE '2.0s' — the CLI must
        # order feature rows temporally (numeric key), not by string
        "fine_grained_descriptions": {"10.5s": "jaw clenches",
                                      "0.0s": "neutral face",
                                      "2.0s": "brow lowers"},
        "au_info": {},
    }))
    empty = tmp_path / "mf" / "vid2"
    empty.mkdir(parents=True)
    (empty / "vid2_au_analysis.json").write_text(json.dumps({"au_info": {}}))
    save = tmp_path / "out"
    out = _run(["scripts/encode_fine_grained.py",
                "--mer-factory-output", str(tmp_path / "mf"),
                "--save-root", str(save)])
    assert out.returncode == 0, out.stderr[-2000:]
    data = np.load(save / "vid1_fine_grained_clip.npz")
    assert data["features"].shape == (3, 512)
    assert list(data["keys"]) == ["0.0s", "2.0s", "10.5s"]  # temporal order
    assert np.isfinite(data["features"]).all()
    assert not (save / "vid2_fine_grained_clip.npz").exists()


def test_precompute_extract_au(tmp_path):
    """FeatureExtractor.extract_au through the shared clip_text helper:
    MER-Factory summary descriptions → [N, 512] CLIP text cache (random
    tower in smoke mode). Constructed via __new__ — the AU leg only needs
    the cache-path attrs and the lazily-loaded text tower."""
    import extract_multimodal_features_precompute as pre

    mf = tmp_path / "mf" / "clipA"
    mf.mkdir(parents=True)
    (mf / "clipA_au_analysis.json").write_text(json.dumps({
        "au_info": {"frames": [
            {"summary_description": "brow raise"},
            {"summary_description": "lip corner pull"},
        ]},
    }))
    fx = pre.FeatureExtractor.__new__(pre.FeatureExtractor)
    fx.save_root = str(tmp_path / "feat")
    fx.dataset = "MER2023"
    fx.frame_sampling = "uniform"
    fx.frame_n_frms = 8
    fx.visual_encoder_name = "CLIP_VIT_LARGE"
    fx.acoustic_encoder_name = "HUBERT_LARGE"
    fx.clips_per_video = 3
    fx.clip_text = None
    assert fx.extract_au("clipA", str(tmp_path / "mf"))
    out = fx.cache_path("au", "clipA")
    feats = np.load(out)
    assert feats.shape == (2, 512) and np.isfinite(feats).all()
    # absent json → False, no cache
    assert not fx.extract_au("missing", str(tmp_path / "mf"))
