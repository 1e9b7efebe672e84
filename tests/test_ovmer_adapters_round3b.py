"""Sixth–ninth OV-MER adapters, completing the reference's 10-harness
breadth (OV-MER/{LLaMA-VID,Otter,VideoChat,VideoChat2}/main-video.py):
LLaMA-VID (1-fps stride, llava_v1 conversation), Otter (16-frame fixed
stride, flamingo format + beam search + bad-words), VideoChat
(segment-midpoint sampling), and VideoChat2 (video-token model), each
driven on a tiny random HF model and end-to-end through
ovmer.zero_shot_harness."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from affectgpt_tpu import paths
from ovmer.adapters import llama_vid, otter, videochat, videochat2
from ovmer.zero_shot_harness import run_zero_shot
from tests.synth_corpus import NAMES, build_corpus
from tests.test_ovmer_adapters_more import tiny_llava  # noqa: F401
from tests.test_ovmer_adapters_round3 import tiny_llava_next_video  # noqa: F401


@pytest.fixture()
def corpus(tmp_path):
    overrides, feat_root = build_corpus(tmp_path)
    saved = {k: dict(getattr(paths, k)) for k in overrides}
    paths.update_from_dict(overrides)
    yield tmp_path
    for k, v in saved.items():
        getattr(paths, k).clear()
        getattr(paths, k).update(v)


def _write_clip(path, n_frames=12, seed=0):
    path.touch()
    frames = (np.random.RandomState(seed).rand(n_frames, 48, 48, 3) * 255
              ).astype(np.uint8)
    np.save(str(path) + ".frames.npy", frames)


class TestSamplingRules:
    def test_llama_vid_1fps_stride(self):
        # 100 frames at 25 fps → stride 25 → frames 0,25,50,75
        idx = llama_vid.sample_frame_indices(100, avg_fps=25.0, fps=1)
        assert list(idx) == [0, 25, 50, 75]

    def test_otter_fixed_stride(self):
        # 160 frames, 16 wanted → stride 10, starting at 0
        idx = otter.sample_frame_indices(160, num_frames=16)
        assert len(idx) == 16 and list(idx[:3]) == [0, 10, 20]
        # short video: reference rule degrades to stride 1 (indices past
        # vlen are clipped downstream by _llava_base.load_frames)
        idx = otter.sample_frame_indices(8, num_frames=16)
        assert list(idx) == list(range(16))

    def test_videochat_segment_midpoints(self):
        # 81 frames / 8 segments → seg_size 10 → start 5, stride 10
        idx = videochat.sample_frame_indices(81, num_segments=8)
        assert list(idx) == [5, 15, 25, 35, 45, 55, 65, 75]

    def test_otter_answer_parse(self):
        assert otter.parse_answer("junk<answer>  happy face <|endofchunk|>"
                                  ) == "happy face"
        assert otter.parse_answer("no marker at all") == "no marker at all"


class TestLlamaVidAdapter:
    def test_model_fn_generates(self, tiny_llava, tmp_path):
        model, tok = tiny_llava
        fn = llama_vid.build_model_fn(None, model=model, tokenizer=tok,
                                      max_new_tokens=4, do_sample=False)
        clip = tmp_path / "clip.mp4"
        _write_clip(clip, n_frames=30)
        assert isinstance(fn(str(clip), None, "I am fine.", "unused"), str)
        assert isinstance(fn(str(clip), None, None, "unused"), str)


class TestOtterAdapter:
    def test_model_fn_generates(self, tiny_llava, tmp_path):
        model, tok = tiny_llava
        fn = otter.build_model_fn(None, model=model, tokenizer=tok,
                                  max_new_tokens=4, num_frames=4)
        clip = tmp_path / "clip.mp4"
        _write_clip(clip)
        assert isinstance(fn(str(clip), None, "I am fine.", "unused"), str)


class TestVideoChatAdapter:
    def test_run_zero_shot_end_to_end(self, tiny_llava, corpus):
        model, tok = tiny_llava
        video_root = corpus / "mer2023" / "video"
        for name in NAMES:
            _write_clip(video_root / f"{name}.mp4", n_frames=10, seed=1)
        fn = videochat.build_model_fn(None, model=model, tokenizer=tok,
                                      max_new_tokens=4, num_segments=4)
        out = corpus / "out" / "result-mer2023" / "results-subtitle.npz"
        name2reason = run_zero_shot("MER2023", fn, save_npz=str(out))
        assert set(name2reason) == set(NAMES)
        loaded = np.load(out, allow_pickle=True)["name2reason"].tolist()
        assert loaded == name2reason


class TestVideoChat2Adapter:
    def test_model_fn_generates(self, tiny_llava_next_video, tmp_path):
        model, tok = tiny_llava_next_video
        fn = videochat2.build_model_fn(None, model=model, tokenizer=tok,
                                       max_new_tokens=4, num_segments=4)
        clip = tmp_path / "clip.mp4"
        _write_clip(clip)
        assert isinstance(fn(str(clip), None, "I am fine.", "unused"), str)
