"""Tenth OV-MER adapter: mPLUG-Owl-style video harness (reference
OV-MER/mPLUG-Owl/main-video.py) — 4 uniform frames, flamingo-style
conversation template with a <|video|> placeholder, top-k sampling,
empty-string failure fallback — driven on a tiny random HF model and
end-to-end through ovmer.zero_shot_harness."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from affectgpt_tpu import paths
from ovmer.adapters import mplug_owl
from ovmer.zero_shot_harness import run_zero_shot
from tests.synth_corpus import NAMES, build_corpus
from tests.test_ovmer_adapters_more import tiny_llava  # noqa: F401


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


def test_uniform_sampling_rule():
    assert list(mplug_owl.sample_frame_indices(100, 4)) == [0, 33, 66, 99]
    assert list(mplug_owl.sample_frame_indices(1, 4)) == [0, 0, 0, 0]


def test_conversation_template_matches_reference():
    text = mplug_owl.CONVERSATION_TEMPLATE.format(user_message="Q?")
    assert "<|video|>" in text
    assert text.endswith("AI: ")
    # the reference's triple-quoted literal keeps 12-space indentation
    assert "\n            Human: <|video|>" in text


def test_model_fn_generates(tiny_llava, tmp_path):
    model, tok = tiny_llava
    torch.manual_seed(0)
    fn = mplug_owl.build_model_fn(None, model=model, tokenizer=tok,
                                  max_length=8, num_frames=4)
    clip = tmp_path / "clip.mp4"
    _write_clip(clip)
    assert isinstance(fn(str(clip), None, "I am fine.", "unused"), str)
    assert isinstance(fn(str(clip), None, None, "unused"), str)


def test_run_zero_shot_end_to_end(tiny_llava, corpus):
    model, tok = tiny_llava
    torch.manual_seed(0)
    video_root = corpus / "mer2023" / "video"
    for name in NAMES:
        _write_clip(video_root / f"{name}.mp4", n_frames=10, seed=1)
    fn = mplug_owl.build_model_fn(None, model=model, tokenizer=tok,
                                  max_length=8, num_frames=4)
    out = corpus / "out" / "result-mer2023" / "results-subtitle.npz"
    name2reason = run_zero_shot("MER2023", fn, save_npz=str(out))
    assert set(name2reason) == set(NAMES)
