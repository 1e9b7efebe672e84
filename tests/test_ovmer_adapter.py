"""Worked OV-MER adapter: a tiny random HF VideoLlava driven through
ovmer.adapters.videollava + run_zero_shot over a synthetic corpus,
proving the harness's model_fn contract on a real third-party MLLM
implementation (not self-use)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from affectgpt_tpu import paths
from ovmer.adapters import videollava
from ovmer.zero_shot_harness import run_zero_shot
from tests.synth_corpus import NAMES, build_corpus


@pytest.fixture(scope="module")
def tiny_videollava():
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import (CLIPVisionConfig, LlamaConfig,
                              PreTrainedTokenizerFast, VideoLlavaConfig,
                              VideoLlavaForConditionalGeneration)

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        vocab_size=300,
        special_tokens=["<unk>", "<s>", "</s>", "<pad>", "<video>", "<image>"],
    )
    tok.train_from_iterator(
        ["USER: ASSISTANT: the emotional state of the individual is happy sad "
         "neutral video subtitle content expert"], trainer,
    )
    hf_tok = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>", pad_token="<pad>",
    )
    vision = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=56, patch_size=14,
    )
    text = LlamaConfig(
        vocab_size=512, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
    )
    cfg = VideoLlavaConfig(
        vision_config=vision, text_config=text,
        video_token_index=hf_tok.convert_tokens_to_ids("<video>"),
        image_token_index=hf_tok.convert_tokens_to_ids("<image>"),
    )
    torch.manual_seed(0)
    model = VideoLlavaForConditionalGeneration(cfg).eval()
    return model, hf_tok


class TestVideoLlavaAdapter:
    def test_model_fn_generates(self, tiny_videollava, tmp_path):
        model, tok = tiny_videollava
        fn = videollava.build_model_fn(None, model=model, tokenizer=tok,
                                       max_new_tokens=6)
        video = tmp_path / "clip.mp4"
        video.touch()
        frames = (np.random.RandomState(0).rand(12, 64, 64, 3) * 255).astype(np.uint8)
        np.save(str(video) + ".frames.npy", frames)  # media fallback decode
        reply = fn(str(video), None, "I am fine.", "unused")
        assert isinstance(reply, str)
        # subtitle toggles the prompt variant
        reply2 = fn(str(video), None, None, "unused")
        assert isinstance(reply2, str)

    def test_run_zero_shot_end_to_end(self, tiny_videollava, tmp_path):
        model, tok = tiny_videollava
        overrides, _ = build_corpus(tmp_path)
        saved = {k: dict(getattr(paths, k)) for k in overrides}
        paths.update_from_dict(overrides)
        try:
            video_root = tmp_path / "mer2023" / "video"
            for name in NAMES:
                video = video_root / f"{name}.mp4"
                video.touch()
                frames = (np.random.RandomState(1).rand(10, 48, 48, 3) * 255).astype(np.uint8)
                np.save(str(video) + ".frames.npy", frames)
            fn = videollava.build_model_fn(None, model=model, tokenizer=tok,
                                           max_new_tokens=4)
            out = tmp_path / "out" / "result-mer2023" / "0.npz"
            name2reason = run_zero_shot("MER2023", fn, save_npz=str(out))
            assert set(name2reason) == set(NAMES)
            loaded = np.load(out, allow_pickle=True)["name2reason"].tolist()
            assert loaded == name2reason
        finally:
            for k, v in saved.items():
                getattr(paths, k).clear()
                getattr(paths, k).update(v)

    def test_token_expansion_matches_vision_geometry(self, tiny_videollava):
        model, _ = tiny_videollava
        # 56/14 → 16 patches + CLS, × 8 frames
        assert videollava.num_video_tokens(model.config) == 136
