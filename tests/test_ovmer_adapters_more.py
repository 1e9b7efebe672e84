"""Second + third OV-MER adapters: a Qwen-Audio-style AUDIO-side harness
(reference OV-MER/Qwen-Audio/main-audio.py contract) on a tiny random
Qwen2Audio, and a Chat-UniVi-style video harness (reference
OV-MER/Chat-UniVi/main-video.py contract) on a tiny random Llava, both
driven end-to-end through ovmer.zero_shot_harness."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from affectgpt_tpu import paths
from ovmer.adapters import chat_univi, qwen_audio
from ovmer.zero_shot_harness import run_zero_shot
from tests.synth_corpus import NAMES, build_corpus


def _tiny_tokenizer(extra_special):
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        vocab_size=300,
        special_tokens=["<unk>", "<s>", "</s>", "<pad>", extra_special],
    )
    tok.train_from_iterator(
        ["USER: ASSISTANT: Audio 1 the emotional state of the individual is "
         "happy sad subtitle content expert acoustic video"], trainer,
    )
    hf_tok = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>", pad_token="<pad>",
    )
    hf_tok.add_special_tokens({"additional_special_tokens": [extra_special]})
    return hf_tok


@pytest.fixture(scope="module")
def tiny_qwen2audio():
    from transformers import (Qwen2AudioConfig, Qwen2AudioEncoderConfig,
                              Qwen2AudioForConditionalGeneration,
                              Qwen2AudioProcessor, Qwen2Config,
                              WhisperFeatureExtractor)

    hf_tok = _tiny_tokenizer("<|AUDIO|>")
    feat = WhisperFeatureExtractor(feature_size=16, sampling_rate=16000,
                                   hop_length=160, chunk_length=4, n_fft=400)
    proc = Qwen2AudioProcessor(feature_extractor=feat, tokenizer=hf_tok)
    audio_cfg = Qwen2AudioEncoderConfig(
        num_mel_bins=16, d_model=32, encoder_layers=2,
        encoder_attention_heads=4, encoder_ffn_dim=64, max_source_positions=200,
    )
    text_cfg = Qwen2Config(vocab_size=400, hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           num_key_value_heads=2)
    cfg = Qwen2AudioConfig(
        audio_config=audio_cfg, text_config=text_cfg,
        audio_token_index=hf_tok.convert_tokens_to_ids("<|AUDIO|>"),
    )
    torch.manual_seed(0)
    return Qwen2AudioForConditionalGeneration(cfg).eval(), proc


@pytest.fixture(scope="module")
def tiny_llava():
    from transformers import (CLIPVisionConfig, LlamaConfig, LlavaConfig,
                              LlavaForConditionalGeneration)

    hf_tok = _tiny_tokenizer("<image>")
    vision = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                              num_hidden_layers=2, num_attention_heads=4,
                              image_size=28, patch_size=14)
    text = LlamaConfig(vocab_size=512, hidden_size=32, intermediate_size=64,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=4)
    cfg = LlavaConfig(vision_config=vision, text_config=text,
                      image_token_index=hf_tok.convert_tokens_to_ids("<image>"))
    torch.manual_seed(0)
    return LlavaForConditionalGeneration(cfg).eval(), hf_tok


@pytest.fixture()
def corpus(tmp_path):
    overrides, feat_root = build_corpus(tmp_path)
    saved = {k: dict(getattr(paths, k)) for k in overrides}
    paths.update_from_dict(overrides)
    yield tmp_path
    for k, v in saved.items():
        getattr(paths, k).clear()
        getattr(paths, k).update(v)


class TestQwenAudioAdapter:
    def test_model_fn_generates(self, tiny_qwen2audio, tmp_path):
        from tests.synth_corpus import write_wav

        model, proc = tiny_qwen2audio
        fn = qwen_audio.build_model_fn(None, model=model, processor=proc,
                                       max_new_tokens=4)
        wav_path = tmp_path / "clip.wav"
        write_wav(wav_path, np.random.RandomState(0).randn(8000) * 0.1)
        reply = fn(None, str(wav_path), "I am fine.", "unused")
        assert isinstance(reply, str)
        reply2 = fn(None, str(wav_path), None, "unused")
        assert isinstance(reply2, str)

    def test_run_zero_shot_audio_side(self, tiny_qwen2audio, corpus):
        """The main-audio.py contract: audio-only iteration over the test
        split, name2reason npz out."""
        model, proc = tiny_qwen2audio
        fn = qwen_audio.build_model_fn(None, model=model, processor=proc,
                                       max_new_tokens=4)
        out = corpus / "out" / "result-mer2023" / "results-subtitle.npz"
        name2reason = run_zero_shot("MER2023", fn, save_npz=str(out))
        assert set(name2reason) == set(NAMES)
        loaded = np.load(out, allow_pickle=True)["name2reason"].tolist()
        assert loaded == name2reason

    def test_resample(self):
        wav = np.sin(np.linspace(0, 40 * np.pi, 44100)).astype(np.float32)
        out = qwen_audio._resample_linear(wav, 44100, 16000)
        assert out.shape[0] == 16000
        assert np.abs(out).max() <= 1.01


class TestChatUniViAdapter:
    def test_sampling_rule(self):
        # 250 frames at 25 fps, 1 fps target → stride 25 → 10 frames
        idx = chat_univi.sample_frame_indices(250, 25.0, 1, max_frames=100)
        assert list(idx) == list(range(0, 250, 25))
        # cap: 1000 frames at 1 fps stride 1 → linspace down to max_frames
        idx = chat_univi.sample_frame_indices(1000, 1.0, 1, max_frames=100)
        assert len(idx) == 100 and idx[0] == 0 and idx[-1] == 999

    def test_model_fn_generates(self, tiny_llava, tmp_path):
        model, tok = tiny_llava
        fn = chat_univi.build_model_fn(None, model=model, tokenizer=tok,
                                       max_new_tokens=4, max_frames=4)
        video = tmp_path / "clip.mp4"
        video.touch()
        frames = (np.random.RandomState(0).rand(12, 48, 48, 3) * 255).astype(np.uint8)
        np.save(str(video) + ".frames.npy", frames)
        reply = fn(str(video), None, "I am fine.", "unused")
        assert isinstance(reply, str)

    def test_run_zero_shot_end_to_end(self, tiny_llava, corpus):
        model, tok = tiny_llava
        video_root = corpus / "mer2023" / "video"
        for name in NAMES:
            video = video_root / f"{name}.mp4"
            video.touch()
            frames = (np.random.RandomState(1).rand(10, 48, 48, 3) * 255).astype(np.uint8)
            np.save(str(video) + ".frames.npy", frames)
        fn = chat_univi.build_model_fn(None, model=model, tokenizer=tok,
                                       max_new_tokens=4, max_frames=4)
        out = corpus / "out" / "result-mer2023" / "results-nosubtitle.npz"
        name2reason = run_zero_shot("MER2023", fn, save_npz=str(out),
                                    with_subtitle=False)
        assert set(name2reason) == set(NAMES)
