"""Fourth + fifth OV-MER adapters: a SALMONN-style AUDIO-side harness
(reference OV-MER/SALMONN/main-audio.py contract) recomposed as a tiny
random Whisper → causal-LM pipeline, and a Video-ChatGPT-style video
harness (reference OV-MER/Video-ChatGPT/main-video.py contract) on a
tiny random LlavaNextVideo, both driven end-to-end through
ovmer.zero_shot_harness."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from affectgpt_tpu import paths
from ovmer.adapters import salmonn, video_chatgpt
from ovmer.zero_shot_harness import run_zero_shot
from tests.synth_corpus import NAMES, build_corpus
from tests.test_ovmer_adapters_more import _tiny_tokenizer


@pytest.fixture(scope="module")
def tiny_whisper():
    from transformers import (WhisperConfig, WhisperFeatureExtractor,
                              WhisperForConditionalGeneration)

    cfg = WhisperConfig(
        vocab_size=64, num_mel_bins=16, d_model=32,
        encoder_layers=2, encoder_attention_heads=4, encoder_ffn_dim=64,
        decoder_layers=2, decoder_attention_heads=4, decoder_ffn_dim=64,
        max_source_positions=200, max_target_positions=64,
        bos_token_id=1, eos_token_id=2, pad_token_id=3,
        decoder_start_token_id=1, begin_suppress_tokens=None,
        suppress_tokens=None, forced_decoder_ids=None,
    )
    torch.manual_seed(0)
    model = WhisperForConditionalGeneration(cfg).eval()
    model.generation_config.begin_suppress_tokens = None
    model.generation_config.suppress_tokens = None
    model.generation_config.forced_decoder_ids = None
    feat = WhisperFeatureExtractor(feature_size=16, sampling_rate=16000,
                                   hop_length=160, chunk_length=4, n_fft=400)

    # minimal duck-typed processor: the adapter only touches
    # feature_extractor.sampling_rate, __call__ and batch_decode
    hf_tok = _tiny_tokenizer("<|startoftranscript|>")

    class MiniProcessor:
        def __init__(self, feature_extractor, tokenizer):
            self.feature_extractor = feature_extractor
            self.tokenizer = tokenizer

        def __call__(self, *args, **kwargs):
            return self.feature_extractor(*args, **kwargs)

        def batch_decode(self, ids, **kwargs):
            return self.tokenizer.batch_decode(ids, **kwargs)

    return model, MiniProcessor(feat, hf_tok)


@pytest.fixture(scope="module")
def tiny_llm():
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(vocab_size=512, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=4)
    torch.manual_seed(1)
    return LlamaForCausalLM(cfg).eval(), _tiny_tokenizer("<extra>")


@pytest.fixture(scope="module")
def tiny_llava_next_video():
    from transformers import (CLIPVisionConfig, LlamaConfig,
                              LlavaNextVideoConfig,
                              LlavaNextVideoForConditionalGeneration)

    hf_tok = _tiny_tokenizer("<video>")
    vision = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                              num_hidden_layers=2, num_attention_heads=4,
                              image_size=28, patch_size=14)
    text = LlamaConfig(vocab_size=512, hidden_size=32, intermediate_size=64,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=4)
    cfg = LlavaNextVideoConfig(
        vision_config=vision, text_config=text,
        video_token_index=hf_tok.convert_tokens_to_ids("<video>"),
        image_grid_pinpoints=[[28, 28]], spatial_pool_stride=2,
    )
    torch.manual_seed(0)
    return LlavaNextVideoForConditionalGeneration(cfg).eval(), hf_tok


@pytest.fixture()
def corpus(tmp_path):
    overrides, feat_root = build_corpus(tmp_path)
    saved = {k: dict(getattr(paths, k)) for k in overrides}
    paths.update_from_dict(overrides)
    yield tmp_path
    for k, v in saved.items():
        getattr(paths, k).clear()
        getattr(paths, k).update(v)


class TestSalmonnAdapter:
    def test_model_fn_generates(self, tiny_whisper, tiny_llm, tmp_path):
        from tests.synth_corpus import write_wav

        whisper, proc = tiny_whisper
        llm, tok = tiny_llm
        fn = salmonn.build_model_fn(None, None, whisper=whisper,
                                    whisper_processor=proc, llm=llm,
                                    llm_tokenizer=tok, max_new_tokens=4)
        wav_path = tmp_path / "clip.wav"
        write_wav(wav_path, np.random.RandomState(0).randn(8000) * 0.1)
        reply = fn(None, str(wav_path), "I am fine.", "unused")
        assert isinstance(reply, str)
        reply2 = fn(None, str(wav_path), None, "unused")
        assert isinstance(reply2, str)

    def test_missing_audio_yields_empty(self, tiny_whisper, tiny_llm):
        """The reference driver's try/except contract: failed clips score
        as empty responses (main-audio.py:82-97)."""
        whisper, proc = tiny_whisper
        llm, tok = tiny_llm
        fn = salmonn.build_model_fn(None, None, whisper=whisper,
                                    whisper_processor=proc, llm=llm,
                                    llm_tokenizer=tok, max_new_tokens=4)
        assert fn(None, "/nonexistent/clip.wav", None, "unused") == ""

    def test_run_zero_shot_audio_side(self, tiny_whisper, tiny_llm, corpus):
        whisper, proc = tiny_whisper
        llm, tok = tiny_llm
        fn = salmonn.build_model_fn(None, None, whisper=whisper,
                                    whisper_processor=proc, llm=llm,
                                    llm_tokenizer=tok, max_new_tokens=4)
        out = corpus / "out" / "result-mer2023" / "results-subtitle.npz"
        name2reason = run_zero_shot("MER2023", fn, save_npz=str(out))
        assert set(name2reason) == set(NAMES)
        loaded = np.load(out, allow_pickle=True)["name2reason"].tolist()
        assert loaded == name2reason


class TestVideoChatGPTAdapter:
    def test_run_zero_shot_video_side(self, tiny_llava_next_video, corpus):
        model, tok = tiny_llava_next_video
        fn = video_chatgpt.build_model_fn(None, model=model, tokenizer=tok,
                                          max_new_tokens=4, num_frames=4)
        out = corpus / "out" / "result-mer2023" / "results-subtitle.npz"
        name2reason = run_zero_shot("MER2023", fn, save_npz=str(out))
        assert set(name2reason) == set(NAMES)
        for reply in name2reason.values():
            assert isinstance(reply, str)
