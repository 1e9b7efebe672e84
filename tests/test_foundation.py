"""Foundation tests: config merge, registry, prompts, tokenization."""

import pytest

from affectgpt_tpu import constants, prompts, registry
from affectgpt_tpu.config import Config, parse_dot_overrides
from affectgpt_tpu.tokenization import ByteTokenizer


class TestConfig:
    def test_sections_and_overrides(self, tmp_path):
        cfg_file = tmp_path / "exp1.yaml"
        cfg_file.write_text(
            """
model:
  llm_name: Qwen25
  lora_r: 16
  fusion:
    multi: attention
run:
  max_epoch: 100
  lr: 1.0e-5
datasets:
  mercaptionplus:
    ratio: 1.0
inference: {}
"""
        )
        cfg = Config.from_file(
            str(cfg_file), options=["model.lora_r=32", "run.new_key=[1,2]"]
        )
        assert cfg.name == "exp1"
        assert cfg.model.llm_name == "Qwen25"
        assert cfg.model.lora_r == 32  # override wins
        assert cfg.model.fusion.multi == "attention"
        assert cfg.run.new_key == [1, 2]
        assert cfg.run.lr == pytest.approx(1e-5)
        assert cfg.output_dir.endswith("output/exp1")

    def test_dot_override_types(self):
        tree = parse_dot_overrides(["a.b=true", "a.c=3.5", "d=null", "e=hello"])
        assert tree == {"a": {"b": True, "c": 3.5}, "d": None, "e": "hello"}

    def test_bad_override(self):
        with pytest.raises(ValueError):
            parse_dot_overrides(["noequalsign"])


class TestRegistry:
    def test_register_and_get(self):
        @registry.register("model", "_test_model")
        def factory():
            return 42

        assert registry.get("model", "_test_model") is factory
        with pytest.raises(KeyError):
            registry.get("model", "_does_not_exist")

    def test_duplicate_rejected(self):
        registry.register("task", "_dup")(int)
        with pytest.raises(KeyError):
            registry.register("task", "_dup")(float)


class TestPrompts:
    def test_needed_data_modes(self):
        assert prompts.get_needed_data("multiface_audio_face_frame_text") == [
            "frame", "face", "audio", "multi",
        ]
        assert prompts.get_needed_data("textonly") == []
        with pytest.raises(ValueError):
            prompts.get_needed_data("bogus")

    def test_prompt_face_mode(self):
        p = prompts.get_prompt_for_multimodal("face", "hello world", "How do they feel?")
        assert p.startswith("###Human: The audio content is as follows: <Audio><AudioHere></Audio>. ")
        assert "<Subtitle>hello world</Subtitle>" in p
        assert p.endswith("How do they feel? ###Assistant: ")
        assert "<FaceHere>" in p and "<FrameHere>" not in p

    def test_prompt_multi_with_nonverbal(self):
        p = prompts.get_prompt_for_multimodal(
            "multiface_audio_face_frame_au_text", "sub", "Q?", nonverbal_text="brow raise"
        )
        assert "<Multi><MultiHere></Multi>" in p
        assert "<Nonverbal>brow raise</Nonverbal>" in p
        # nonverbal part omitted when text is None
        p2 = prompts.get_prompt_for_multimodal(
            "multiface_audio_face_frame_au_text", "sub", "Q?", nonverbal_text=None
        )
        assert "<Nonverbal>" not in p2

    def test_subtitle_required(self):
        with pytest.raises(AssertionError):
            prompts.get_prompt_for_multimodal("face", None, "Q?")

    def test_patch_replication(self):
        p = prompts.get_prompt_for_multimodal("multiface_audio_face_text", "s", "Q?")
        replaced = prompts.replace_token_for_multimodal(
            p, num_video_query_token=3, num_audio_query_token=2,
            num_multi_query_token=4, num_image_query_token=1,
        )
        assert replaced.count(constants.DEFAULT_FACE_PATCH_TOKEN) == 3
        assert replaced.count(constants.DEFAULT_AUDIO_PATCH_TOKEN) == 2
        assert replaced.count(constants.DEFAULT_MULTI_PATCH_TOKEN) == 4


class TestByteTokenizer:
    def test_roundtrip_and_patch_tokens(self):
        tok = ByteTokenizer()
        text = "hi <AudioHere><AudioHere> there"
        ids = tok.encode(text)
        assert ids.count(tok.patch_token_ids["<AudioHere>"]) == 2
        assert tok.decode(ids) == text
        assert tok.decode(ids, skip_special_tokens=True) == "hi  there"

    def test_pad_is_eos(self):
        tok = ByteTokenizer()
        assert tok.pad_token_id == tok.eos_token_id

    def test_max_length(self):
        tok = ByteTokenizer()
        assert len(tok.encode("a" * 100, max_length=7)) == 7
