"""AU agent tests: OpenFace parsing, AU prompt building, batched generation
with the tiny decoder."""

import jax
import jax.numpy as jnp

from affectgpt_tpu.models import qwen2
from affectgpt_tpu.models.au_agent import (
    AUAgent,
    NEUTRAL_DESCRIPTION,
    build_au_input,
    build_chat_prompt,
    parse_openface_row,
)
from affectgpt_tpu.tokenization import ByteTokenizer


class TestAUParsing:
    def test_parse_openface_row(self):
        row = {"frame": 1, "AU01_r": "0.98", "AU12_r": 2.5, "AU06_c": 1.0, "bad_r": "x"}
        aus = parse_openface_row(row)
        assert aus == {"AU01": 0.98, "AU12": 2.5}

    def test_build_au_input_filters_threshold(self):
        text = build_au_input({"AU01": 0.2, "AU12": 1.5})
        assert "AU12: 1.50" in text and "AU01" not in text
        assert "Lip corner puller (smile)" in text

    def test_neutral_when_all_low(self):
        assert build_au_input({"AU01": 0.1}) is None

    def test_external_description_used(self):
        text = build_au_input({"AU12": 1.0}, au_description="custom desc")
        assert "custom desc" in text

    def test_chat_prompt_template(self):
        p = build_chat_prompt("AU values: AU12: 1.00")
        assert p.startswith("<|im_start|>system\n")
        assert p.endswith("<|im_start|>assistant\n")


class TestAUAgentGenerate:
    def test_batched_generation_mixed_neutral(self):
        cfg = qwen2.QwenConfig.tiny()
        params = qwen2.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        agent = AUAgent(params, cfg, ByteTokenizer(), max_new_tokens=4)
        outs = agent.generate_descriptions(
            [{"AU12": 1.5}, {"AU01": 0.1}, {"AU04": 2.0, "AU07": 0.9}]
        )
        assert len(outs) == 3
        assert outs[1] == NEUTRAL_DESCRIPTION
        assert all(isinstance(o, str) for o in outs)
