"""int8 serving mode end-to-end: bootstrap flag → quantized decoder →
batched chat answer (XLA int8 path on CPU)."""

import jax.numpy as jnp
import numpy as np

from affectgpt_tpu.bootstrap import build_model
from affectgpt_tpu.config import Config
from affectgpt_tpu.inference.chat import Chat


def test_int8_bootstrap_chat_roundtrip():
    cfg = Config.from_dict(
        {"model": {"llama_model": "tiny", "int8": True, "lora_r": 2,
                   "num_video_query_token": 2, "num_audio_query_token": 2}}
    )
    model_cfg, frozen, trainable, tok = build_model(cfg)
    # decoder projections quantized, embeddings left bf16/fp
    layer0 = frozen["llm"]["layers"][0]
    assert "w_q" in layer0["q_proj"] and layer0["q_proj"]["w_q"].dtype == jnp.int8
    assert "table" in frozen["llm"]["embed_tokens"]

    chat = Chat(frozen, trainable, model_cfg, tok, max_len=1024)
    feats = {
        "face": jnp.asarray(np.random.RandomState(0).randn(2, 8, model_cfg.visual_dim), jnp.float32),
        "audio": jnp.asarray(np.random.RandomState(1).randn(2, 8, model_cfg.acoustic_dim), jnp.float32),
    }
    out = chat.answer_batch(
        "multiface_audio_face_text", ["hello", "there"], "Feel?", feats,
        max_new_tokens=4, do_sample=False,
    )
    assert len(out) == 2 and all(isinstance(o, str) for o in out)
