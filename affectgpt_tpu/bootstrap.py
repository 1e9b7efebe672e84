"""Model bootstrap shared by the CLI entry points.

Equivalent role to the reference's AffectGPT.from_config (reference:
affectgpt.py:1031-1122): resolve tokenizer + frozen weights (converted
HF checkpoints when the model dirs exist, random init otherwise so the
framework stays exercisable without downloaded assets), build trainable
params, apply the 3-tier checkpoint overlay (ckpt < ckpt_2 < ckpt_3).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from affectgpt_tpu import paths
from affectgpt_tpu.config import Config
from affectgpt_tpu.models import affectgpt, convert, qwen2
from affectgpt_tpu.tokenization import ByteTokenizer, load_tokenizer
from affectgpt_tpu.training import checkpoint

logger = logging.getLogger(__name__)


def build_tokenizer(model_cfg_node: dict):
    node = model_cfg_node or {}
    llm_name = node.get(
        "llama_model", node.get("llama_model_name", node.get("llm_name", "Qwen25"))
    )
    llm_dir = paths.PATH_TO_LLM.get(llm_name, "")
    if llm_dir and os.path.isdir(llm_dir):
        return load_tokenizer(llm_name)
    logger.warning(
        "LLM dir %s not found — using ByteTokenizer (random-weight mode)", llm_dir
    )
    return ByteTokenizer()


def build_model(
    cfg: Config,
    with_encoders: bool = False,
    dtype=jnp.bfloat16,
    seed: int = 0,
) -> Tuple[affectgpt.AffectGPTConfig, dict, dict, object]:
    """Returns (model_cfg, frozen, trainable, tokenizer)."""
    node = cfg.model.to_dict() if hasattr(cfg.model, "to_dict") else dict(cfg.model)
    tokenizer = build_tokenizer(node)
    model_cfg = affectgpt.AffectGPTConfig.from_model_cfg(node)
    if isinstance(tokenizer, ByteTokenizer):
        # shrink LLM to tiny geometry when no pretrained assets exist
        if not node.get("keep_full_llm", False):
            model_cfg = affectgpt.AffectGPTConfig(
                **{**model_cfg.__dict__, "llm": qwen2.QwenConfig.tiny(
                    vocab_size=max(tokenizer.vocab_size, 300), lora_r=model_cfg.llm.lora_r
                )}
            )

    rng = jax.random.PRNGKey(seed)
    frozen = affectgpt.init_frozen(rng, model_cfg, dtype=dtype, with_encoders=False)
    tiny_mode = isinstance(tokenizer, ByteTokenizer) and not node.get("keep_full_llm", False)
    if with_encoders and not node.get("skip_encoders", False):
        from affectgpt_tpu.models import encoders as _zoo

        vis_spec = _zoo.get_visual_encoder(
            node.get("visual_encoder", node.get("visual_encoder_name", "CLIP_VIT_LARGE"))
        )
        aud_spec = _zoo.get_acoustic_encoder(
            node.get("acoustic_encoder", node.get("acoustic_encoder_name", "HUBERT_LARGE"))
        )
        if tiny_mode:
            # random-weight smoke mode: shrink the encoder towers while
            # keeping their output dims consistent with the merger configs
            from dataclasses import replace as _replace

            from affectgpt_tpu.models import clip_vit as _cv
            from affectgpt_tpu.models import hubert as _hb

            vis_cfg = _replace(_cv.ClipVisionConfig.tiny(), projection_dim=model_cfg.visual_dim)
            aud_cfg = _replace(_hb.HubertConfig.tiny(), hidden_size=model_cfg.acoustic_dim)
            frozen["visual_encoder"] = _cv.init_vision_params(
                jax.random.fold_in(rng, 1), vis_cfg, dtype
            )
            frozen["acoustic_encoder"] = _hb.init_params(
                jax.random.fold_in(rng, 2), aud_cfg, dtype
            )
            model_cfg = affectgpt.AffectGPTConfig(
                **{**model_cfg.__dict__, "vision_cfg_override": vis_cfg,
                   "audio_cfg_override": aud_cfg}
            )
        else:
            frozen["visual_encoder"] = vis_spec.init_params(
                jax.random.fold_in(rng, 1), vis_spec.make_config(), dtype
            )
            frozen["acoustic_encoder"] = aud_spec.init_params(
                jax.random.fold_in(rng, 2), aud_spec.make_config(), dtype
            )

    llm_name = node.get(
        "llama_model", node.get("llama_model_name", node.get("llm_name", "Qwen25"))
    )
    llm_dir = paths.PATH_TO_LLM.get(llm_name, "")
    if llm_dir and os.path.isdir(llm_dir):
        logger.info("Converting LLM weights from %s", llm_dir)
        llm_convert = (
            convert.convert_baichuan2 if llm_name == "Baichuan2" else convert.convert_qwen2
        )
        frozen["llm"] = jax.tree.map(
            lambda x: jnp.asarray(x, dtype=dtype), llm_convert(llm_dir)
        )
    # encoder weights via the registry zoo (visual_encoder/acoustic_encoder
    # YAML keys carry the reference's names; reference affectgpt.py:141-148)
    from affectgpt_tpu.models import encoders as encoder_zoo

    vis_name = node.get("visual_encoder", node.get("visual_encoder_name", "CLIP_VIT_LARGE"))
    aud_name = node.get("acoustic_encoder", node.get("acoustic_encoder_name", "HUBERT_LARGE"))
    if "visual_encoder" in frozen:
        spec = encoder_zoo.get_visual_encoder(vis_name)
        vis_dir = paths.PATH_TO_VISUAL.get(vis_name, "")
        if spec.convert and vis_dir and os.path.isdir(vis_dir):
            frozen["visual_encoder"] = jax.tree.map(
                lambda x: jnp.asarray(x, dtype=dtype), spec.convert(vis_dir)
            )
    if "acoustic_encoder" in frozen:
        spec = encoder_zoo.get_acoustic_encoder(aud_name)
        aud_dir = paths.PATH_TO_AUDIO.get(aud_name, "")
        if spec.convert and aud_dir and os.path.isdir(aud_dir):
            frozen["acoustic_encoder"] = jax.tree.map(
                lambda x: jnp.asarray(x, dtype=dtype), spec.convert(aud_dir)
            )

    if node.get("int8", False):
        # serving mode: per-channel int8 decoder weights (quantized on device —
        # see CLAUDE.md: host→device relay transfers are too slow for 7B)
        frozen["llm"] = qwen2.quantize_params(frozen["llm"])

    trainable = affectgpt.init_trainable(jax.random.PRNGKey(seed + 1), model_cfg)
    trainable = checkpoint.apply_checkpoint_overlays(
        trainable, node.get("ckpt"), node.get("ckpt_2"), node.get("ckpt_3")
    )
    return model_cfg, frozen, trainable, tokenizer
