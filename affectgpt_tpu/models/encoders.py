"""Registry-keyed frozen encoder wrappers.

The reference exposes its encoder zoo through registry names consumed by
the model config (reference: my_affectgpt/models/encoder.py:43-433,
@registry.register_visual_encoder / register_acoustic_encoder). Same
contract here: each entry bundles (hidden_size, config, init, convert,
encode-batch) so `visual_encoder: CLIP_VIT_LARGE` style YAML keys resolve
identically. encode() signatures: visual [b, t, H, W, 3] normalized
floats → [b, t, d]; acoustic [b, clips, 1, samples] → [b, clips, d].
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from affectgpt_tpu import registry
from affectgpt_tpu.models import clip_vit, hubert, vit_variants


@dataclass(frozen=True)
class EncoderSpec:
    name: str
    hidden_size: int
    make_config: Callable
    init_params: Callable  # (rng, cfg, dtype) -> params
    convert: Optional[Callable]  # model_dir -> params
    encode: Callable  # (params, cfg, batch) -> features
    # pixel-normalization scheme of the tower's own image processor
    # (reference runs each encoder's HF AutoImageProcessor,
    # encoder.py:221/262): "clip" (OpenAI stats — CLIP and EVA/BLIP2),
    # "imagenet" (DINOv2), "siglip" (0.5/0.5). ops/image.normalize_frames
    # dispatches on it; acoustic specs ignore it.
    normalize: str = "clip"


def _encode_frames(encode_one):
    def fn(params, cfg, frames):  # [b, t, H, W, 3]
        b, t = frames.shape[:2]
        flat = frames.reshape(b * t, *frames.shape[2:])
        out = encode_one(params, cfg, flat)
        return out.reshape(b, t, -1)

    return fn


def _register(namespace: str, spec: EncoderSpec):
    registry.register(namespace, spec.name)(spec)
    return spec


from affectgpt_tpu.models import convert as convert_mod  # noqa: E402

CLIP_VIT_LARGE = _register(
    "visual_encoder",
    EncoderSpec(
        name="CLIP_VIT_LARGE",
        hidden_size=768,  # projection dim (reference encoder.py:193)
        make_config=clip_vit.ClipVisionConfig.vit_l_14,
        init_params=clip_vit.init_vision_params,
        convert=convert_mod.convert_clip_vision,
        encode=_encode_frames(clip_vit.encode_image),
    ),
)

DINO2_LARGE = _register(
    "visual_encoder",
    EncoderSpec(
        name="DINO2_LARGE",
        hidden_size=1024,  # reference encoder.py:229
        make_config=vit_variants.Dinov2Config.large,
        init_params=vit_variants.init_dinov2_params,
        convert=convert_mod.convert_dinov2,
        encode=_encode_frames(vit_variants.dinov2_encode),
        normalize="imagenet",
    ),
)

SigLIP_SO = _register(
    "visual_encoder",
    EncoderSpec(
        name="SigLIP_SO",
        hidden_size=1152,  # reference encoder.py:262
        make_config=vit_variants.SiglipConfig.so400m,
        init_params=vit_variants.init_siglip_params,
        convert=convert_mod.convert_siglip_vision,
        encode=_encode_frames(vit_variants.siglip_encode),
        normalize="siglip",
    ),
)

HUBERT_LARGE = _register(
    "acoustic_encoder",
    EncoderSpec(
        name="HUBERT_LARGE",
        hidden_size=1024,
        make_config=hubert.HubertConfig.large,
        init_params=hubert.init_params,
        convert=convert_mod.convert_hubert,
        encode=hubert.encode_clips,
    ),
)

from affectgpt_tpu.models import eva_vit, wav_encoders  # noqa: E402

EVA_CLIP_G_NO_QFORMER = _register(
    "visual_encoder",
    EncoderSpec(
        name="EVA_CLIP_G_NO_QFORMER",
        hidden_size=1408,  # reference encoder.py:123-176
        make_config=eva_vit.EvaVitConfig.vit_g_14,
        init_params=eva_vit.init_params,
        convert=None,  # EVA ships raw state dicts: use eva_vit.convert_eva_state
        encode=_encode_frames(eva_vit.encode_mean),
    ),
)


def _encode_frames_blip2(params, cfg, frames):
    """EVA_CLIP_G: [b, t, H, W, 3] → [b, t, 32, 768] (reference
    encoder.py:43-122). params = {'vit': ..., 'head': ...}."""
    b, t = frames.shape[:2]
    flat = frames.reshape(b * t, *frames.shape[2:])
    out = eva_vit.encode_blip2(params["vit"], params["head"], cfg, flat)
    return out.reshape(b, t, out.shape[-2], out.shape[-1])


EVA_CLIP_G = _register(
    "visual_encoder",
    EncoderSpec(
        name="EVA_CLIP_G",
        hidden_size=768,  # BLIP2 Q-Former output width
        make_config=eva_vit.EvaVitConfig.vit_g_14,
        init_params=lambda rng, cfg, dtype=None: {
            "vit": eva_vit.init_params(rng, cfg, dtype or jnp.bfloat16),
            "head": eva_vit.init_blip2_head(jax.random.fold_in(rng, 1), cfg,
                                            dtype=dtype or jnp.bfloat16),
        },
        convert=None,
        encode=_encode_frames_blip2,
    ),
)

WAVLM_LARGE = _register(
    "acoustic_encoder",
    EncoderSpec(
        name="WAVLM_LARGE",
        hidden_size=1024,
        make_config=wav_encoders.WavLMConfig.large,
        init_params=wav_encoders.init_wavlm_params,
        convert=convert_mod.convert_wavlm,
        encode=wav_encoders.wavlm_encode_clips,
    ),
)

from affectgpt_tpu.models import imagebind_audio  # noqa: E402

IMAGEBIND = _register(
    "acoustic_encoder",
    EncoderSpec(
        name="IMAGEBIND",
        hidden_size=1024,  # projected embed dim (reference imagebind_model.py:541)
        make_config=imagebind_audio.ImageBindAudioConfig.huge,
        init_params=imagebind_audio.init_params,
        convert=None,  # raw .pth state dicts: imagebind_audio.convert_imagebind_audio
        encode=imagebind_audio.encode_clips,  # NB: consumes mel clips, not raw wav
    ),
)

DATA2VEC_BASE = _register(
    "acoustic_encoder",
    EncoderSpec(
        name="DATA2VEC_BASE",
        hidden_size=768,
        make_config=wav_encoders.Data2VecAudioConfig.base,
        init_params=wav_encoders.init_data2vec_params,
        convert=convert_mod.convert_data2vec_audio,
        encode=wav_encoders.data2vec_encode_clips,
    ),
)


def get_visual_encoder(name: str) -> EncoderSpec:
    return registry.get("visual_encoder", name)


def get_acoustic_encoder(name: str) -> EncoderSpec:
    return registry.get("acoustic_encoder", name)
