"""ImageBind audio encoder (mel-spectrogram ViT), TPU-native.

Registry alternate completing the reference's acoustic zoo (reference:
my_affectgpt/models/encoder.py:285-310 IMAGEBIND;
ImageBind/models/imagebind_model.py:477-511 get_audio_feature,
:137-207 audio stem, :514-541 imagebind_huge → hidden 1024).

Geometry (imagebind_huge audio branch): normalized log-mel clips
[B, S, 1, 128, 204] → overlapping Conv2d patches (k=16, s=10 → 12×19 =
228 tokens) + LayerNorm → cls token + learned position embeddings →
12-block pre-LN ViT (width 768, 12 heads, MLP 3072) → head LayerNorm →
cls select → 768→1024 linear (no bias) → L2-normalize × logit scale 20.
The reference wrapper consumes the projected 1024-d clip embeddings.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from affectgpt_tpu.models import nn


@dataclass(frozen=True)
class ImageBindAudioConfig:
    num_mel_bins: int = 128
    target_len: int = 204
    kernel_size: int = 16
    stride: int = 10
    width: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    out_embed_dim: int = 1024
    logit_scale: float = 20.0
    layer_norm_eps: float = 1e-6

    @property
    def patch_grid(self):
        h = (self.num_mel_bins - self.kernel_size) // self.stride + 1
        w = (self.target_len - self.kernel_size) // self.stride + 1
        return h, w

    @classmethod
    def huge(cls):
        return cls()

    @classmethod
    def tiny(cls):
        return cls(num_mel_bins=32, target_len=48, kernel_size=16, stride=10,
                   width=16, num_layers=2, num_heads=2, mlp_dim=32, out_embed_dim=12)


def init_params(rng: jax.Array, cfg: ImageBindAudioConfig, dtype=jnp.bfloat16) -> dict:
    keys = jax.random.split(rng, cfg.num_layers + 5)
    h, w = cfg.patch_grid
    blocks = []
    for i in range(cfg.num_layers):
        k = jax.random.split(keys[4 + i], 3)
        blocks.append(
            {
                "ln1": nn.layernorm_init(cfg.width, dtype=dtype),
                "attn": nn.mha_init(k[0], cfg.width, cfg.width, cfg.num_heads, dtype=dtype),
                "ln2": nn.layernorm_init(cfg.width, dtype=dtype),
                "mlp_in": nn.dense_init(k[1], cfg.width, cfg.mlp_dim, dtype=dtype),
                "mlp_out": nn.dense_init(k[2], cfg.mlp_dim, cfg.width, dtype=dtype),
            }
        )
    return {
        # conv kernel torch layout [out, in=1, kh, kw]
        "stem_conv": {
            "w": (jax.random.normal(keys[0], (cfg.width, 1, cfg.kernel_size, cfg.kernel_size))
                  * 0.02).astype(dtype),
        },
        "stem_ln": nn.layernorm_init(cfg.width, dtype=dtype),
        "cls_token": jnp.zeros((cfg.width,), dtype=dtype),
        "pos_embed": {"table": (jax.random.normal(keys[1], (h * w + 1, cfg.width)) * 0.02).astype(dtype)},
        "blocks": blocks,
        "head_ln": nn.layernorm_init(cfg.width, dtype=dtype),
        "head_proj": nn.dense_nobias_init(keys[2], cfg.width, cfg.out_embed_dim, dtype=dtype),
    }


def encode_mels(params: dict, cfg: ImageBindAudioConfig, mels: jnp.ndarray) -> jnp.ndarray:
    """[b, 1, mel_bins, target_len] normalized log-mels → [b, out_embed_dim]."""
    x = jax.lax.conv_general_dilated(
        mels.astype(params["cls_token"].dtype), params["stem_conv"]["w"].astype(mels.dtype),
        window_strides=(cfg.stride, cfg.stride), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )  # [b, width, h, w]
    b, d, h, w = x.shape
    x = jnp.transpose(x.reshape(b, d, h * w), (0, 2, 1))  # [b, tokens, width]
    x = nn.layernorm(params["stem_ln"], x, cfg.layer_norm_eps)
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, d)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"]["table"][None, : x.shape[1]].astype(x.dtype)
    for blk in params["blocks"]:
        hstate = nn.layernorm(blk["ln1"], x, cfg.layer_norm_eps)
        x = x + nn.mha(blk["attn"], hstate, hstate, cfg.num_heads)
        hstate = nn.layernorm(blk["ln2"], x, cfg.layer_norm_eps)
        x = x + nn.dense(blk["mlp_out"], nn.gelu(nn.dense(blk["mlp_in"], hstate)))
    pooled = nn.layernorm(params["head_ln"], x[:, 0], cfg.layer_norm_eps)
    proj = nn.dense_nobias(params["head_proj"], pooled).astype(jnp.float32)
    proj = proj / jnp.maximum(jnp.linalg.norm(proj, axis=-1, keepdims=True), 1e-8)
    return (proj * cfg.logit_scale).astype(pooled.dtype)


def encode_clips(params: dict, cfg: ImageBindAudioConfig, mel_clips: jnp.ndarray) -> jnp.ndarray:
    """[b, clips, 1, mel, frames] (the reference's audio tensor layout)
    → [b, clips, out_embed_dim]."""
    b, s = mel_clips.shape[:2]
    flat = mel_clips.reshape(b * s, *mel_clips.shape[2:])
    return encode_mels(params, cfg, flat).reshape(b, s, -1)


def convert_imagebind_audio(state: dict, dtype=None) -> dict:
    """ImageBind huge checkpoint state dict → this layout (audio branch).
    Accepts torch tensors or numpy arrays keyed by the reference names."""
    import numpy as np

    def arr(key):
        value = state[key]
        value = value.numpy() if hasattr(value, "numpy") else np.asarray(value)
        return value.astype(dtype) if dtype else value

    pre = "modality_preprocessors.audio"
    trunk = "modality_trunks.audio"
    blocks = []
    i = 0
    while f"{trunk}.blocks.{i}.norm_1.weight" in state:
        p = f"{trunk}.blocks.{i}"
        in_w = arr(f"{p}.attn.in_proj_weight")  # [3d, d]
        in_b = arr(f"{p}.attn.in_proj_bias")
        d = in_w.shape[1]
        qw, kw, vw = in_w[:d], in_w[d : 2 * d], in_w[2 * d :]
        qb, kb, vb = in_b[:d], in_b[d : 2 * d], in_b[2 * d :]
        blocks.append(
            {
                "ln1": {"scale": arr(f"{p}.norm_1.weight"), "bias": arr(f"{p}.norm_1.bias")},
                "attn": {
                    "q": {"w": np.ascontiguousarray(qw.T), "b": qb},
                    "k": {"w": np.ascontiguousarray(kw.T), "b": kb},
                    "v": {"w": np.ascontiguousarray(vw.T), "b": vb},
                    "o": {"w": np.ascontiguousarray(arr(f"{p}.attn.out_proj.weight").T),
                          "b": arr(f"{p}.attn.out_proj.bias")},
                },
                "ln2": {"scale": arr(f"{p}.norm_2.weight"), "bias": arr(f"{p}.norm_2.bias")},
                "mlp_in": {"w": np.ascontiguousarray(arr(f"{p}.mlp.fc1.weight").T),
                           "b": arr(f"{p}.mlp.fc1.bias")},
                "mlp_out": {"w": np.ascontiguousarray(arr(f"{p}.mlp.fc2.weight").T),
                            "b": arr(f"{p}.mlp.fc2.bias")},
            }
        )
        i += 1
    return {
        "stem_conv": {"w": arr(f"{pre}.audio_stem.proj.0.weight")},
        "stem_ln": {"scale": arr(f"{pre}.audio_stem.norm_layer.weight"),
                    "bias": arr(f"{pre}.audio_stem.norm_layer.bias")},
        "cls_token": arr(f"{pre}.cls_token").reshape(-1),
        "pos_embed": {"table": arr(f"{pre}.pos_embedding_helper.pos_embed")[0]},
        "blocks": blocks,
        "head_ln": {"scale": arr("modality_heads.audio.0.weight"),
                    "bias": arr("modality_heads.audio.0.bias")},
        "head_proj": {"w": np.ascontiguousarray(arr("modality_heads.audio.2.weight").T)},
    }
