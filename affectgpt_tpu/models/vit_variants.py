"""Alternate visual encoders: DINOv2 and SigLIP towers.

Registry alternates to the production CLIP encoder, mirroring the
reference's encoder zoo (reference: my_affectgpt/models/encoder.py:212-249
DINO2_LARGE — last hidden state mean over cls+patch tokens → [b, t, 1024];
:249-281 SigLIP_SO — same pooling → [b, t, 1152]).

Architecture notes (matching HF):
- DINOv2: pre-LN ViT with LayerScale per residual branch, CLS token,
  interpolatable position embeddings, plain-MLP (ViT-L) with exact gelu.
- SigLIP: pre-LN ViT, no CLS token, gelu_tanh MLP, learned position
  embeddings; the reference pools hidden states itself so the
  attention-pool head is not needed.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from affectgpt_tpu.models import nn
from affectgpt_tpu.models.clip_vit import patchify


@dataclass(frozen=True)
class Dinov2Config:
    image_size: int = 224  # pos-embed grid reference (518 for released ckpts)
    patch_size: int = 14
    width: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_dim: int = 4096
    layer_norm_eps: float = 1e-6

    @classmethod
    def large(cls, image_size: int = 518):
        return cls(image_size=image_size)

    @classmethod
    def tiny(cls):
        return cls(image_size=28, patch_size=14, width=16, num_layers=2,
                   num_heads=2, mlp_dim=32)


def init_dinov2_params(rng: jax.Array, cfg: Dinov2Config, dtype=jnp.bfloat16) -> dict:
    keys = jax.random.split(rng, cfg.num_layers + 4)
    n_patches = (cfg.image_size // cfg.patch_size) ** 2
    blocks = []
    for i in range(cfg.num_layers):
        k = jax.random.split(keys[3 + i], 3)
        blocks.append(
            {
                "ln1": nn.layernorm_init(cfg.width, dtype=dtype),
                "attn": nn.mha_init(k[0], cfg.width, cfg.width, cfg.num_heads, dtype=dtype),
                "ls1": jnp.ones((cfg.width,), dtype=dtype),  # LayerScale lambda
                "ln2": nn.layernorm_init(cfg.width, dtype=dtype),
                "mlp_in": nn.dense_init(k[1], cfg.width, cfg.mlp_dim, dtype=dtype),
                "mlp_out": nn.dense_init(k[2], cfg.mlp_dim, cfg.width, dtype=dtype),
                "ls2": jnp.ones((cfg.width,), dtype=dtype),
            }
        )
    return {
        "patch_embed": nn.dense_init(keys[0], cfg.patch_size**2 * 3, cfg.width, dtype=dtype),
        "cls_token": (jax.random.normal(keys[1], (cfg.width,)) * 0.02).astype(dtype),
        "pos_embed": {"table": (jax.random.normal(keys[2], (n_patches + 1, cfg.width)) * 0.02).astype(dtype)},
        "blocks": blocks,
        "final_ln": nn.layernorm_init(cfg.width, dtype=dtype),
    }


def dinov2_encode(params: dict, cfg: Dinov2Config, images: jnp.ndarray) -> jnp.ndarray:
    """[b, H, W, 3] (ImageNet-normalized) → [b, width]: mean of the final
    hidden states over all tokens (the reference's pooling,
    encoder.py:240-242)."""
    b, H, W, _ = images.shape
    x = nn.dense(params["patch_embed"], patchify(images.astype(params["cls_token"].dtype), cfg.patch_size))
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.width)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    pos = params["pos_embed"]["table"]
    if pos.shape[0] != x.shape[1]:
        pos = _interpolate_pos(pos, x.shape[1] - 1, cfg)
    x = x + pos[None].astype(x.dtype)
    for blk in params["blocks"]:
        h = nn.mha(blk["attn"], nn.layernorm(blk["ln1"], x, cfg.layer_norm_eps),
                   nn.layernorm(blk["ln1"], x, cfg.layer_norm_eps), cfg.num_heads)
        x = x + h * blk["ls1"].astype(x.dtype)
        h = nn.dense(blk["mlp_out"], nn.gelu(nn.dense(blk["mlp_in"],
                     nn.layernorm(blk["ln2"], x, cfg.layer_norm_eps))))
        x = x + h * blk["ls2"].astype(x.dtype)
    x = nn.layernorm(params["final_ln"], x, cfg.layer_norm_eps)
    return jnp.mean(x, axis=1)


def _interpolate_pos(pos, n_patches_target, cfg):
    """Bilinear resize of the patch position grid (HF interpolate_pos_encoding)."""
    cls_pos, patch_pos = pos[:1], pos[1:]
    src = int(patch_pos.shape[0] ** 0.5)
    dst = int(n_patches_target**0.5)
    grid = patch_pos.reshape(src, src, -1)
    grid = jax.image.resize(grid.astype(jnp.float32), (dst, dst, grid.shape[-1]), "bicubic")
    return jnp.concatenate([cls_pos, grid.reshape(dst * dst, -1).astype(pos.dtype)], axis=0)


@dataclass(frozen=True)
class SiglipConfig:
    image_size: int = 384
    patch_size: int = 14
    width: int = 1152
    num_layers: int = 27
    num_heads: int = 16
    mlp_dim: int = 4304
    layer_norm_eps: float = 1e-6

    @classmethod
    def so400m(cls):
        """siglip-so400m-patch14-384, the reference's SigLIP_SO
        (encoder.py:249: hidden 1152)."""
        return cls()

    @classmethod
    def tiny(cls):
        return cls(image_size=32, patch_size=16, width=16, num_layers=2,
                   num_heads=2, mlp_dim=32)


def init_siglip_params(rng: jax.Array, cfg: SiglipConfig, dtype=jnp.bfloat16) -> dict:
    keys = jax.random.split(rng, cfg.num_layers + 3)
    n_patches = (cfg.image_size // cfg.patch_size) ** 2
    blocks = []
    for i in range(cfg.num_layers):
        k = jax.random.split(keys[2 + i], 3)
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
        "patch_embed": nn.dense_init(keys[0], cfg.patch_size**2 * 3, cfg.width, dtype=dtype),
        "pos_embed": {"table": (jax.random.normal(keys[1], (n_patches, cfg.width)) * 0.02).astype(dtype)},
        "blocks": blocks,
        "post_ln": nn.layernorm_init(cfg.width, dtype=dtype),
    }


def siglip_encode(params: dict, cfg: SiglipConfig, images: jnp.ndarray) -> jnp.ndarray:
    """[b, H, W, 3] → [b, width]: mean over the final hidden states
    (reference pooling at encoder.py:275-277)."""
    x = nn.dense(params["patch_embed"],
                 patchify(images.astype(params["pos_embed"]["table"].dtype), cfg.patch_size))
    x = x + params["pos_embed"]["table"][None, : x.shape[1]].astype(x.dtype)
    for blk in params["blocks"]:
        h = nn.layernorm(blk["ln1"], x, cfg.layer_norm_eps)
        x = x + nn.mha(blk["attn"], h, h, cfg.num_heads)
        h = nn.layernorm(blk["ln2"], x, cfg.layer_norm_eps)
        x = x + nn.dense(blk["mlp_out"], jax.nn.gelu(nn.dense(blk["mlp_in"], h), approximate=True))
    x = nn.layernorm(params["post_ln"], x, cfg.layer_norm_eps)
    return jnp.mean(x, axis=1)
