"""VideoMAE pretraining: tube-masked video autoencoding.

Capability-parity with the reference's VideoMAE pretraining baseline
(reference: toolkit/models/ VideoMAE pretrain entry): videos are split
into space-time tubes, a high ratio is masked, a ViT encoder sees only
visible tubes, and a light decoder reconstructs the masked pixels.

TPU design: the mask is a per-sample random permutation (argsort of
uniforms) with a STATIC visible count, so gathers/scatters are fixed
shape; encoder/decoder are the shared nn blocks; loss is masked-pixel
MSE (normalized per tube, as in the paper).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from affectgpt_tpu.models import nn


@dataclass(frozen=True)
class VideoMAEConfig:
    num_frames: int = 16
    image_size: int = 224
    patch_size: int = 16
    tubelet_size: int = 2
    width: int = 384
    num_layers: int = 12
    num_heads: int = 6
    mlp_dim: int = 1536
    decoder_width: int = 192
    decoder_layers: int = 4
    decoder_heads: int = 3
    mask_ratio: float = 0.9
    layer_norm_eps: float = 1e-6

    @property
    def num_patches(self) -> int:
        spatial = (self.image_size // self.patch_size) ** 2
        return spatial * (self.num_frames // self.tubelet_size)

    @property
    def patch_dim(self) -> int:
        return self.tubelet_size * self.patch_size * self.patch_size * 3

    @property
    def num_visible(self) -> int:
        return max(1, int(self.num_patches * (1.0 - self.mask_ratio)))

    @classmethod
    def tiny(cls):
        return cls(num_frames=4, image_size=32, patch_size=16, tubelet_size=2,
                   width=32, num_layers=2, num_heads=2, mlp_dim=64,
                   decoder_width=16, decoder_layers=1, decoder_heads=2,
                   mask_ratio=0.5)


def _block_init(rng, width, heads, mlp, dtype=jnp.float32):
    k = jax.random.split(rng, 3)
    return {
        "ln1": nn.layernorm_init(width, dtype=dtype),
        "attn": nn.mha_init(k[0], width, width, heads, dtype=dtype),
        "ln2": nn.layernorm_init(width, dtype=dtype),
        "mlp_in": nn.dense_init(k[1], width, mlp, dtype=dtype),
        "mlp_out": nn.dense_init(k[2], mlp, width, dtype=dtype),
    }


def _block_apply(block, x, heads, eps):
    h = nn.layernorm(block["ln1"], x, eps)
    x = x + nn.mha(block["attn"], h, h, heads)
    h = nn.layernorm(block["ln2"], x, eps)
    return x + nn.dense(block["mlp_out"], nn.gelu(nn.dense(block["mlp_in"], h)))


def init_params(rng: jax.Array, cfg: VideoMAEConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(rng, cfg.num_layers + cfg.decoder_layers + 6)
    return {
        "patch_embed": nn.dense_init(keys[0], cfg.patch_dim, cfg.width, dtype=dtype),
        "pos_embed": {"table": (jax.random.normal(keys[1], (cfg.num_patches, cfg.width)) * 0.02).astype(dtype)},
        "encoder": [
            _block_init(keys[2 + i], cfg.width, cfg.num_heads, cfg.mlp_dim, dtype)
            for i in range(cfg.num_layers)
        ],
        "encoder_ln": nn.layernorm_init(cfg.width, dtype=dtype),
        "enc_to_dec": nn.dense_init(keys[-4], cfg.width, cfg.decoder_width, dtype=dtype),
        "mask_token": jnp.zeros((cfg.decoder_width,), dtype=dtype),
        "dec_pos_embed": {"table": (jax.random.normal(keys[-3], (cfg.num_patches, cfg.decoder_width)) * 0.02).astype(dtype)},
        "decoder": [
            _block_init(keys[2 + cfg.num_layers + i], cfg.decoder_width,
                        cfg.decoder_heads, cfg.decoder_width * 4, dtype)
            for i in range(cfg.decoder_layers)
        ],
        "decoder_ln": nn.layernorm_init(cfg.decoder_width, dtype=dtype),
        "pixel_head": nn.dense_init(keys[-2], cfg.decoder_width, cfg.patch_dim, dtype=dtype),
    }


def tube_patchify(video: jnp.ndarray, cfg: VideoMAEConfig) -> jnp.ndarray:
    """[B, T, H, W, 3] → [B, num_patches, patch_dim] space-time tubes."""
    b, t, h, w, c = video.shape
    ts, ps = cfg.tubelet_size, cfg.patch_size
    x = video.reshape(b, t // ts, ts, h // ps, ps, w // ps, ps, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6, 7))
    return x.reshape(b, (t // ts) * (h // ps) * (w // ps), ts * ps * ps * c)


@partial(jax.jit, static_argnames=("cfg",))
def pretrain_loss(params: dict, cfg: VideoMAEConfig, video: jnp.ndarray,
                  rng: jax.Array) -> jnp.ndarray:
    """Masked tube reconstruction loss. video [B, T, H, W, 3] in [0,1]."""
    patches = tube_patchify(video.astype(jnp.float32), cfg)  # [B, N, D]
    b, n, d = patches.shape
    v = cfg.num_visible

    # per-sample random permutation with static visible count
    noise = jax.random.uniform(rng, (b, n))
    order = jnp.argsort(noise, axis=1)  # [B, N]
    visible_idx = order[:, :v]
    masked_idx = order[:, v:]

    pos = params["pos_embed"]["table"]  # [N, W]
    tokens = nn.dense(params["patch_embed"], patches) + pos[None]
    visible = jnp.take_along_axis(tokens, visible_idx[:, :, None], axis=1)  # [B, V, W]

    x = visible
    for block in params["encoder"]:
        x = _block_apply(block, x, cfg.num_heads, cfg.layer_norm_eps)
    x = nn.layernorm(params["encoder_ln"], x, cfg.layer_norm_eps)
    x = nn.dense(params["enc_to_dec"], x)  # [B, V, Wd]

    # decoder sees visible tokens + mask tokens, each with decoder pos embeds
    dec_pos = params["dec_pos_embed"]["table"]  # [N, Wd]
    vis_pos = jnp.take_along_axis(
        jnp.broadcast_to(dec_pos[None], (b, n, dec_pos.shape[-1])), visible_idx[:, :, None], axis=1
    )
    msk_pos = jnp.take_along_axis(
        jnp.broadcast_to(dec_pos[None], (b, n, dec_pos.shape[-1])), masked_idx[:, :, None], axis=1
    )
    mask_tok = jnp.broadcast_to(params["mask_token"], msk_pos.shape)
    dec_in = jnp.concatenate([x + vis_pos, mask_tok + msk_pos], axis=1)  # [B, N, Wd]
    y = dec_in
    for block in params["decoder"]:
        y = _block_apply(block, y, cfg.decoder_heads, cfg.layer_norm_eps)
    y = nn.layernorm(params["decoder_ln"], y, cfg.layer_norm_eps)
    recon = nn.dense(params["pixel_head"], y[:, v:])  # only masked positions [B, N-V, D]

    target = jnp.take_along_axis(patches, masked_idx[:, :, None], axis=1)
    # per-tube normalization (VideoMAE's normalized-pixel target)
    mean = jnp.mean(target, axis=-1, keepdims=True)
    std = jnp.std(target, axis=-1, keepdims=True) + 1e-6
    target = (target - mean) / std
    return jnp.mean((recon - target) ** 2)


def encode_video(params: dict, cfg: VideoMAEConfig, video: jnp.ndarray) -> jnp.ndarray:
    """Inference-time representation: encoder over ALL tubes, mean-pooled
    → [B, width] (the pretrained-feature output used downstream)."""
    patches = tube_patchify(video.astype(jnp.float32), cfg)
    x = nn.dense(params["patch_embed"], patches) + params["pos_embed"]["table"][None]
    for block in params["encoder"]:
        x = _block_apply(block, x, cfg.num_heads, cfg.layer_norm_eps)
    x = nn.layernorm(params["encoder_ln"], x, cfg.layer_norm_eps)
    return jnp.mean(x, axis=1)
