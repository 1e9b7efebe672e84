"""EVA ViT-g/14 visual tower (+ optional BLIP2 Q-Former head).

Registry alternate matching the reference's EVA encoders (reference:
my_affectgpt/models/eva_vit.py:245-407 VisionTransformer/create_eva_vit_g;
encoder.py:43-122 EVA_CLIP_G with BLIP2 Q-Former → [b, t, 32, 768],
:123-176 EVA_CLIP_G_NO_QFORMER mean over all 257 tokens → [b, t, 1408]).

Geometry (create_eva_vit_g, eva_vit.py:389-402): patch 14, width 1408,
39 blocks, 16 heads, MLP 6144 (ratio 4.3637), abs position embeddings,
no final LayerNorm (BLIP2's fp32 ln_vision follows), EVA's asymmetric
qkv bias (k bias fixed at zero).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from affectgpt_tpu.models import nn, qformer
from affectgpt_tpu.models.clip_vit import patchify


@dataclass(frozen=True)
class EvaVitConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1408
    num_layers: int = 39
    num_heads: int = 16
    mlp_dim: int = 6144
    layer_norm_eps: float = 1e-6

    @classmethod
    def vit_g_14(cls):
        return cls()

    @classmethod
    def tiny(cls):
        return cls(image_size=28, patch_size=14, width=16, num_layers=2,
                   num_heads=2, mlp_dim=32)


def init_params(rng: jax.Array, cfg: EvaVitConfig, dtype=jnp.bfloat16) -> dict:
    keys = jax.random.split(rng, cfg.num_layers + 3)
    n_patches = (cfg.image_size // cfg.patch_size) ** 2
    blocks = []
    for i in range(cfg.num_layers):
        k = jax.random.split(keys[2 + i], 3)
        blocks.append(
            {
                "ln1": nn.layernorm_init(cfg.width, dtype=dtype),
                # EVA attention: packed qkv weight, q/v biases, zero k bias
                "qkv_w": (jax.random.normal(k[0], (cfg.width, 3 * cfg.width)) * 0.02).astype(dtype),
                "q_bias": jnp.zeros((cfg.width,), dtype=dtype),
                "v_bias": jnp.zeros((cfg.width,), dtype=dtype),
                "proj": nn.dense_init(jax.random.fold_in(k[0], 1), cfg.width, cfg.width, dtype=dtype),
                "ln2": nn.layernorm_init(cfg.width, dtype=dtype),
                "mlp_in": nn.dense_init(k[1], cfg.width, cfg.mlp_dim, dtype=dtype),
                "mlp_out": nn.dense_init(k[2], cfg.mlp_dim, cfg.width, dtype=dtype),
            }
        )
    return {
        "patch_embed": nn.dense_init(keys[0], cfg.patch_size**2 * 3, cfg.width, dtype=dtype),
        "cls_token": jnp.zeros((cfg.width,), dtype=dtype),
        "pos_embed": {"table": (jax.random.normal(keys[1], (n_patches + 1, cfg.width)) * 0.02).astype(dtype)},
        "blocks": blocks,
    }


def _eva_attention(block, cfg: EvaVitConfig, x: jnp.ndarray) -> jnp.ndarray:
    b, t, d = x.shape
    h = cfg.num_heads
    hd = d // h
    bias = jnp.concatenate(
        [block["q_bias"], jnp.zeros_like(block["q_bias"]), block["v_bias"]]
    )
    qkv = jnp.dot(x, block["qkv_w"], preferred_element_type=jnp.float32)
    qkv = (qkv + bias.astype(jnp.float32)).astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, t, h, hd)
    k = k.reshape(b, t, h, hd)
    v = v.reshape(b, t, h, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(float(hd))
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32)
    return nn.dense(block["proj"], out.astype(x.dtype).reshape(b, t, d))


def encode_tokens(params: dict, cfg: EvaVitConfig, images: jnp.ndarray) -> jnp.ndarray:
    """[b, H, W, 3] → [b, 1+n_patches, width] raw token states (no final LN,
    matching use_mean_pooling=False)."""
    b = images.shape[0]
    x = nn.dense(params["patch_embed"], patchify(images.astype(params["cls_token"].dtype), cfg.patch_size))
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.width)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"]["table"][None, : x.shape[1]].astype(x.dtype)
    for blk in params["blocks"]:
        x = x + _eva_attention(blk, cfg, nn.layernorm(blk["ln1"], x, cfg.layer_norm_eps))
        h = nn.dense(blk["mlp_out"], nn.gelu(nn.dense(blk["mlp_in"],
                     nn.layernorm(blk["ln2"], x, cfg.layer_norm_eps))))
        x = x + h
    return x


def encode_mean(params: dict, cfg: EvaVitConfig, images: jnp.ndarray) -> jnp.ndarray:
    """EVA_CLIP_G_NO_QFORMER pooling: mean over all 257 tokens → [b, 1408]
    (reference encoder.py:123-176)."""
    return jnp.mean(encode_tokens(params, cfg, images), axis=1)


def init_blip2_head(rng: jax.Array, cfg: EvaVitConfig, num_query_tokens: int = 32,
                    dtype=jnp.bfloat16) -> dict:
    """BLIP2 ln_vision + 12-layer Q-Former over patch tokens → 32×768
    (reference encoder.py:43-122 EVA_CLIP_G)."""
    k1, k2 = jax.random.split(rng)
    qcfg = qformer.QFormerConfig.blip2(num_query_tokens, cfg.width)
    return {
        "ln_vision": nn.layernorm_init(cfg.width, dtype=dtype),
        "qformer": qformer.init_params(k2, qcfg, dtype=dtype),
    }


def encode_blip2(params: dict, head: dict, cfg: EvaVitConfig, images: jnp.ndarray,
                 num_query_tokens: int = 32) -> jnp.ndarray:
    """[b, H, W, 3] → [b, num_query_tokens, 768]."""
    tokens = encode_tokens(params, cfg, images)
    tokens = nn.layernorm(head["ln_vision"], tokens)
    qcfg = qformer.QFormerConfig.blip2(num_query_tokens, cfg.width)
    return qformer.apply(head["qformer"], qcfg, tokens)


def convert_eva_state(state: dict, dtype=None) -> dict:
    """EVA checkpoint state-dict (torch tensor/numpy map with eva_vit.py
    names) → this layout."""
    import numpy as np

    def arr(key):
        value = state[key]
        value = value.numpy() if hasattr(value, "numpy") else np.asarray(value)
        return value.astype(dtype) if dtype else value

    conv = arr("patch_embed.proj.weight")
    o, c, kh, kw = conv.shape
    blocks = []
    i = 0
    while f"blocks.{i}.norm1.weight" in state:
        p = f"blocks.{i}"
        blocks.append(
            {
                "ln1": {"scale": arr(f"{p}.norm1.weight"), "bias": arr(f"{p}.norm1.bias")},
                "qkv_w": np.ascontiguousarray(arr(f"{p}.attn.qkv.weight").T),
                "q_bias": arr(f"{p}.attn.q_bias"),
                "v_bias": arr(f"{p}.attn.v_bias"),
                "proj": {"w": np.ascontiguousarray(arr(f"{p}.attn.proj.weight").T),
                         "b": arr(f"{p}.attn.proj.bias")},
                "ln2": {"scale": arr(f"{p}.norm2.weight"), "bias": arr(f"{p}.norm2.bias")},
                "mlp_in": {"w": np.ascontiguousarray(arr(f"{p}.mlp.fc1.weight").T),
                           "b": arr(f"{p}.mlp.fc1.bias")},
                "mlp_out": {"w": np.ascontiguousarray(arr(f"{p}.mlp.fc2.weight").T),
                            "b": arr(f"{p}.mlp.fc2.bias")},
            }
        )
        i += 1
    return {
        "patch_embed": {"w": np.ascontiguousarray(conv.reshape(o, c * kh * kw).T),
                        "b": arr("patch_embed.proj.bias")},
        "cls_token": arr("cls_token").reshape(-1),
        "pos_embed": {"table": arr("pos_embed")[0]},
        "blocks": blocks,
    }
