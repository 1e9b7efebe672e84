"""Alternate acoustic encoders: WavLM-large and data2vec-audio-base.

Registry alternates to the production HuBERT encoder, mirroring the
reference's acoustic zoo (reference: my_affectgpt/models/encoder.py:
354-394 WAVLM_LARGE, :313-352 DATA2VEC_BASE) with the same pooling —
mean of the last 4 hidden layers then time-mean per 2 s clip.

Architecture notes (matching HF):
- WavLM-large: HuBERT-style conv frontend (layer-norm mode) + stable-LN
  transformer whose self-attention adds a *gated relative position
  bias*: T5-style log-bucketed relative positions embedded per head
  (first layer computes it, all layers reuse it), gated per (batch,
  head, query) by a sigmoid MLP of the query hidden state.
- data2vec-audio-base: layer-norm conv frontend, 5 stacked positional
  conv layers (non-affine LN), post-LN transformer.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from affectgpt_tpu.models import nn
from affectgpt_tpu.models.hubert import HubertConfig, _conv_frontend, _pos_conv


@dataclass(frozen=True)
class WavLMConfig:
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    num_buckets: int = 320
    max_distance: int = 800
    layer_norm_eps: float = 1e-5
    mean_last_k_layers: int = 4

    @classmethod
    def large(cls):
        return cls()

    @classmethod
    def tiny(cls):
        return cls(conv_dim=(8, 8), conv_kernel=(10, 3), conv_stride=(5, 2),
                   hidden_size=16, num_layers=3, num_heads=2, intermediate_size=32,
                   pos_conv_kernel=8, pos_conv_groups=2, num_buckets=8,
                   max_distance=16, mean_last_k_layers=2)

    def as_hubert(self) -> HubertConfig:
        return HubertConfig(
            conv_dim=self.conv_dim, conv_kernel=self.conv_kernel,
            conv_stride=self.conv_stride, hidden_size=self.hidden_size,
            num_layers=self.num_layers, num_heads=self.num_heads,
            intermediate_size=self.intermediate_size,
            pos_conv_kernel=self.pos_conv_kernel, pos_conv_groups=self.pos_conv_groups,
            layer_norm_eps=self.layer_norm_eps,
            mean_last_k_layers=self.mean_last_k_layers,
        )


def relative_position_buckets(q_len: int, k_len: int, num_buckets: int, max_distance: int) -> np.ndarray:
    """T5-style signed log buckets (reference of behavior: HF
    WavLMAttention._relative_positions_bucket)."""
    context = np.arange(q_len)[:, None]
    memory = np.arange(k_len)[None, :]
    rel = memory - context
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact) / math.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    buckets += np.where(is_small, rel, large)
    return buckets  # [q, k]


def init_wavlm_params(rng: jax.Array, cfg: WavLMConfig, dtype=jnp.bfloat16) -> dict:
    from affectgpt_tpu.models import hubert as hub

    base = hub.init_params(rng, cfg.as_hubert(), dtype=dtype)
    k1, k2 = jax.random.split(jax.random.fold_in(rng, 1))
    base["rel_attn_embed"] = nn.embedding_init(k1, cfg.num_buckets, cfg.num_heads, dtype=dtype)
    for i, layer in enumerate(base["layers"]):
        kg = jax.random.fold_in(k2, i)
        layer["gru_rel_pos_linear"] = nn.dense_init(
            kg, cfg.hidden_size // cfg.num_heads, 8, dtype=dtype
        )
        layer["gru_rel_pos_const"] = jnp.ones((1, cfg.num_heads, 1, 1), dtype=dtype)
    return base


def _wavlm_attention(layer, cfg: WavLMConfig, x: jnp.ndarray, position_bias: jnp.ndarray) -> jnp.ndarray:
    """Self-attention with gated relative position bias. x [b, t, d],
    position_bias [h, t, t]."""
    b, t, d = x.shape
    h, hd = cfg.num_heads, d // cfg.num_heads

    # gate from query hidden states (HF WavLMAttention.forward steps 1-4)
    gated = x.reshape(b, t, h, hd).transpose(0, 2, 1, 3)  # [b, h, t, hd]
    proj = nn.dense(layer["gru_rel_pos_linear"], gated)  # [b, h, t, 8]
    proj = proj.reshape(b, h, t, 2, 4).sum(-1)  # [b, h, t, 2]
    gate_a, gate_b = jnp.split(jax.nn.sigmoid(proj), 2, axis=-1)  # each [b,h,t,1]
    const = layer["gru_rel_pos_const"].astype(jnp.float32)  # [1,h,1,1]
    gate = gate_a * (gate_b * const - 1.0) + 2.0  # [b, h, t, 1]
    gated_bias = gate * position_bias[None].astype(jnp.float32)  # [b, h, t, t]

    attn = layer["attn"]
    q = nn.dense(attn["q"], x).reshape(b, t, h, hd)
    k = nn.dense(attn["k"], x).reshape(b, t, h, hd)
    v = nn.dense(attn["v"], x).reshape(b, t, h, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits / math.sqrt(hd) + gated_bias
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32)
    return nn.dense(attn["o"], out.astype(x.dtype).reshape(b, t, d))


def wavlm_encode(params: dict, cfg: WavLMConfig, waveform: jnp.ndarray,
                 normalize_input: bool = True) -> jnp.ndarray:
    """[b, samples] → [b, hidden]: stable-LN stack with gated rel-pos
    attention, last-k-layer mean + time mean."""
    hcfg = cfg.as_hubert()
    if normalize_input:
        mean = jnp.mean(waveform, axis=-1, keepdims=True)
        var = jnp.var(waveform, axis=-1, keepdims=True)
        waveform = (waveform - mean) / jnp.sqrt(var + 1e-7)

    x = _conv_frontend(params, hcfg, waveform)
    x = nn.layernorm(params["feat_proj_ln"], x, cfg.layer_norm_eps)
    x = nn.dense(params["feat_proj"], x)
    x = x + _pos_conv(params, hcfg, x)

    t = x.shape[1]
    buckets = relative_position_buckets(t, t, cfg.num_buckets, cfg.max_distance)
    position_bias = jnp.transpose(
        nn.embedding(params["rel_attn_embed"], jnp.asarray(buckets)), (2, 0, 1)
    )  # [h, t, t]

    k = cfg.mean_last_k_layers
    acc = jnp.zeros_like(x, dtype=jnp.float32)
    n = cfg.num_layers
    for i, layer in enumerate(params["layers"]):
        h = nn.layernorm(layer["attn_ln"], x, cfg.layer_norm_eps)
        x = x + _wavlm_attention(layer, cfg, h, position_bias)
        h = nn.layernorm(layer["ffn_ln"], x, cfg.layer_norm_eps)
        x = x + nn.dense(layer["ffn_out"], nn.gelu(nn.dense(layer["ffn_in"], h)))
        out_state = x if i < n - 1 else nn.layernorm(params["final_ln"], x, cfg.layer_norm_eps)
        if i >= n - k:
            acc = acc + out_state.astype(jnp.float32)
    return jnp.mean(acc / k, axis=1).astype(x.dtype)


def wavlm_encode_clips(params: dict, cfg: WavLMConfig, clips: jnp.ndarray) -> jnp.ndarray:
    b, t, _, s = clips.shape
    return wavlm_encode(params, cfg, clips[:, :, 0, :].reshape(b * t, s)).reshape(b, t, -1)


# ---------------------------------------------------------------------------
# data2vec-audio


@dataclass(frozen=True)
class Data2VecAudioConfig:
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    num_pos_conv_layers: int = 5
    pos_conv_kernel: int = 19
    pos_conv_groups: int = 16
    layer_norm_eps: float = 1e-5
    mean_last_k_layers: int = 4

    @classmethod
    def base(cls):
        return cls()

    @classmethod
    def tiny(cls):
        return cls(conv_dim=(8, 8), conv_kernel=(10, 3), conv_stride=(5, 2),
                   hidden_size=16, num_layers=3, num_heads=2, intermediate_size=32,
                   num_pos_conv_layers=2, pos_conv_kernel=5, pos_conv_groups=2,
                   mean_last_k_layers=2)

    def as_hubert(self) -> HubertConfig:
        return HubertConfig(
            conv_dim=self.conv_dim, conv_kernel=self.conv_kernel,
            conv_stride=self.conv_stride, hidden_size=self.hidden_size,
            num_layers=self.num_layers, num_heads=self.num_heads,
            intermediate_size=self.intermediate_size,
            layer_norm_eps=self.layer_norm_eps,
            mean_last_k_layers=self.mean_last_k_layers,
        )


def init_data2vec_params(rng: jax.Array, cfg: Data2VecAudioConfig, dtype=jnp.bfloat16) -> dict:
    from affectgpt_tpu.models import hubert as hub

    base = hub.init_params(rng, cfg.as_hubert(), dtype=dtype)
    del base["pos_conv"]
    k = jax.random.fold_in(rng, 7)
    base["pos_convs"] = [
        {
            "w": (jax.random.normal(jax.random.fold_in(k, i),
                  (cfg.hidden_size, cfg.hidden_size // cfg.pos_conv_groups, cfg.pos_conv_kernel))
                  * 0.02).astype(dtype),
            "b": jnp.zeros((cfg.hidden_size,), dtype=dtype),
        }
        for i in range(cfg.num_pos_conv_layers)
    ]
    base["encoder_ln"] = nn.layernorm_init(cfg.hidden_size, dtype=dtype)
    return base


def _d2v_pos_conv(params: dict, cfg: Data2VecAudioConfig, x: jnp.ndarray) -> jnp.ndarray:
    """5 stacked grouped convs, each + non-affine LN + GELU (HF
    Data2VecAudioPositionalConvLayer)."""
    h = jnp.transpose(x, (0, 2, 1))  # [b, c, t]
    pad = cfg.pos_conv_kernel // 2
    for conv in params["pos_convs"]:
        h = jax.lax.conv_general_dilated(
            h, conv["w"].astype(h.dtype), (1,), [(pad, pad)],
            feature_group_count=cfg.pos_conv_groups,
            dimension_numbers=("NCH", "OIH", "NCH"),
        ) + conv["b"][None, :, None].astype(h.dtype)
        if cfg.pos_conv_kernel % 2 == 0:
            h = h[:, :, :-1]
        ht = jnp.transpose(h, (0, 2, 1)).astype(jnp.float32)
        mean = jnp.mean(ht, axis=-1, keepdims=True)
        var = jnp.var(ht, axis=-1, keepdims=True)
        ht = (ht - mean) * jax.lax.rsqrt(var + cfg.layer_norm_eps)
        h = jnp.transpose(nn.gelu(ht).astype(h.dtype), (0, 2, 1))
    return jnp.transpose(h, (0, 2, 1))


def data2vec_encode(params: dict, cfg: Data2VecAudioConfig, waveform: jnp.ndarray,
                    normalize_input: bool = True) -> jnp.ndarray:
    """[b, samples] → [b, hidden]: post-LN wav2vec2-style encoder
    (layer-norm after pos-conv add, residual-then-LN blocks)."""
    hcfg = cfg.as_hubert()
    if normalize_input:
        mean = jnp.mean(waveform, axis=-1, keepdims=True)
        var = jnp.var(waveform, axis=-1, keepdims=True)
        waveform = (waveform - mean) / jnp.sqrt(var + 1e-7)

    x = _conv_frontend(params, hcfg, waveform)
    x = nn.layernorm(params["feat_proj_ln"], x, cfg.layer_norm_eps)
    x = nn.dense(params["feat_proj"], x)
    x = x + _d2v_pos_conv(params, cfg, x)
    x = nn.layernorm(params["encoder_ln"], x, cfg.layer_norm_eps)

    k = cfg.mean_last_k_layers
    acc = jnp.zeros_like(x, dtype=jnp.float32)
    for i, layer in enumerate(params["layers"]):
        attn_out = nn.mha(layer["attn"], x, x, cfg.num_heads)
        x = nn.layernorm(layer["attn_ln"], x + attn_out, cfg.layer_norm_eps)
        ffn = nn.dense(layer["ffn_out"], nn.gelu(nn.dense(layer["ffn_in"], x)))
        x = nn.layernorm(layer["ffn_ln"], x + ffn, cfg.layer_norm_eps)
        if i >= cfg.num_layers - k:
            acc = acc + x.astype(jnp.float32)
    return jnp.mean(acc / k, axis=1).astype(x.dtype)


def data2vec_encode_clips(params: dict, cfg: Data2VecAudioConfig, clips: jnp.ndarray) -> jnp.ndarray:
    b, t, _, s = clips.shape
    return data2vec_encode(params, cfg, clips[:, :, 0, :].reshape(b * t, s)).reshape(b, t, -1)
