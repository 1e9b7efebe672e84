"""HuBERT-large acoustic encoder, TPU-native.

Replaces the reference's HF chinese-hubert-large wrapper (reference:
my_affectgpt/models/encoder.py:395-433): raw 16 kHz clips → conv feature
extractor → transformer → mean of the last 4 hidden layers → time-mean,
giving one 1024-d vector per 2 s clip ([b, 8, 1024]).

Geometry follows hubert-large (feat_extract_norm="layer",
do_stable_layer_norm=True): 7 conv1d stages (512 ch, kernels
10/3/3/3/3/2/2, strides 5/2/2/2/2/2/2) each with channel LayerNorm +
GELU; feature projection LN+dense→1024; grouped conv positional
embedding (k=128, groups=16); 24 pre-LN transformer layers (16 heads,
FFN 4096); final LayerNorm.

TPU notes: the conv frontend is expressed as lax.conv_general_dilated in
NCH layout (channels land on the lane dimension); all attention softmax
in fp32; the last-4-layer mean is accumulated on the fly instead of
stacking all hidden states (saves 24× activation HBM of the reference's
output_hidden_states=True).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from affectgpt_tpu.models import nn

# Transformer-attention implementation: "sublayer" = the VMEM-resident
# fused attention-sublayer Pallas kernel (shared with CLIP,
# ops/vit_sublayer_pallas — HuBERT-large has the identical pre-LN
# width-1024/16-head geometry); "xla" = unfused. "auto" currently means
# XLA: at HuBERT's ~99-token sequences the score-only flash kernel
# measured −8% (CLAUDE.md), so the fused default waits on a TPU A/B.
ATTN_IMPL = os.environ.get("HUBERT_ATTN", "auto")

# FFN implementation: "pallas" = the two weight-resident fused calls
# (LN+fc1+gelu, fc2+residual — ops/vit_mlp_pallas.apply_hubert, same
# 1024→4096 geometry as ViT-L); "xla" = unfused; "auto" pending a TPU A/B.
MLP_IMPL = os.environ.get("HUBERT_MLP", "auto")


@dataclass(frozen=True)
class HubertConfig:
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    layer_norm_eps: float = 1e-5
    mean_last_k_layers: int = 4  # reference layer_ids = [-4,-3,-2,-1]

    @classmethod
    def large(cls):
        return cls()

    @classmethod
    def tiny(cls):
        return cls(
            conv_dim=(8, 8), conv_kernel=(10, 3), conv_stride=(5, 2),
            hidden_size=16, num_layers=3, num_heads=2, intermediate_size=32,
            pos_conv_kernel=8, pos_conv_groups=2, mean_last_k_layers=2,
        )


def init_params(rng: jax.Array, cfg: HubertConfig, dtype=jnp.bfloat16) -> dict:
    n_conv = len(cfg.conv_dim)
    keys = jax.random.split(rng, n_conv + cfg.num_layers + 4)
    convs = []
    in_ch = 1
    for i in range(n_conv):
        convs.append(
            {
                # kernel layout [out_ch, in_ch, k] = torch Conv1d
                "w": (jax.random.normal(keys[i], (cfg.conv_dim[i], in_ch, cfg.conv_kernel[i]))
                      * (1.0 / jnp.sqrt(in_ch * cfg.conv_kernel[i]))).astype(dtype),
                "b": jnp.zeros((cfg.conv_dim[i],), dtype=dtype),
                "ln": nn.layernorm_init(cfg.conv_dim[i], dtype=dtype),
            }
        )
        in_ch = cfg.conv_dim[i]

    k_rest = keys[n_conv:]
    layers = []
    for i in range(cfg.num_layers):
        k = jax.random.split(k_rest[2 + i], 3)
        layers.append(
            {
                "attn_ln": nn.layernorm_init(cfg.hidden_size, dtype=dtype),
                "attn": nn.mha_init(k[0], cfg.hidden_size, cfg.hidden_size, cfg.num_heads, dtype=dtype),
                "ffn_ln": nn.layernorm_init(cfg.hidden_size, dtype=dtype),
                "ffn_in": nn.dense_init(k[1], cfg.hidden_size, cfg.intermediate_size, dtype=dtype),
                "ffn_out": nn.dense_init(k[2], cfg.intermediate_size, cfg.hidden_size, dtype=dtype),
            }
        )

    return {
        "convs": convs,
        "feat_proj_ln": nn.layernorm_init(cfg.conv_dim[-1], dtype=dtype),
        "feat_proj": nn.dense_init(k_rest[0], cfg.conv_dim[-1], cfg.hidden_size, dtype=dtype),
        "pos_conv": {
            "w": (jax.random.normal(
                k_rest[1],
                (cfg.hidden_size, cfg.hidden_size // cfg.pos_conv_groups, cfg.pos_conv_kernel),
            ) * 0.02).astype(dtype),
            "b": jnp.zeros((cfg.hidden_size,), dtype=dtype),
        },
        "layers": layers,
        "final_ln": nn.layernorm_init(cfg.hidden_size, dtype=dtype),
    }


def _use_sublayer(cfg: HubertConfig, params: dict) -> bool:
    return (
        ATTN_IMPL == "sublayer"
        and jax.default_backend() == "tpu"
        and "w" in params["layers"][0]["attn"]["q"]
        and (cfg.hidden_size // cfg.num_heads) % 64 == 0
    )


def _conv_frontend(params: dict, cfg: HubertConfig, waveform: jnp.ndarray) -> jnp.ndarray:
    """[b, samples] → [b, frames, conv_dim[-1]].

    Chunked over clips (HUBERT_CONV_CHUNK, default 256) when the batch is
    larger: the first conv's [b, samples/5, 512] bf16 activation is the
    batch-scaling HBM high-water mark of the whole realtime graph
    ([1024, 6399, 512] = 6.25 GB at realtime b128 — the round-3 OOM once
    the ViT MLP intermediate was chunked). The frontend output
    [b, ~99, 512] is ~1/64 the size, so bounding the conv temps costs one
    lax.map with negligible serialization (audio is ~15% of the pass)."""
    import os

    chunk = int(os.environ.get("HUBERT_CONV_CHUNK", 256))
    b = waveform.shape[0]
    if chunk and b > chunk:
        while b % chunk:  # largest divisor of b not above the cap
            chunk -= 1
        if chunk > 1:
            ys = jax.lax.map(
                lambda wc: _conv_frontend(params, cfg, wc),
                waveform.reshape(b // chunk, chunk, waveform.shape[1]),
            )
            return ys.reshape(b, ys.shape[2], ys.shape[3])
    x = waveform[:, None, :].astype(params["convs"][0]["w"].dtype)  # [b, 1, s]
    for i, conv in enumerate(params["convs"]):
        x = jax.lax.conv_general_dilated(
            x, conv["w"], window_strides=(cfg.conv_stride[i],), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        x = x + conv["b"][None, :, None]
        # channel LayerNorm (feat_extract_norm="layer"): normalize over C
        x = jnp.transpose(x, (0, 2, 1))  # [b, t, c]
        x = nn.layernorm(conv["ln"], x, cfg.layer_norm_eps)
        x = nn.gelu(x)
        x = jnp.transpose(x, (0, 2, 1))
    return jnp.transpose(x, (0, 2, 1))  # [b, t, c]


def _pos_conv(params: dict, cfg: HubertConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Grouped conv positional embedding with same-ish padding (64/63 for
    even kernels, matching wav2vec2's trailing-sample trim)."""
    h = jnp.transpose(x, (0, 2, 1))  # [b, c, t]
    pad = cfg.pos_conv_kernel // 2
    h = jax.lax.conv_general_dilated(
        h, params["pos_conv"]["w"].astype(h.dtype), window_strides=(1,),
        padding=[(pad, pad)], feature_group_count=cfg.pos_conv_groups,
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    h = h + params["pos_conv"]["b"][None, :, None].astype(h.dtype)
    if cfg.pos_conv_kernel % 2 == 0:
        h = h[:, :, :-1]
    h = nn.gelu(h)
    return jnp.transpose(h, (0, 2, 1))


def encode(
    params: dict, cfg: HubertConfig, waveform: jnp.ndarray, normalize_input: bool = True
) -> jnp.ndarray:
    """[b, samples] raw audio → [b, hidden] per-clip embedding
    (mean of last-k transformer layers, then time-mean — the reference's
    pooling at encoder.py:424-429)."""
    if normalize_input:
        # Wav2Vec2FeatureExtractor do_normalize: per-sequence zero-mean/unit-var
        mean = jnp.mean(waveform, axis=-1, keepdims=True)
        var = jnp.var(waveform, axis=-1, keepdims=True)
        waveform = (waveform - mean) / jnp.sqrt(var + 1e-7)

    x = _conv_frontend(params, cfg, waveform)
    x = nn.layernorm(params["feat_proj_ln"], x, cfg.layer_norm_eps)
    x = nn.dense(params["feat_proj"], x)
    x = x + _pos_conv(params, cfg, x)

    # pre-LN stack (do_stable_layer_norm=True); accumulate last-k mean online
    k = cfg.mean_last_k_layers
    t_valid = x.shape[1]
    use_sublayer = _use_sublayer(cfg, params)
    use_mlp_kernel = (
        MLP_IMPL in ("pallas", "fused")
        and jax.default_backend() == "tpu"
        and "w" in params["layers"][0]["ffn_in"]
    )
    if (use_sublayer or use_mlp_kernel) and t_valid % 8:
        # sublane-pad the token axis once for the whole stack; padded keys
        # are masked in-kernel (attention) / row-independent (FFN) and the
        # pooling below slices them off
        x = jnp.pad(x, ((0, 0), (0, -t_valid % 8), (0, 0)))
    acc = jnp.zeros_like(x, dtype=jnp.float32)
    n_layers = cfg.num_layers
    for i, layer in enumerate(params["layers"]):
        if use_sublayer:
            from affectgpt_tpu.ops import vit_sublayer_pallas

            x = vit_sublayer_pallas.apply(
                {"ln1": layer["attn_ln"], "attn": layer["attn"]},
                x, cfg.num_heads, t_valid, cfg.layer_norm_eps,
            )
        else:
            h = nn.layernorm(layer["attn_ln"], x, cfg.layer_norm_eps)
            if x.shape[1] != t_valid:
                # padded for the FFN kernel but attention is unfused: keep
                # the garbage rows out of every query's softmax
                mask = (jnp.arange(x.shape[1]) < t_valid)[None, None, None, :]
                x = x + nn.mha(layer["attn"], h, h, cfg.num_heads, mask)
            else:
                x = x + nn.mha(layer["attn"], h, h, cfg.num_heads)
        if use_mlp_kernel:
            if MLP_IMPL == "fused":
                from affectgpt_tpu.ops import vit_mlp_fused_pallas

                x = vit_mlp_fused_pallas.apply_hubert(layer, x, cfg.layer_norm_eps)
            else:
                from affectgpt_tpu.ops import vit_mlp_pallas

                x = vit_mlp_pallas.apply_hubert(layer, x, cfg.layer_norm_eps)
        else:
            h = nn.layernorm(layer["ffn_ln"], x, cfg.layer_norm_eps)
            x = x + nn.dense(layer["ffn_out"], nn.gelu(nn.dense(layer["ffn_in"], h)))
        # hidden_states[i+1] in HF terms; final LN applies to the last one
        out_state = x if i < n_layers - 1 else nn.layernorm(params["final_ln"], x, cfg.layer_norm_eps)
        if i >= n_layers - k:
            acc = acc + out_state.astype(jnp.float32)

    feature = (acc / k)[:, :t_valid]  # [b, t, hidden]
    return jnp.mean(feature, axis=1).astype(x.dtype)


def encode_clips(params: dict, cfg: HubertConfig, clips: jnp.ndarray) -> jnp.ndarray:
    """[b, n_clips, 1, samples] → [b, n_clips, hidden] (reference forward
    reshapes (b t) into the batch dim; here it is one batched call)."""
    b, t, _, s = clips.shape
    flat = clips[:, :, 0, :].reshape(b * t, s)
    feats = encode(params, cfg, flat)
    return feats.reshape(b, t, -1)
