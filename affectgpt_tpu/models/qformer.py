"""Q-Former: learned query tokens cross-attending over encoder states.

TPU-native reimplementation of the temporal/fusion Q-Former used by the
reference (vendored BERT at my_affectgpt/models/Qformer.py; instantiated
via `init_video_Qformer` at affectgpt.py:24-37 with 2 layers,
cross-attention every layer, and the text FFN/cls head stripped).

Math per layer (post-LN BERT, queries-only input):
  x = LN(x + SelfAttn(x))
  x = LN(x + CrossAttn(x, enc))
  x = LN(x + FFN(x))        # the reference's intermediate_query/output_query
with an input LayerNorm on the query embeddings (BertEmbeddings). All
shapes static; encoder mask folds padding if provided.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from affectgpt_tpu.models import nn


@dataclass(frozen=True)
class QFormerConfig:
    hidden_size: int = 768
    num_heads: int = 12
    num_layers: int = 2
    intermediate_size: int = 3072
    encoder_width: int = 768
    num_query_tokens: int = 32
    layer_norm_eps: float = 1e-12
    # cross-attention every Nth layer (1 for the temporal Q-Formers,
    # 2 for the BLIP2 image Q-Former; reference affectgpt.py:30 vs blip2.py)
    cross_attention_freq: int = 1
    # BERT regularization the reference inherits from bert-base-uncased
    # (init_Qformer, blip2.py:53-60: BertConfig defaults 0.1/0.1; active
    # under model.train() on the TRAINABLE merger Q-Formers). Applied iff
    # apply() receives dropout_rng — eval/inference never passes one.
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1

    @classmethod
    def blip2(cls, num_query_tokens: int = 32, encoder_width: int = 1408):
        return cls(num_layers=12, cross_attention_freq=2,
                   num_query_tokens=num_query_tokens, encoder_width=encoder_width)

    @classmethod
    def tiny(cls, encoder_width: int = 16, num_query_tokens: int = 4):
        return cls(
            hidden_size=16, num_heads=2, num_layers=2, intermediate_size=32,
            encoder_width=encoder_width, num_query_tokens=num_query_tokens,
        )


def init_params(rng: jax.Array, cfg: QFormerConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(rng, cfg.num_layers + 2)
    layers = []
    for i in range(cfg.num_layers):
        k = jax.random.split(keys[i], 4)
        layer = {
            "self_attn": nn.mha_init(k[0], cfg.hidden_size, cfg.hidden_size, cfg.num_heads, dtype=dtype),
            "self_ln": nn.layernorm_init(cfg.hidden_size, dtype=dtype),
            "ffn_in": nn.dense_init(k[2], cfg.hidden_size, cfg.intermediate_size, dtype=dtype),
            "ffn_out": nn.dense_init(k[3], cfg.intermediate_size, cfg.hidden_size, dtype=dtype),
            "ffn_ln": nn.layernorm_init(cfg.hidden_size, dtype=dtype),
        }
        if i % cfg.cross_attention_freq == 0:
            layer["cross_attn"] = nn.mha_init(
                k[1], cfg.hidden_size, cfg.encoder_width, cfg.num_heads, dtype=dtype
            )
            layer["cross_ln"] = nn.layernorm_init(cfg.hidden_size, dtype=dtype)
        layers.append(layer)
    return {
        "query_tokens": (
            jax.random.normal(keys[-2], (1, cfg.num_query_tokens, cfg.hidden_size)) * 0.02
        ).astype(dtype),
        "embed_ln": nn.layernorm_init(cfg.hidden_size, dtype=dtype),
        "layers": layers,
    }


def apply(
    params: dict,
    cfg: QFormerConfig,
    encoder_hidden_states: jnp.ndarray,
    encoder_mask: Optional[jnp.ndarray] = None,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """encoder_hidden_states [b, t, encoder_width] → [b, num_query, hidden].

    encoder_mask [b, t] bool (True = valid) folds padded timesteps.
    dropout_rng: train-mode switch for the BERT dropouts (embeddings +
    attention-probs + per-sublayer hidden, Qformer.py:108,259,288,374).
    None = eval-mode identity — bitwise what inference always ran.
    """
    b = encoder_hidden_states.shape[0]
    x = jnp.broadcast_to(
        params["query_tokens"], (b, cfg.num_query_tokens, cfg.hidden_size)
    ).astype(encoder_hidden_states.dtype)
    x = nn.layernorm(params["embed_ln"], x, cfg.layer_norm_eps)

    h_p, a_p = cfg.hidden_dropout_prob, cfg.attention_probs_dropout_prob
    drop_on = dropout_rng is not None and (h_p > 0.0 or a_p > 0.0)
    # site keys: fold_in(layer_key, site) — 0 self-probs, 1 self-hidden,
    # 2 cross-probs, 3 cross-hidden, 4 ffn-hidden; embeddings use site 5
    # of a reserved pseudo-layer index
    def hdrop(key, y):
        return nn.dropout(key, h_p, y) if (drop_on and h_p > 0.0) else y

    def pdrop(key):
        return (key, a_p) if (drop_on and a_p > 0.0) else None

    if drop_on:
        x = hdrop(jax.random.fold_in(jax.random.fold_in(dropout_rng, 10_000), 5), x)

    cross_mask = None
    if encoder_mask is not None:
        cross_mask = encoder_mask[:, None, None, :]  # [b, 1, 1, t]

    for i, layer in enumerate(params["layers"]):
        lk = jax.random.fold_in(dropout_rng, i) if drop_on else None
        sk = (lambda s: jax.random.fold_in(lk, s)) if drop_on else (lambda s: None)
        attn = nn.mha(layer["self_attn"], x, x, cfg.num_heads,
                      probs_drop=pdrop(sk(0)) if drop_on else None)
        if drop_on:
            attn = hdrop(sk(1), attn)
        x = nn.layernorm(layer["self_ln"], x + attn, cfg.layer_norm_eps)
        if "cross_attn" in layer:
            cross = nn.mha(layer["cross_attn"], x, encoder_hidden_states, cfg.num_heads,
                           cross_mask, probs_drop=pdrop(sk(2)) if drop_on else None)
            if drop_on:
                cross = hdrop(sk(3), cross)
            x = nn.layernorm(layer["cross_ln"], x + cross, cfg.layer_norm_eps)
        h = nn.dense(layer["ffn_out"], nn.gelu(nn.dense(layer["ffn_in"], x)))
        if drop_on:
            h = hdrop(sk(4), h)
        x = nn.layernorm(layer["ffn_ln"], x + h, cfg.layer_norm_eps)
    return x
