"""Functional neural-net building blocks on explicit parameter pytrees.

All model components in this framework are pure functions over nested
dicts of jnp arrays. This keeps pjit/shard_map sharding rules trivial
(regex on tree paths), makes torch→jax weight conversion a direct key
mapping, and avoids framework object state inside traced code.

Compute dtype convention: parameters may be stored in bf16; matmuls
always request float32 accumulation via preferred_element_type.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def dense_init(rng, in_dim: int, out_dim: int, scale: float = 0.02, dtype=jnp.float32):
    wkey, _ = jax.random.split(rng)
    return {
        "w": (jax.random.normal(wkey, (in_dim, out_dim)) * scale).astype(dtype),
        "b": jnp.zeros((out_dim,), dtype=dtype),
    }


def dense(params, x: jnp.ndarray) -> jnp.ndarray:
    if "w_q" in params:  # int8 tower serving mode (quantize_encoder_tree)
        from affectgpt_tpu.ops import quant

        return quant.dense_w8a8_xla(x, params["w_q"], params["scales"], params.get("b"))
    y = jnp.dot(x, params["w"], preferred_element_type=jnp.float32)
    y = y + params["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def dense_nobias_init(rng, in_dim: int, out_dim: int, scale: float = 0.02, dtype=jnp.float32):
    return {"w": (jax.random.normal(rng, (in_dim, out_dim)) * scale).astype(dtype)}


def dense_nobias(params, x: jnp.ndarray) -> jnp.ndarray:
    if "w_q" in params:  # int8 tower serving mode (quantize_encoder_tree)
        from affectgpt_tpu.ops import quant

        return quant.dense_w8a8_xla(x, params["w_q"], params["scales"])
    return jnp.dot(x, params["w"], preferred_element_type=jnp.float32).astype(x.dtype)


def layernorm_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype=dtype), "bias": jnp.zeros((dim,), dtype=dtype)}


def layernorm(params, x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    # fp32 statistics for bf16 safety (role of the reference's fp32 LayerNorm,
    # reference: my_affectgpt/models/blip2.py LayerNorm subclass).
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def rmsnorm_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype=dtype)}


def rmsnorm(params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (y * params["scale"].astype(jnp.float32)).astype(x.dtype)


def embedding_init(rng, num: int, dim: int, scale: float = 0.02, dtype=jnp.float32):
    return {"table": (jax.random.normal(rng, (num, dim)) * scale).astype(dtype)}


def embedding(params, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["table"], ids, axis=0)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    # erf-based gelu (matches torch nn.GELU default / BERT "gelu")
    return jax.nn.gelu(x, approximate=False)


def mha_init(rng, q_dim: int, kv_dim: int, num_heads: int, head_dim: Optional[int] = None,
             dtype=jnp.float32):
    """Multi-head attention projections: q from q_dim, k/v from kv_dim,
    output back to q_dim."""
    head_dim = head_dim or q_dim // num_heads
    inner = num_heads * head_dim
    keys = jax.random.split(rng, 4)
    return {
        "q": dense_init(keys[0], q_dim, inner, dtype=dtype),
        "k": dense_init(keys[1], kv_dim, inner, dtype=dtype),
        "v": dense_init(keys[2], kv_dim, inner, dtype=dtype),
        "o": dense_init(keys[3], inner, q_dim, dtype=dtype),
    }


def _fused_self_attn_ok(tq: int, tk: int, head_dim: int, mask) -> bool:
    """Dispatch gate for the fused Pallas encoder-attention kernel: full
    (unmasked) self-attention at perf-relevant geometry on TPU. Env
    AFFECTGPT_FUSED_MHA=0 forces the XLA path everywhere."""
    import os

    if os.environ.get("AFFECTGPT_FUSED_MHA", "auto") == "0":
        return False
    return (
        mask is None
        and tq == tk
        # short sequences lose: at HuBERT's 99 tokens the kernel's per-layer
        # pad/slice and per-step dispatch cost MORE than the unfused score
        # round-trip saves (measured −8% on the audio realtime path); the
        # win starts where the n² score tensor dominates (CLIP's 257+)
        and tq >= 192
        and head_dim % 8 == 0
        and head_dim >= 32
        and jax.default_backend() == "tpu"
    )


def dropout(key, rate: float, x: jnp.ndarray) -> jnp.ndarray:
    """Inverted dropout (train-mode torch nn.Dropout): zero with prob
    `rate`, scale survivors by 1/(1-rate). Callers gate on key presence —
    eval mode simply never calls this."""
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / jnp.asarray(1.0 - rate, x.dtype), jnp.zeros((), x.dtype))


def mha(params, q_input: jnp.ndarray, kv_input: jnp.ndarray, num_heads: int,
        mask: Optional[jnp.ndarray] = None, probs_drop=None) -> jnp.ndarray:
    """Attention with full softmax in fp32. q_input [b, tq, dq],
    kv_input [b, tk, dkv], mask broadcastable to [b, h, tq, tk] (bool,
    True = attend). Unmasked self-attention at encoder geometry routes
    through the fused Pallas kernel on TPU (no HBM score tensor).
    probs_drop: optional (key, rate) — train-mode dropout on the softmaxed
    attention probabilities (BERT attention_probs_dropout_prob; the
    reference's trainable Q-Former runs it, Qformer.py:259)."""
    b, tq, _ = q_input.shape
    tk = kv_input.shape[1]
    q_w = params["q"].get("w", params["q"].get("w_q"))
    inner = q_w.shape[1]
    head_dim = inner // num_heads

    q = dense(params["q"], q_input).reshape(b, tq, num_heads, head_dim)
    k = dense(params["k"], kv_input).reshape(b, tk, num_heads, head_dim)
    v = dense(params["v"], kv_input).reshape(b, tk, num_heads, head_dim)

    if probs_drop is None and _fused_self_attn_ok(tq, tk, head_dim, mask):
        from affectgpt_tpu.ops import vit_attention_pallas

        out = vit_attention_pallas.fused_self_attention(q, k, v, valid_len=tk)
        out = out.astype(q_input.dtype).reshape(b, tq, inner)
        return dense(params["o"], out)

    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits / math.sqrt(head_dim)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    if probs_drop is not None:
        probs = dropout(probs_drop[0], probs_drop[1], probs)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32)
    out = out.astype(q_input.dtype).reshape(b, tq, inner)
    return dense(params["o"], out)


def tree_cast(tree, dtype):
    return jax.tree.map(lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


def count_params(tree) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(tree))
