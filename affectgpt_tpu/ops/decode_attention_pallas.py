"""Pallas fused decode-attention kernel (dense KV cache).

One grid cell per (sequence, kv-head): streams that head's whole cache
tile [T, d] into VMEM once and computes QK^T → masked softmax → PV in a
single kernel, replacing the XLA chain of 5+ ops per layer per decode
step (einsum, scale, where, softmax, einsum) whose op boundaries cost
~0.13 ms/layer at b384 (CLAUDE.md decode profiling). GQA: the q heads of
one kv head ride together as the [groups, d] tile.

Cache layout matches models/qwen2.init_cache: [b, kv_heads, T, head_dim].
VMEM per cell = 2·T·d·2B (K+V bf16) + [g, T] f32 scores — T ≤ 8k fits.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, head_dim: int):
    q = q_ref[0, 0].astype(jnp.float32)  # [g, d]
    k = k_ref[0, 0].astype(jnp.float32)  # [T, d]
    v = v_ref[0, 0].astype(jnp.float32)
    m = m_ref[0]  # [1, T] f32 (1 = valid) — kept 2-D: Mosaic layout
    # inference rejects 1-D vectors here; masking is additive instead of
    # a bool select for the same reason.

    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [g, T]
    scores = scores / np.sqrt(head_dim).astype(np.float32)
    scores = scores + (m - 1.0) * 1e30  # invalid columns → -1e30
    mx = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - mx) * m  # invalid columns → exactly 0
    denom = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-20)
    out = jax.lax.dot_general(
        p / denom, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [g, d]
    o_ref[0, 0] = out.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def decode_attention_pallas(
    q: jnp.ndarray,  # [b, kv, groups, d] one query token per sequence
    k_cache: jnp.ndarray,  # [b, kv, T, d]
    v_cache: jnp.ndarray,  # [b, kv, T, d]
    key_mask: jnp.ndarray,  # [b, T] bool — valid cache columns per row
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns [b, kv, groups, d] attention outputs (f32-accumulated)."""
    b, kv, groups, d = q.shape
    t = k_cache.shape[2]
    # [b, 1, T] so the block's trailing two dims (1, T) equal the array's
    # (Mosaic tiling constraint on sub-array blocks)
    mask8 = key_mask.astype(jnp.float32)[:, None, :]
    grid = (b, kv)
    return pl.pallas_call(
        partial(_kernel, head_dim=d),
        out_shape=jax.ShapeDtypeStruct((b, kv, groups, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, groups, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, t, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, t, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, groups, d), lambda i, j: (i, j, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(q, k_cache, v_cache, mask8)
