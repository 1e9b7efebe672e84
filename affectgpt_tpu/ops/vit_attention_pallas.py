"""Fused non-causal ViT attention (Pallas, TPU).

The realtime encoder path runs CLIP ViT-L/14 over thousands of 257-token
images per serving batch. XLA's unfused attention materializes the fp32
score tensor in HBM ([b·t, h, n, n] ≈ 8.6 GB at batch 2048) and rereads
it through softmax and the value matmul — ~26 GB of HBM traffic per layer
that a fused kernel eliminates entirely.

Design (short-sequence regime, NOT flash-streaming): at n ≤ ~512 and
head_dim 64, one (image, head-block) tile's ENTIRE attention fits in VMEM
(scores [hb, n, n] fp32 ≈ 1.1 MB at hb=4, n=264), so the kernel does
qkᵀ → masked fp32 softmax → pv in one VMEM-resident pass, grid over
(batch, num_heads/hb). Sequences are padded to a sublane multiple by the
caller (257 → 264 for CLIP); `valid_len` masks the padded keys in-kernel
(a free iota compare — no mask tensor in HBM).

Reference equivalence: HF CLIPAttention (fp32 softmax, bf16 matmuls) —
numerics identical up to fp32 reduction order.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# heads per grid step: more heads = fewer, fatter steps (less per-step
# dispatch overhead) at the cost of VMEM (scores hb·n²·4B ≈ 2.2 MB at
# hb=8, n=264); must leave room for q/k/v/out tiles
DEFAULT_HEAD_BLOCK = int(os.environ.get("AFFECTGPT_ATTN_HB", 8))


def _kernel(q_ref, k_ref, v_ref, o_ref, *, valid_len: int, sm_scale: float):
    q = q_ref[0]  # [hb, n, d] bf16
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [hb, n, n]
    s = s * sm_scale
    kv_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(kv_idx < valid_len, s, -1e30)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [hb, n, d]
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("valid_len", "head_block", "interpret"))
def fused_vit_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    valid_len: int,
    head_block: int = DEFAULT_HEAD_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    """q/k/v [b, h, n, d] (n sublane-padded; keys ≥ valid_len are masked)
    → [b, h, n, d] in q.dtype. Softmax in fp32, matmuls on the MXU with
    fp32 accumulation; no HBM score tensor."""
    b, h, n, d = q.shape
    assert k.shape == v.shape == (b, h, n, d)
    assert n % 8 == 0, n
    hb = min(head_block, h)
    while h % hb:
        hb -= 1
    sm_scale = 1.0 / float(d) ** 0.5

    grid = (b, h // hb)
    spec = pl.BlockSpec((1, hb, n, d), lambda i, j: (i, j, 0, 0))
    return pl.pallas_call(
        functools.partial(_kernel, valid_len=valid_len, sm_scale=sm_scale),
        out_shape=jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * n * n * d,
            bytes_accessed=4 * b * h * n * d * 2,
            transcendentals=b * h * n * n,
        ),
        interpret=interpret,
    )(q, k, v)


def fused_self_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, valid_len: int
) -> jnp.ndarray:
    """q/k/v [b, t, h, d] (t possibly already sublane-padded; keys ≥
    valid_len masked) → [b, t, h, d]. Handles the head-major transpose and
    any remaining sublane pad around the kernel."""
    b, t, h, d = q.shape
    pad = -t % 8
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    qh = q.transpose(0, 2, 1, 3)
    kh = k.transpose(0, 2, 1, 3)
    vh = v.transpose(0, 2, 1, 3)
    o = fused_vit_attention(qh, kh, vh, valid_len=valid_len)
    o = o.transpose(0, 2, 1, 3)
    return o[:, :t] if pad else o


def mha_fused(params: dict, x: jnp.ndarray, num_heads: int, valid_len: int) -> jnp.ndarray:
    """Drop-in for nn.mha(params, x, x, num_heads) on padded self-attention
    inputs x [b, n_pad, w]: projections in XLA (they fuse with neighbors),
    the softmax chain in the Pallas kernel."""
    from affectgpt_tpu.models import nn

    b, n, _ = x.shape
    inner = params["q"].get("w", params["q"].get("w_q")).shape[1]
    d = inner // num_heads
    q = nn.dense(params["q"], x).reshape(b, n, num_heads, d)
    k = nn.dense(params["k"], x).reshape(b, n, num_heads, d)
    v = nn.dense(params["v"], x).reshape(b, n, num_heads, d)
    o = fused_self_attention(q, k, v, valid_len=valid_len)
    o = o.reshape(b, n, inner).astype(x.dtype)
    return nn.dense(params["o"], o)
