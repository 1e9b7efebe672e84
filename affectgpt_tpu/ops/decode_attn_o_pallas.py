"""Fused decode attention+output-projection Pallas kernel (dense KV cache).

Completes the decode-step back half of the attention sublayer in ONE
kernel: QK^T → masked online softmax → PV → o_proj → residual add. With
the fused qkv kernel (norm+projections+rope) in front of it, the whole
attention sublayer becomes two Pallas calls + the two cache-row writes —
the XLA chain it replaces is ~8 ops per layer per decode step (einsum,
scale, where, softmax, einsum, reshape, o-matmul, residual), each paying
op-boundary overhead at q=1 (CLAUDE.md decode layer-scaling sweep).

Layout: grid (b/bm, T/bt + 1), T-blocks innermost with a flash-style
online softmax in scratch — the KV cache streams block-by-block while
W_o rides a constant index map (DMA'd once, VMEM-resident: 8 MB bf16 at
3B width 2048). The final grid step normalizes the accumulator,
assembles the head-major [bm, H·d] activation from per-head 2-D slices
(no head transpose materializes — the vit_sublayer_pallas idiom) and
runs o_proj + residual on the MXU.

Reference equivalence: Qwen2Attention eager path + o_proj + residual
(modeling_qwen2.py); our unfused path is models/qwen2._attention's GQA
einsum chain. Opt-in via qwen2.DECODE_ATTN_O until TPU-measured.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from affectgpt_tpu.ops.decode_mlp_pallas import best_block_m


def _kernel(
    x_ref,  # [bm, h] raw residual stream
    q_ref,  # [bm, kv, g, d] roped queries
    k_ref,  # [bm, kv, bt, d] cache block j
    v_ref,  # [bm, kv, bt, d]
    lo_ref,  # [bm, 1] f32 first valid cache column per row
    hi_ref,  # [bm, 1] f32 last valid cache column per row
    wo_ref,  # [H*d, h] resident
    o_ref,  # [bm, h] out: x + attn @ wo
    mx_ref,  # scratch [bm, kv, g, 1] f32 running max
    l_ref,  # scratch [bm, kv, g, 1] f32 running denom
    acc_ref,  # scratch [bm, kv, g, d] f32 unnormalized PV accumulator
    *, head_dim: int, block_t: int,
):
    j = pl.program_id(1)
    n_t = pl.num_programs(1) - 1
    kv, groups = q_ref.shape[1], q_ref.shape[2]
    bm = q_ref.shape[0]
    scale = 1.0 / float(head_dim) ** 0.5

    @pl.when(j == 0)
    def _():
        mx_ref[:] = jnp.full_like(mx_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j < n_t)
    def _():
        # valid-window mask rebuilt in-kernel (a [bm, bt] mask block's
        # trailing dim would violate Mosaic's 128-divisibility rule)
        col = jax.lax.broadcasted_iota(jnp.int32, (bm, 1, block_t), 2).astype(
            jnp.float32
        ) + (j * block_t).astype(jnp.float32)
        lo = lo_ref[:][:, :, None]  # [bm, 1, 1]
        hi = hi_ref[:][:, :, None]
        mask = jnp.where((col >= lo) & (col <= hi), 1.0, 0.0)  # [bm, 1, bt]
        for h in range(kv):
            q = q_ref[:, h].astype(jnp.float32)  # [bm, g, d]
            k = k_ref[:, h].astype(jnp.float32)  # [bm, bt, d]
            v = v_ref[:, h].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale  # [bm, g, bt]
            s = s + (mask - 1.0) * 1e30  # invalid columns → ~-1e30
            m_old = mx_ref[:, h]  # [bm, g, 1]
            m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_old - m_new)  # [bm, g, 1]
            p = jnp.exp(s - m_new) * mask  # invalid columns → exactly 0
            pv = jax.lax.dot_general(
                p, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [bm, g, d]
            mx_ref[:, h] = m_new
            l_ref[:, h] = l_ref[:, h] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc_ref[:, h] = acc_ref[:, h] * alpha + pv

    @pl.when(j == n_t)
    def _():
        parts = []
        for h in range(kv):
            for g in range(groups):
                denom = jnp.maximum(l_ref[:, h, g], 1e-20)  # [bm, 1]
                parts.append(acc_ref[:, h, g] / denom)  # [bm, d]
        attn = jnp.concatenate(parts, axis=1).astype(x_ref.dtype)  # [bm, H*d]
        y = jnp.dot(attn, wo_ref[:], preferred_element_type=jnp.float32)
        o_ref[:] = (x_ref[:].astype(jnp.float32) + y).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("block_m", "block_t", "interpret"))
def decode_attn_o(
    x_res: jnp.ndarray,  # [b, h] raw residual stream (pre-attention)
    q: jnp.ndarray,  # [b, kv, groups, d] roped query for the new token
    k_cache: jnp.ndarray,  # [b, kv, T, d] (already holds the new token's k)
    v_cache: jnp.ndarray,  # [b, kv, T, d]
    key_mask: jnp.ndarray,  # [b, T] bool — valid cache columns per row
    wo: jnp.ndarray,  # [kv*groups*d, h]
    block_m: int = 64,
    block_t: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns x_res + o_proj(softmax(q k^T / sqrt(d)) v) — the full decode
    attention sublayer output [b, h].

    key_mask must be a contiguous per-row WINDOW of valid columns (the
    decode-step shape: left pads invalid, columns ≤ write index valid) —
    the kernel reduces it to (first, last) valid column per row and
    rebuilds the window in-kernel; non-contiguous masks are not
    representable here (the dense decode path never produces one)."""
    b, kv, groups, d = q.shape
    t = k_cache.shape[2]
    h = x_res.shape[1]
    assert wo.shape == (kv * groups * d, h)
    block_m = best_block_m(b, cap=block_m)
    while t % block_t:
        block_t //= 2
    assert block_m > 0 and block_t >= 8, (b, t)
    n_t = t // block_t

    valid = key_mask.astype(jnp.float32)  # [b, T]
    lo = jnp.argmax(valid, axis=1).astype(jnp.float32)[:, None]  # first True
    hi = (t - 1 - jnp.argmax(valid[:, ::-1], axis=1)).astype(jnp.float32)[:, None]
    grid = (b // block_m, n_t + 1)
    clamp = lambda j: jnp.minimum(j, n_t - 1)
    return pl.pallas_call(
        partial(_kernel, head_dim=d, block_t=block_t),
        out_shape=jax.ShapeDtypeStruct((b, h), x_res.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, h), lambda i, j: (i, 0)),  # x_res
            pl.BlockSpec((block_m, kv, groups, d), lambda i, j: (i, 0, 0, 0)),  # q
            pl.BlockSpec((block_m, kv, block_t, d), lambda i, j: (i, 0, clamp(j), 0)),
            pl.BlockSpec((block_m, kv, block_t, d), lambda i, j: (i, 0, clamp(j), 0)),
            pl.BlockSpec((block_m, 1), lambda i, j: (i, 0)),  # lo
            pl.BlockSpec((block_m, 1), lambda i, j: (i, 0)),  # hi
            pl.BlockSpec((kv * groups * d, h), lambda i, j: (0, 0)),  # wo resident
        ],
        out_specs=pl.BlockSpec((block_m, h), lambda i, j: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_m, kv, groups, 1), jnp.float32),
            pltpu.VMEM((block_m, kv, groups, 1), jnp.float32),
            pltpu.VMEM((block_m, kv, groups, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * kv * groups * d * (2 * t + h),
            bytes_accessed=2 * b * kv * t * d * 2 + kv * groups * d * h * 2
            + 2 * b * h * 2,
            transcendentals=b * kv * groups * t,
        ),
        interpret=interpret,
    )(x_res, q, k_cache, v_cache, lo, hi, wo)
