"""Int8 weight quantization with fused Pallas matmul kernels.

MATMUL_MODE selects the serving precision at trace time:
- "w8"   (default): int8 weights, bf16 activations — dequant-in-kernel.
- "w8a8": int8 weights AND activations (dynamic per-row quantization) —
  int8×int8 MXU matmuls at 2× bf16 throughput; more quantization error.

Serving-mode optimization with no reference equivalent (the reference
serves fp16 through HF generate): autoregressive decode is HBM-bandwidth
bound — every step re-reads all decoder weights — so storing them int8
with per-output-channel scales halves the bytes per step. The Pallas
kernel streams int8 tiles HBM→VMEM, upcasts in registers, runs the MXU
matmul in fp32 accumulation, and applies the channel scales on the final
K step; the dequantized weights never exist in HBM.

Layout: w_q int8 [K, N], scales f32 [1, N] (absmax per output channel).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_per_channel(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[K, N] float → (int8 [K, N], scales f32 [1, N])."""
    w = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)  # [1, N]
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.bfloat16)
    w = w_ref[:].astype(jnp.bfloat16)  # int8 → bf16 upcast in VMEM
    acc_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("block_m", "block_n", "block_k", "interpret"))
def int8_matmul(
    x: jnp.ndarray,
    w_q: jnp.ndarray,
    scales: jnp.ndarray,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x [M, K] (bf16/f32) @ dequant(w_q [K, N], scales [1, N]) → [M, N] x.dtype.

    Grid (M/bm, N/bn, K/bk) with K innermost, accumulating in an f32 VMEM
    scratch tile; M tiles cover both decode (small M) and prefill (M = B·T).
    """
    m, k = x.shape
    k2, n = w_q.shape
    assert k == k2 and scales.shape == (1, n)
    block_m = min(block_m, m)
    block_n = min(block_n, n)
    block_k = min(block_k, k)
    assert m % block_m == 0 and n % block_n == 0 and k % block_k == 0, (
        m, k, n, block_m, block_k, block_n,
    )

    grid = (m // block_m, n // block_n, k // block_k)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, l: (i, l)),
            pl.BlockSpec((block_k, block_n), lambda i, j, l: (l, j)),
            pl.BlockSpec((1, block_n), lambda i, j, l: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, l: (i, j)),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * 2 + k * n + m * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w_q, scales)


def _kernel_w8a8(x_ref, w_ref, s_ref, o_ref, acc_ref):
    """W8A8 tile: activations are quantized per (row, k-block) in-kernel,
    the dot runs int8×int8 → int32 on the MXU (2× bf16 throughput on
    v5e), and the per-row × per-channel scales rescale the partial sums
    in fp32 before accumulation."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.float32)  # [bm, bk]
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)  # [bm, 1]
    sx = jnp.maximum(absmax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)

    partial_i32 = jax.lax.dot_general(
        xq, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc_ref[:] += partial_i32.astype(jnp.float32) * sx  # per-row scale

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("block_m", "block_n", "block_k", "interpret"))
def int8_matmul_w8a8(
    x: jnp.ndarray,
    w_q: jnp.ndarray,
    scales: jnp.ndarray,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full int8 path: dynamic per-(row, k-block) activation quantization +
    int8 weights; int8×int8→int32 MXU matmuls. A serving-mode option —
    adds activation-quantization error on top of weight quantization."""
    m, k = x.shape
    k2, n = w_q.shape
    assert k == k2 and scales.shape == (1, n)
    block_m = min(block_m, m)
    block_n = min(block_n, n)
    block_k = min(block_k, k)
    assert m % block_m == 0 and n % block_n == 0 and k % block_k == 0

    grid = (m // block_m, n // block_n, k // block_k)
    return pl.pallas_call(
        _kernel_w8a8,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, l: (i, l)),
            pl.BlockSpec((block_k, block_n), lambda i, j, l: (l, j)),
            pl.BlockSpec((1, block_n), lambda i, j, l: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, l: (i, j)),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * 2 + k * n + m * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w_q, scales)


def int8_matmul_xla(x: jnp.ndarray, w_q: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """XLA fallback with identical semantics (used on CPU / for testing)."""
    y = jnp.dot(
        x.astype(jnp.bfloat16), w_q.astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )
    return (y * scales.astype(jnp.float32)).astype(x.dtype)


def quantize_dense_tree(params) -> dict:
    """Quantize every 2-D 'w' leaf of a dense-params pytree in place
    (dict-level): {'w': [K,N], 'b'?} → {'w_q', 'scales', 'b'?}."""

    def visit(node):
        if isinstance(node, dict):
            if "w" in node and getattr(node["w"], "ndim", 0) == 2:
                w_q, scales = quantize_per_channel(node["w"])
                out = {"w_q": w_q, "scales": scales}
                if "b" in node:
                    out["b"] = node["b"]
                return out
            return {k: visit(v) for k, v in node.items()}
        if isinstance(node, list):
            return [visit(v) for v in node]
        return node

    return visit(params)


# serving precision mode, read at trace time by the decoder's dense layers
MATMUL_MODE = "w8"
