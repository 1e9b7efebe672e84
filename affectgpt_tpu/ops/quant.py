"""Int8/int4 weight quantization with fused Pallas matmul kernels.

MATMUL_MODE selects the serving precision at trace time:
- "w8"   (default): int8 weights, bf16 activations — dequant-in-kernel.
- "w8a8": int8 weights AND activations (dynamic per-row quantization) —
  int8×int8 MXU matmuls at 2× bf16 throughput; more quantization error.

W4 (int4 grouped) is a separate weight format selected per-tree
(`quantize_dense_tree(..., bits=4)`): two int4 values packed per int8
byte (low nibbles = rows [0, K/2), high nibbles = rows [K/2, K) — the
unpack is two shift/mask ops, no interleave), with per-(K-group, out
channel) float32 scales (group 128, the GPTQ/AWQ standard). Autoregressive
decode of the 7B flagship is HBM-bound on the weight read; int4 halves it
again vs int8 (7.6 GB → 3.8 GB per step) at grouped-quant accuracy.

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


# ---------------------------------------------------------------------------
# W4: int4 grouped quantization

INT4_GROUP = 128  # K-rows per scale group (GPTQ/AWQ default)


def quantize_int4_grouped(
    w: jnp.ndarray, group_size: int = INT4_GROUP
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[K, N] float → (packed int8 [K/2, N], scales f32 [K/group, N]).

    Symmetric per-(group, output-channel) quantization to [-7, 7]
    (scale = absmax/7). Packing: byte[k, n] = (q[k + K/2, n] << 4) |
    (q[k, n] & 0xF) — low nibble holds the first K-half, high nibble the
    second, so the kernel unpacks with one mask and one arithmetic shift
    and contracts each half against the matching x columns.
    """
    k, n = w.shape
    assert k % 2 == 0 and k % group_size == 0 and (k // 2) % group_size == 0, (k, group_size)
    w = w.astype(jnp.float32)
    groups = k // group_size
    wg = w.reshape(groups, group_size, n)
    absmax = jnp.max(jnp.abs(wg), axis=1, keepdims=True)  # [G, 1, N]
    scale = jnp.maximum(absmax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wg / scale), -7, 7).astype(jnp.int32).reshape(k, n)
    lo, hi = q[: k // 2], q[k // 2 :]
    packed = ((hi << 4) | (lo & 0xF)).astype(jnp.int8)
    return packed, scale[:, 0, :]


def _unpack_int4(packed_i32: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """int32 packed bytes → (low-nibble int32, high-nibble int32), signed."""
    lo = ((packed_i32 & 0xF) ^ 0x8) - 0x8  # sign-extend 4-bit
    hi = packed_i32 >> 4  # arithmetic shift; int8 sign already extended
    return lo, hi


def _kernel_w4(x_lo_ref, x_hi_ref, wp_ref, s_lo_ref, s_hi_ref, o_ref, acc_ref, *, group: int):
    """One (m, n, k) tile of the W4 matmul. The packed tile covers real-K
    rows [l·bk, (l+1)·bk) in the low nibbles and [K/2 + l·bk, …) in the
    high nibbles; each nibble half is contracted subgroup-by-subgroup
    (static unroll, `group`-wide MXU dots) so the per-group scales apply
    to f32 partial sums — the dequantized weight tile never exists."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    wp = wp_ref[:].astype(jnp.int32)
    lo, hi = _unpack_int4(wp)
    bk = wp.shape[0]
    for half, x_ref, s_ref in ((lo, x_lo_ref, s_lo_ref), (hi, x_hi_ref, s_hi_ref)):
        w_bf = half.astype(jnp.bfloat16)
        for s in range(bk // group):
            xs = x_ref[:, s * group : (s + 1) * group].astype(jnp.bfloat16)
            ws = w_bf[s * group : (s + 1) * group, :]
            p = jnp.dot(xs, ws, preferred_element_type=jnp.float32)
            # s_ref is [1, sg, bn] (3-D so Mosaic's sublane-divisibility rule
            # sees a full-array middle dim); row s scales this subgroup
            acc_ref[:] += p * s_ref[0, s : s + 1, :].astype(jnp.float32)

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _w4_block_k(k_half: int, group: int, cap: int = 1024) -> int:
    """Largest multiple of `group` that divides k_half and is ≤ cap."""
    best = 0
    d = group
    while d <= min(k_half, cap):
        if k_half % d == 0:
            best = d
        d += group
    return best


def int4_shapes_ok(x2d, w_p, group: int = INT4_GROUP, block_m: int = 256, block_n: int = 512) -> bool:
    m = x2d.shape[0]
    k_half, n = w_p.shape
    return (
        m % min(block_m, m) == 0
        and n % min(block_n, n) == 0
        and k_half % group == 0
        and _w4_block_k(k_half, group) > 0
    )


@partial(jax.jit, static_argnames=("group", "block_m", "block_n", "interpret"))
def int4_matmul(
    x: jnp.ndarray,
    w_p: jnp.ndarray,
    scales: jnp.ndarray,
    group: int = INT4_GROUP,
    block_m: int = 256,
    block_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x [M, K] (bf16/f32) @ dequant(w_p int4-packed [K/2, N],
    scales [K/group, N]) → [M, N] x.dtype.

    Grid (M/bm, N/bn, (K/2)/bk) with K innermost; every step streams one
    packed tile (bk rows of bytes = 2·bk rows of weights) and contracts
    both nibble halves against their x column blocks, accumulating in an
    f32 VMEM scratch tile.
    """
    m, k = x.shape
    k_half, n = w_p.shape
    assert k == 2 * k_half, (k, k_half)
    groups = k // group
    assert scales.shape == (groups, n), (scales.shape, groups, n)
    if m < 8:
        # Mosaic executes degenerate sub-sublane M tiles pathologically
        # (b1 latency mode measured ~40 ms/step vs ~1 ms at M=8); pad to
        # the 8-row sublane minimum and slice the result
        x_pad = jnp.pad(x, ((0, 8 - m), (0, 0)))
        return int4_matmul(
            x_pad, w_p, scales, group=group, block_m=block_m, block_n=block_n,
            interpret=interpret,
        )[:m]
    block_m = min(block_m, m)
    block_n = min(block_n, n)
    block_k = _w4_block_k(k_half, group)
    assert m % block_m == 0 and n % block_n == 0 and block_k > 0, (m, n, k)

    nk = k_half // block_k  # packed K blocks; also the hi-half block offset
    sg = block_k // group  # scale rows per block
    # scales [K/group, N] → [2·nk, sg, N]: blocked (1, sg, block_n), so the
    # sublane-adjacent dims are (sg == full dim, 128-multiple) — Mosaic's
    # block-shape rule rejects a 2-D (sg, block_n) block when sg % 8 != 0
    scales3 = scales.reshape(2 * nk, sg, n)
    grid = (m // block_m, n // block_n, nk)
    return pl.pallas_call(
        partial(_kernel_w4, group=group),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, l: (i, l)),  # x low half
            pl.BlockSpec((block_m, block_k), lambda i, j, l: (i, l + nk)),  # x high half
            pl.BlockSpec((block_k, block_n), lambda i, j, l: (l, j)),  # packed bytes
            pl.BlockSpec((1, sg, block_n), lambda i, j, l: (l, 0, j)),  # low-half scales
            pl.BlockSpec((1, sg, block_n), lambda i, j, l: (l + nk, 0, j)),  # high-half scales
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, l: (i, j)),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * 2 + k_half * n + m * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, x, w_p, scales3, scales3)


def _kernel_w4_smallm(
    x_lo_ref, x_hi_ref, wp_ref, s_lo_ref, s_hi_ref, o_ref, acc_ref,
    *, group: int,
):
    """Small-M (decode) int4 tile: dequantize the packed tile into a bf16
    VMEM scratch FIRST (pure VPU work — unpack + per-group scale), then
    ONE MXU dot per nibble half. Mosaic's handling of the subgroup-unrolled
    dot sequence in _kernel_w4 is pathological at M≤8 (measured ~37× over
    the streaming bound at batch 1); a single fat dot per half sidesteps
    it while the dequantized weights still never touch HBM."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    wp = wp_ref[:].astype(jnp.int32)
    lo, hi = _unpack_int4(wp)
    bk, bn = wp.shape
    sg = bk // group
    for half, x_ref, s_ref in ((lo, x_lo_ref, s_lo_ref), (hi, x_hi_ref, s_hi_ref)):
        w_g = half.reshape(sg, group, bn).astype(jnp.float32)
        w_g = w_g * s_ref[0][:, None, :].astype(jnp.float32)
        w_bf = w_g.reshape(bk, bn).astype(jnp.bfloat16)
        acc_ref[:] += jnp.dot(
            x_ref[:].astype(jnp.bfloat16), w_bf,
            preferred_element_type=jnp.float32,
        )

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("group", "block_n", "interpret"))
def int4_matmul_smallm(
    x: jnp.ndarray,
    w_p: jnp.ndarray,
    scales: jnp.ndarray,
    group: int = INT4_GROUP,
    block_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Decode-shaped int4 matmul (M ≤ 8 after padding): same contract as
    int4_matmul, different inner loop (see _kernel_w4_smallm)."""
    m, k = x.shape
    k_half, n = w_p.shape
    assert k == 2 * k_half, (k, k_half)
    groups = k // group
    assert scales.shape == (groups, n), (scales.shape, groups, n)
    if m < 8:
        x_pad = jnp.pad(x, ((0, 8 - m), (0, 0)))
        return int4_matmul_smallm(
            x_pad, w_p, scales, group=group, block_n=block_n, interpret=interpret
        )[:m]
    block_n = min(block_n, n)
    block_k = _w4_block_k(k_half, group)
    assert n % block_n == 0 and block_k > 0, (m, n, k)

    nk = k_half // block_k
    sg = block_k // group
    scales3 = scales.reshape(2 * nk, sg, n)
    grid = (1, n // block_n, nk)
    return pl.pallas_call(
        partial(_kernel_w4_smallm, group=group),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, block_k), lambda i, j, l: (0, l)),
            pl.BlockSpec((m, block_k), lambda i, j, l: (0, l + nk)),
            pl.BlockSpec((block_k, block_n), lambda i, j, l: (l, j)),
            pl.BlockSpec((1, sg, block_n), lambda i, j, l: (l, 0, j)),
            pl.BlockSpec((1, sg, block_n), lambda i, j, l: (l + nk, 0, j)),
        ],
        out_specs=pl.BlockSpec((m, block_n), lambda i, j, l: (0, j)),
        scratch_shapes=[pltpu.VMEM((m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * 2 + k_half * n + m * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, x, w_p, scales3, scales3)


def int4_matmul_xla(
    x: jnp.ndarray, w_p: jnp.ndarray, scales: jnp.ndarray, group: int = INT4_GROUP
) -> jnp.ndarray:
    """XLA fallback with identical semantics (CPU / odd shapes / testing)."""
    k_half, n = w_p.shape
    k = 2 * k_half
    lo, hi = _unpack_int4(w_p.astype(jnp.int32))
    w = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32)
    w = (w.reshape(k // group, group, n) * scales[:, None, :]).reshape(k, n)
    y = jnp.dot(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )
    return y.astype(x.dtype)


def int8_matmul_xla(x: jnp.ndarray, w_q: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """XLA fallback with identical semantics (used on CPU / for testing)."""
    y = jnp.dot(
        x.astype(jnp.bfloat16), w_q.astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )
    return (y * scales.astype(jnp.float32)).astype(x.dtype)


def quantize_dense_tree(params, bits: int = 8, group_size: int = INT4_GROUP) -> dict:
    """Quantize every 2-D 'w' leaf of a dense-params pytree in place
    (dict-level): {'w': [K,N], 'b'?} → {'w_q', 'scales', 'b'?} (bits=8)
    or {'w_q4', 'scales', 'b'?} (bits=4, per-group scales). bits=4 leaves
    with a K not divisible by 2·group_size fall back to int8."""
    assert bits in (8, 4), bits

    def visit(node):
        if isinstance(node, dict):
            if "w" in node and getattr(node["w"], "ndim", 0) == 2:
                k = node["w"].shape[0]
                if bits == 4 and k % (2 * group_size) == 0:
                    w_p, scales = quantize_int4_grouped(node["w"], group_size)
                    out = {"w_q4": w_p, "scales": scales}
                else:
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

# M threshold separating decode-shaped (Pallas weight-streaming kernel;
# HBM-bound, quantized bytes are the traffic) from prefill-shaped matmuls
# (XLA dequant path; compute-bound, transient bf16 weights run the MXU at
# full rate and XLA's own blocking reuses them across all M tiles).
# Env-tunable: AFFECTGPT_PALLAS_MAX_M=0 forces the XLA path everywhere
# (for int8, XLA fuses the int8→bf16 convert into the dot — no transient).
PALLAS_DEQUANT_MAX_M = int(__import__("os").environ.get("AFFECTGPT_PALLAS_MAX_M", 1024))

# int4-only small-M floor: Mosaic's handling of the subgroup-unrolled int4
# dots is pathological at M≤8 (batch-1 latency measured ~37× over the
# streaming bound even with the 8-row sublane pad), so tiny-M int4 matmuls
# route to the XLA dequant path instead — its transient bf16 weight write
# (~5× the int4 bytes) is still far cheaper than the Mosaic degenerate case.
PALLAS_INT4_MIN_M = int(__import__("os").environ.get("AFFECTGPT_PALLAS_INT4_MIN_M", 16))


def dense_w8a8_xla(x: jnp.ndarray, w_q: jnp.ndarray, scales: jnp.ndarray, b=None) -> jnp.ndarray:
    """W8A8 dense through XLA's native int8 MXU path (v5e: 2× the bf16
    rate): dynamic per-row activation quantization + per-output-channel
    int8 weights, int8×int8 → int32 dot, fp32 rescale. The encoder serving
    mode (frozen compute-bound towers — CLIP/HuBERT); the LLM decoder uses
    the Pallas kernels above instead."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(absmax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, w_q, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * sx * scales.astype(jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(orig_dtype)


# Encoder towers reuse the decoder leaf format ({"w_q","scales","b"?});
# nn.dense/dense_nobias dispatch on it and run dense_w8a8_xla — the
# compute-bound frozen towers (CLIP/HuBERT) get the 2× int8 MXU rate.
# Conv / LN / embedding leaves (non-2-D or no "w") pass through untouched.
quantize_encoder_tree = quantize_dense_tree
