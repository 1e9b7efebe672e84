"""Fused decode-MLP Pallas kernel: rmsnorm → gate/up int8 matmuls → silu·mul
→ down int8 matmul → residual, in ONE kernel call.

The q=1 decode phase is op-dispatch-bound (CLAUDE.md round-2 anatomy:
~1.06 ms/layer at 7B b288, vs a ~0.5 ms weight+cache HBM floor); each
decoder layer's MLP alone is ~8 XLA ops whose activations bounce through
HBM between every op. This kernel keeps the normalized activations and
the silu(gate)·up intermediate entirely in VMEM, streams the int8 weights
tile-by-tile (the only unavoidable HBM traffic), and writes just the
residual-added output.

Layout: the DEFAULT split serving layout (w_gate/w_up/w_down separate,
per-channel int8 scales) — no dependence on fuse_qkv_gateup.

Grid (I/bI, b/bm) with the BATCH dimension innermost: consecutive steps
revisit the same weight blocks (Pallas skips the re-DMA when a block's
index map is unchanged), so each weight byte is fetched exactly once per
call — a batch-outer grid was measured 4% slower e2e because it streamed
the MLP weights once per batch tile. The normalized activations and the
down-projection accumulator live in full-batch VMEM scratch, dynamically
sliced per batch tile. VMEM ≈ 13 MB at b288/bI=256/h=3584 — inside the
~16 MB/core budget.

Measured verdict (7B int8 b288, one v5e): 67.7 clips/s vs 68.7 for the
XLA op-by-op MLP — XLA's own fusion + pipelining already wins, matching
the round-1 finding for the fused decode-attention kernel. Kept as an
opt-in (qwen2.DECODE_MLP="pallas") for future stacks where the tradeoff
may flip; the XLA path stays the default.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    x_ref,  # [bm, h] input activations (pre-norm), tile i
    ln_ref,  # [1, h] rmsnorm scale
    wg_ref,  # [h, bI] int8 gate block j
    sg_ref,  # [1, bI] f32 gate scales
    wu_ref,  # [h, bI] int8 up block j
    su_ref,  # [1, bI] f32 up scales
    wd_ref,  # [bI, h] int8 down block j
    sd_ref,  # [1, h] f32 down scales
    o_ref,  # [bm, h] out, tile i
    xn_ref,  # scratch [b, h] bf16 normalized activations (ALL tiles)
    acc_ref,  # scratch [b, h] f32 down accumulator (ALL tiles)
    *,
    eps: float,
    block_m: int,
):
    j = pl.program_id(0)  # intermediate-dim block (outer)
    i = pl.program_id(1)  # batch tile (inner)
    row = pl.ds(i * block_m, block_m)

    @pl.when(j == 0)
    def _():
        x = x_ref[:].astype(jnp.float32)
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        xn = x * jax.lax.rsqrt(var + eps) * ln_ref[:].astype(jnp.float32)
        xn_ref[row, :] = xn.astype(jnp.bfloat16)
        acc_ref[row, :] = jnp.zeros((block_m, acc_ref.shape[1]), jnp.float32)

    xn = xn_ref[row, :]
    g = jnp.dot(xn, wg_ref[:].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    g = g * sg_ref[:].astype(jnp.float32)
    u = jnp.dot(xn, wu_ref[:].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    u = u * su_ref[:].astype(jnp.float32)
    a = (jax.nn.silu(g) * u).astype(jnp.bfloat16)  # [bm, bI]
    acc_ref[row, :] += jnp.dot(
        a, wd_ref[:].astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        out = x_ref[:].astype(jnp.float32) + acc_ref[row, :] * sd_ref[:].astype(jnp.float32)
        o_ref[:] = out.astype(o_ref.dtype)


def best_block_m(b: int, cap: int = 128) -> int:
    """Largest divisor of b that is a multiple of 8 (Mosaic sublane) and
    ≤ cap; 0 if none (caller falls back to the XLA path)."""
    best = 0
    d = 8
    while d <= min(b, cap):
        if b % d == 0:
            best = d
        d += 8
    return best


@partial(jax.jit, static_argnames=("eps", "block_m", "block_i", "interpret"))
def decode_mlp_pallas(
    x: jnp.ndarray,  # [b, h]
    ln_scale: jnp.ndarray,  # [h]
    w_gate_q: jnp.ndarray,  # [h, I] int8
    s_gate: jnp.ndarray,  # [1, I] f32
    w_up_q: jnp.ndarray,
    s_up: jnp.ndarray,
    w_down_q: jnp.ndarray,  # [I, h] int8
    s_down: jnp.ndarray,  # [1, h] f32
    eps: float = 1e-6,
    block_m: int = 128,
    block_i: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + down(silu(gate(rms(x))) * up(rms(x))) for the q=1 decode step."""
    b, h = x.shape
    h2, inter = w_gate_q.shape
    assert h2 == h and w_up_q.shape == (h, inter) and w_down_q.shape == (inter, h)
    block_m = best_block_m(b, cap=block_m)
    block_i = min(block_i, inter)
    assert block_m > 0 and inter % block_i == 0, (b, inter, block_m, block_i)

    ln2 = ln_scale.reshape(1, h)
    grid = (inter // block_i, b // block_m)  # batch innermost: weights DMA once
    return pl.pallas_call(
        partial(_kernel, eps=eps, block_m=block_m),
        out_shape=jax.ShapeDtypeStruct((b, h), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, h), lambda j, i: (i, 0)),  # x
            pl.BlockSpec((1, h), lambda j, i: (0, 0)),  # ln scale
            pl.BlockSpec((h, block_i), lambda j, i: (0, j)),  # gate block
            pl.BlockSpec((1, block_i), lambda j, i: (0, j)),
            pl.BlockSpec((h, block_i), lambda j, i: (0, j)),  # up block
            pl.BlockSpec((1, block_i), lambda j, i: (0, j)),
            pl.BlockSpec((block_i, h), lambda j, i: (j, 0)),  # down block
            pl.BlockSpec((1, h), lambda j, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, h), lambda j, i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.bfloat16),
            pltpu.VMEM((b, h), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * inter * 3,
            bytes_accessed=2 * h * inter + inter * h + 2 * b * h * 2,
            transcendentals=b * inter,
        ),
        interpret=interpret,
    )(x, ln2, w_gate_q, s_gate, w_up_q, s_up, w_down_q, s_down)
