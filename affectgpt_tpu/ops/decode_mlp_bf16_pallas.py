"""Fused bf16 decode-MLP Pallas kernel: rmsnorm → gate/up matmuls →
silu·mul → down matmul → residual, in ONE kernel call.

The int8 sibling (decode_mlp_pallas.py) measured 67.7 vs 68.7 clips/s
against XLA at 7B b288 — but every weight tile there pays an
int8→bf16 VPU convert before its dot. The flagship serving path
(bench.py 3B bf16 merged-LoRA) streams bf16 weights with NO conversion,
so the same fusion idea gets a second, cleaner shot here: activations
and the silu(gate)·up intermediate stay in VMEM, the three weight
matrices stream tile-by-tile (the unavoidable HBM traffic), and one
kernel replaces the ~8-op XLA MLP sublayer (q=1 decode is
op-overhead-bound: 0.378 ms/layer at 3B vs a 0.25 ms HBM floor —
CLAUDE.md decode layer-scaling sweep).

Grid (I/bI, b/bm), batch innermost: consecutive steps revisit the same
weight blocks, so each weight byte is DMA'd exactly once per call.

Reference equivalence: Qwen2MLP (modeling_qwen2.py) == our
qwen2._mlp + pre-norm residual. Default-on for the bf16 decode path
(qwen2.DECODE_MLP="auto"; TPU-measured +1.3% e2e at 3B b384); "xla"
disables.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from affectgpt_tpu.ops.decode_mlp_pallas import best_block_m


def _kernel(
    x_ref,  # [bm, h] input activations (pre-norm), tile i
    ln_ref,  # [1, h] rmsnorm scale
    wg_ref,  # [h, bI] bf16 gate block j
    wu_ref,  # [h, bI] bf16 up block j
    wd_ref,  # [bI, h] bf16 down block j
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
        xn_ref[row, :] = xn.astype(xn_ref.dtype)
        acc_ref[row, :] = jnp.zeros((block_m, acc_ref.shape[1]), jnp.float32)

    xn = xn_ref[row, :]
    g = jnp.dot(xn, wg_ref[:], preferred_element_type=jnp.float32)
    u = jnp.dot(xn, wu_ref[:], preferred_element_type=jnp.float32)
    a = (jax.nn.silu(g) * u).astype(xn_ref.dtype)  # [bm, bI]
    acc_ref[row, :] += jnp.dot(a, wd_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        out = x_ref[:].astype(jnp.float32) + acc_ref[row, :]
        o_ref[:] = out.astype(o_ref.dtype)


def activation_vmem_bytes(b: int, h: int, ws: int = 2) -> int:
    """Batch-scaled part of the scoped-VMEM working set: double-buffered
    x/o tiles (2×(x,o) in the weight dtype) + xn scratch + f32 accumulator.
    Shared by fits_vmem and the block_i picker so the dispatch gate and the
    kernel's actual allocation can't drift apart."""
    return 4 * b * h * ws + b * h * ws + 4 * b * h


# Mosaic overhead the working-set model undercounts: at b=512/h=2048 bf16
# the model gives 17.0 MB but Mosaic reports 17.43 MB scoped VMEM at
# block_i=128 — ~0.43 MB of compiler-managed temporaries/alignment. The
# gate adds this slack so batches in the fuzzy band near the 16 MB limit
# (e.g. b464/h2048, modeled 15.7 MB, actual ~16.1 MB) decline to XLA.
_MOSAIC_SLACK_BYTES = int(0.45 * 2**20)


def min_vmem_bytes(b: int, h: int, ws: int = 2) -> int:
    """Modeled scoped-VMEM working set at the smallest weight block
    (block_i=128): activation term + double-buffered gate/up/down weight
    blocks. The one-tile batch layout (the whole point of the kernel —
    x/o transfer once) makes this scale with b, so past a batch bound the
    kernel cannot compile at all (b=512/h=2048 bf16: modeled 17.0 MB,
    Mosaic-measured 17.43 MB — see _MOSAIC_SLACK_BYTES — vs the 16 MB
    scoped limit). Dispatch must check fits_vmem and fall back to XLA."""
    return activation_vmem_bytes(b, h, ws) + 6 * h * 128 * ws


def fits_vmem(b: int, h: int, ws: int = 2) -> bool:
    """True when some weight block size can fit Mosaic's 16 MB scoped VMEM,
    including the measured ~0.43 MB of unmodeled Mosaic overhead (keeps the
    TPU-verified b448/h2048 = 15.25+0.45 MB fused while rejecting the
    untested b464-512 band whose actual footprint crosses the limit)."""
    return min_vmem_bytes(b, h, ws) + _MOSAIC_SLACK_BYTES <= 16 * 2**20


def best_block_i(inter: int, cap: int = 512) -> int:
    """Largest lane-aligned (×128) divisor of the intermediate dim ≤ cap
    (Qwen2.5-3B's 11008 = 86×128 → 256; 7B's 18944 = 148×128 → 512)."""
    best = 0
    d = 128
    while d <= min(inter, cap):
        if inter % d == 0:
            best = d
        d += 128
    return best


@partial(jax.jit, static_argnames=("eps", "block_m", "block_i", "interpret"))
def decode_mlp_bf16(
    x: jnp.ndarray,  # [b, h]
    ln_scale: jnp.ndarray,  # [h]
    w_gate: jnp.ndarray,  # [h, I] bf16
    w_up: jnp.ndarray,  # [h, I] bf16
    w_down: jnp.ndarray,  # [I, h] bf16
    eps: float = 1e-6,
    block_m: int = 128,
    block_i: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + down(silu(gate(rms(x))) * up(rms(x))) for the q=1 decode step."""
    b, h = x.shape
    h2, inter = w_gate.shape
    assert h2 == h and w_up.shape == (h, inter) and w_down.shape == (inter, h)
    # One batch tile when it fits: the [b,h] scratch is allocated for ALL
    # tiles anyway, and a constant x/o index map means the activations
    # transfer once instead of once per intermediate block (43× at 3B —
    # with bm=128 the re-DMA'd x + re-flushed o nearly double traffic).
    # block_i then shrinks until the whole working set fits scoped VMEM:
    # x/o double-buffered + xn + f32 acc + double-buffered weight blocks
    # (measured: bi=256 at b=384/h=2048 is 16.07 MB — 72 KB over the 16 MB
    # limit — so budget to 15 MB and let bi drop to 128 there).
    ws = jnp.dtype(w_gate.dtype).itemsize
    block_m = best_block_m(b, cap=max(block_m, 512))
    fixed = activation_vmem_bytes(b, h, ws)  # 2×(x,o) + xn + acc
    block_i = best_block_i(inter, cap=block_i)
    while block_i > 128 and fixed + 6 * h * block_i * ws > 15 * 2**20:
        block_i = best_block_i(inter, cap=block_i - 128)
    assert block_m > 0 and block_i > 0, (b, inter)

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
            pl.BlockSpec((h, block_i), lambda j, i: (0, j)),  # up block
            pl.BlockSpec((block_i, h), lambda j, i: (j, 0)),  # down block
        ],
        out_specs=pl.BlockSpec((block_m, h), lambda j, i: (i, 0)),
        scratch_shapes=[
            # intermediates follow the weight dtype: bf16 in production,
            # f32 when testing fp32 weights (keeps numerics exact there)
            pltpu.VMEM((b, h), w_gate.dtype),
            pltpu.VMEM((b, h), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * inter * 3,
            bytes_accessed=3 * h * inter * 2 + 2 * b * h * 2,
            transcendentals=b * inter,
        ),
        interpret=interpret,
    )(x, ln2, w_gate, w_up, w_down)
