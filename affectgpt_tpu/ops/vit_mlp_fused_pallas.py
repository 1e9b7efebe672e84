"""Single-call fused ViT MLP sublayer: LN → fc1 → gelu → fc2 → residual
with NO HBM round trip for the [rows, mlp_dim] intermediate.

Motivation (round 4, VERDICT r3 item 2): the two-call pair
(ops/vit_mlp_pallas) pays ~24 KB/row of HBM traffic — x read twice, the
bf16 intermediate written+read (16 KB/row at I=4096), out written. The
MLP has no cross-token coupling, so the [b, n, w] activations flatten to
ONE row matrix [M, w] and the sublayer becomes a row-blocked fused matmul
chain. Grid (m_blocks, K) with the intermediate dim K-chunked innermost:

- the x/out blocks are indexed by m only → VMEM-resident across the K
  revisits (legal Pallas accumulation: consecutive grid steps, same
  block),
- fc1/fc2 column/row chunks are indexed by k → streamed, costing the
  full 16 MB (ViT-L) of weights once per m block = 16 MB / bm per row.

At bm=2048 rows that is 8 KB/row of weight traffic; total ≈
x(2) + out(2) + weights(8) = 12 KB/row — half the pair's traffic — plus
one fewer kernel dispatch per block. Accumulation across the K partials
runs in the bf16 out block (each partial is an f32 dot result rounded
once); the pair's single f32 fc2 accumulation rounds once total, so the
fused path adds ≤K-1 bf16 roundings — measured ~1-2 ulp on ViT-scale
activations (tests/test_vit_mlp_fused.py). VIT_MLP_FUSED_ACC=f32 switches
to an f32 VMEM scratch accumulator (needs bm≤1024 to fit VMEM).

Reference equivalence: HF CLIPMLP (quick_gelu) / HuBERT FFN (erf gelu) +
pre-LN residual; unfused path models/clip_vit.py _apply_block.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from affectgpt_tpu.ops.vit_mlp_pallas import _erf


def _act(t: jnp.ndarray, act: str) -> jnp.ndarray:
    if act == "quick_gelu":  # CLIP
        return t * jax.nn.sigmoid(1.702 * t)
    # "gelu": HuBERT / HF default erf gelu (A&S rational — Mosaic lowers
    # neither erf nor erfc)
    return 0.5 * t * (1.0 + _erf(t * 0.7071067811865476))


def _kernel_bf16acc(x_ref, lns_ref, lnb_ref, wi_ref, bi_ref, wo_ref, bo_ref,
                    o_ref, *, eps: float, act: str):
    k = pl.program_id(1)
    x32 = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mean) ** 2, axis=-1, keepdims=True)
    h = (x32 - mean) * jax.lax.rsqrt(var + eps)
    h = h * lns_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    t = jnp.dot(h.astype(x_ref.dtype), wi_ref[...], preferred_element_type=jnp.float32)
    t = _act(t + bi_ref[0].astype(jnp.float32), act)
    # Mosaic requires a 32-bit matmul accumulator (a bf16
    # preferred_element_type dot fails 'Expected matmul acc to be 32-bit')
    partial = jnp.dot(
        t.astype(x_ref.dtype), wo_ref[...], preferred_element_type=jnp.float32
    )

    @pl.when(k == 0)
    def _():
        o_ref[...] = (x32 + bo_ref[0].astype(jnp.float32) + partial).astype(o_ref.dtype)

    @pl.when(k > 0)
    def _():
        o_ref[...] = (o_ref[...].astype(jnp.float32) + partial).astype(o_ref.dtype)


def _kernel_f32acc(x_ref, lns_ref, lnb_ref, wi_ref, bi_ref, wo_ref, bo_ref,
                   o_ref, acc_ref, *, eps: float, act: str, k_chunks: int):
    k = pl.program_id(1)
    x32 = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mean) ** 2, axis=-1, keepdims=True)
    h = (x32 - mean) * jax.lax.rsqrt(var + eps)
    h = h * lns_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    t = jnp.dot(h.astype(x_ref.dtype), wi_ref[...], preferred_element_type=jnp.float32)
    t = _act(t + bi_ref[0].astype(jnp.float32), act)
    partial = jnp.dot(
        t.astype(x_ref.dtype), wo_ref[...], preferred_element_type=jnp.float32
    )

    @pl.when(k == 0)
    def _():
        acc_ref[...] = x32 + bo_ref[0].astype(jnp.float32) + partial

    @pl.when(k > 0)
    def _():
        acc_ref[...] = acc_ref[...] + partial

    @pl.when(k == k_chunks - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "act", "interpret", "block_rows", "k_chunks", "acc"),
)
def mlp_sublayer_fused(
    x: jnp.ndarray,  # [b, n, w]
    ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,  # [w]
    w_in: jnp.ndarray, b_in: jnp.ndarray,  # [w, I], [I]
    w_out: jnp.ndarray, b_out: jnp.ndarray,  # [I, w], [w]
    eps: float = 1e-5,
    act: str = "quick_gelu",
    interpret: bool = False,
    block_rows: int = 2048,
    k_chunks: int = 8,
    acc: str = "bf16",
) -> jnp.ndarray:
    """x + fc2(act(fc1(LN(x)))) in x.dtype, one pallas call."""
    b, n, w = x.shape
    w2, inter = w_in.shape
    assert w2 == w and w_out.shape == (inter, w)
    while inter % k_chunks:
        k_chunks //= 2
    kc = inter // k_chunks

    rows = b * n
    xm = x.reshape(rows, w)
    bm = min(block_rows, rows)
    pad = (-rows) % bm
    if pad:
        xm = jnp.pad(xm, ((0, pad), (0, 0)))
    m_blocks = xm.shape[0] // bm

    vec = lambda a: a.reshape(1, -1)
    row_block = pl.BlockSpec((bm, w), lambda m, k: (m, 0))
    const_vec = lambda d: pl.BlockSpec((1, d), lambda m, k: (0, 0))
    kwargs = dict(
        out_shape=jax.ShapeDtypeStruct(xm.shape, x.dtype),
        grid=(m_blocks, k_chunks),
        in_specs=[
            row_block, const_vec(w), const_vec(w),
            pl.BlockSpec((w, kc), lambda m, k: (0, k)),
            pl.BlockSpec((1, kc), lambda m, k: (0, k)),
            pl.BlockSpec((kc, w), lambda m, k: (k, 0)),
            const_vec(w),
        ],
        out_specs=row_block,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * xm.shape[0] * w * inter,
            bytes_accessed=xm.size * 2 * 2 + m_blocks * 2 * w * inter * 2,
            transcendentals=xm.shape[0] * inter,
        ),
        interpret=interpret,
    )
    args = (xm, vec(ln_scale), vec(ln_bias), w_in, vec(b_in), w_out, vec(b_out))
    if acc == "f32":
        out = pl.pallas_call(
            functools.partial(_kernel_f32acc, eps=eps, act=act, k_chunks=k_chunks),
            scratch_shapes=[pltpu.VMEM((bm, w), jnp.float32)],
            **kwargs,
        )(*args)
    else:
        out = pl.pallas_call(
            functools.partial(_kernel_bf16acc, eps=eps, act=act), **kwargs
        )(*args)
    if pad:
        out = out[:rows]
    return out.reshape(b, n, w)


def _settings():
    """(block_rows, k_chunks, acc) from env; f32 accumulation halves the
    row block to fit the scratch in VMEM."""
    acc = os.environ.get("VIT_MLP_FUSED_ACC", "bf16")
    # bm=768 is the largest row block the 16 MB VMEM scope compiles on
    # v5e (measured: bm2048/K8 18.0 MB, bm1024/K8 18.64 MB, bm1024/K32
    # 16.5 MB — all OOM; the f32 matmul accumulator + LN temporaries +
    # double-buffered chunk DMAs are the floor). See the close-out note
    # in CLAUDE.md: break-even vs the two-call pair needs bm >= ~1024, so
    # this kernel cannot win on v5e and stays opt-in.
    bm = int(os.environ.get("VIT_MLP_FUSED_ROWS", "768"))
    return bm, int(os.environ.get("VIT_MLP_FUSED_K", "8")), acc


def apply(block: dict, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Drop-in for the MLP half of models/clip_vit.py _apply_block."""
    bm, kc, acc = _settings()
    return mlp_sublayer_fused(
        x, block["ln2"]["scale"], block["ln2"]["bias"],
        block["mlp_in"]["w"], block["mlp_in"]["b"],
        block["mlp_out"]["w"], block["mlp_out"]["b"],
        eps=eps, block_rows=bm, k_chunks=kc, acc=acc,
    )


def apply_hubert(layer: dict, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Drop-in for the post-LN FFN half of models/hubert.py."""
    bm, kc, acc = _settings()
    return mlp_sublayer_fused(
        x, layer["ffn_ln"]["scale"], layer["ffn_ln"]["bias"],
        layer["ffn_in"]["w"], layer["ffn_in"]["b"],
        layer["ffn_out"]["w"], layer["ffn_out"]["b"],
        eps=eps, act="gelu", block_rows=bm, k_chunks=kc, acc=acc,
    )
