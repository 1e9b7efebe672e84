"""Fused decode-QKV Pallas kernel: q/k/v projections (+bias) + rotary
embedding in ONE kernel call, weights VMEM-resident across batch tiles.

The q=1 decode step's attention front half is ~10 XLA ops (3 dots,
3 bias adds, and rope's split/mul/concat chains on q and k) each paying
kernel-launch + HBM round-trip overhead (CLAUDE.md: 0.378 ms/layer at 3B
vs the 0.25 ms weight+cache HBM floor, overhead uniform across layers).
This kernel loads Wq/Wk/Wv once (constant index maps — ~10 MB bf16 at 3B
geometry), streams batch tiles through them, and applies rope in-VMEM
with per-head 64-lane slices (the half-split HF convention of
models/qwen2._rope; cos/sin are precomputed per row outside since decode
positions are per-sequence).

Reference equivalence: Qwen2Attention q/k/v_proj + apply_rotary_pos_emb
(modeling_qwen2.py); our unfused path is qwen2._attention:444-449.
Default-on where the resident weights fit VMEM (qwen2.DECODE_QKV="auto";
TPU-measured +1.5% e2e at 3B b384); "xla" disables, BENCH_DECODE_QKV in
bench.py overrides.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from affectgpt_tpu.ops.decode_mlp_pallas import best_block_m


def _rope_rows(y, cos, sin, num_heads: int, head_dim: int):
    """Half-split rope on [bm, num_heads*head_dim] fp32 rows."""
    half = head_dim // 2
    parts = []
    for h in range(num_heads):
        a = y[:, h * head_dim : h * head_dim + half]
        b = y[:, h * head_dim + half : (h + 1) * head_dim]
        parts.append(a * cos - b * sin)
        parts.append(b * cos + a * sin)
    return jnp.concatenate(parts, axis=1)


def _kernel(
    x_ref,  # [bm, d] activations (pre-norm when ln_ref is given, else normalized)
    cos_ref,  # [bm, head_dim/2] f32
    sin_ref,  # [bm, head_dim/2] f32
    ln_ref,  # [1, d] rmsnorm scale, or None (x pre-normalized outside)
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
    q_ref, k_ref, v_ref,
    *, num_heads: int, num_kv_heads: int, head_dim: int, eps: float,
):
    if ln_ref is not None:
        xf = x_ref[:].astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        x = (xf * jax.lax.rsqrt(var + eps) * ln_ref[:].astype(jnp.float32)).astype(
            x_ref.dtype
        )
    else:
        x = x_ref[:]
    cos = cos_ref[:].astype(jnp.float32)
    sin = sin_ref[:].astype(jnp.float32)

    def proj(w_ref, b_ref):
        y = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
        return y + b_ref[:].astype(jnp.float32)

    q = _rope_rows(proj(wq_ref, bq_ref), cos, sin, num_heads, head_dim)
    k = _rope_rows(proj(wk_ref, bk_ref), cos, sin, num_kv_heads, head_dim)
    q_ref[:] = q.astype(q_ref.dtype)
    k_ref[:] = k.astype(k_ref.dtype)
    v_ref[:] = proj(wv_ref, bv_ref).astype(v_ref.dtype)


@partial(
    jax.jit,
    static_argnames=("num_heads", "num_kv_heads", "head_dim", "theta",
                     "block_m", "eps", "interpret"),
)
def decode_qkv(
    x: jnp.ndarray,  # [b, d] activations ([pre-]normalized, see ln_scale)
    positions: jnp.ndarray,  # [b] int32 rope positions
    wq: jnp.ndarray, bq: jnp.ndarray,  # [d, H*hd], [H*hd]
    wk: jnp.ndarray, bk: jnp.ndarray,  # [d, kv*hd], [kv*hd]
    wv: jnp.ndarray, bv: jnp.ndarray,
    num_heads: int, num_kv_heads: int, head_dim: int, theta: float,
    block_m: int = 128,
    ln_scale: jnp.ndarray | None = None,  # [d]: fold rmsnorm(x)·scale in-kernel
    eps: float = 1e-6,
    interpret: bool = False,
):
    """Returns (q [b, H*hd], k [b, kv*hd], v [b, kv*hd]), q/k roped at
    positions, all in x.dtype. With ln_scale given, x is the RAW residual
    stream and the pre-attention rmsnorm runs in-kernel on the VMEM tile
    (saves the separate XLA norm's [b,d] HBM round trip per layer)."""
    b, d = x.shape
    nq, nkv = num_heads * head_dim, num_kv_heads * head_dim
    assert wq.shape == (d, nq) and wk.shape == (d, nkv) and wv.shape == (d, nkv)
    block_m = best_block_m(b, cap=block_m)
    assert block_m > 0, b

    half = head_dim // 2
    freqs = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    angles = positions.astype(jnp.float32)[:, None] * freqs[None, :]  # [b, hd/2]
    cos, sin = jnp.cos(angles), jnp.sin(angles)

    row = lambda v_: v_.reshape(1, -1)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    grid = (b // block_m,)
    if ln_scale is None:
        kernel = lambda x_, c_, s_, *rest: _kernel(
            x_, c_, s_, None, *rest, num_heads=num_heads,
            num_kv_heads=num_kv_heads, head_dim=head_dim, eps=eps,
        )
        ln_specs, ln_args = [], ()
    else:
        kernel = partial(_kernel, num_heads=num_heads, num_kv_heads=num_kv_heads,
                         head_dim=head_dim, eps=eps)
        ln_specs, ln_args = [const((1, d))], (row(ln_scale),)
    out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, nq), x.dtype),
            jax.ShapeDtypeStruct((b, nkv), x.dtype),
            jax.ShapeDtypeStruct((b, nkv), x.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i: (i, 0)),  # x
            pl.BlockSpec((block_m, half), lambda i: (i, 0)),  # cos
            pl.BlockSpec((block_m, half), lambda i: (i, 0)),  # sin
            *ln_specs,
            const((d, nq)), const((1, nq)),  # wq, bq (resident)
            const((d, nkv)), const((1, nkv)),  # wk, bk
            const((d, nkv)), const((1, nkv)),  # wv, bv
        ],
        out_specs=(
            pl.BlockSpec((block_m, nq), lambda i: (i, 0)),
            pl.BlockSpec((block_m, nkv), lambda i: (i, 0)),
            pl.BlockSpec((block_m, nkv), lambda i: (i, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * (nq + 2 * nkv),
            bytes_accessed=d * (nq + 2 * nkv) * 2 + b * d * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, cos, sin, *ln_args, wq, row(bq), wk, row(bk), wv, row(bv))
    return out
