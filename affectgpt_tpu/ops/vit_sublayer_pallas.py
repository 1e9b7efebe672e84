"""Fused ViT ATTENTION-SUBLAYER kernel: LN → qkv → per-head attention →
o-proj → residual, one Pallas kernel per layer, weights resident in VMEM.

Motivation (measured, round 3): with the score-tensor-only flash kernel
the CLIP ViT-L pass still spends ~890 ms/1024-image batch in the
attention sublayer, of which only ~500 ms is matmul work — the rest is
q/k/v/out head-transposes, the separate LN pass, kernel I/O round-trips
and residual traffic. This kernel keeps the ENTIRE sublayer in VMEM:

- grid over images; the qkv/o weight blocks use a constant index_map, so
  the Pallas pipeline DMAs them ONCE and they stay resident (~8.4 MB bf16
  at ViT-L width 1024 — fits the ~16 MB VMEM with room for activations);
- per-image HBM traffic collapses to x in + y out (2 × 540 KB);
- LN stats, softmax and accumulations in fp32; matmuls bf16 on the MXU
  (identical numerics to the unfused path up to fp32 reduction order);
- heads processed in a static Python loop with 64-lane-aligned slices —
  no head transpose ever materializes.

Reference equivalence: HF CLIPAttention + pre-LN residual
(CLIPEncoderLayer.forward); our unfused path is models/clip_vit.py
_apply_block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    x_ref, lns_ref, lnb_ref, wq_ref, bq_ref, wk_ref, bk_ref,
    wv_ref, bv_ref, wo_ref, bo_ref, o_ref,
    *, num_heads: int, valid_len: int, eps: float,
):
    x = x_ref[0]  # [n, w] bf16
    n, w = x.shape
    d = w // num_heads

    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mean) ** 2, axis=-1, keepdims=True)
    h = (x32 - mean) * jax.lax.rsqrt(var + eps)
    h = h * lns_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    h = h.astype(x.dtype)

    def proj(w_ref, b_ref):
        y = jnp.dot(h, w_ref[...], preferred_element_type=jnp.float32)
        return (y + b_ref[0].astype(jnp.float32)).astype(x.dtype)

    q = proj(wq_ref, bq_ref)  # [n, w]
    k = proj(wk_ref, bk_ref)
    v = proj(wv_ref, bv_ref)

    sm_scale = 1.0 / float(d) ** 0.5
    kv_idx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    ohs = []
    for head in range(num_heads):
        sl = slice(head * d, (head + 1) * d)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale  # [n, n]
        s = jnp.where(kv_idx < valid_len, s, -1e30)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        ohs.append(jnp.dot(p.astype(x.dtype), vh, preferred_element_type=jnp.float32))
    attn = jnp.concatenate(ohs, axis=1)  # [n, w]

    y = jnp.dot(attn.astype(x.dtype), wo_ref[...], preferred_element_type=jnp.float32)
    y = y + bo_ref[0].astype(jnp.float32) + x32
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "valid_len", "eps", "interpret")
)
def attn_sublayer(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    wq: jnp.ndarray, bq: jnp.ndarray,
    wk: jnp.ndarray, bk: jnp.ndarray,
    wv: jnp.ndarray, bv: jnp.ndarray,
    wo: jnp.ndarray, bo: jnp.ndarray,
    num_heads: int,
    valid_len: int,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """x [b, n, w] (n sublane-padded; keys ≥ valid_len masked) →
    x + o_proj(attention(LN(x))) in x.dtype."""
    b, n, w = x.shape
    assert n % 8 == 0 and w % num_heads == 0

    vec = lambda a: a.reshape(1, w)  # 2-D for Mosaic-friendly layouts
    mat_spec = pl.BlockSpec((w, w), lambda i: (0, 0))
    vec_spec = pl.BlockSpec((1, w), lambda i: (0, 0))
    x_spec = pl.BlockSpec((1, n, w), lambda i: (i, 0, 0))

    return pl.pallas_call(
        functools.partial(
            _kernel, num_heads=num_heads, valid_len=valid_len, eps=eps
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, w), x.dtype),
        grid=(b,),
        in_specs=[x_spec, vec_spec, vec_spec,
                  mat_spec, vec_spec, mat_spec, vec_spec,
                  mat_spec, vec_spec, mat_spec, vec_spec],
        out_specs=x_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * w * (4 * w + 2 * n),
            bytes_accessed=2 * b * n * w * 2 + 4 * w * w * 2,
            transcendentals=b * num_heads * n * n,
        ),
        interpret=interpret,
    )(x, vec(ln_scale), vec(ln_bias),
      wq, vec(bq), wk, vec(bk), wv, vec(bv), wo, vec(bo))


def apply(block: dict, x: jnp.ndarray, num_heads: int, valid_len: int, eps: float) -> jnp.ndarray:
    """Drop-in for `x + nn.mha(block['attn'], LN(x), ...)` on padded
    inputs (models/clip_vit.py _apply_block attention half)."""
    a = block["attn"]
    return attn_sublayer(
        x, block["ln1"]["scale"], block["ln1"]["bias"],
        a["q"]["w"], a["q"]["b"], a["k"]["w"], a["k"]["b"],
        a["v"]["w"], a["v"]["b"], a["o"]["w"], a["o"]["b"],
        num_heads=num_heads, valid_len=valid_len, eps=eps,
    )
