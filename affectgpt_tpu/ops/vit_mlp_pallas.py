"""Fused ViT MLP-sublayer kernels: LN → fc1 → quick_gelu (one call) and
fc2 → residual (a second call), each with its weight matrix VMEM-resident.

Motivation (measured, round 3): after the attention-sublayer megakernel
(vit_sublayer_pallas) the CLIP ViT-L pass is MLP-dominated — the
no-attention probe runs the MLP+LN portion at ~62% MFU (864 ms of the
1024-image pass vs a ~536 ms matmul floor), consistent with XLA paying
separate LN / gelu / residual passes around the two matmuls. ViT-L's
fc1+fc2 weigh 16 MB bf16 — too big to sit in VMEM together, and Pallas
gives no safe cross-grid-step accumulator (an input_output_aliases
read-back of partial sums reads a stale snapshot in interpret mode, so
its compiled semantics can't be relied on either — probed round 3).
Hence TWO calls, each streaming the image grid past ONE resident weight:

- call A: LN stats + fc1 + bias + quick_gelu, in VMEM; emits the
  [n, mlp_dim] intermediate in bf16 (its one HBM write);
- call B: fc2 + bias + residual; reads the intermediate back (its one
  HBM read) and re-reads x for the residual.

Per image+layer the sublayer's HBM traffic is x(2r) + inter(1w+1r) +
out(1w) ≈ 5×540 KB instead of XLA's LN+gelu+residual round trips.

Reference equivalence: HF CLIPMLP (quick_gelu) + pre-LN residual
(CLIPEncoderLayer.forward second half); our unfused path is
models/clip_vit.py _apply_block:137-138.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """Abramowitz–Stegun 7.1.26 rational erf (max abs err 1.5e-7 — below
    bf16 resolution). Mosaic lowers neither erf nor erfc, so the exact-gelu
    variant builds it from exp."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    z = jnp.abs(x)
    t = 1.0 / (1.0 + p * z)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-z * z))


def _fc1_kernel(x_ref, lns_ref, lnb_ref, wi_ref, bi_ref, t_ref, *, eps: float, act: str):
    x32 = x_ref[0].astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mean) ** 2, axis=-1, keepdims=True)
    h = (x32 - mean) * jax.lax.rsqrt(var + eps)
    h = h * lns_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    t = jnp.dot(h.astype(x_ref.dtype), wi_ref[...], preferred_element_type=jnp.float32)
    t = t + bi_ref[0].astype(jnp.float32)
    if act == "quick_gelu":  # CLIP
        t = t * jax.nn.sigmoid(1.702 * t)
    else:  # "gelu": HuBERT / HF default erf gelu
        t = 0.5 * t * (1.0 + _erf(t * 0.7071067811865476))
    t_ref[0] = t.astype(t_ref.dtype)


def _fc2_kernel(t_ref, x_ref, wo_ref, bo_ref, o_ref):
    y = jnp.dot(t_ref[0], wo_ref[...], preferred_element_type=jnp.float32)
    y = y + bo_ref[0].astype(jnp.float32) + x_ref[0].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("eps", "act", "interpret", "image_chunk")
)
def mlp_sublayer(
    x: jnp.ndarray,  # [b, n, w]
    ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,  # [w]
    w_in: jnp.ndarray, b_in: jnp.ndarray,  # [w, I], [I]
    w_out: jnp.ndarray, b_out: jnp.ndarray,  # [I, w], [w]
    eps: float = 1e-5,
    act: str = "quick_gelu",
    interpret: bool = False,
    image_chunk: int = 0,
) -> jnp.ndarray:
    """x + fc2(act(fc1(LN(x)))) in x.dtype.

    image_chunk > 0 bounds the [chunk, n, I] HBM intermediate between the
    two calls by running the pair under lax.map over image groups (largest
    divisor of b ≤ image_chunk). At realtime b128 the un-chunked
    intermediate is [2048, 264, 4096] bf16 = 4.4 GB — the tensor that blew
    the 16 GB HBM budget (17.3 GB high water, CLAUDE.md); chunked at 512 it
    is 1.1 GB. Numerics are bit-identical (the kernels are per-image)."""
    b, n, w = x.shape
    w2, inter = w_in.shape
    assert w2 == w and w_out.shape == (inter, w)
    if image_chunk and b > image_chunk:
        chunk = image_chunk
        while b % chunk:  # largest divisor of b not above image_chunk
            chunk -= 1
        if chunk > 1:
            ys = jax.lax.map(
                lambda xc: mlp_sublayer(
                    xc, ln_scale, ln_bias, w_in, b_in, w_out, b_out,
                    eps=eps, act=act, interpret=interpret,
                ),
                x.reshape(b // chunk, chunk, n, w),
            )
            return ys.reshape(b, n, w)

    vec = lambda a: a.reshape(1, -1)
    img = pl.BlockSpec((1, n, w), lambda i: (i, 0, 0))
    mid = pl.BlockSpec((1, n, inter), lambda i: (i, 0, 0))
    vspec = lambda m: pl.BlockSpec((1, m), lambda i: (0, 0))
    params = pltpu.CompilerParams(dimension_semantics=("arbitrary",))

    t = pl.pallas_call(
        functools.partial(_fc1_kernel, eps=eps, act=act),
        out_shape=jax.ShapeDtypeStruct((b, n, inter), x.dtype),
        grid=(b,),
        in_specs=[img, vspec(w), vspec(w),
                  pl.BlockSpec((w, inter), lambda i: (0, 0)), vspec(inter)],
        out_specs=mid,
        compiler_params=params,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * w * inter,
            bytes_accessed=b * n * (w + inter) * 2 + w * inter * 2,
            transcendentals=b * n * inter,
        ),
        interpret=interpret,
    )(x, vec(ln_scale), vec(ln_bias), w_in, vec(b_in))

    return pl.pallas_call(
        _fc2_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, w), x.dtype),
        grid=(b,),
        in_specs=[mid, img,
                  pl.BlockSpec((inter, w), lambda i: (0, 0)), vspec(w)],
        out_specs=img,
        compiler_params=params,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * w * inter,
            bytes_accessed=b * n * (w + inter) * 2 + w * inter * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(t, x, w_out, vec(b_out))


def _image_chunk(x: jnp.ndarray, inter: int) -> int:
    """Images per fc1→fc2 pair (0 = unchunked). The lax.map serialization
    costs ~4.5% e2e when it isn't needed (TPU-measured: realtime b96
    29.41 vs 30.81 chunked-always vs never), so chunking engages only
    when the [b, n, I] intermediate alone would pass
    CLIP_MLP_CHUNK_ABOVE_GB (default 4.0 — realtime b96's 3.3 GB fits
    HBM unchunked, b128's 4.4 GB does not). CLIP_MLP_CHUNK sets the
    group size (0 = never chunk)."""
    import os

    chunk = int(os.environ.get("CLIP_MLP_CHUNK", 512))
    limit_gb = float(os.environ.get("CLIP_MLP_CHUNK_ABOVE_GB", 4.0))
    b, n, _ = x.shape
    inter_bytes = b * n * inter * x.dtype.itemsize
    return chunk if inter_bytes > limit_gb * 2**30 else 0


def apply(block: dict, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Drop-in for the MLP half of models/clip_vit.py _apply_block."""
    return mlp_sublayer(
        x, block["ln2"]["scale"], block["ln2"]["bias"],
        block["mlp_in"]["w"], block["mlp_in"]["b"],
        block["mlp_out"]["w"], block["mlp_out"]["b"],
        eps=eps, image_chunk=_image_chunk(x, block["mlp_in"]["w"].shape[1]),
    )


def apply_hubert(layer: dict, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Drop-in for the post-LN FFN half of models/hubert.py (ffn_ln +
    ffn_in + erf-gelu + ffn_out + residual)."""
    return mlp_sublayer(
        x, layer["ffn_ln"]["scale"], layer["ffn_ln"]["bias"],
        layer["ffn_in"]["w"], layer["ffn_in"]["b"],
        layer["ffn_out"]["w"], layer["ffn_out"]["b"],
        eps=eps, act="gelu",
        image_chunk=_image_chunk(x, layer["ffn_in"]["w"].shape[1]),
    )
