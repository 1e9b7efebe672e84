"""Pallas paged-attention decode kernel.

Upgrades inference/paged.py's XLA gather attention to a TPU kernel: the
per-sequence page list rides in as *scalar-prefetch* operands
(PrefetchScalarGridSpec), so the BlockSpec index maps select which HBM
page each grid step streams into VMEM — Pallas double-buffers the page
DMAs across grid steps automatically. Attention is computed flash-style
(running max / normalizer in SMEM-adjacent scratch) over one page per
step, so VMEM holds exactly one (block_size × kv × d) K and V tile plus
the [heads, d] accumulator.

Decode shape: one query token per sequence, GQA (q heads grouped over
kv heads). Grid = (batch, max_blocks_per_seq); the j loop is sequential
("arbitrary") for the accumulation, batch is parallel.

int8-quantized pools take the _kernel_int8 variant: value pages stream
as int8 (half the DMA bytes) with their per-row fp32 scale side-pages,
and the scales fold into the flash accumulation outside the dots.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    # scalar prefetch
    block_tables_ref,  # [b, max_blocks] int32
    seq_lens_ref,  # [b] int32
    # inputs (blocked)
    q_ref,  # [1, heads, d]
    k_page_ref,  # [1, block, kv, d]
    v_page_ref,  # [1, block, kv, d]
    # output
    o_ref,  # [1, heads, d]
    # scratch
    m_ref,  # [kv, groups] running max
    l_ref,  # [kv, groups] running denom
    acc_ref,  # [heads, d] accumulator (f32)
    *,
    block_size: int,
    num_kv_heads: int,
    groups: int,
    head_dim: int,
):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    seq_len = seq_lens_ref[i]
    start = j * block_size
    # positions covered by this page
    pos = start + jax.lax.broadcasted_iota(jnp.int32, (block_size, 1), 0)[:, 0]
    valid = pos < seq_len  # [block]

    @pl.when(start < seq_len)
    def _():
        q = q_ref[0].astype(jnp.float32).reshape(num_kv_heads, groups, head_dim)
        # [block, kv, d] → [kv, block, d] (Mosaic requires leading batch dims)
        k = jnp.transpose(k_page_ref[0].astype(jnp.float32), (1, 0, 2))
        v = jnp.transpose(v_page_ref[0].astype(jnp.float32), (1, 0, 2))

        # scores [kv, groups, block]
        scores = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [kv, groups, block]
        scores = scores / np.sqrt(head_dim).astype(np.float32)
        scores = jnp.where(valid[None, None, :], scores, -jnp.inf)

        m_prev = m_ref[:]  # [kv, groups]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1))
        # guard -inf - -inf when a (kv, group) has no valid keys yet
        safe_m = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        alpha = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - safe_m), 0.0)
        p = jnp.exp(scores - safe_m[:, :, None])
        p = jnp.where(valid[None, None, :], p, 0.0)  # [kv, groups, block]

        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1)
        pv = jax.lax.dot_general(
            p, v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [kv, groups, d]
        acc = acc_ref[:].reshape(num_kv_heads, groups, head_dim)
        acc_ref[:] = (acc * alpha[:, :, None] + pv).reshape(
            num_kv_heads * groups, head_dim
        )
        m_ref[:] = m_new

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        denom = jnp.maximum(l_ref[:], 1e-20)[:, :, None]  # [kv, groups, 1]
        out = acc_ref[:].reshape(num_kv_heads, groups, head_dim) / denom
        o_ref[0] = out.reshape(num_kv_heads * groups, head_dim).astype(o_ref.dtype)


def _kernel_int8(
    # scalar prefetch
    block_tables_ref,  # [b, max_blocks] int32
    seq_lens_ref,  # [b] int32
    # inputs (blocked)
    q_ref,  # [1, heads, d]
    k_page_ref,  # [1, block, kv, d] int8
    v_page_ref,  # [1, block, kv, d] int8
    ks_page_ref,  # [1, kv, block] f32 per-row scales (kv-major side pages)
    vs_page_ref,  # [1, kv, block] f32
    # output
    o_ref,  # [1, heads, d]
    # scratch
    m_ref,
    l_ref,
    acc_ref,
    *,
    block_size: int,
    num_kv_heads: int,
    groups: int,
    head_dim: int,
):
    """int8-KV variant: pages stream as int8 (half the DMA bytes of bf16),
    per-row scales ride in side pages and are folded OUTSIDE the dots —
      q·(k_int8·s_k) == (q·k_int8)·s_k,  Σ p·(v_int8·s_v) == Σ (p·s_v)·v_int8
    — exactly the dense-cache algebra in qwen2._attention. The softmax
    normalizer accumulates the UNSCALED p (v scales only weight the PV dot)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    seq_len = seq_lens_ref[i]
    start = j * block_size
    pos = start + jax.lax.broadcasted_iota(jnp.int32, (block_size, 1), 0)[:, 0]
    valid = pos < seq_len  # [block]

    @pl.when(start < seq_len)
    def _():
        q = q_ref[0].astype(jnp.float32).reshape(num_kv_heads, groups, head_dim)
        k = jnp.transpose(k_page_ref[0].astype(jnp.float32), (1, 0, 2))  # [kv, block, d]
        v = jnp.transpose(v_page_ref[0].astype(jnp.float32), (1, 0, 2))
        ks = ks_page_ref[0]  # [kv, block] — side pages arrive kv-major
        vs = vs_page_ref[0]

        scores = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [kv, groups, block]
        scores = scores * ks[:, None, :]  # fold per-key int8 scales
        scores = scores / np.sqrt(head_dim).astype(np.float32)
        scores = jnp.where(valid[None, None, :], scores, -jnp.inf)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1))
        safe_m = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        alpha = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - safe_m), 0.0)
        p = jnp.exp(scores - safe_m[:, :, None])
        p = jnp.where(valid[None, None, :], p, 0.0)

        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1)
        pv = jax.lax.dot_general(
            p * vs[:, None, :], v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc = acc_ref[:].reshape(num_kv_heads, groups, head_dim)
        acc_ref[:] = (acc * alpha[:, :, None] + pv).reshape(
            num_kv_heads * groups, head_dim
        )
        m_ref[:] = m_new

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        denom = jnp.maximum(l_ref[:], 1e-20)[:, :, None]
        out = acc_ref[:].reshape(num_kv_heads, groups, head_dim) / denom
        o_ref[0] = out.reshape(num_kv_heads * groups, head_dim).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("num_kv_heads", "interpret"))
def paged_attention_pallas(
    q: jnp.ndarray,  # [b, heads, d]
    pool_k: jnp.ndarray,  # [num_blocks, block, kv, d]
    pool_v: jnp.ndarray,
    block_tables: jnp.ndarray,  # [b, max_blocks] int32
    seq_lens: jnp.ndarray,  # [b] int32
    num_kv_heads: int,
    k_scale: jnp.ndarray | None = None,  # int8 pools: [blocks, kv, block] f32
    v_scale: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    b, heads, d = q.shape
    _, block_size, kv, _ = pool_k.shape
    assert kv == num_kv_heads
    groups = heads // num_kv_heads
    max_blocks = block_tables.shape[1]
    quantized = k_scale is not None
    assert quantized == (pool_k.dtype == jnp.int8), (pool_k.dtype, quantized)

    page_spec = pl.BlockSpec(
        (1, block_size, kv, d), lambda i, j, tables, lens: (tables[i, j], 0, 0, 0)
    )
    scale_spec = pl.BlockSpec(
        (1, kv, block_size), lambda i, j, tables, lens: (tables[i, j], 0, 0)
    )
    in_specs = [
        pl.BlockSpec((1, heads, d), lambda i, j, tables, lens: (i, 0, 0)),
        page_spec,
        page_spec,
    ] + ([scale_spec, scale_spec] if quantized else [])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, max_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, heads, d), lambda i, j, tables, lens: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((num_kv_heads, groups), jnp.float32),
            pltpu.VMEM((num_kv_heads, groups), jnp.float32),
            pltpu.VMEM((heads, d), jnp.float32),
        ],
    )
    kernel = partial(
        _kernel_int8 if quantized else _kernel,
        block_size=block_size, num_kv_heads=num_kv_heads,
        groups=groups, head_dim=d,
    )
    operands = (block_tables, seq_lens, q, pool_k, pool_v) + (
        (k_scale, v_scale) if quantized else ()
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, heads, d), q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
