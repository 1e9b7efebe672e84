"""Pallas paged-attention kernel vs the XLA gather reference (interpret
mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from affectgpt_tpu.inference.paged import paged_attention
from affectgpt_tpu.ops.paged_attention_pallas import paged_attention_pallas


@pytest.mark.parametrize("seq_lens", [[7, 13], [16, 3]])
def test_kernel_matches_xla_reference(seq_lens):
    b, heads, kv, d = 2, 4, 2, 8
    block, num_blocks, max_blocks = 4, 16, 4
    rng = np.random.RandomState(0)

    q = jnp.asarray(rng.randn(b, heads, d), jnp.float32)
    pool_k = jnp.asarray(rng.randn(num_blocks, block, kv, d), jnp.float32)
    pool_v = jnp.asarray(rng.randn(num_blocks, block, kv, d), jnp.float32)
    # distinct pages per sequence
    tables = np.zeros((b, max_blocks), np.int32)
    tables[0] = [1, 2, 3, 4]
    tables[1] = [5, 6, 7, 8]
    tables = jnp.asarray(tables)
    lens = jnp.asarray(seq_lens, jnp.int32)

    ref = paged_attention(q, pool_k, pool_v, tables, lens, kv)
    got = paged_attention_pallas(
        q, pool_k, pool_v, tables, lens, kv, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("seq_lens", [[7, 13], [16, 3]])
def test_int8_pool_kernel_matches_xla_reference(seq_lens):
    """int8 pools + per-row scale side-pages through _kernel_int8 must match
    the XLA gather path's scale-folded attention exactly."""
    b, heads, kv, d = 2, 4, 2, 8
    block, num_blocks, max_blocks = 4, 16, 4
    rng = np.random.RandomState(2)

    q = jnp.asarray(rng.randn(b, heads, d), jnp.float32)
    vals_k = rng.randn(num_blocks, block, kv, d)
    vals_v = rng.randn(num_blocks, block, kv, d)
    # per-(token, head) symmetric int8 quantization, as write_kv produces
    ks = np.abs(vals_k).max(-1, keepdims=True) / 127.0 + 1e-9
    vs = np.abs(vals_v).max(-1, keepdims=True) / 127.0 + 1e-9
    pool_k = jnp.asarray(np.round(vals_k / ks), jnp.int8)
    pool_v = jnp.asarray(np.round(vals_v / vs), jnp.int8)
    # storage layout is FLAT [blocks, block·kv] (paged.init_paged_cache);
    # the kernel consumes kv-major [blocks, kv, block] side pages (the
    # dispatch in paged_attention_auto does this transpose)
    scale_flat_k = jnp.asarray(ks[..., 0].reshape(num_blocks, block * kv), jnp.float32)
    scale_flat_v = jnp.asarray(vs[..., 0].reshape(num_blocks, block * kv), jnp.float32)
    kernel_ks = jnp.asarray(ks[..., 0].transpose(0, 2, 1), jnp.float32)
    kernel_vs = jnp.asarray(vs[..., 0].transpose(0, 2, 1), jnp.float32)

    tables = np.zeros((b, max_blocks), np.int32)
    tables[0] = [1, 2, 3, 4]
    tables[1] = [5, 6, 7, 8]
    tables = jnp.asarray(tables)
    lens = jnp.asarray(seq_lens, jnp.int32)

    ref = paged_attention(
        q, pool_k, pool_v, tables, lens, kv, scale_flat_k, scale_flat_v)
    got = paged_attention_pallas(
        q, pool_k, pool_v, tables, lens, kv, k_scale=kernel_ks, v_scale=kernel_vs,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_kernel_single_block_sequence():
    b, heads, kv, d = 1, 2, 1, 8
    block, num_blocks, max_blocks = 8, 4, 2
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(b, heads, d), jnp.float32)
    pool_k = jnp.asarray(rng.randn(num_blocks, block, kv, d), jnp.float32)
    pool_v = jnp.asarray(rng.randn(num_blocks, block, kv, d), jnp.float32)
    tables = jnp.asarray([[2, 0]], jnp.int32)
    lens = jnp.asarray([5], jnp.int32)
    ref = paged_attention(q, pool_k, pool_v, tables, lens, kv)
    got = paged_attention_pallas(q, pool_k, pool_v, tables, lens, kv, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)
