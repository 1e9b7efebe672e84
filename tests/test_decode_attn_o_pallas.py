"""Fused decode attention+o_proj kernel (interpret mode) vs a plain
softmax-attention + o_proj reference."""

import jax
import jax.numpy as jnp
import numpy as np

from affectgpt_tpu.models import qwen2
from affectgpt_tpu.ops.decode_attn_o_pallas import decode_attn_o


def _reference(x_res, q, k, v, key_mask, wo):
    b, kv, g, d = q.shape
    s = np.einsum("bhgd,bhkd->bhgk", q, k) / np.sqrt(d)
    s = np.where(key_mask[:, None, None, :], s, -np.inf)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    out = np.einsum("bhgk,bhkd->bhgd", p, v).reshape(b, kv * g * d)
    return x_res + out @ wo


def test_kernel_matches_reference():
    rng = np.random.RandomState(0)
    b, kv, g, d, t, h = 16, 2, 4, 128, 64, 256
    x = rng.randn(b, h).astype(np.float32)
    q = rng.randn(b, kv, g, d).astype(np.float32)
    k = rng.randn(b, kv, t, d).astype(np.float32)
    v = rng.randn(b, kv, t, d).astype(np.float32)
    wo = (rng.randn(kv * g * d, h) * 0.05).astype(np.float32)
    # ragged validity windows: left pads invalid, then valid through a
    # per-row write index (the decode-step mask shape)
    lo = rng.randint(0, 8, size=(b,))
    hi = rng.randint(16, t, size=(b,))
    cols = np.arange(t)[None, :]
    key_mask = (cols >= lo[:, None]) & (cols <= hi[:, None])

    out = decode_attn_o(
        jnp.asarray(x), jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(key_mask), jnp.asarray(wo),
        block_m=8, block_t=16, interpret=True,
    )
    ref = _reference(x, q, k, v, key_mask, wo)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=2e-3)


def test_decode_step_dispatch_matches_xla(monkeypatch):
    """qwen2.forward decode step with DECODE_ATTN_O engaged (interpret mode,
    stacked on the fused qkv kernel) vs the default XLA chain."""
    monkeypatch.setenv("AFFECTGPT_DECODE_KERNEL_INTERPRET", "1")
    cfg = qwen2.QwenConfig(
        vocab_size=64, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=2, num_kv_heads=2, head_dim=128,
    )
    params = qwen2.init_params(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    b, max_len, pos = 8, 32, 5
    rng = np.random.RandomState(0)
    embeds = jnp.asarray(rng.randn(b, 1, cfg.hidden_size), jnp.float32)
    positions = jnp.full((b, 1), pos, jnp.int32)
    mask = jnp.asarray(
        (np.arange(max_len)[None, None, :] <= pos) * np.ones((b, 1, 1), bool)
    )

    def run():
        cache = qwen2.init_cache(cfg, b, max_len, dtype=jnp.float32)
        # deterministic junk so attention reads real data at earlier slots
        cache = [
            {k2: v2 + 0.01 * jnp.arange(v2.size, dtype=v2.dtype).reshape(v2.shape)
             for k2, v2 in layer.items()}
            for layer in cache
        ]
        logits, _ = qwen2.forward(
            params, cfg, embeds, mask, positions=positions,
            cache=cache, cache_index=jnp.int32(pos),
        )
        return np.asarray(logits)

    assert qwen2._decode_qkv_fused(
        params["layers"][0], None, cfg, jnp.zeros((b, cfg.hidden_size)),
        positions[:, 0], ln=params["layers"][0]["input_ln"],
    ) is not None, "fused qkv gate must engage (attn_o stacks on it)"
    monkeypatch.setattr(qwen2, "DECODE_ATTN_O", "pallas")
    fused = run()
    monkeypatch.setattr(qwen2, "DECODE_ATTN_O", "xla")
    unfused = run()
    np.testing.assert_allclose(fused, unfused, atol=2e-3, rtol=2e-3)


def test_fully_masked_blocks_and_single_block():
    """Masks that blank whole trailing T-blocks (the decode-prefix case)
    and a mask valid only in the first column."""
    rng = np.random.RandomState(1)
    b, kv, g, d, t, h = 8, 1, 2, 128, 64, 128
    x = rng.randn(b, h).astype(np.float32)
    q = rng.randn(b, kv, g, d).astype(np.float32)
    k = rng.randn(b, kv, t, d).astype(np.float32)
    v = rng.randn(b, kv, t, d).astype(np.float32)
    wo = (rng.randn(kv * g * d, h) * 0.05).astype(np.float32)
    key_mask = np.zeros((b, t), bool)
    key_mask[:, :1] = True  # only the first key valid → later blocks all masked

    out = decode_attn_o(
        jnp.asarray(x), jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(key_mask), jnp.asarray(wo),
        block_m=8, block_t=16, interpret=True,
    )
    ref = _reference(x, q, k, v, key_mask, wo)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=2e-3)
