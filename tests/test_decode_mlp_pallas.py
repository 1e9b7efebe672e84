"""Fused decode-MLP kernel (interpret mode) vs the XLA op-by-op reference."""

import jax
import jax.numpy as jnp
import numpy as np

from affectgpt_tpu.models import nn, qwen2
from affectgpt_tpu.ops import quant
from affectgpt_tpu.ops.decode_mlp_pallas import decode_mlp_pallas


def _reference(x, ln_scale, layer, cfg):
    h = nn.rmsnorm({"scale": ln_scale}, x[:, None, :], cfg.rms_eps)
    return x + qwen2._mlp(layer, None, cfg, h)[:, 0, :]


def test_kernel_matches_xla_mlp():
    cfg = qwen2.QwenConfig(
        vocab_size=64, hidden_size=256, intermediate_size=1024,
        num_layers=1, num_heads=4, num_kv_heads=2, head_dim=64,
    )
    rng = np.random.RandomState(0)
    h, inter = cfg.hidden_size, cfg.intermediate_size
    layer = {
        "gate_proj": {"w": jnp.asarray(rng.randn(h, inter) * 0.05, jnp.float32)},
        "up_proj": {"w": jnp.asarray(rng.randn(h, inter) * 0.05, jnp.float32)},
        "down_proj": {"w": jnp.asarray(rng.randn(inter, h) * 0.05, jnp.float32)},
    }
    qlayer = quant.quantize_dense_tree(layer)
    ln_scale = jnp.asarray(1.0 + 0.1 * rng.randn(h), jnp.float32)
    x = jnp.asarray(rng.randn(8, h), jnp.float32)

    ref = np.asarray(_reference(x, ln_scale, qlayer, cfg))
    got = np.asarray(
        decode_mlp_pallas(
            x, ln_scale,
            qlayer["gate_proj"]["w_q"], qlayer["gate_proj"]["scales"],
            qlayer["up_proj"]["w_q"], qlayer["up_proj"]["scales"],
            qlayer["down_proj"]["w_q"], qlayer["down_proj"]["scales"],
            eps=cfg.rms_eps, block_i=512, interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)


def test_forward_switch_routes_and_matches():
    """DECODE_MLP='pallas' on a CPU backend must be a no-op (guarded by
    backend), and the guard conditions must leave training untouched."""
    cfg = qwen2.QwenConfig.tiny()
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qparams = qwen2.quantize_params(params)
    embeds = jax.random.normal(jax.random.PRNGKey(1), (2, 1, cfg.hidden_size))
    cache = qwen2.init_cache(cfg, 2, 8, dtype=jnp.float32)
    mask = jnp.ones((2, 1, 8), bool)
    old = qwen2.DECODE_MLP
    try:
        qwen2.DECODE_MLP = "pallas"
        a, _ = qwen2.forward(
            qparams, cfg, embeds, mask,
            positions=jnp.zeros((2, 1), jnp.int32), cache=cache,
            cache_index=jnp.int32(0),
        )
    finally:
        qwen2.DECODE_MLP = old
    b, _ = qwen2.forward(
        qparams, cfg, embeds, mask,
        positions=jnp.zeros((2, 1), jnp.int32),
        cache=qwen2.init_cache(cfg, 2, 8, dtype=jnp.float32),
        cache_index=jnp.int32(0),
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)
