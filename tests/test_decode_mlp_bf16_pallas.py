"""Fused bf16 decode-MLP kernel (interpret mode) vs the XLA op-by-op
reference, and the block-size pickers."""

import jax.numpy as jnp
import numpy as np

from affectgpt_tpu.models import nn, qwen2
from affectgpt_tpu.ops.decode_mlp_bf16_pallas import best_block_i, decode_mlp_bf16


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
    ln_scale = jnp.asarray(1.0 + 0.1 * rng.randn(h), jnp.float32)
    x = jnp.asarray(rng.randn(8, h), jnp.float32)

    ref = np.asarray(_reference(x, ln_scale, layer, cfg))
    got = np.asarray(
        decode_mlp_bf16(
            x, ln_scale,
            layer["gate_proj"]["w"], layer["up_proj"]["w"],
            layer["down_proj"]["w"],
            eps=cfg.rms_eps, block_i=512, interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_block_i_picker():
    assert best_block_i(11008, cap=512) == 256  # 3B: 86×128, odd factor 43
    assert best_block_i(18944, cap=512) == 512  # 7B: 148×128
    assert best_block_i(1024, cap=512) == 512
    assert best_block_i(100, cap=512) == 0  # not lane-aligned → caller falls back
