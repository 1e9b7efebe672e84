"""Fused decode-QKV kernel (interpret mode) vs the unfused projection +
rope path in models/qwen2."""

import jax.numpy as jnp
import numpy as np

from affectgpt_tpu.models import qwen2
from affectgpt_tpu.ops.decode_qkv_pallas import decode_qkv


def test_kernel_matches_unfused_qkv_rope():
    cfg = qwen2.QwenConfig(
        vocab_size=64, hidden_size=256, intermediate_size=512,
        num_layers=1, num_heads=4, num_kv_heads=2, head_dim=64,
    )
    rng = np.random.RandomState(1)
    h = cfg.hidden_size
    nq = cfg.num_heads * cfg.head_dim
    nkv = cfg.num_kv_heads * cfg.head_dim
    b = 8
    wq = jnp.asarray(rng.randn(h, nq) * 0.05, jnp.float32)
    wk = jnp.asarray(rng.randn(h, nkv) * 0.05, jnp.float32)
    wv = jnp.asarray(rng.randn(h, nkv) * 0.05, jnp.float32)
    bq = jnp.asarray(rng.randn(nq) * 0.1, jnp.float32)
    bk = jnp.asarray(rng.randn(nkv) * 0.1, jnp.float32)
    bv = jnp.asarray(rng.randn(nkv) * 0.1, jnp.float32)
    x = jnp.asarray(rng.randn(b, h), jnp.float32)
    positions = jnp.asarray(rng.randint(0, 500, size=(b,)), jnp.int32)

    # unfused reference: dense + bias, then the model's half-split rope
    q_ref = (x @ wq + bq).reshape(b, 1, cfg.num_heads, cfg.head_dim)
    k_ref = (x @ wk + bk).reshape(b, 1, cfg.num_kv_heads, cfg.head_dim)
    v_ref = (x @ wv + bv).reshape(b, 1, cfg.num_kv_heads, cfg.head_dim)
    pos2 = positions[:, None]
    q_ref = qwen2._rope(q_ref, pos2, cfg.rope_theta)
    k_ref = qwen2._rope(k_ref, pos2, cfg.rope_theta)

    q, k, v = decode_qkv(
        x, positions, wq, bq, wk, bk, wv, bv,
        num_heads=cfg.num_heads, num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim, theta=cfg.rope_theta, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(q), np.asarray(q_ref).reshape(b, nq), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(k), np.asarray(k_ref).reshape(b, nkv), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(v), np.asarray(v_ref).reshape(b, nkv), atol=2e-4, rtol=2e-4)

    # ln_scale variant: kernel folds the pre-attention rmsnorm in-VMEM —
    # feeding it RAW x must match feeding it rmsnorm(x) without ln_scale
    from affectgpt_tpu.models import nn

    ln = {"scale": jnp.asarray(rng.randn(h).astype(np.float32) * 0.2 + 1.0)}
    xn = nn.rmsnorm(ln, x, 1e-6)
    q2, k2, v2 = decode_qkv(
        xn, positions, wq, bq, wk, bk, wv, bv,
        num_heads=cfg.num_heads, num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim, theta=cfg.rope_theta, interpret=True,
    )
    q3, k3, v3 = decode_qkv(
        x, positions, wq, bq, wk, bk, wv, bv,
        num_heads=cfg.num_heads, num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim, theta=cfg.rope_theta,
        ln_scale=ln["scale"], eps=1e-6, interpret=True,
    )
    for a, ref in ((q3, q2), (k3, k2), (v3, v2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(ref), atol=2e-4, rtol=2e-4)
