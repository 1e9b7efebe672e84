"""Fused ViT attention kernel parity (interpret mode, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from affectgpt_tpu.ops.vit_attention_pallas import fused_vit_attention


def _reference(q, k, v, valid_len):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s / np.sqrt(q.shape[-1])
    kv_idx = jnp.arange(q.shape[2])[None, None, None, :]
    s = jnp.where(kv_idx < valid_len, s, -1e30)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v, preferred_element_type=jnp.float32).astype(q.dtype)


def test_fused_attention_matches_xla():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 4, 264, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 4, 264, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 4, 264, 64)), jnp.float32)
    out = fused_vit_attention(q, k, v, valid_len=257, interpret=True)
    ref = _reference(q, k, v, 257)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # padded keys must not contribute: perturbing them changes nothing
    k2 = k.at[:, :, 257:, :].set(99.0)
    v2 = v.at[:, :, 257:, :].set(-99.0)
    out2 = fused_vit_attention(q, k2, v2, valid_len=257, interpret=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=2e-5)


def test_fused_attention_head_block_remainder():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 3, 16, 8)), jnp.float32)  # h=3: hb falls to 3→1
    k = jnp.asarray(rng.normal(size=(1, 3, 16, 8)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 3, 16, 8)), jnp.float32)
    out = fused_vit_attention(q, k, v, valid_len=16, interpret=True)
    ref = _reference(q, k, v, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_encode_image_flash_equals_xla():
    """encode_image with the fused path (interpret) matches the XLA path."""
    from affectgpt_tpu.models import clip_vit

    cfg = clip_vit.ClipVisionConfig(image_size=28, patch_size=14, width=32,
                                    num_layers=2, num_heads=4, mlp_dim=64,
                                    projection_dim=12)
    params = clip_vit.init_vision_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    images = jnp.asarray(rng.normal(size=(3, 28, 28, 3)), jnp.float32)

    ref = clip_vit.encode_image(params, cfg, images)

    saved = clip_vit.ATTN_IMPL
    orig = fused_vit_attention

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    from affectgpt_tpu.ops import vit_attention_pallas

    clip_vit.ATTN_IMPL = "flash"
    vit_attention_pallas.fused_vit_attention = interp
    try:
        out = clip_vit.encode_image(params, cfg, images)
    finally:
        clip_vit.ATTN_IMPL = saved
        vit_attention_pallas.fused_vit_attention = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)
