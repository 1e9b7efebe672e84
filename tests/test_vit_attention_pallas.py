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


def test_attn_sublayer_kernel_matches_unfused():
    """The VMEM-resident attention-sublayer kernel (LN+qkv+attn+o+residual)
    matches LN → nn.mha → residual with pad-key masking."""
    from affectgpt_tpu.models import nn
    from affectgpt_tpu.ops import vit_sublayer_pallas as vsp

    rng = np.random.default_rng(3)
    b, n, w, heads = 2, 16, 64, 4
    block = {
        "ln1": nn.layernorm_init(w),
        "attn": nn.mha_init(jax.random.PRNGKey(0), w, w, heads),
    }
    block["ln1"]["scale"] = jnp.asarray(rng.normal(1, 0.1, w), jnp.float32)
    block["ln1"]["bias"] = jnp.asarray(rng.normal(0, 0.1, w), jnp.float32)
    x = jnp.asarray(rng.normal(size=(b, n, w)), jnp.float32)
    valid = 13
    h = nn.layernorm(block["ln1"], x, 1e-5)
    mask = jnp.arange(n)[None, None, None, :] < valid
    ref = x + nn.mha(block["attn"], h, h, heads, mask)
    a = block["attn"]
    got = vsp.attn_sublayer(
        x, block["ln1"]["scale"], block["ln1"]["bias"],
        a["q"]["w"], a["q"]["b"], a["k"]["w"], a["k"]["b"],
        a["v"]["w"], a["v"]["b"], a["o"]["w"], a["o"]["b"],
        num_heads=heads, valid_len=valid, eps=1e-5, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_hubert_encode_sublayer_equals_xla(monkeypatch):
    """hubert.encode with the shared attention-sublayer kernel (interpret,
    gate stubbed open) matches the unfused XLA stack, including the
    pad-then-slice pooling over a non-multiple-of-8 token count."""
    from affectgpt_tpu.models import hubert
    from affectgpt_tpu.ops import vit_sublayer_pallas as vsp

    cfg = hubert.HubertConfig.tiny()
    params = hubert.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    wav = jnp.asarray(rng.normal(size=(2, 400)), jnp.float32)

    ref = hubert.encode(params, cfg, wav)

    orig = vsp.attn_sublayer

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(vsp, "attn_sublayer", interp)
    monkeypatch.setattr(hubert, "_use_sublayer", lambda cfg, p: True)
    out = hubert.encode(params, cfg, wav)
    # tiny frontend: 400 samples -> 39 conv frames -> padded to 40 in-kernel
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)
