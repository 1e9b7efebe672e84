"""int8 encoder serving mode: quantize_encoder_tree + the nn.dense w8a8
dispatch keep CLIP/HuBERT outputs near-identical (the towers are frozen
feature extractors; per-channel weights + dynamic per-row activations)."""

import jax
import jax.numpy as jnp
import numpy as np

from affectgpt_tpu.models import clip_vit, hubert
from affectgpt_tpu.ops import quant


def _cos(a, b):
    return (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9
    )


def test_clip_w8a8_feature_parity():
    cfg = clip_vit.ClipVisionConfig(image_size=28, patch_size=14, width=32,
                                    num_layers=2, num_heads=4, mlp_dim=64,
                                    projection_dim=12)
    params = clip_vit.init_vision_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    imgs = jnp.asarray(np.random.default_rng(0).normal(size=(3, 28, 28, 3)), jnp.float32)
    ref = np.asarray(clip_vit.encode_image(params, cfg, imgs))
    got = np.asarray(clip_vit.encode_image(quant.quantize_encoder_tree(params), cfg, imgs))
    assert _cos(ref, got).min() > 0.995


def test_hubert_w8a8_feature_parity():
    cfg = hubert.HubertConfig.tiny()
    params = hubert.init_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    wav = jnp.asarray(np.random.default_rng(1).normal(size=(2, 1, 800)) * 0.1, jnp.float32)
    ref = np.asarray(hubert.encode_clips(params, cfg, wav[:, None]))
    got = np.asarray(hubert.encode_clips(quant.quantize_encoder_tree(params), cfg, wav[:, None]))
    assert _cos(ref, got).min() > 0.99


def test_dense_w8a8_matches_fp():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(5, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 32)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.normal(size=(32,)) * 0.01, jnp.float32)
    w_q, scales = quant.quantize_per_channel(w)
    got = np.asarray(quant.dense_w8a8_xla(x, w_q, scales, b))
    ref = np.asarray(x @ w + b)
    assert _cos(ref, got).min() > 0.999
