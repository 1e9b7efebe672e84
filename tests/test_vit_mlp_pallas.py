"""Fused ViT MLP-sublayer kernels (interpret mode) vs the XLA op-by-op
path (models/clip_vit.py _apply_block MLP half)."""

import jax.numpy as jnp
import numpy as np

from affectgpt_tpu.models import clip_vit, nn
from affectgpt_tpu.ops.vit_mlp_pallas import mlp_sublayer


def _reference(block, x, eps):
    h = nn.layernorm(block["ln2"], x, eps)
    return x + nn.dense(block["mlp_out"], clip_vit.quick_gelu(nn.dense(block["mlp_in"], h)))


def test_kernel_matches_xla_mlp():
    rng = np.random.RandomState(0)
    b, n, w, inter = 3, 8, 128, 512
    block = {
        "ln2": {
            "scale": jnp.asarray(1.0 + 0.1 * rng.randn(w), jnp.float32),
            "bias": jnp.asarray(0.1 * rng.randn(w), jnp.float32),
        },
        "mlp_in": {
            "w": jnp.asarray(rng.randn(w, inter) * 0.05, jnp.float32),
            "b": jnp.asarray(rng.randn(inter) * 0.1, jnp.float32),
        },
        "mlp_out": {
            "w": jnp.asarray(rng.randn(inter, w) * 0.05, jnp.float32),
            "b": jnp.asarray(rng.randn(w) * 0.1, jnp.float32),
        },
    }
    x = jnp.asarray(rng.randn(b, n, w), jnp.float32)

    ref = np.asarray(_reference(block, x, 1e-5))
    got = np.asarray(
        mlp_sublayer(
            x, block["ln2"]["scale"], block["ln2"]["bias"],
            block["mlp_in"]["w"], block["mlp_in"]["b"],
            block["mlp_out"]["w"], block["mlp_out"]["b"],
            eps=1e-5, interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)

    # image-chunked pair (bounds the [chunk, n, I] HBM intermediate) is
    # bit-identical — same per-image kernels under lax.map. chunk=2 with
    # b=3 exercises the largest-divisor fallback (3 % 2 != 0 → chunk 1
    # divides but is rejected → unchunked path).
    for chunk in (1, 2):
        chunked = np.asarray(
            mlp_sublayer(
                x, block["ln2"]["scale"], block["ln2"]["bias"],
                block["mlp_in"]["w"], block["mlp_in"]["b"],
                block["mlp_out"]["w"], block["mlp_out"]["b"],
                eps=1e-5, interpret=True, image_chunk=chunk,
            )
        )
        np.testing.assert_array_equal(chunked, got)


def test_image_chunk_divisor_split():
    """b=4, chunk=2 actually splits (2 lax.map steps) and stays exact."""
    rng = np.random.RandomState(2)
    b, n, w, inter = 4, 8, 128, 256
    args = (
        jnp.asarray(1.0 + 0.1 * rng.randn(w), jnp.float32),
        jnp.asarray(0.1 * rng.randn(w), jnp.float32),
        jnp.asarray(rng.randn(w, inter) * 0.05, jnp.float32),
        jnp.asarray(rng.randn(inter) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(inter, w) * 0.05, jnp.float32),
        jnp.asarray(rng.randn(w) * 0.1, jnp.float32),
    )
    x = jnp.asarray(rng.randn(b, n, w), jnp.float32)
    full = np.asarray(mlp_sublayer(x, *args, eps=1e-5, interpret=True))
    split = np.asarray(
        mlp_sublayer(x, *args, eps=1e-5, interpret=True, image_chunk=2)
    )
    np.testing.assert_array_equal(split, full)


def test_hubert_gelu_variant():
    from affectgpt_tpu.ops.vit_mlp_pallas import apply_hubert

    rng = np.random.RandomState(1)
    b, n, w, inter = 2, 8, 128, 256
    layer = {
        "ffn_ln": {
            "scale": jnp.asarray(1.0 + 0.1 * rng.randn(w), jnp.float32),
            "bias": jnp.asarray(0.1 * rng.randn(w), jnp.float32),
        },
        "ffn_in": {
            "w": jnp.asarray(rng.randn(w, inter) * 0.05, jnp.float32),
            "b": jnp.asarray(rng.randn(inter) * 0.1, jnp.float32),
        },
        "ffn_out": {
            "w": jnp.asarray(rng.randn(inter, w) * 0.05, jnp.float32),
            "b": jnp.asarray(rng.randn(w) * 0.1, jnp.float32),
        },
    }
    x = jnp.asarray(rng.randn(b, n, w), jnp.float32)
    h = nn.layernorm(layer["ffn_ln"], x, 1e-5)
    ref = np.asarray(x + nn.dense(layer["ffn_out"], nn.gelu(nn.dense(layer["ffn_in"], h))))
    got = np.asarray(
        mlp_sublayer(
            x, layer["ffn_ln"]["scale"], layer["ffn_ln"]["bias"],
            layer["ffn_in"]["w"], layer["ffn_in"]["b"],
            layer["ffn_out"]["w"], layer["ffn_out"]["b"],
            eps=1e-5, act="gelu", interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
