"""Single-call fused ViT MLP sublayer (ops/vit_mlp_fused_pallas,
interpret mode) vs the XLA op-by-op path — including the row-padding
path, k-chunk accumulation (both bf16 and f32 accumulators), and the
HuBERT erf-gelu variant."""

import jax.numpy as jnp
import numpy as np
import pytest

from affectgpt_tpu.models import clip_vit, nn
from affectgpt_tpu.ops.vit_mlp_fused_pallas import mlp_sublayer_fused


def _make_block(rng, w, inter):
    return {
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


def _reference(block, x, eps, act="quick_gelu"):
    h = nn.layernorm(block["ln2"], x, eps)
    t = nn.dense(block["mlp_in"], h)
    t = clip_vit.quick_gelu(t) if act == "quick_gelu" else nn.gelu(t)
    return x + nn.dense(block["mlp_out"], t)


def _run(block, x, **kw):
    return mlp_sublayer_fused(
        x, block["ln2"]["scale"], block["ln2"]["bias"],
        block["mlp_in"]["w"], block["mlp_in"]["b"],
        block["mlp_out"]["w"], block["mlp_out"]["b"],
        eps=1e-5, interpret=True, **kw,
    )


@pytest.mark.parametrize("acc", ["bf16", "f32"])
def test_fused_matches_xla(acc):
    rng = np.random.RandomState(0)
    b, n, w, inter = 3, 8, 128, 512
    block = _make_block(rng, w, inter)
    x = jnp.asarray(rng.randn(b, n, w), jnp.float32)
    ref = np.asarray(_reference(block, x, 1e-5))
    got = np.asarray(_run(block, x, block_rows=8, k_chunks=4, acc=acc))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_row_padding_and_single_chunk():
    """b*n=24 rows with block_rows=16 forces the pad path; k_chunks=1
    degenerates to one resident weight pass."""
    rng = np.random.RandomState(1)
    b, n, w, inter = 3, 8, 128, 256
    block = _make_block(rng, w, inter)
    x = jnp.asarray(rng.randn(b, n, w), jnp.float32)
    ref = np.asarray(_reference(block, x, 1e-5))
    got = np.asarray(_run(block, x, block_rows=16, k_chunks=1))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_k_chunks_rounded_down_to_divisor():
    """inter=384 with k_chunks=8 → halved until it divides (k=4? no:
    384 % 8 = 0... use 192 → k 8→4→2... 192%8!=0, 192%4=0)."""
    rng = np.random.RandomState(2)
    b, n, w, inter = 2, 8, 128, 192
    block = _make_block(rng, w, inter)
    x = jnp.asarray(rng.randn(b, n, w), jnp.float32)
    ref = np.asarray(_reference(block, x, 1e-5))
    got = np.asarray(_run(block, x, block_rows=16, k_chunks=8))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_hubert_erf_gelu_variant():
    rng = np.random.RandomState(3)
    b, n, w, inter = 2, 8, 128, 256
    block = _make_block(rng, w, inter)
    x = jnp.asarray(rng.randn(b, n, w), jnp.float32)
    ref = np.asarray(_reference(block, x, 1e-5, act="gelu"))
    got = np.asarray(_run(block, x, act="gelu", block_rows=16, k_chunks=2))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_bf16_accumulation_close_to_pair_kernel():
    """bf16 inputs: the fused kernel's per-chunk bf16 accumulation must
    stay within a few bf16 ulp of the two-call pair (which accumulates
    the whole fc2 dot in f32 and rounds once)."""
    from affectgpt_tpu.ops.vit_mlp_pallas import mlp_sublayer

    rng = np.random.RandomState(4)
    b, n, w, inter = 2, 16, 256, 1024
    block = _make_block(rng, w, inter)
    block = {k: {kk: vv.astype(jnp.bfloat16) for kk, vv in v.items()}
             for k, v in block.items()}
    x = jnp.asarray(rng.randn(b, n, w), jnp.bfloat16)
    pair = np.asarray(mlp_sublayer(
        x, block["ln2"]["scale"], block["ln2"]["bias"],
        block["mlp_in"]["w"], block["mlp_in"]["b"],
        block["mlp_out"]["w"], block["mlp_out"]["b"],
        eps=1e-5, interpret=True,
    ).astype(jnp.float32))
    fused = np.asarray(_run(block, x, block_rows=16, k_chunks=8).astype(jnp.float32))
    # bf16 resolution on O(1) activations ≈ 0.008; allow a few ulp
    np.testing.assert_allclose(fused, pair, atol=0.08, rtol=0.05)
