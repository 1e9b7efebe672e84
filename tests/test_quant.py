"""Int8 quantization tests: kernel vs XLA fallback vs fp32 reference, and
the quantized decoder end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np

from affectgpt_tpu.models import qwen2
from affectgpt_tpu.ops import quant


class TestQuantize:
    def test_per_channel_roundtrip(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (64, 128)) * 3.0
        w_q, scales = quant.quantize_per_channel(w)
        assert w_q.dtype == jnp.int8
        deq = np.asarray(w_q, dtype=np.float32) * np.asarray(scales)
        err = np.abs(deq - np.asarray(w)).max()
        assert err <= np.asarray(scales).max() * 0.51  # half-ULP of int8 grid

    def test_matmul_xla_matches_fp(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 64), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(2), (64, 128)) * 0.1
        w_q, scales = quant.quantize_per_channel(w)
        ref = np.asarray(x @ w)
        got = np.asarray(quant.int8_matmul_xla(x, w_q, scales))
        rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
        assert rel < 0.03

    def test_pallas_kernel_interpret_matches_xla(self):
        x = jax.random.normal(jax.random.PRNGKey(3), (8, 256), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(4), (256, 512)) * 0.1
        w_q, scales = quant.quantize_per_channel(w)
        xla = np.asarray(quant.int8_matmul_xla(x, w_q, scales))
        pal = np.asarray(
            quant.int8_matmul(x, w_q, scales, block_n=256, block_k=128, interpret=True)
        )
        np.testing.assert_allclose(pal, xla, rtol=2e-2, atol=2e-2)

    def test_quantize_dense_tree(self):
        tree = {
            "q_proj": {"w": jnp.ones((8, 16)), "b": jnp.zeros(16)},
            "input_ln": {"scale": jnp.ones(8)},
        }
        out = quant.quantize_dense_tree(tree)
        assert "w_q" in out["q_proj"] and "b" in out["q_proj"]
        assert out["input_ln"] == {"scale": tree["input_ln"]["scale"]}


class TestQuantizedDecoder:
    def test_quantized_forward_close_to_fp(self):
        cfg = qwen2.QwenConfig.tiny()
        params = qwen2.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        qparams = qwen2.quantize_params(params)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, cfg.vocab_size)
        embeds = qwen2.embed_tokens(params, ids)
        mask = jnp.ones((2, 6))
        fp_logits, _ = qwen2.forward(params, cfg, embeds, mask)
        q_logits, _ = qwen2.forward(qparams, cfg, embeds, mask)
        fp = np.asarray(fp_logits)
        q = np.asarray(q_logits)
        # logits shift but argmax token choices should mostly agree
        agreement = (fp.argmax(-1) == q.argmax(-1)).mean()
        assert agreement >= 0.8, agreement
        assert np.isfinite(q).all()


class TestW8A8:
    def test_w8a8_close_to_fp(self):
        x = jax.random.normal(jax.random.PRNGKey(7), (16, 256), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(8), (256, 512)) * 0.1
        w_q, scales = quant.quantize_per_channel(w)
        ref = np.asarray(x @ w)
        got = np.asarray(
            quant.int8_matmul_w8a8(x, w_q, scales, block_m=16, block_n=256,
                                   block_k=128, interpret=True)
        )
        rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
        assert rel < 0.05, rel
