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


class TestW4:
    def test_int4_grouped_roundtrip(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (256, 128)) * 3.0
        w_p, scales = quant.quantize_int4_grouped(w, group_size=128)
        assert w_p.dtype == jnp.int8 and w_p.shape == (128, 128)
        assert scales.shape == (2, 128)
        lo, hi = quant._unpack_int4(np.asarray(w_p, dtype=np.int32))
        q = np.concatenate([lo, hi], axis=0)
        assert q.min() >= -7 and q.max() <= 7
        deq = (q.reshape(2, 128, 128) * np.asarray(scales)[:, None, :]).reshape(256, 128)
        err = np.abs(deq - np.asarray(w))
        # error bounded by half an int4 step per group
        bound = np.repeat(np.asarray(scales), 128, axis=0) * 0.51
        assert (err <= bound).all()

    def test_int4_matmul_xla_close_to_fp(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 256), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(2), (256, 512)) * 0.1
        w_p, scales = quant.quantize_int4_grouped(w)
        got = np.asarray(quant.int4_matmul_xla(x, w_p, scales))
        # exact semantics: matches a dequantized-weight matmul to bf16 rounding
        lo, hi = quant._unpack_int4(np.asarray(w_p, dtype=np.int32))
        q = np.concatenate([lo, hi], axis=0).astype(np.float32)
        wd = (q.reshape(2, 128, 512) * np.asarray(scales)[:, None, :]).reshape(256, 512)
        deq_ref = np.asarray(x) @ wd
        rel_deq = np.abs(got - deq_ref).max() / (np.abs(deq_ref).max() + 1e-6)
        assert rel_deq < 0.01, rel_deq
        # loose sanity vs fp (inherent int4 grid noise, measured ~0.11)
        ref = np.asarray(x @ w)
        rel_fp = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
        assert rel_fp < 0.2, rel_fp

    def test_int4_pallas_interpret_matches_xla(self):
        # K=512 → packed 256 rows → two 128-wide subgroups per nibble half
        x = jax.random.normal(jax.random.PRNGKey(3), (8, 512), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(4), (512, 256)) * 0.1
        w_p, scales = quant.quantize_int4_grouped(w)
        xla = np.asarray(quant.int4_matmul_xla(x, w_p, scales))
        pal = np.asarray(quant.int4_matmul(x, w_p, scales, block_n=256, interpret=True))
        np.testing.assert_allclose(pal, xla, rtol=2e-2, atol=2e-2)

    def test_int4_pallas_m1_pads_to_sublane(self):
        """Batch-1 latency mode: M<8 pads to the 8-row sublane minimum
        (degenerate M tiles measured ~40x slower on Mosaic) and must still
        match the XLA path exactly."""
        x = jax.random.normal(jax.random.PRNGKey(9), (1, 512), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(10), (512, 256)) * 0.1
        w_p, scales = quant.quantize_int4_grouped(w)
        xla = np.asarray(quant.int4_matmul_xla(x, w_p, scales))
        pal = np.asarray(quant.int4_matmul(x, w_p, scales, block_n=256, interpret=True))
        assert pal.shape == (1, 256)
        np.testing.assert_allclose(pal, xla, rtol=2e-2, atol=2e-2)

    def test_dense_tree_bits4_with_int8_fallback(self):
        tree = {
            "big": {"w": jnp.ones((256, 16)), "b": jnp.zeros(16)},
            "small": {"w": jnp.ones((8, 16))},  # K=8 not int4-groupable
        }
        out = quant.quantize_dense_tree(tree, bits=4)
        assert "w_q4" in out["big"] and "b" in out["big"]
        assert "w_q" in out["small"]

    def test_int4_decoder_forward_close_to_fp(self):
        cfg = qwen2.QwenConfig(
            vocab_size=512, hidden_size=256, intermediate_size=512,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=64,
            rope_theta=10_000.0, lora_r=2, lora_alpha=4.0,
        )
        params = qwen2.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        qparams = qwen2.quantize_params(params, bits=4)
        leaves = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda _: 0, qparams["layers"][0]["q_proj"])
        )
        assert "w_q4" in qparams["layers"][0]["q_proj"], leaves
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, cfg.vocab_size)
        embeds = qwen2.embed_tokens(params, ids)
        mask = jnp.ones((2, 6))
        fp_logits, _ = qwen2.forward(params, cfg, embeds, mask)
        q_logits, _ = qwen2.forward(qparams, cfg, embeds, mask)
        fp = np.asarray(fp_logits).reshape(-1, cfg.vocab_size)
        q = np.asarray(q_logits).reshape(-1, cfg.vocab_size)
        # random weights give near-uniform logits, so argmax agreement is a
        # weak signal at int4 noise levels — gate on logit-direction cosine
        # (measured ≥0.96) plus a loose argmax floor
        cos = (fp * q).sum(-1) / (
            np.linalg.norm(fp, axis=-1) * np.linalg.norm(q, axis=-1) + 1e-9
        )
        assert cos.min() >= 0.9, cos.min()
        agreement = (fp.argmax(-1) == q.argmax(-1)).mean()
        assert agreement >= 0.5, agreement
        assert np.isfinite(q).all()


class TestMergeLora:
    def test_merged_forward_matches_parallel_branch(self):
        """merge_lora folds W + (α/r)·A·B so a lora=None forward must match
        the parallel-branch forward (the serving-path optimization that
        drops ~2 adapter matmuls per projection per decode step)."""
        cfg = qwen2.QwenConfig.tiny()
        params = qwen2.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        lora = qwen2.init_lora(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
        # B inits to zero (identity adapter) — give it real values
        lora = jax.tree_util.tree_map(
            lambda x: x + 0.05 * jax.random.normal(jax.random.PRNGKey(2), x.shape), lora
        )
        ids = jax.random.randint(jax.random.PRNGKey(3), (2, 7), 0, cfg.vocab_size)
        embeds = qwen2.embed_tokens(params, ids)
        mask = jnp.ones((2, 7))
        ref, _ = qwen2.forward(params, cfg, embeds, mask, lora=lora)
        merged = qwen2.merge_lora(params, lora, cfg)
        got, _ = qwen2.forward(merged, cfg, embeds, mask, lora=None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


class TestFusedLayout:
    def test_fused_qkv_gateup_token_identical(self):
        """fuse_qkv_gateup is a pure layout change: greedy decode through
        generate() must produce byte-identical tokens vs the split layout."""
        from affectgpt_tpu.inference import generate as gen

        cfg = qwen2.QwenConfig.tiny()
        params = qwen2.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        fused = qwen2.fuse_qkv_gateup(params, cfg)
        assert "qkv_proj" in fused["layers"][0] and "q_proj" not in fused["layers"][0]
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, cfg.vocab_size)
        embeds = qwen2.embed_tokens(params, ids)
        lengths = jnp.array([6, 4])
        gcfg = gen.GenerateConfig(max_new_tokens=6, do_sample=False, eos_token_id=257)
        ref, _ = gen.generate(params, cfg, gcfg, embeds, lengths, jax.random.PRNGKey(2), max_len=16)
        got, _ = gen.generate(fused, cfg, gcfg, embeds, lengths, jax.random.PRNGKey(2), max_len=16)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_fused_qkv_only_token_identical(self):
        """fuse_gateup=False (qkv-only serving layout — the small-transient
        variant) is also a pure layout change."""
        from affectgpt_tpu.inference import generate as gen

        cfg = qwen2.QwenConfig.tiny()
        params = qwen2.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        fused = qwen2.fuse_qkv_gateup(params, cfg, fuse_gateup=False)
        layer0 = fused["layers"][0]
        assert "qkv_proj" in layer0 and "gateup_proj" not in layer0
        assert "gate_proj" in layer0 and "up_proj" in layer0
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, cfg.vocab_size)
        embeds = qwen2.embed_tokens(params, ids)
        lengths = jnp.array([6, 4])
        gcfg = gen.GenerateConfig(max_new_tokens=6, do_sample=False, eos_token_id=257)
        ref, _ = gen.generate(params, cfg, gcfg, embeds, lengths, jax.random.PRNGKey(2), max_len=16)
        got, _ = gen.generate(fused, cfg, gcfg, embeds, lengths, jax.random.PRNGKey(2), max_len=16)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


    def test_fused_then_quantized_forward(self):
        """fuse → quantize composes (per-channel scales commute with the
        column concat): logits match quantize-then-split within rounding."""
        cfg = qwen2.QwenConfig.tiny()
        params = qwen2.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        q_split = qwen2.quantize_params(params)
        q_fused = qwen2.quantize_params(qwen2.fuse_qkv_gateup(params, cfg))
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 5), 0, cfg.vocab_size)
        embeds = qwen2.embed_tokens(params, ids)
        mask = jnp.ones((2, 5))
        a, _ = qwen2.forward(q_split, cfg, embeds, mask)
        b, _ = qwen2.forward(q_fused, cfg, embeds, mask)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


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


class TestInt4SmallM:
    def test_smallm_kernel_matches_xla(self):
        """Decode-shaped int4 path (tile dequant + one fat dot) is
        numerically the XLA dequant reference; used at M below
        PALLAS_INT4_MIN_M where the subgroup-unrolled kernel is
        pathological on Mosaic (batch-1 latency)."""
        from affectgpt_tpu.ops import quant

        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=(512, 256)) * 0.05, jnp.float32)
        wp, sc = quant.quantize_int4_grouped(w)
        for m in (1, 3, 8):
            x = jnp.asarray(rng.normal(size=(m, 512)), jnp.float32)
            ref = np.asarray(quant.int4_matmul_xla(x, wp, sc))
            got = np.asarray(quant.int4_matmul_smallm(x, wp, sc, interpret=True))
            np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)
