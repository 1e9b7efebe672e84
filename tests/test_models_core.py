"""Core model component tests (tiny configs): Q-Former, mergers, encoders,
Qwen2 decoder + LoRA, splice."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from affectgpt_tpu.models import (
    clip_vit,
    hubert,
    mergers,
    nn,
    qformer,
    qwen2,
    splice,
)


class TestQFormer:
    def test_shapes_and_mask(self):
        cfg = qformer.QFormerConfig.tiny(encoder_width=24, num_query_tokens=4)
        params = qformer.init_params(jax.random.PRNGKey(0), cfg)
        enc = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 24))
        out = qformer.apply(params, cfg, enc)
        assert out.shape == (2, 4, cfg.hidden_size)

        # masking out padded timesteps must change the result vs attending them
        mask = jnp.ones((2, 10), dtype=bool).at[:, 5:].set(False)
        out_masked = qformer.apply(params, cfg, enc, mask)
        out_trunc = qformer.apply(params, cfg, enc.at[:, 5:].set(99.0), mask)
        np.testing.assert_allclose(out_masked, out_trunc, atol=1e-5)
        assert not np.allclose(out, out_masked, atol=1e-5)


class TestMergers:
    @pytest.mark.parametrize("fusion", ["qformer", "attention", "mean"])
    def test_merger_shapes(self, fusion):
        cfg = mergers.MergerConfig(
            fusion_type=fusion, feat_dim=12, llm_dim=20, num_query_tokens=5, max_time=8
        )
        params = mergers.init_merger(jax.random.PRNGKey(0), cfg)
        feats = jax.random.normal(jax.random.PRNGKey(1), (3, 8, 12))
        out = mergers.apply_merger(params, cfg, feats)
        assert out.shape == (3, 5, 20)

    def test_mean_merger_math(self):
        cfg = mergers.MergerConfig(
            fusion_type="mean", feat_dim=4, llm_dim=6, num_query_tokens=2, max_time=8
        )
        params = mergers.init_merger(jax.random.PRNGKey(0), cfg)
        feats = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 4))
        out = mergers.apply_merger(params, cfg, feats)
        manual = np.mean(np.asarray(feats), axis=1) @ np.asarray(params["proj"]["w"]) + np.asarray(params["proj"]["b"])
        np.testing.assert_allclose(np.asarray(out[:, 0]), manual, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(out[:, 0]), np.asarray(out[:, 1]))

    def test_attention_merger_is_unnormalized_pool(self):
        # fused = sum_t feats[t] * mlp(feats)[t] (reference affectgpt.py:505-535)
        cfg = mergers.MergerConfig(
            fusion_type="attention", feat_dim=4, llm_dim=6, num_query_tokens=1, max_time=8
        )
        params = mergers.init_merger(jax.random.PRNGKey(0), cfg)
        feats = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (1, 3, 4)))
        w = np.asarray(params["attn_mlp"]["w"])[:, 0]
        b = np.asarray(params["attn_mlp"]["b"])[0]
        weights = feats @ w + b  # [1, 3]
        manual_fused = (feats * weights[..., None]).sum(axis=1)
        out = mergers.apply_merger(params, cfg, feats)
        manual_out = manual_fused @ np.asarray(params["proj"]["w"]) + np.asarray(params["proj"]["b"])
        np.testing.assert_allclose(np.asarray(out[:, 0]), manual_out, atol=1e-5)

    @pytest.mark.parametrize("fusion", ["qformer", "attention"])
    def test_multi_fusion_shapes(self, fusion):
        cfg = mergers.MultiFusionConfig(
            fusion_type=fusion, video_dim=12, audio_dim=16, llm_dim=20,
            num_query_tokens=3, max_time=32,
        )
        params = mergers.init_multi_fusion(jax.random.PRNGKey(0), cfg)
        v = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 12))
        a = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 16))
        out = mergers.apply_multi_fusion(params, cfg, v, a)
        assert out.shape == (2, 3, 20)
        assert cfg.max_dim == 16


class TestEncoders:
    def test_clip_vision(self):
        cfg = clip_vit.ClipVisionConfig.tiny()
        params = clip_vit.init_vision_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        imgs = jax.random.normal(jax.random.PRNGKey(1), (3, 28, 28, 3))
        out = clip_vit.encode_image(params, cfg, imgs)
        assert out.shape == (3, cfg.projection_dim)
        assert np.isfinite(np.asarray(out)).all()

    def test_clip_patchify_channel_major(self):
        # one patch: values laid out as (C, ph, pw) flattened
        img = np.arange(14 * 14 * 3).reshape(1, 14, 14, 3).astype(np.float32)
        patches = np.asarray(clip_vit.patchify(jnp.asarray(img), 14))
        assert patches.shape == (1, 1, 588)
        expect = np.transpose(img[0], (2, 0, 1)).reshape(-1)  # C, H, W order
        np.testing.assert_array_equal(patches[0, 0], expect)

    def test_clip_text(self):
        cfg = clip_vit.ClipTextConfig.tiny()
        params = clip_vit.init_text_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        ids = jnp.array([[1, 5, 9, 63, 0, 0], [1, 7, 63, 0, 0, 0]])  # 63 = max id (EOT)
        out = clip_vit.encode_text(params, cfg, ids)
        assert out.shape == (2, cfg.projection_dim)

    def test_hubert(self):
        cfg = hubert.HubertConfig.tiny()
        params = hubert.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        wav = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 1, 800))
        out = hubert.encode_clips(params, cfg, wav)
        assert out.shape == (2, 3, cfg.hidden_size)
        assert np.isfinite(np.asarray(out)).all()

    def test_hubert_conv_chunk_exact(self, monkeypatch):
        # chunked conv frontend (bounds the [b, samples/5, 512] HBM temp
        # at realtime batch) is bit-identical to the unchunked path
        monkeypatch.setenv("HUBERT_CONV_CHUNK", "3")
        cfg = hubert.HubertConfig.tiny()
        params = hubert.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        wav = jax.random.normal(jax.random.PRNGKey(1), (6, 800))
        chunked = np.asarray(hubert._conv_frontend(params, cfg, wav))
        monkeypatch.setenv("HUBERT_CONV_CHUNK", "0")
        full = np.asarray(hubert._conv_frontend(params, cfg, wav))
        np.testing.assert_array_equal(chunked, full)


class TestQwen:
    def setup_method(self):
        self.cfg = qwen2.QwenConfig.tiny()
        self.params = qwen2.init_params(jax.random.PRNGKey(0), self.cfg, dtype=jnp.float32)
        self.lora = qwen2.init_lora(jax.random.PRNGKey(1), self.cfg)

    def test_forward_shapes(self):
        ids = jax.random.randint(jax.random.PRNGKey(2), (2, 7), 0, self.cfg.vocab_size)
        embeds = qwen2.embed_tokens(self.params, ids)
        mask = jnp.ones((2, 7))
        logits, cache = qwen2.forward(self.params, self.cfg, embeds, mask)
        assert logits.shape == (2, 7, self.cfg.vocab_size)
        assert cache is None

    def test_lora_zero_init_is_identity(self):
        ids = jax.random.randint(jax.random.PRNGKey(2), (1, 5), 0, self.cfg.vocab_size)
        embeds = qwen2.embed_tokens(self.params, ids)
        mask = jnp.ones((1, 5))
        base, _ = qwen2.forward(self.params, self.cfg, embeds, mask)
        with_lora, _ = qwen2.forward(self.params, self.cfg, embeds, mask, lora=self.lora)
        np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora), atol=1e-6)

    def test_lora_changes_output_when_nonzero(self):
        lora = jax.tree.map(lambda x: x + 0.01, self.lora)
        ids = jax.random.randint(jax.random.PRNGKey(2), (1, 5), 0, self.cfg.vocab_size)
        embeds = qwen2.embed_tokens(self.params, ids)
        base, _ = qwen2.forward(self.params, self.cfg, embeds, jnp.ones((1, 5)))
        tuned, _ = qwen2.forward(self.params, self.cfg, embeds, jnp.ones((1, 5)), lora=lora)
        assert not np.allclose(np.asarray(base), np.asarray(tuned), atol=1e-6)

    def test_causality(self):
        ids = jax.random.randint(jax.random.PRNGKey(3), (1, 6), 0, self.cfg.vocab_size)
        embeds = qwen2.embed_tokens(self.params, ids)
        logits1, _ = qwen2.forward(self.params, self.cfg, embeds, jnp.ones((1, 6)))
        # perturbing the last token must not change earlier logits
        embeds2 = embeds.at[:, -1].add(1.0)
        logits2, _ = qwen2.forward(self.params, self.cfg, embeds2, jnp.ones((1, 6)))
        np.testing.assert_allclose(
            np.asarray(logits1[:, :-1]), np.asarray(logits2[:, :-1]), atol=1e-5
        )

    def test_decode_matches_full_forward(self):
        """Prefill+decode with KV cache must agree with full-sequence forward."""
        cfg, params = self.cfg, self.params
        t_total, t_prefill, max_len = 6, 4, 8
        ids = jax.random.randint(jax.random.PRNGKey(4), (1, t_total), 0, cfg.vocab_size)
        embeds = qwen2.embed_tokens(params, ids)

        full_logits, _ = qwen2.forward(params, cfg, embeds, jnp.ones((1, t_total)))

        # prefill: write the first t_prefill tokens into the cache
        cache = qwen2.init_cache(cfg, 1, max_len, dtype=jnp.float32)
        key_valid = jnp.arange(max_len) < t_prefill
        prefill_mask = (
            jnp.tril(jnp.ones((t_prefill, t_prefill), dtype=bool))[None]
            & jnp.ones((1, 1, t_prefill), dtype=bool)
        )
        # decode-style mask over cache keys: [b, t, max_len]
        causal_rows = jnp.arange(max_len)[None, None, :] <= jnp.arange(t_prefill)[None, :, None]
        pmask = causal_rows & key_valid[None, None, :]
        logits_p, cache = qwen2.forward(
            params, cfg, embeds[:, :t_prefill], pmask,
            positions=jnp.arange(t_prefill)[None], cache=cache,
            cache_index=jnp.int32(0),
        )
        np.testing.assert_allclose(
            np.asarray(logits_p), np.asarray(full_logits[:, :t_prefill]), atol=1e-4
        )

        # decode the remaining tokens one at a time
        for step in range(t_prefill, t_total):
            key_mask = (jnp.arange(max_len) <= step)[None, None, :]
            logits_d, cache = qwen2.forward(
                params, cfg, embeds[:, step : step + 1], key_mask,
                positions=jnp.full((1, 1), step), cache=cache,
                cache_index=jnp.int32(step),
            )
            np.testing.assert_allclose(
                np.asarray(logits_d[:, 0]), np.asarray(full_logits[:, step]), atol=1e-4
            )

    def test_loss_ignore_index(self):
        logits = jax.random.normal(jax.random.PRNGKey(5), (2, 5, 11))
        labels = jnp.array([[-100, -100, 3, 4, -100], [-100, 2, 3, -100, -100]])
        loss = qwen2.cross_entropy_loss(logits, labels)
        assert loss.shape == ()
        assert float(loss) > 0
        # fully masked → zero loss, no nan
        loss0 = qwen2.cross_entropy_loss(logits, jnp.full((2, 5), -100))
        assert float(loss0) == 0.0

    def test_fused_cross_entropy_matches_materialized(self):
        """Chunked lm_head+CE (online logsumexp over vocab chunks) matches
        the materialized-logits loss in value AND gradient, for both the
        lm_head and tied-embedding branches."""
        import dataclasses

        cfg = qwen2.QwenConfig.tiny()
        params = qwen2.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        lora = qwen2.init_lora(jax.random.PRNGKey(1), cfg)
        rng = np.random.default_rng(0)
        b, t = 2, 12
        embeds = jnp.asarray(rng.normal(size=(b, t, cfg.hidden_size)), jnp.float32)
        mask = jnp.ones((b, t), jnp.int32)
        labels = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(b, t)))
        labels = labels.at[:, :3].set(-100)

        def loss_ref(e):
            logits, _ = qwen2.forward(params, cfg, e, mask, lora=lora)
            return qwen2.cross_entropy_loss(logits, labels)

        def loss_fused(e):
            hidden, _ = qwen2.forward(
                params, cfg, e, mask, lora=lora, return_hidden=True
            )
            # chunk < vocab forces the multi-chunk online-logsumexp path
            return qwen2.fused_cross_entropy_loss(
                hidden, params, cfg, labels, chunk=64
            )

        l1, g1 = jax.value_and_grad(loss_ref)(embeds)
        l2, g2 = jax.value_and_grad(loss_fused)(embeds)
        np.testing.assert_allclose(float(l1), float(l2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)

        cfg2 = dataclasses.replace(cfg, tie_embeddings=True)
        p2 = qwen2.init_params(jax.random.PRNGKey(2), cfg2, dtype=jnp.float32)
        logits, _ = qwen2.forward(p2, cfg2, embeds, mask)
        hidden, _ = qwen2.forward(p2, cfg2, embeds, mask, return_hidden=True)
        np.testing.assert_allclose(
            float(qwen2.cross_entropy_loss(logits, labels)),
            float(qwen2.fused_cross_entropy_loss(hidden, p2, cfg2, labels, chunk=100)),
            atol=1e-5,
        )


class TestSplice:
    def test_find_patch_run(self):
        ids = [1, 2, 9, 9, 9, 4]
        assert splice.find_patch_run(ids, 9, 3) == 2
        assert splice.find_patch_run(ids, 42, 3) == -1
        with pytest.raises(ValueError):
            splice.find_patch_run(ids, 9, 2)  # wrong count
        with pytest.raises(ValueError):
            splice.find_patch_run([9, 1, 9, 9], 9, 3)  # not consecutive

    def test_splice_embeddings(self):
        embeds = jnp.zeros((2, 6, 4))
        mods = jnp.ones((2, 2, 4))
        offsets = jnp.array([1, -1], dtype=jnp.int32)
        out = np.asarray(splice.splice_embeddings(embeds, mods, offsets))
        assert np.all(out[0, 1:3] == 1.0)
        assert np.all(out[0, 0] == 0.0) and np.all(out[0, 3:] == 0.0)
        np.testing.assert_array_equal(out[1], np.zeros((6, 4)))  # absent → untouched
