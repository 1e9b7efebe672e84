"""EVA ViT tower + BLIP2 head structural tests, 4-D merger path, and
state-dict conversion roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np

from affectgpt_tpu.models import eva_vit, mergers
from affectgpt_tpu.models.encoders import get_visual_encoder


class TestEvaVit:
    def setup_method(self):
        self.cfg = eva_vit.EvaVitConfig.tiny()
        self.params = eva_vit.init_params(jax.random.PRNGKey(0), self.cfg, dtype=jnp.float32)

    def test_token_and_mean_shapes(self):
        imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 3))
        tokens = eva_vit.encode_tokens(self.params, self.cfg, imgs)
        assert tokens.shape == (2, 5, 16)  # 4 patches + cls
        pooled = eva_vit.encode_mean(self.params, self.cfg, imgs)
        assert pooled.shape == (2, 16)
        np.testing.assert_allclose(
            np.asarray(pooled), np.asarray(tokens).mean(1), atol=1e-6
        )

    def test_blip2_head(self):
        head = eva_vit.init_blip2_head(jax.random.PRNGKey(2), self.cfg, num_query_tokens=4,
                                       dtype=jnp.float32)
        imgs = jax.random.normal(jax.random.PRNGKey(3), (2, 28, 28, 3))
        out = eva_vit.encode_blip2(self.params, head, self.cfg, imgs, num_query_tokens=4)
        assert out.shape == (2, 4, 768)

    def test_convert_eva_state_roundtrip(self):
        import torch

        width, patches = 16, 4
        state = {
            "patch_embed.proj.weight": torch.randn(width, 3, 14, 14),
            "patch_embed.proj.bias": torch.randn(width),
            "cls_token": torch.randn(1, 1, width),
            "pos_embed": torch.randn(1, patches + 1, width),
        }
        for i in range(2):
            state.update({
                f"blocks.{i}.norm1.weight": torch.ones(width),
                f"blocks.{i}.norm1.bias": torch.zeros(width),
                f"blocks.{i}.attn.qkv.weight": torch.randn(3 * width, width),
                f"blocks.{i}.attn.q_bias": torch.randn(width),
                f"blocks.{i}.attn.v_bias": torch.randn(width),
                f"blocks.{i}.attn.proj.weight": torch.randn(width, width),
                f"blocks.{i}.attn.proj.bias": torch.randn(width),
                f"blocks.{i}.norm2.weight": torch.ones(width),
                f"blocks.{i}.norm2.bias": torch.zeros(width),
                f"blocks.{i}.mlp.fc1.weight": torch.randn(32, width),
                f"blocks.{i}.mlp.fc1.bias": torch.randn(32),
                f"blocks.{i}.mlp.fc2.weight": torch.randn(width, 32),
                f"blocks.{i}.mlp.fc2.bias": torch.randn(width),
            })
        params = eva_vit.convert_eva_state(state, dtype=np.float32)
        assert params["qkv_w" if False else "blocks"][0]["qkv_w"].shape == (16, 48)
        imgs = jnp.zeros((1, 28, 28, 3))
        out = eva_vit.encode_mean(jax.tree.map(jnp.asarray, params), self.cfg, imgs)
        assert np.isfinite(np.asarray(out)).all()

    def test_registry_entries(self):
        assert get_visual_encoder("EVA_CLIP_G").hidden_size == 768
        assert get_visual_encoder("EVA_CLIP_G_NO_QFORMER").hidden_size == 1408


class TestMerger4D:
    def test_qformer_merger_accepts_blip2_features(self):
        cfg = mergers.MergerConfig(
            fusion_type="qformer", feat_dim=12, llm_dim=20, num_query_tokens=5, max_time=8
        )
        params = mergers.init_merger(jax.random.PRNGKey(0), cfg)
        feats4d = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 3, 12))
        out = mergers.apply_merger(params, cfg, feats4d)
        assert out.shape == (2, 5, 20)

    def test_attention_merger_pools_query_dim(self):
        cfg = mergers.MergerConfig(
            fusion_type="attention", feat_dim=12, llm_dim=20, num_query_tokens=2, max_time=8
        )
        params = mergers.init_merger(jax.random.PRNGKey(0), cfg)
        feats4d = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 3, 12))
        out4 = mergers.apply_merger(params, cfg, feats4d)
        out3 = mergers.apply_merger(params, cfg, jnp.mean(feats4d, axis=2))
        np.testing.assert_allclose(np.asarray(out4), np.asarray(out3), atol=1e-6)
