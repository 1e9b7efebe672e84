"""DINOv2 / SigLIP parity vs HF transformers (tiny random models)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from affectgpt_tpu.models import convert, vit_variants  # noqa: E402


class TestDinov2Parity:
    def test_pooled_mean_matches_hf(self, tmp_path):
        from transformers import Dinov2Config as HFCfg
        from transformers import Dinov2Model

        hf_cfg = HFCfg(
            hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
            mlp_ratio=2, image_size=28, patch_size=14, use_swiglu_ffn=False,
            attn_implementation="eager",
        )
        torch.manual_seed(0)
        model = Dinov2Model(hf_cfg).eval()
        model.save_pretrained(str(tmp_path / "hf"), safe_serialization=True)
        params = convert.convert_dinov2(str(tmp_path / "hf"))

        cfg = vit_variants.Dinov2Config(
            image_size=28, patch_size=14, width=16, num_layers=2, num_heads=2, mlp_dim=32,
        )
        imgs = np.random.RandomState(0).randn(2, 28, 28, 3).astype(np.float32)
        with torch.no_grad():
            out = model(torch.tensor(imgs).permute(0, 3, 1, 2)).last_hidden_state
            hf_pooled = out.mean(dim=1).numpy()
        ours = vit_variants.dinov2_encode(
            jax.tree.map(jnp.asarray, params), cfg, jnp.asarray(imgs)
        )
        np.testing.assert_allclose(np.asarray(ours), hf_pooled, atol=5e-4, rtol=5e-3)


class TestSiglipParity:
    def test_pooled_mean_matches_hf(self, tmp_path):
        from transformers import SiglipVisionConfig, SiglipVisionModel

        hf_cfg = SiglipVisionConfig(
            hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=32, image_size=32, patch_size=16,
            attn_implementation="eager",
        )
        torch.manual_seed(0)
        model = SiglipVisionModel(hf_cfg).eval()
        model.save_pretrained(str(tmp_path / "hf"), safe_serialization=True)
        params = convert.convert_siglip_vision(str(tmp_path / "hf"))

        cfg = vit_variants.SiglipConfig(
            image_size=32, patch_size=16, width=16, num_layers=2, num_heads=2, mlp_dim=32,
        )
        imgs = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)
        with torch.no_grad():
            out = model(torch.tensor(imgs).permute(0, 3, 1, 2)).last_hidden_state
            hf_pooled = out.mean(dim=1).numpy()
        ours = vit_variants.siglip_encode(
            jax.tree.map(jnp.asarray, params), cfg, jnp.asarray(imgs)
        )
        np.testing.assert_allclose(np.asarray(ours), hf_pooled, atol=5e-4, rtol=5e-3)
