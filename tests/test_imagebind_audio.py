"""ImageBind audio encoder: structure, normalization contract, converter."""

import jax
import jax.numpy as jnp
import numpy as np

from affectgpt_tpu.models import imagebind_audio as ib
from affectgpt_tpu.models.encoders import get_acoustic_encoder


class TestImageBindAudio:
    def setup_method(self):
        self.cfg = ib.ImageBindAudioConfig.tiny()
        self.params = ib.init_params(jax.random.PRNGKey(0), self.cfg, dtype=jnp.float32)

    def test_patch_grid(self):
        assert ib.ImageBindAudioConfig.huge().patch_grid == (12, 19)

    def test_encode_shapes_and_norm(self):
        mels = jax.random.normal(jax.random.PRNGKey(1), (3, 1, 32, 48))
        out = ib.encode_mels(self.params, self.cfg, mels)
        assert out.shape == (3, self.cfg.out_embed_dim)
        norms = np.linalg.norm(np.asarray(out), axis=-1)
        np.testing.assert_allclose(norms, self.cfg.logit_scale, rtol=1e-4)

    def test_encode_clips_layout(self):
        clips = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 1, 32, 48))
        out = ib.encode_clips(self.params, self.cfg, clips)
        assert out.shape == (2, 4, self.cfg.out_embed_dim)

    def test_converter_from_torch_names(self):
        import torch

        d, mlp, grid_tokens = 16, 32, self.cfg.patch_grid[0] * self.cfg.patch_grid[1]
        state = {
            "modality_preprocessors.audio.audio_stem.proj.0.weight": torch.randn(d, 1, 16, 16),
            "modality_preprocessors.audio.audio_stem.norm_layer.weight": torch.ones(d),
            "modality_preprocessors.audio.audio_stem.norm_layer.bias": torch.zeros(d),
            "modality_preprocessors.audio.cls_token": torch.zeros(1, 1, d),
            "modality_preprocessors.audio.pos_embedding_helper.pos_embed": torch.randn(1, grid_tokens + 1, d),
            "modality_heads.audio.0.weight": torch.ones(d),
            "modality_heads.audio.0.bias": torch.zeros(d),
            "modality_heads.audio.2.weight": torch.randn(12, d),
        }
        for i in range(2):
            p = f"modality_trunks.audio.blocks.{i}"
            state.update({
                f"{p}.norm_1.weight": torch.ones(d), f"{p}.norm_1.bias": torch.zeros(d),
                f"{p}.attn.in_proj_weight": torch.randn(3 * d, d),
                f"{p}.attn.in_proj_bias": torch.randn(3 * d),
                f"{p}.attn.out_proj.weight": torch.randn(d, d),
                f"{p}.attn.out_proj.bias": torch.randn(d),
                f"{p}.norm_2.weight": torch.ones(d), f"{p}.norm_2.bias": torch.zeros(d),
                f"{p}.mlp.fc1.weight": torch.randn(mlp, d), f"{p}.mlp.fc1.bias": torch.randn(mlp),
                f"{p}.mlp.fc2.weight": torch.randn(d, mlp), f"{p}.mlp.fc2.bias": torch.randn(d),
            })
        params = ib.convert_imagebind_audio(state, dtype=np.float32)
        mels = jnp.zeros((1, 1, 32, 48))
        out = ib.encode_mels(jax.tree.map(jnp.asarray, params), self.cfg, mels)
        assert np.isfinite(np.asarray(out)).all()

    def test_registry(self):
        assert get_acoustic_encoder("IMAGEBIND").hidden_size == 1024
