"""WavLM / data2vec-audio parity vs HF transformers (tiny random models)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from affectgpt_tpu.models import convert, wav_encoders  # noqa: E402


def pooled_last_k(hidden_states, k=2):
    stacked = torch.stack(hidden_states)[-k:].mean(dim=0)
    return stacked.mean(dim=1).numpy()


class TestWavLMParity:
    def test_pooling_matches_hf(self, tmp_path):
        from transformers import WavLMConfig as HFCfg
        from transformers import WavLMModel

        hf_cfg = HFCfg(
            hidden_size=16, num_hidden_layers=3, num_attention_heads=2,
            intermediate_size=32, conv_dim=(8, 8), conv_kernel=(10, 3),
            conv_stride=(5, 2), num_feat_extract_layers=2, conv_bias=True,
            feat_extract_norm="layer", do_stable_layer_norm=True,
            num_conv_pos_embeddings=8, num_conv_pos_embedding_groups=2,
            num_buckets=8, max_bucket_distance=16,
            feat_proj_dropout=0.0, hidden_dropout=0.0, attention_dropout=0.0,
            layerdrop=0.0, apply_spec_augment=False,
        )
        torch.manual_seed(0)
        model = WavLMModel(hf_cfg).eval()
        model.save_pretrained(str(tmp_path / "hf"), safe_serialization=True)
        params = convert.convert_wavlm(str(tmp_path / "hf"))

        cfg = wav_encoders.WavLMConfig.tiny()
        wav = np.random.RandomState(0).randn(2, 800).astype(np.float32)
        with torch.no_grad():
            out = model(torch.tensor(wav), output_hidden_states=True)
            hf_pooled = pooled_last_k(out.hidden_states, k=2)
        ours = wav_encoders.wavlm_encode(
            jax.tree.map(jnp.asarray, params), cfg, jnp.asarray(wav), normalize_input=False
        )
        np.testing.assert_allclose(np.asarray(ours), hf_pooled, atol=3e-3, rtol=3e-2)


class TestData2VecParity:
    def test_pooling_matches_hf(self, tmp_path):
        from transformers import Data2VecAudioConfig as HFCfg
        from transformers import Data2VecAudioModel

        hf_cfg = HFCfg(
            hidden_size=16, num_hidden_layers=3, num_attention_heads=2,
            intermediate_size=32, conv_dim=(8, 8), conv_kernel=(10, 3),
            conv_stride=(5, 2), num_feat_extract_layers=2, conv_bias=True,
            num_conv_pos_embeddings=2, num_conv_pos_embedding_groups=2,
            conv_pos_kernel_size=5,
            feat_proj_dropout=0.0, hidden_dropout=0.0, attention_dropout=0.0,
            layerdrop=0.0, apply_spec_augment=False,
        )
        torch.manual_seed(0)
        model = Data2VecAudioModel(hf_cfg).eval()
        model.save_pretrained(str(tmp_path / "hf"), safe_serialization=True)
        params = convert.convert_data2vec_audio(str(tmp_path / "hf"))

        cfg = wav_encoders.Data2VecAudioConfig(
            conv_dim=(8, 8), conv_kernel=(10, 3), conv_stride=(5, 2),
            hidden_size=16, num_layers=3, num_heads=2, intermediate_size=32,
            num_pos_conv_layers=2, pos_conv_kernel=5,
            pos_conv_groups=2, mean_last_k_layers=2,
        )
        wav = np.random.RandomState(0).randn(2, 800).astype(np.float32)
        with torch.no_grad():
            out = model(torch.tensor(wav), output_hidden_states=True)
            hf_pooled = pooled_last_k(out.hidden_states, k=2)
        ours = wav_encoders.data2vec_encode(
            jax.tree.map(jnp.asarray, params), cfg, jnp.asarray(wav), normalize_input=False
        )
        np.testing.assert_allclose(np.asarray(ours), hf_pooled, atol=3e-3, rtol=3e-2)
