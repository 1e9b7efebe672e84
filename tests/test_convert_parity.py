"""Numerical parity: HF PyTorch reference models (random-init, tiny) vs
our JAX implementations through the weight converter.

This validates both the converter mappings and the model math (RoPE/GQA,
pre-LN CLIP with quick_gelu, HuBERT conv frontend + stable-LN encoder)
against the exact libraries the reference uses.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from affectgpt_tpu.models import clip_vit, convert, hubert, qwen2  # noqa: E402


def save_and_convert(model, tmp_path, convert_fn):
    model_dir = str(tmp_path / "hf")
    model.save_pretrained(model_dir, safe_serialization=True)
    return convert_fn(model_dir)


class TestQwenParity:
    def test_logits_match_hf(self, tmp_path):
        from transformers import Qwen2Config, Qwen2ForCausalLM

        hf_cfg = Qwen2Config(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=8, rope_theta=10000.0, rms_norm_eps=1e-6, tie_word_embeddings=False,
            attn_implementation="eager",
        )
        torch.manual_seed(0)
        model = Qwen2ForCausalLM(hf_cfg).eval()
        params = save_and_convert(model, tmp_path, convert.convert_qwen2)

        cfg = qwen2.QwenConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=2,
            num_heads=4, num_kv_heads=2, head_dim=8, rope_theta=10000.0,
        )
        ids = np.random.RandomState(0).randint(0, 128, (2, 9))
        with torch.no_grad():
            hf_logits = model(torch.tensor(ids)).logits.numpy()

        params = jax.tree.map(jnp.asarray, params)
        embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
        logits, _ = qwen2.forward(params, cfg, embeds, jnp.ones(ids.shape))
        np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=2e-3, rtol=2e-3)


class TestLlamaParity:
    def test_logits_match_hf(self, tmp_path):
        """Llama-2 family (reference affectgpt.py:92-133 alternate LLM):
        no qkv bias, MHA, rope 10k, eps 1e-5 — through the same converter."""
        from transformers import LlamaConfig, LlamaForCausalLM

        hf_cfg = LlamaConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
            head_dim=8, rope_theta=10000.0, rms_norm_eps=1e-5,
            tie_word_embeddings=False, attn_implementation="eager",
        )
        torch.manual_seed(1)
        model = LlamaForCausalLM(hf_cfg).eval()
        model_dir = str(tmp_path / "hf")
        model.save_pretrained(model_dir, safe_serialization=True)
        params = convert.convert_llama(model_dir)
        cfg = convert.llm_config_from_hf(model_dir)
        assert not cfg.qkv_bias and cfg.num_kv_heads == cfg.num_heads
        assert cfg.rms_eps == 1e-5 and not cfg.tie_embeddings

        ids = np.random.RandomState(1).randint(0, 128, (2, 9))
        with torch.no_grad():
            hf_logits = model(torch.tensor(ids)).logits.numpy()

        params = jax.tree.map(jnp.asarray, params)
        embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
        logits, _ = qwen2.forward(params, cfg, embeds, jnp.ones(ids.shape))
        np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=2e-3, rtol=2e-3)

    def test_tied_embeddings_roundtrip(self, tmp_path):
        """Tied-embedding checkpoints (e.g. real Qwen2.5-3B) have no
        lm_head tensor; config detection + forward must handle it."""
        from transformers import Qwen2Config, Qwen2ForCausalLM

        hf_cfg = Qwen2Config(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=8, rope_theta=10000.0, rms_norm_eps=1e-6,
            tie_word_embeddings=True, attn_implementation="eager",
        )
        torch.manual_seed(2)
        model = Qwen2ForCausalLM(hf_cfg).eval()
        model_dir = str(tmp_path / "hf")
        model.save_pretrained(model_dir, safe_serialization=True)
        params = convert.convert_qwen2(model_dir)
        cfg = convert.llm_config_from_hf(model_dir)
        assert cfg.tie_embeddings and "lm_head" not in params

        ids = np.random.RandomState(2).randint(0, 128, (2, 7))
        with torch.no_grad():
            hf_logits = model(torch.tensor(ids)).logits.numpy()
        params = jax.tree.map(jnp.asarray, params)
        embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
        logits, _ = qwen2.forward(params, cfg, embeds, jnp.ones(ids.shape))
        np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=2e-3, rtol=2e-3)


class TestGreedyGenerateParity:
    def test_greedy_tokens_match_hf_generate(self, tmp_path):
        """Beyond logits parity: the whole compiled KV-cache decode loop
        (prefill → per-step argmax → cache append) must emit the same
        greedy tokens as HF `model.generate` on a tiny random Qwen2."""
        from transformers import Qwen2Config, Qwen2ForCausalLM

        from affectgpt_tpu.inference import generate as gen

        hf_cfg = Qwen2Config(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=8, rope_theta=10000.0, rms_norm_eps=1e-6,
            tie_word_embeddings=False, attn_implementation="eager",
            bos_token_id=None, eos_token_id=None, pad_token_id=0,
        )
        torch.manual_seed(7)
        model = Qwen2ForCausalLM(hf_cfg).eval()
        params = save_and_convert(model, tmp_path, convert.convert_qwen2)
        cfg = qwen2.QwenConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=2,
            num_heads=4, num_kv_heads=2, head_dim=8, rope_theta=10000.0,
        )

        ids = np.random.RandomState(7).randint(1, 128, (2, 6))
        max_new = 8
        with torch.no_grad():
            hf_out = model.generate(
                torch.tensor(ids), max_new_tokens=max_new, do_sample=False,
                eos_token_id=None, pad_token_id=0, use_cache=True,
            )
        hf_new = hf_out[:, ids.shape[1]:].numpy()

        params = jax.tree.map(jnp.asarray, params)
        embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
        gcfg = gen.GenerateConfig(
            max_new_tokens=max_new, do_sample=False, eos_token_id=-1,
        )
        toks, _ = gen.generate(
            params, cfg, gcfg, embeds, jnp.full((2,), ids.shape[1]),
            jax.random.PRNGKey(0), max_len=ids.shape[1] + max_new,
        )
        np.testing.assert_array_equal(np.asarray(toks), hf_new)


class TestBaichuan2Parity:
    def test_logits_match_reference_semantics(self, tmp_path):
        """Baichuan2 family (reference affectgpt.py:92-103 trust_remote_code
        branch). transformers has no Baichuan class, so the reference
        numerics come from an HF Llama (same decoder math: MHA, no bias,
        rope 10k) whose lm_head is row-normalized the way Baichuan2's
        NormHead does at runtime; the converter sees a Baichuan-format
        state dict (fused W_pack, raw NormHead weight) and must fold both
        deltas to match."""
        from transformers import LlamaConfig, LlamaForCausalLM

        hf_cfg = LlamaConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
            head_dim=8, rope_theta=10000.0, rms_norm_eps=1e-6,
            tie_word_embeddings=False, attn_implementation="eager",
            attention_bias=False, mlp_bias=False,
        )
        torch.manual_seed(3)
        model = LlamaForCausalLM(hf_cfg).eval()

        # fabricate the Baichuan2-format state dict from the Llama weights
        sd = {k: v.clone() for k, v in model.state_dict().items()}
        bc_state = {}
        for i in range(hf_cfg.num_hidden_layers):
            p = f"model.layers.{i}"
            bc_state[f"{p}.self_attn.W_pack.weight"] = torch.cat(
                [sd.pop(f"{p}.self_attn.{n}_proj.weight") for n in ("q", "k", "v")], dim=0
            )
            sd.pop(f"{p}.self_attn.rotary_emb.inv_freq", None)
        bc_state.update(sd)
        model_dir = tmp_path / "baichuan"
        model_dir.mkdir()
        torch.save(bc_state, model_dir / "pytorch_model.bin")
        import json

        (model_dir / "config.json").write_text(json.dumps({
            "architectures": ["BaichuanForCausalLM"],
            "vocab_size": 128, "hidden_size": 32, "intermediate_size": 64,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "rms_norm_eps": 1e-6,
        }))

        params = convert.convert_baichuan2(str(model_dir))
        cfg = convert.llm_config_from_hf(str(model_dir))
        assert not cfg.qkv_bias and cfg.num_kv_heads == cfg.num_heads == 4
        assert cfg.rope_theta == 10000.0

        # reference logits: Llama forward with the NormHead normalization
        # applied to its (static) head weight
        with torch.no_grad():
            w = model.lm_head.weight
            model.lm_head.weight.copy_(torch.nn.functional.normalize(w, dim=-1))
        ids = np.random.RandomState(3).randint(0, 128, (2, 9))
        with torch.no_grad():
            hf_logits = model(torch.tensor(ids)).logits.numpy()

        params = jax.tree.map(jnp.asarray, params)
        embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
        logits, _ = qwen2.forward(params, cfg, embeds, jnp.ones(ids.shape))
        np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=2e-3, rtol=2e-3)


class TestClipParity:
    def test_image_features_match_hf(self, tmp_path):
        from transformers import CLIPConfig, CLIPModel

        hf_cfg = CLIPConfig(
            text_config=dict(
                vocab_size=64, hidden_size=16, intermediate_size=32,
                num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=16,
                projection_dim=8, hidden_act="quick_gelu",
                # real CLIP's EOT is the highest vocab id; our encode_text pools
                # at argmax(ids), so keep the HF eos consistent with that
                eos_token_id=63,
            ),
            vision_config=dict(
                hidden_size=16, intermediate_size=32, num_hidden_layers=2,
                num_attention_heads=2, image_size=28, patch_size=14,
                projection_dim=8, hidden_act="quick_gelu",
            ),
            projection_dim=8,
        )
        torch.manual_seed(0)
        model = CLIPModel(hf_cfg).eval()
        v_params = save_and_convert(model, tmp_path, convert.convert_clip_vision)
        t_params = convert.convert_clip_text(str(tmp_path / "hf"))

        vcfg = clip_vit.ClipVisionConfig(
            image_size=28, patch_size=14, width=16, num_layers=2, num_heads=2,
            mlp_dim=32, projection_dim=8,
        )
        imgs = np.random.RandomState(0).randn(2, 28, 28, 3).astype(np.float32)
        with torch.no_grad():
            hf_feat = model.get_image_features(
                torch.tensor(imgs).permute(0, 3, 1, 2)
            ).numpy()
        ours = clip_vit.encode_image(jax.tree.map(jnp.asarray, v_params), vcfg, jnp.asarray(imgs))
        np.testing.assert_allclose(np.asarray(ours), hf_feat, atol=2e-4, rtol=2e-3)

        tcfg = clip_vit.ClipTextConfig(
            vocab_size=64, context_length=16, width=16, num_layers=2, num_heads=2,
            mlp_dim=32, projection_dim=8,
        )
        ids = np.zeros((2, 10), dtype=np.int64)
        ids[0, :4] = [5, 9, 11, 63]  # 63 = highest id acts as EOT
        ids[1, :3] = [7, 8, 63]
        with torch.no_grad():
            hf_text = model.get_text_features(torch.tensor(ids)).numpy()
        ours_t = clip_vit.encode_text(jax.tree.map(jnp.asarray, t_params), tcfg, jnp.asarray(ids))
        np.testing.assert_allclose(np.asarray(ours_t), hf_text, atol=2e-4, rtol=2e-3)


class TestHubertParity:
    def test_hidden_pooling_matches_hf(self, tmp_path):
        from transformers import HubertConfig as HFHubertConfig
        from transformers import HubertModel

        hf_cfg = HFHubertConfig(
            vocab_size=32, hidden_size=16, num_hidden_layers=3,
            num_attention_heads=2, intermediate_size=32,
            conv_dim=(8, 8), conv_kernel=(10, 3), conv_stride=(5, 2),
            num_feat_extract_layers=2, conv_bias=True,
            feat_extract_norm="layer", do_stable_layer_norm=True,
            num_conv_pos_embeddings=8, num_conv_pos_embedding_groups=2,
            feat_proj_dropout=0.0, hidden_dropout=0.0, attention_dropout=0.0,
            layerdrop=0.0, apply_spec_augment=False,
        )
        torch.manual_seed(0)
        model = HubertModel(hf_cfg).eval()
        params = save_and_convert(model, tmp_path, convert.convert_hubert)

        cfg = hubert.HubertConfig(
            conv_dim=(8, 8), conv_kernel=(10, 3), conv_stride=(5, 2),
            hidden_size=16, num_layers=3, num_heads=2, intermediate_size=32,
            pos_conv_kernel=8, pos_conv_groups=2, mean_last_k_layers=2,
        )
        wav = np.random.RandomState(0).randn(2, 800).astype(np.float32)
        with torch.no_grad():
            out = model(torch.tensor(wav), output_hidden_states=True)
            stacked = torch.stack(out.hidden_states)[[-2, -1]].mean(dim=0)
            hf_pooled = stacked.mean(dim=1).numpy()
        ours = hubert.encode(
            jax.tree.map(jnp.asarray, params), cfg, jnp.asarray(wav), normalize_input=False
        )
        np.testing.assert_allclose(np.asarray(ours), hf_pooled, atol=2e-3, rtol=2e-2)
