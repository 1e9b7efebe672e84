"""HF PyTorch checkpoint → JAX pytree weight conversion.

The reference loads HF checkpoints directly (AutoModel.from_pretrained);
here torch stays on the host purely as a weight reader and each tensor is
mapped into the functional pytrees of qwen2.py / clip_vit.py / hubert.py.
Run once offline; training/inference consume the converted arrays.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def _load_torch_state(model_dir: str) -> Dict[str, "np.ndarray"]:
    """Read all tensors from a HF model dir (safetensors preferred)."""
    state: Dict[str, np.ndarray] = {}
    try:
        import glob as _glob

        from safetensors import safe_open

        files = sorted(_glob.glob(os.path.join(model_dir, "*.safetensors")))
        if files:
            for path in files:
                with safe_open(path, framework="np") as handle:
                    for key in handle.keys():
                        state[key] = handle.get_tensor(key)
            return state
    except ImportError:
        pass
    import glob as _glob

    import torch

    for path in sorted(_glob.glob(os.path.join(model_dir, "*.bin"))) or [
        os.path.join(model_dir, "pytorch_model.bin")
    ]:
        sd = torch.load(path, map_location="cpu", weights_only=True)
        for key, value in sd.items():
            state[key] = value.float().numpy()
    return state


def _dense(state, prefix, transpose=True, bias=True):
    out = {"w": state[f"{prefix}.weight"]}
    if transpose:
        out["w"] = np.ascontiguousarray(out["w"].T)
    if bias and f"{prefix}.bias" in state:
        out["b"] = state[f"{prefix}.bias"]
    return out


def _ln(state, prefix):
    return {"scale": state[f"{prefix}.weight"], "bias": state[f"{prefix}.bias"]}


def convert_qwen2(model_dir: str, dtype=np.float32) -> dict:
    """HF Qwen2ForCausalLM state → qwen2.init_params layout."""
    state = _load_torch_state(model_dir)

    def cast(tree):
        import jax

        return jax.tree.map(lambda x: np.array(x, dtype=dtype), tree)

    layers = []
    i = 0
    while f"model.layers.{i}.self_attn.q_proj.weight" in state:
        p = f"model.layers.{i}"
        layers.append(
            {
                "q_proj": _dense(state, f"{p}.self_attn.q_proj"),
                "k_proj": _dense(state, f"{p}.self_attn.k_proj"),
                "v_proj": _dense(state, f"{p}.self_attn.v_proj"),
                "o_proj": _dense(state, f"{p}.self_attn.o_proj", bias=False),
                "gate_proj": _dense(state, f"{p}.mlp.gate_proj", bias=False),
                "up_proj": _dense(state, f"{p}.mlp.up_proj", bias=False),
                "down_proj": _dense(state, f"{p}.mlp.down_proj", bias=False),
                "input_ln": {"scale": state[f"{p}.input_layernorm.weight"]},
                "post_attn_ln": {"scale": state[f"{p}.post_attention_layernorm.weight"]},
            }
        )
        i += 1
    params = {
        "embed_tokens": {"table": state["model.embed_tokens.weight"]},
        "layers": layers,
        "final_ln": {"scale": state["model.norm.weight"]},
    }
    if "lm_head.weight" in state:
        params["lm_head"] = {"w": np.ascontiguousarray(state["lm_head.weight"].T)}
    return cast(params)


# HF LlamaForCausalLM uses the same state-dict names as Qwen2 (q/k/v simply
# carry no bias tensors, which `_dense` already treats as optional), so the
# same mapping loads the reference's alternate LLM family
# (reference: my_affectgpt/models/affectgpt.py:92-133 loads Qwen2.5/Llama-2/
# Baichuan2 via AutoModelForCausalLM).
convert_llama = convert_qwen2


def convert_baichuan2(model_dir: str, dtype=np.float32) -> dict:
    """HF Baichuan2-7B (BaichuanForCausalLM, trust_remote_code) state →
    qwen2.init_params layout — the reference's third LLM family
    (affectgpt.py:92-103, tokenizer.py:32-35). Two deltas vs Llama:

    - W_pack: q/k/v are one fused [3·hidden, hidden] matrix → split here.
    - NormHead: Baichuan2's head L2-normalizes its weight rows on every
      forward (modeling_baichuan.py NormHead). The served weights are
      static, so the normalization folds in at conversion time and the
      runtime lm_head stays a plain matmul.
    """
    state = _load_torch_state(model_dir)

    def cast(tree):
        import jax

        return jax.tree.map(lambda x: np.array(x, dtype=dtype), tree)

    layers = []
    i = 0
    while f"model.layers.{i}.self_attn.W_pack.weight" in state:
        p = f"model.layers.{i}"
        w_pack = state[f"{p}.self_attn.W_pack.weight"]  # [3h, h]
        h = w_pack.shape[1]
        assert w_pack.shape[0] == 3 * h, w_pack.shape
        q_w, k_w, v_w = (np.ascontiguousarray(w.T) for w in np.split(w_pack, 3, axis=0))
        layers.append(
            {
                "q_proj": {"w": q_w},
                "k_proj": {"w": k_w},
                "v_proj": {"w": v_w},
                "o_proj": _dense(state, f"{p}.self_attn.o_proj", bias=False),
                "gate_proj": _dense(state, f"{p}.mlp.gate_proj", bias=False),
                "up_proj": _dense(state, f"{p}.mlp.up_proj", bias=False),
                "down_proj": _dense(state, f"{p}.mlp.down_proj", bias=False),
                "input_ln": {"scale": state[f"{p}.input_layernorm.weight"]},
                "post_attn_ln": {"scale": state[f"{p}.post_attention_layernorm.weight"]},
            }
        )
        i += 1
    head = state["lm_head.weight"]  # [vocab, h]
    head = head / np.maximum(np.linalg.norm(head, axis=-1, keepdims=True), 1e-7)
    params = {
        "embed_tokens": {"table": state["model.embed_tokens.weight"]},
        "layers": layers,
        "final_ln": {"scale": state["model.norm.weight"]},
        "lm_head": {"w": np.ascontiguousarray(head.T)},
    }
    return cast(params)


def llm_config_from_hf(model_dir: str, lora_r: int = 16):
    """Build a qwen2.QwenConfig from an HF checkpoint's config.json —
    covers Qwen2/2.5 and Llama-2 geometries (vocab, dims, GQA heads,
    rope theta, rms eps, tied embeddings, qkv bias)."""
    import json

    from affectgpt_tpu.models import qwen2

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    arch = (hf.get("architectures") or [""])[0]
    is_llama = "Llama" in arch or "Baichuan" in arch  # both families: no qkv bias
    heads = int(hf["num_attention_heads"])
    return qwen2.QwenConfig(
        vocab_size=int(hf["vocab_size"]),
        hidden_size=int(hf["hidden_size"]),
        intermediate_size=int(hf["intermediate_size"]),
        num_layers=int(hf["num_hidden_layers"]),
        num_heads=heads,
        num_kv_heads=int(hf.get("num_key_value_heads", heads)),
        head_dim=int(hf.get("head_dim", hf["hidden_size"] // heads)),
        rope_theta=float(hf.get("rope_theta", 10_000.0)),
        rms_eps=float(hf.get("rms_norm_eps", 1e-6)),
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        qkv_bias=bool(hf.get("attention_bias", not is_llama)),
        lora_r=lora_r,
    )


def convert_clip_vision(model_dir: str, dtype=np.float32) -> dict:
    """HF CLIPModel vision tower + visual_projection → clip_vit layout."""
    state = _load_torch_state(model_dir)
    pre = "vision_model"

    def block(i):
        p = f"{pre}.encoder.layers.{i}"
        return {
            "ln1": _ln(state, f"{p}.layer_norm1"),
            "attn": {
                "q": _dense(state, f"{p}.self_attn.q_proj"),
                "k": _dense(state, f"{p}.self_attn.k_proj"),
                "v": _dense(state, f"{p}.self_attn.v_proj"),
                "o": _dense(state, f"{p}.self_attn.out_proj"),
            },
            "ln2": _ln(state, f"{p}.layer_norm2"),
            "mlp_in": _dense(state, f"{p}.mlp.fc1"),
            "mlp_out": _dense(state, f"{p}.mlp.fc2"),
        }

    n_layers = 0
    while f"{pre}.encoder.layers.{n_layers}.layer_norm1.weight" in state:
        n_layers += 1

    # conv patch embedding (O, C, kH, kW) → dense [C·kH·kW, O]
    conv = state[f"{pre}.embeddings.patch_embedding.weight"]
    o, c, kh, kw = conv.shape
    patch_w = conv.reshape(o, c * kh * kw).T

    import jax

    params = {
        "patch_embed": {"w": np.ascontiguousarray(patch_w)},
        "class_embed": state[f"{pre}.embeddings.class_embedding"].reshape(-1),
        "pos_embed": {"table": state[f"{pre}.embeddings.position_embedding.weight"]},
        "pre_ln": _ln(state, f"{pre}.pre_layrnorm"),
        "blocks": [block(i) for i in range(n_layers)],
        "post_ln": _ln(state, f"{pre}.post_layernorm"),
        "proj": {"w": np.ascontiguousarray(state["visual_projection.weight"].T)},
    }
    return jax.tree.map(lambda x: np.array(x, dtype=dtype), params)


def convert_clip_text(model_dir: str, dtype=np.float32) -> dict:
    """HF CLIPModel text tower + text_projection → clip_vit text layout."""
    state = _load_torch_state(model_dir)
    pre = "text_model"

    def block(i):
        p = f"{pre}.encoder.layers.{i}"
        return {
            "ln1": _ln(state, f"{p}.layer_norm1"),
            "attn": {
                "q": _dense(state, f"{p}.self_attn.q_proj"),
                "k": _dense(state, f"{p}.self_attn.k_proj"),
                "v": _dense(state, f"{p}.self_attn.v_proj"),
                "o": _dense(state, f"{p}.self_attn.out_proj"),
            },
            "ln2": _ln(state, f"{p}.layer_norm2"),
            "mlp_in": _dense(state, f"{p}.mlp.fc1"),
            "mlp_out": _dense(state, f"{p}.mlp.fc2"),
        }

    n_layers = 0
    while f"{pre}.encoder.layers.{n_layers}.layer_norm1.weight" in state:
        n_layers += 1

    import jax

    params = {
        "token_embed": {"table": state[f"{pre}.embeddings.token_embedding.weight"]},
        "pos_embed": {"table": state[f"{pre}.embeddings.position_embedding.weight"]},
        "blocks": [block(i) for i in range(n_layers)],
        "final_ln": _ln(state, f"{pre}.final_layer_norm"),
        "proj": {"w": np.ascontiguousarray(state["text_projection.weight"].T)},
    }
    return jax.tree.map(lambda x: np.array(x, dtype=dtype), params)


def convert_wavlm(model_dir: str, dtype=np.float32) -> dict:
    """HF WavLMModel (large, stable-LN) → wav_encoders wavlm layout."""
    params = convert_hubert(model_dir, dtype=dtype)
    state = _load_torch_state(model_dir)
    params["rel_attn_embed"] = {
        "table": np.asarray(state["encoder.layers.0.attention.rel_attn_embed.weight"], dtype=dtype)
    }
    for i, layer in enumerate(params["layers"]):
        p = f"encoder.layers.{i}.attention"
        layer["gru_rel_pos_linear"] = {
            "w": np.asarray(state[f"{p}.gru_rel_pos_linear.weight"].T, dtype=dtype),
            "b": np.asarray(state[f"{p}.gru_rel_pos_linear.bias"], dtype=dtype),
        }
        layer["gru_rel_pos_const"] = np.asarray(state[f"{p}.gru_rel_pos_const"], dtype=dtype)
    return params


def convert_data2vec_audio(model_dir: str, dtype=np.float32) -> dict:
    """HF Data2VecAudioModel → wav_encoders data2vec layout."""
    state = _load_torch_state(model_dir)
    import jax

    convs = []
    i = 0
    while f"feature_extractor.conv_layers.{i}.conv.weight" in state:
        p = f"feature_extractor.conv_layers.{i}"
        convs.append(
            {
                "w": state[f"{p}.conv.weight"],
                "b": state.get(f"{p}.conv.bias", np.zeros(state[f"{p}.conv.weight"].shape[0])),
                "ln": _ln(state, f"{p}.layer_norm"),
            }
        )
        i += 1

    pos_convs = []
    i = 0
    while f"encoder.pos_conv_embed.layers.{i}.conv.weight" in state:
        p = f"encoder.pos_conv_embed.layers.{i}"
        pos_convs.append({"w": state[f"{p}.conv.weight"], "b": state[f"{p}.conv.bias"]})
        i += 1

    def layer(i):
        p = f"encoder.layers.{i}"
        return {
            "attn": {
                "q": _dense(state, f"{p}.attention.q_proj"),
                "k": _dense(state, f"{p}.attention.k_proj"),
                "v": _dense(state, f"{p}.attention.v_proj"),
                "o": _dense(state, f"{p}.attention.out_proj"),
            },
            "attn_ln": _ln(state, f"{p}.layer_norm"),
            "ffn_in": _dense(state, f"{p}.feed_forward.intermediate_dense"),
            "ffn_out": _dense(state, f"{p}.feed_forward.output_dense"),
            "ffn_ln": _ln(state, f"{p}.final_layer_norm"),
        }

    n_layers = 0
    while f"encoder.layers.{n_layers}.layer_norm.weight" in state:
        n_layers += 1

    params = {
        "convs": convs,
        "feat_proj_ln": _ln(state, "feature_projection.layer_norm"),
        "feat_proj": _dense(state, "feature_projection.projection"),
        "pos_convs": pos_convs,
        "encoder_ln": _ln(state, "encoder.layer_norm"),
        "layers": [layer(i) for i in range(n_layers)],
    }
    return jax.tree.map(lambda x: np.array(x, dtype=dtype), params)


def convert_dinov2(model_dir: str, dtype=np.float32) -> dict:
    """HF Dinov2Model → vit_variants dinov2 layout."""
    state = _load_torch_state(model_dir)

    def block(i):
        p = f"encoder.layer.{i}"
        return {
            "ln1": _ln(state, f"{p}.norm1"),
            "attn": {
                "q": _dense(state, f"{p}.attention.attention.query"),
                "k": _dense(state, f"{p}.attention.attention.key"),
                "v": _dense(state, f"{p}.attention.attention.value"),
                "o": _dense(state, f"{p}.attention.output.dense"),
            },
            "ls1": state[f"{p}.layer_scale1.lambda1"],
            "ln2": _ln(state, f"{p}.norm2"),
            "mlp_in": _dense(state, f"{p}.mlp.fc1"),
            "mlp_out": _dense(state, f"{p}.mlp.fc2"),
            "ls2": state[f"{p}.layer_scale2.lambda1"],
        }

    n_layers = 0
    while f"encoder.layer.{n_layers}.norm1.weight" in state:
        n_layers += 1

    conv = state["embeddings.patch_embeddings.projection.weight"]
    o, c, kh, kw = conv.shape
    import jax

    params = {
        "patch_embed": {
            "w": np.ascontiguousarray(conv.reshape(o, c * kh * kw).T),
            "b": state["embeddings.patch_embeddings.projection.bias"],
        },
        "cls_token": state["embeddings.cls_token"].reshape(-1),
        "pos_embed": {"table": state["embeddings.position_embeddings"][0]},
        "blocks": [block(i) for i in range(n_layers)],
        "final_ln": _ln(state, "layernorm"),
    }
    return jax.tree.map(lambda x: np.array(x, dtype=dtype), params)


def convert_siglip_vision(model_dir: str, dtype=np.float32) -> dict:
    """HF SiglipVisionModel (or SiglipModel vision tower) → siglip layout."""
    state = _load_torch_state(model_dir)
    pre = "vision_model" if any(k.startswith("vision_model.") for k in state) else None

    def key(suffix):
        return f"{pre}.{suffix}" if pre else suffix

    def block(i):
        p = key(f"encoder.layers.{i}")
        return {
            "ln1": _ln(state, f"{p}.layer_norm1"),
            "attn": {
                "q": _dense(state, f"{p}.self_attn.q_proj"),
                "k": _dense(state, f"{p}.self_attn.k_proj"),
                "v": _dense(state, f"{p}.self_attn.v_proj"),
                "o": _dense(state, f"{p}.self_attn.out_proj"),
            },
            "ln2": _ln(state, f"{p}.layer_norm2"),
            "mlp_in": _dense(state, f"{p}.mlp.fc1"),
            "mlp_out": _dense(state, f"{p}.mlp.fc2"),
        }

    n_layers = 0
    while key(f"encoder.layers.{n_layers}.layer_norm1.weight") in state:
        n_layers += 1

    conv = state[key("embeddings.patch_embedding.weight")]
    o, c, kh, kw = conv.shape
    import jax

    params = {
        "patch_embed": {
            "w": np.ascontiguousarray(conv.reshape(o, c * kh * kw).T),
            "b": state[key("embeddings.patch_embedding.bias")],
        },
        "pos_embed": {"table": state[key("embeddings.position_embedding.weight")]},
        "blocks": [block(i) for i in range(n_layers)],
        "post_ln": _ln(state, key("post_layernorm")),
    }
    return jax.tree.map(lambda x: np.array(x, dtype=dtype), params)


def convert_hubert(model_dir: str, dtype=np.float32) -> dict:
    """HF HubertModel (large, stable-LN) → hubert layout."""
    state = _load_torch_state(model_dir)

    convs = []
    i = 0
    while f"feature_extractor.conv_layers.{i}.conv.weight" in state:
        p = f"feature_extractor.conv_layers.{i}"
        conv = {
            "w": state[f"{p}.conv.weight"],  # [out, in, k] — matches our layout
            "b": state.get(f"{p}.conv.bias", np.zeros(state[f"{p}.conv.weight"].shape[0])),
            "ln": _ln(state, f"{p}.layer_norm"),
        }
        convs.append(conv)
        i += 1

    def layer(i):
        p = f"encoder.layers.{i}"
        return {
            "attn_ln": _ln(state, f"{p}.layer_norm"),
            "attn": {
                "q": _dense(state, f"{p}.attention.q_proj"),
                "k": _dense(state, f"{p}.attention.k_proj"),
                "v": _dense(state, f"{p}.attention.v_proj"),
                "o": _dense(state, f"{p}.attention.out_proj"),
            },
            "ffn_ln": _ln(state, f"{p}.final_layer_norm"),
            "ffn_in": _dense(state, f"{p}.feed_forward.intermediate_dense"),
            "ffn_out": _dense(state, f"{p}.feed_forward.output_dense"),
        }

    n_layers = 0
    while f"encoder.layers.{n_layers}.layer_norm.weight" in state:
        n_layers += 1

    # weight-normed positional conv: materialize w = g * v / ||v||.
    # Key names vary with torch version: weight_g/weight_v (legacy),
    # parametrizations.weight.original0/original1 (torch>=2.1), or plain
    # weight if the norm was removed.
    base = "encoder.pos_conv_embed.conv"
    if f"{base}.weight_g" in state:
        g, v = state[f"{base}.weight_g"], state[f"{base}.weight_v"]
    elif f"{base}.parametrizations.weight.original0" in state:
        g = state[f"{base}.parametrizations.weight.original0"]
        v = state[f"{base}.parametrizations.weight.original1"]
    else:
        g, v = None, state[f"{base}.weight"]
    if g is not None:
        norm = np.linalg.norm(v, axis=(0, 1), keepdims=True)
        pos_w = g * v / np.maximum(norm, 1e-12)
    else:
        pos_w = v

    import jax

    params = {
        "convs": convs,
        "feat_proj_ln": _ln(state, "feature_projection.layer_norm"),
        "feat_proj": _dense(state, "feature_projection.projection"),
        "pos_conv": {"w": pos_w, "b": state[f"{base}.bias"]},
        "layers": [layer(i) for i in range(n_layers)],
        "final_ln": _ln(state, "encoder.layer_norm"),
    }
    return jax.tree.map(lambda x: np.array(x, dtype=dtype), params)


# ---------------------------------------------------------------------------
# Assembled reference-model conversion (oracle parity)


def convert_reference_affectgpt(state: Dict[str, "np.ndarray"], dtype=np.float32) -> dict:
    """Convert a full reference `AffectGPT.state_dict()` (torch tensors or
    numpy arrays; reference my_affectgpt/models/affectgpt.py:39-357) into
    this framework's {"frozen": {"llm": ...}, "trainable": {...}} pytrees.

    Key layout handled (peft-wrapped Qwen2/Llama base):
    - `llama_model.base_model.model.model.*`   → frozen llm decoder
    - `llama_model.base_model.model.lm_head.*` → frozen llm lm_head
    - `...<proj>.lora_A/lora_B.default.weight` → trainable lora (a = Aᵀ, b = Bᵀ)
    - `video_attention_mlp` + `affectgpt_proj` → the SHARED video merger
      (serving both frame and face streams, like the reference —
      affectgpt.py:929-932; affectgpt.MERGER_GROUP routes both to it)
    - `audio_attention_mlp` + `audio_llama_proj` → audio merger
    - `image_llama_proj` / `au_llama_proj` → image / au mergers (mean fusion)
    - `multi_video_embs`/`multi_audio_embs`/`attention_mlp`/`fc_att`/
      `multi_llama_proj` → multi pre-fusion (attention variant,
      affectgpt.py:883-908)

    Q-Former fusion variants map through ref_qformer (the BLIP2
    BertLMHeadModel query path) for every group incl. the multi
    pre-fusion; parity for both fusion families is asserted end to end by
    tests/test_reference_oracle.py."""
    import torch

    state = {
        k: (v.detach().cpu().float().numpy() if isinstance(v, torch.Tensor) else np.asarray(v))
        for k, v in state.items()
    }

    llm_prefix = "llama_model.base_model.model.model"
    head_prefix = "llama_model.base_model.model"

    def base_dense(prefix):
        key = f"{prefix}.base_layer.weight"
        if key not in state:  # non-LoRA module (plain Linear)
            key = f"{prefix}.weight"
            bkey = f"{prefix}.bias"
        else:
            bkey = f"{prefix}.base_layer.bias"
        out = {"w": np.ascontiguousarray(state[key].T)}
        if bkey in state:
            out["b"] = state[bkey]
        return out

    def lora_leaf(prefix):
        a = state[f"{prefix}.lora_A.default.weight"]  # [r, in]
        b = state[f"{prefix}.lora_B.default.weight"]  # [out, r]
        return {"a": np.ascontiguousarray(a.T), "b": np.ascontiguousarray(b.T)}

    layers, lora_layers = [], []
    i = 0
    while f"{llm_prefix}.layers.{i}.self_attn.q_proj.base_layer.weight" in state:
        p = f"{llm_prefix}.layers.{i}"
        layers.append({
            "q_proj": base_dense(f"{p}.self_attn.q_proj"),
            "k_proj": base_dense(f"{p}.self_attn.k_proj"),
            "v_proj": base_dense(f"{p}.self_attn.v_proj"),
            "o_proj": base_dense(f"{p}.self_attn.o_proj"),
            "gate_proj": base_dense(f"{p}.mlp.gate_proj"),
            "up_proj": base_dense(f"{p}.mlp.up_proj"),
            "down_proj": base_dense(f"{p}.mlp.down_proj"),
            "input_ln": {"scale": state[f"{p}.input_layernorm.weight"]},
            "post_attn_ln": {"scale": state[f"{p}.post_attention_layernorm.weight"]},
        })
        lora_layers.append({
            name: lora_leaf(f"{p}.{mod}.{name}")
            for name, mod in (
                ("q_proj", "self_attn"), ("k_proj", "self_attn"),
                ("v_proj", "self_attn"), ("o_proj", "self_attn"),
                ("gate_proj", "mlp"), ("up_proj", "mlp"), ("down_proj", "mlp"),
            )
        })
        i += 1

    llm = {
        "embed_tokens": {"table": state[f"{llm_prefix}.embed_tokens.weight"]},
        "layers": layers,
        "final_ln": {"scale": state[f"{llm_prefix}.norm.weight"]},
    }
    if f"{head_prefix}.lm_head.weight" in state:
        llm["lm_head"] = {"w": np.ascontiguousarray(state[f"{head_prefix}.lm_head.weight"].T)}

    def plain_dense(name):
        out = {"w": np.ascontiguousarray(state[f"{name}.weight"].T)}
        if f"{name}.bias" in state:
            out["b"] = state[f"{name}.bias"]
        return out

    def ref_qformer(prefix, query_key):
        """Reference temporal Q-Former (Qformer.py BertLMHeadModel, query
        path only: affectgpt.py:24-37 deletes cls/word/pos embeddings) →
        qformer.init_params structure. Query-path FFN weights are the
        `intermediate_query`/`output_query` modules (Qformer.py:482-485);
        the text-path `intermediate`/`output` twins are never used here."""
        def ln(p):
            return {"scale": state[f"{p}.weight"], "bias": state[f"{p}.bias"]}

        qlayers = []
        j = 0
        while f"{prefix}.bert.encoder.layer.{j}.attention.self.query.weight" in state:
            p = f"{prefix}.bert.encoder.layer.{j}"
            qlayer = {
                "self_attn": {
                    "q": plain_dense(f"{p}.attention.self.query"),
                    "k": plain_dense(f"{p}.attention.self.key"),
                    "v": plain_dense(f"{p}.attention.self.value"),
                    "o": plain_dense(f"{p}.attention.output.dense"),
                },
                "self_ln": ln(f"{p}.attention.output.LayerNorm"),
                "ffn_in": plain_dense(f"{p}.intermediate_query.dense"),
                "ffn_out": plain_dense(f"{p}.output_query.dense"),
                "ffn_ln": ln(f"{p}.output_query.LayerNorm"),
            }
            if f"{p}.crossattention.self.query.weight" in state:
                qlayer["cross_attn"] = {
                    "q": plain_dense(f"{p}.crossattention.self.query"),
                    "k": plain_dense(f"{p}.crossattention.self.key"),
                    "v": plain_dense(f"{p}.crossattention.self.value"),
                    "o": plain_dense(f"{p}.crossattention.output.dense"),
                }
                qlayer["cross_ln"] = ln(f"{p}.crossattention.output.LayerNorm")
            qlayers.append(qlayer)
            j += 1
        return {
            "query_tokens": state[query_key],
            "embed_ln": ln(f"{prefix}.bert.embeddings.LayerNorm"),
            "layers": qlayers,
        }

    def merger_for(qformer_prefix, query_key, pos_key, attn_mlp_name, proj_name):
        if f"{qformer_prefix}.bert.embeddings.LayerNorm.weight" in state:
            return {
                "pos_embed": {"table": state[pos_key]},
                "qformer": ref_qformer(qformer_prefix, query_key),
                "proj": plain_dense(proj_name),
            }
        out = {"proj": plain_dense(proj_name)}
        if f"{attn_mlp_name}.weight" in state:
            out["attn_mlp"] = plain_dense(attn_mlp_name)
        return out

    video_merger = merger_for(
        "video_Qformer", "video_query_tokens",
        "video_frame_position_embedding.weight",
        "video_attention_mlp", "affectgpt_proj",
    )
    audio_merger = merger_for(
        "audio_Qformer", "audio_query_tokens",
        "audio_position_embedding.weight",
        "audio_attention_mlp", "audio_llama_proj",
    )
    au_merger = merger_for(
        "au_Qformer", "au_query_tokens", "au_position_embedding.weight",
        "au_attention_mlp", "au_llama_proj",
    )
    mergers = {
        # ONE video merger shared by the frame and face streams, exactly the
        # reference's parameter set (affectgpt.py:929-932) — see
        # affectgpt.MERGER_GROUP
        "video": video_merger,
        "audio": audio_merger,
        "image": {"proj": plain_dense("image_llama_proj")},
        "au": au_merger,
    }

    trainable = {"mergers": mergers, "lora": {"layers": lora_layers}}
    if "multi_llama_proj.weight" in state:
        multi = {
            "video_embs": plain_dense("multi_video_embs"),
            "audio_embs": plain_dense("multi_audio_embs"),
            "proj": plain_dense("multi_llama_proj"),
        }
        if "multi_Qformer.bert.embeddings.LayerNorm.weight" in state:
            # qformer pre-fusion (affectgpt.py:848-881): projected streams
            # concat along time + position embedding + multi Q-Former
            multi["pos_embed"] = {"table": state["multi_position_embedding.weight"]}
            multi["qformer"] = ref_qformer("multi_Qformer", "multi_query_tokens")
        elif "attention_mlp.weight" in state:
            multi["attn_mlp"] = plain_dense("attention_mlp")
            multi["fc_att"] = plain_dense("fc_att")
        trainable["multi"] = multi

    import jax

    tree = {"frozen": {"llm": llm}, "trainable": trainable}
    return jax.tree.map(lambda x: np.array(x, dtype=dtype), tree)
