"""AffectGPT: the full multimodal emotion-recognition model, TPU-native.

Capability-equivalent to the reference `AffectGPT` module (reference:
my_affectgpt/models/affectgpt.py:17-1122): frozen per-modality encoders →
temporal mergers → optional audio-video pre-fusion → LLM-space projection
→ static splice into the token-embedding sequence → Qwen2.5 decoder with
LoRA → causal-LM loss.

Architecture differences that are deliberate TPU-first redesigns:
- One forward graph, traced once: fusion variants / modality sets are
  selected at trace time from the typed AffectGPTConfig, not by runtime
  dict probing. Absent modalities are handled by offset == -1 (splice is
  a no-op for that row), keeping shapes static across the whole dataset.
- Realtime vs preextracted is a *data* question, not a model question:
  both paths produce [b, t, d] feature tensors before the merger, so the
  fusion math is shared by construction (the reference duplicates it,
  affectgpt.py:420-610).
- Params are split into `frozen` (LLM base + encoders) and `trainable`
  (LoRA + mergers + projections + fusion) pytrees so the optimizer, the
  donation logic and checkpointing (trainable-only state, reference
  runner_base.py:600-630) fall out naturally.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from affectgpt_tpu.models import clip_vit, hubert, mergers, qwen2, splice


@dataclass(frozen=True)
class AffectGPTConfig:
    llm: qwen2.QwenConfig = field(default_factory=qwen2.QwenConfig.qwen25_7b)
    # merger fusion types (reference train cfg fusion knobs)
    video_fusion_type: str = "attention"
    audio_fusion_type: str = "attention"
    multi_fusion_type: str = "attention"
    au_fusion_type: str = "mean"
    image_fusion_type: str = "mean"
    # query token counts
    num_video_query_token: int = 8
    num_audio_query_token: int = 8
    num_multi_query_token: int = 1
    num_image_query_token: int = 8
    num_au_query_token: int = 8
    # feature dims ([b,t,d] entering the mergers)
    visual_dim: int = 768  # CLIP ViT-L/14 projection (encoder.py:193)
    acoustic_dim: int = 1024  # chinese-hubert-large hidden (encoder.py:412)
    au_dim: int = 512  # CLIP ViT-B/32 text projection (affectgpt.py:273)
    # position-embedding slots (affectgpt.py:159,223,283,318)
    video_max_time: int = 32
    audio_max_time: int = 8
    au_max_time: int = 32
    multi_max_time: int = 264
    # which modalities this config can feed (from face_or_frame mode)
    use_multi: bool = True
    # registry names of the frozen media encoders (reference YAML keys
    # visual_encoder / acoustic_encoder)
    visual_encoder_name: str = "CLIP_VIT_LARGE"
    acoustic_encoder_name: str = "HUBERT_LARGE"
    # geometry overrides for the encoder towers (tiny smoke mode); None =
    # the registry spec's production geometry
    vision_cfg_override: Optional[clip_vit.ClipVisionConfig] = None
    audio_cfg_override: Optional[hubert.HubertConfig] = None

    @classmethod
    def from_model_cfg(cls, node: dict) -> "AffectGPTConfig":
        """Build from the YAML `model:` section (same knob names as the
        reference train configs: fusion types, query-token counts,
        llama_model_name, lora_r, preextracted dims)."""
        node = dict(node or {})
        llm_name = node.get(
            "llama_model", node.get("llama_model_name", node.get("llm_name", "Qwen25"))
        )
        presets = {
            "Qwen25": qwen2.QwenConfig.qwen25_7b,
            # real Qwen2.5-3B ties its embeddings (HF config
            # tie_word_embeddings=true) — without this the preset would
            # mis-load a real 3B checkpoint (no lm_head tensor exists)
            "Qwen25_3B": lambda **kw: qwen2.QwenConfig(
                vocab_size=151936, hidden_size=2048, intermediate_size=11008,
                num_layers=36, num_heads=16, num_kv_heads=2, head_dim=128,
                tie_embeddings=True, **kw,
            ),
            "Llama2": qwen2.QwenConfig.llama2_7b,
            "Baichuan2": qwen2.QwenConfig.baichuan2_7b,
            "tiny": qwen2.QwenConfig.tiny,
        }
        llm_kwargs = {}
        if "lora_r" in node:
            llm_kwargs["lora_r"] = int(node["lora_r"])
        llm = presets.get(llm_name, qwen2.QwenConfig.qwen25_7b)(**llm_kwargs)
        if "lora_dropout" in node:  # reference peft default 0.05; 0 disables
            import dataclasses as _dc

            llm = _dc.replace(llm, lora_dropout=float(node["lora_dropout"]))
        return cls(
            llm=llm,
            video_fusion_type=node.get("video_fusion_type", "attention"),
            audio_fusion_type=node.get("audio_fusion_type", "attention"),
            multi_fusion_type=node.get("multi_fusion_type", "attention"),
            au_fusion_type=node.get("au_fusion_type", "mean"),
            image_fusion_type=node.get("image_fusion_type", "mean"),
            num_video_query_token=int(node.get("num_video_query_token", 8)),
            num_audio_query_token=int(node.get("num_audio_query_token", 8)),
            num_multi_query_token=int(node.get("num_multi_query_token", 1)),
            num_image_query_token=int(node.get("num_image_query_token", 8)),
            num_au_query_token=int(node.get("num_au_query_token", 8)),
            visual_dim=int(node.get("preextracted_visual_dim", 768)),
            acoustic_dim=int(node.get("preextracted_acoustic_dim", 1024)),
            au_dim=int(node.get("preextracted_au_dim", 512)),
            visual_encoder_name=node.get(
                "visual_encoder", node.get("visual_encoder_name", "CLIP_VIT_LARGE")
            ),
            acoustic_encoder_name=node.get(
                "acoustic_encoder", node.get("acoustic_encoder_name", "HUBERT_LARGE")
            ),
        )

    @classmethod
    def tiny(cls):
        return cls(
            llm=qwen2.QwenConfig.tiny(),
            num_video_query_token=2, num_audio_query_token=2,
            num_multi_query_token=1, num_image_query_token=2, num_au_query_token=2,
            visual_dim=12, acoustic_dim=16, au_dim=8,
        )

    def merger_config(self, modality: str) -> mergers.MergerConfig:
        llm_dim = self.llm.hidden_size
        if modality in ("frame", "face"):
            return mergers.MergerConfig(self.video_fusion_type, self.visual_dim,
                                        llm_dim, self.num_video_query_token, self.video_max_time)
        if modality == "audio":
            return mergers.MergerConfig(self.audio_fusion_type, self.acoustic_dim,
                                        llm_dim, self.num_audio_query_token, self.audio_max_time)
        if modality == "au":
            return mergers.MergerConfig(self.au_fusion_type, self.au_dim,
                                        llm_dim, self.num_au_query_token, self.au_max_time)
        if modality == "image":
            return mergers.MergerConfig(self.image_fusion_type, self.visual_dim,
                                        llm_dim, self.num_image_query_token, self.video_max_time)
        raise ValueError(modality)

    def multi_config(self) -> mergers.MultiFusionConfig:
        return mergers.MultiFusionConfig(
            self.multi_fusion_type, self.visual_dim, self.acoustic_dim,
            self.llm.hidden_size, self.num_multi_query_token, self.multi_max_time,
        )

    def num_query_tokens(self, modality: str) -> int:
        return {
            "frame": self.num_video_query_token,
            "face": self.num_video_query_token,
            "audio": self.num_audio_query_token,
            "multi": self.num_multi_query_token,
            "image": self.num_image_query_token,
            "au": self.num_au_query_token,
        }[modality]


MODALITIES = ("frame", "face", "audio", "image", "au")

# modality → merger parameter group: frame and face streams run through ONE
# shared video merger, exactly like the reference (affectgpt.py:929-932 uses
# the same video_attention_mlp/affectgpt_proj for both) — training must
# accumulate both streams' gradients into the same weights
# (tests/test_reference_oracle.py::test_gradient_parity).
MERGER_GROUP = {
    "frame": "video", "face": "video",
    "audio": "audio", "image": "image", "au": "au",
}
_GROUPS = ("video", "audio", "image", "au")
# a representative modality per group for merger_config()
_GROUP_CFG_MODALITY = {
    "video": "frame", "audio": "audio", "image": "image", "au": "au",
}
# NOTE on the "au" group: AU features are a vestigial channel in the
# reference — encode_au_merge runs when samples carry 'aus' but its output
# is never spliced into the LLM input (no AU patch token in the splice
# list, reference affectgpt.py:969-1009) — and the same holds here (no
# 'au' offsets are ever produced). When the au merger is trainable but
# loss-unreachable, torch AdamW leaves its params untouched (None grads
# are skipped) while optax.adamw applies decoupled weight decay to
# zero-grad leaves; the drift is confined to parameters that can never
# influence outputs.


def init_trainable(rng: jax.Array, cfg: AffectGPTConfig, dtype=jnp.float32) -> dict:
    """LoRA + mergers + projections — everything the optimizer touches
    (the reference's requires_grad=True set)."""
    keys = jax.random.split(rng, len(_GROUPS) + 2)
    params: dict = {
        "mergers": {
            g: mergers.init_merger(
                keys[i], cfg.merger_config(_GROUP_CFG_MODALITY[g]), dtype=dtype
            )
            for i, g in enumerate(_GROUPS)
        },
        "lora": qwen2.init_lora(keys[-2], cfg.llm, dtype=dtype),
    }
    if cfg.use_multi:
        params["multi"] = mergers.init_multi_fusion(keys[-1], cfg.multi_config(), dtype=dtype)
    return params


def init_frozen(rng: jax.Array, cfg: AffectGPTConfig, dtype=jnp.bfloat16,
                with_encoders: bool = False,
                vision_cfg: Optional[clip_vit.ClipVisionConfig] = None,
                audio_cfg: Optional[hubert.HubertConfig] = None) -> dict:
    """Frozen base params: the LLM, and (optionally) the media encoders.
    with_encoders=False is the `skip_encoders` preextracted mode
    (reference affectgpt.py:139-148)."""
    keys = jax.random.split(rng, 3)
    params = {"llm": qwen2.init_params(keys[0], cfg.llm, dtype=dtype)}
    if with_encoders:
        params["visual_encoder"] = clip_vit.init_vision_params(
            keys[1], vision_cfg or clip_vit.ClipVisionConfig.vit_l_14(), dtype=dtype)
        params["acoustic_encoder"] = hubert.init_params(
            keys[2], audio_cfg or hubert.HubertConfig.large(), dtype=dtype)
    return params


def encode_modalities(
    trainable: dict,
    cfg: AffectGPTConfig,
    features: Dict[str, jnp.ndarray],
    dropout_rng=None,
) -> Dict[str, jnp.ndarray]:
    """Per-modality [b, t, d] features → LLM-space token blocks
    [b, q_m, llm_dim], plus the pre-fusion 'multi' block when configured.

    `features` may contain: frame, face, audio, image, au — each already
    encoded (by the frozen encoders on device, or loaded from a
    preextracted cache). Pre-fusion consumes face (preferred) or frame
    hiddens + audio hiddens, mirroring the reference's multiface/multiframe
    dispatch (affectgpt.py:520-535).
    """
    blocks: Dict[str, jnp.ndarray] = {}
    for mi, m in enumerate(MODALITIES):
        if m in features:
            blocks[m] = mergers.apply_merger(
                trainable["mergers"][MERGER_GROUP[m]], cfg.merger_config(m),
                features[m],
                dropout_rng=(
                    jax.random.fold_in(dropout_rng, mi)
                    if dropout_rng is not None else None
                ),
            )
    if cfg.use_multi and "multi" in trainable and "audio" in features:
        video_hidden = features.get("face", features.get("frame"))
        if video_hidden is not None:
            blocks["multi"] = mergers.apply_multi_fusion(
                trainable["multi"], cfg.multi_config(), video_hidden, features["audio"],
                dropout_rng=(
                    jax.random.fold_in(dropout_rng, len(MODALITIES))
                    if dropout_rng is not None else None
                ),
            )
    return blocks


def build_inputs_embeds(
    frozen: dict,
    trainable: dict,
    cfg: AffectGPTConfig,
    input_ids: jnp.ndarray,
    features: Dict[str, jnp.ndarray],
    offsets: Dict[str, jnp.ndarray],
    dropout_rng=None,
) -> jnp.ndarray:
    """Token ids + modality features → spliced embedding sequence.

    input_ids [b, t] with patch tokens already zeroed out host-side
    (the collator replaces patch ids with 0 before upload, reference
    affectgpt.py:538-546); offsets[m] [b] int32 start positions (-1 =
    absent)."""
    embeds = qwen2.embed_tokens(frozen["llm"], input_ids)
    blocks = encode_modalities(trainable, cfg, features, dropout_rng=dropout_rng)
    for m, block in blocks.items():
        if m in offsets:
            embeds = splice.splice_embeddings(embeds, block, offsets[m])
    return embeds


def forward_loss(
    frozen: dict,
    trainable: dict,
    cfg: AffectGPTConfig,
    batch: Dict[str, jnp.ndarray],
    remat: bool = False,
    dropout_rng=None,
) -> jnp.ndarray:
    """One training forward: returns scalar causal-LM loss (the reference
    forward's {"loss"} contract, affectgpt.py:924-1028).

    batch:
      input_ids [b, t] (patch ids zeroed), attention_mask [b, t],
      labels [b, t] (-100 outside target), features {m: [b, tm, dm]},
      offsets {m: [b] int32}.
    dropout_rng: train-mode key — activates the reference's LoRA dropout
    (cfg.llm.lora_dropout, peft 0.05) and the merger Q-Formers' BERT
    dropouts (0.1). None = eval-mode identity (what every parity oracle
    compares against).
    """
    merger_rng = llm_rng = None
    if dropout_rng is not None:
        merger_rng = jax.random.fold_in(dropout_rng, 1)
        llm_rng = jax.random.fold_in(dropout_rng, 2)
    embeds = build_inputs_embeds(
        frozen, trainable, cfg, batch["input_ids"], batch["features"], batch["offsets"],
        dropout_rng=merger_rng,
    )
    llm = frozen["llm"]
    if cfg.llm.tie_embeddings or "w" in llm["lm_head"]:
        # fused lm_head+CE: stream vocab chunks, never materialize the
        # [b, t, vocab] fp32 logits (the train-step OOM at batch ≥ 16)
        hidden, _ = qwen2.forward(
            llm, cfg.llm, embeds, batch["attention_mask"],
            lora=trainable["lora"], remat=remat, return_hidden=True,
            dropout_rng=llm_rng,
        )
        return qwen2.fused_cross_entropy_loss(
            hidden, llm, cfg.llm, batch["labels"]
        )
    logits, _ = qwen2.forward(
        llm, cfg.llm, embeds, batch["attention_mask"],
        lora=trainable["lora"], remat=remat, dropout_rng=llm_rng,
    )
    return qwen2.cross_entropy_loss(logits, batch["labels"])
