"""Chat: single- and batched-clip inference over the full model.

Capability-parity with the reference `Chat` (reference:
my_affectgpt/conversation/conversation_video.py:111-388: per-modality
postprocess_* wrappers + answer_sample generate). TPU redesign: one
compiled clip→tokens program covering encode (when raw media is given) →
mergers → splice → prefill → decode, batched over clips (the reference
generates strictly batch-1).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from affectgpt_tpu import constants, prompts
from affectgpt_tpu.inference import generate as gen
from affectgpt_tpu.models import affectgpt, clip_vit, hubert, splice
from affectgpt_tpu.ops import image as image_ops


def encode_media_features(
    frozen: dict,
    cfg: Optional[affectgpt.AffectGPTConfig],
    raw: Dict[str, jnp.ndarray],
    vision_cfg: Optional[clip_vit.ClipVisionConfig] = None,
    audio_cfg: Optional[hubert.HubertConfig] = None,
) -> Dict[str, jnp.ndarray]:
    """Raw device media → per-modality [b, t, d] features using the frozen
    encoders resolved from the registry zoo (the realtime path; reference
    encoder.py forward wrappers). raw: frame/face [b, T, H, W, 3] uint8,
    audio [b, clips, 1, samples] (mel clips for IMAGEBIND)."""
    from affectgpt_tpu.models import encoders as zoo

    vis_name = cfg.visual_encoder_name if cfg is not None else "CLIP_VIT_LARGE"
    aud_name = cfg.acoustic_encoder_name if cfg is not None else "HUBERT_LARGE"
    vis_spec = zoo.get_visual_encoder(vis_name)
    aud_spec = zoo.get_acoustic_encoder(aud_name)
    vcfg = vision_cfg or getattr(cfg, "vision_cfg_override", None) or vis_spec.make_config()
    acfg = audio_cfg or getattr(cfg, "audio_cfg_override", None) or aud_spec.make_config()

    feats: Dict[str, jnp.ndarray] = {}
    for m in ("frame", "face", "image"):
        if m in raw:
            frames = raw[m]
            b, t = frames.shape[:2]
            flat = frames.reshape(b * t, *frames.shape[2:])
            out_size = getattr(vcfg, "image_size", 224)
            # the encoder's OWN processor stats (spec.normalize: CLIP vs
            # ImageNet vs SigLIP — reference runs each tower's HF
            # AutoImageProcessor); preprocess maps [T,H,W,C]→[C,T,S,S],
            # transpose back to channels-last for the encoder batch
            prepped = jnp.transpose(
                image_ops.preprocess_frames_eval(
                    flat, out_size=out_size, normalize=vis_spec.normalize
                ),
                (1, 2, 3, 0),
            )
            prepped = prepped.reshape(b, t, *prepped.shape[1:])
            feats[m] = vis_spec.encode(frozen["visual_encoder"], vcfg, prepped)
    if "audio" in raw:
        feats["audio"] = aud_spec.encode(frozen["acoustic_encoder"], acfg, raw["audio"])
    return feats


@dataclass
class Chat:
    frozen: dict
    trainable: dict
    cfg: affectgpt.AffectGPTConfig
    tokenizer: "object"
    max_len: int = 2048
    # "int8" → quantized KV cache (qwen2.init_cache): halves decode-phase
    # cache reads / doubles max_len capacity per HBM byte. None = bf16.
    kv_cache_dtype: Optional[str] = None
    # tp>1 serving mesh the frozen/trainable trees were sharded over
    # (informational for engines built from this Chat; the compiled
    # answer path itself picks the sharding up from the arg trees)
    mesh: Optional[object] = None
    # >0 enables prompt-lookup speculative decoding for GREEDY requests
    # (gen.generate_speculative — exact same tokens, fewer weight sweeps
    # per token on decode-heavy reasoning outputs). Sampled requests
    # always take the standard path.
    speculative_draft_len: int = 0
    # seeds the per-instance sampling stream used when answer_batch is
    # called without an explicit rng — each call splits a fresh key, so
    # repeated sampled calls differ (like the reference's torch global
    # RNG) instead of silently reusing one fixed key
    seed: int = 0

    def __post_init__(self):
        if self.kv_cache_dtype not in (None, "int8"):
            raise ValueError(
                f"kv_cache_dtype must be None or 'int8', got {self.kv_cache_dtype!r}"
            )
        self._rng = jax.random.PRNGKey(self.seed)
        # single-token turn terminators (the reference stops generation at
        # '###', conversation_video.py StoppingCriteria): included only
        # when the active tokenizer encodes the string as ONE token —
        # multi-token encodings are cut host-side by trim_output_text
        self._stop_ids = tuple(
            enc[0] for s in ("###",)
            for enc in [self.tokenizer.encode(s)] if len(enc) == 1
        )
        if self.mesh is not None:
            # sharded trees serve through plain jit (GSPMD): the fused
            # decode Pallas kernels have no partitioning rule and would
            # force operand replication — gate them off for this process
            from affectgpt_tpu.models import qwen2 as _q

            _q.mark_tp_serving()

    def build_prompt_batch(
        self,
        face_or_frame: str,
        subtitles: List[Optional[str]],
        user_message: str,
        nonverbal_texts: Optional[List[Optional[str]]] = None,
    ):
        """Tokenize prompts (bos + prompt, reference answer_sample prepends
        bos) and compute patch offsets; returns right-padded ids [b, t],
        lengths [b], offsets {m: [b]}."""
        texts = []
        for i, subtitle in enumerate(subtitles):
            nv = nonverbal_texts[i] if nonverbal_texts else None
            p = prompts.get_prompt_for_multimodal(face_or_frame, subtitle, user_message, nv)
            p = prompts.replace_token_for_multimodal(
                p, self.cfg.num_video_query_token, self.cfg.num_audio_query_token,
                self.cfg.num_multi_query_token, self.cfg.num_image_query_token,
            )
            texts.append(p)
        from affectgpt_tpu.tokenization import encode_batch

        ids, lengths = encode_batch(self.tokenizer, texts)

        query_counts = {
            "frame": self.cfg.num_video_query_token,
            "face": self.cfg.num_video_query_token,
            "audio": self.cfg.num_audio_query_token,
            "multi": self.cfg.num_multi_query_token,
            "image": self.cfg.num_image_query_token,
        }
        token_names = {
            "frame": constants.DEFAULT_FRAME_PATCH_TOKEN,
            "face": constants.DEFAULT_FACE_PATCH_TOKEN,
            "audio": constants.DEFAULT_AUDIO_PATCH_TOKEN,
            "multi": constants.DEFAULT_MULTI_PATCH_TOKEN,
            "image": constants.DEFAULT_IMAGE_PATCH_TOKEN,
        }
        offsets = {}
        for m, name in token_names.items():
            tok_id = self.tokenizer.patch_token_ids[name]
            offs = np.array(
                [splice.find_patch_run(row, tok_id, query_counts[m]) for row in ids],
                dtype=np.int32,
            )
            if np.any(offs >= 0):
                offsets[m] = offs
                ids[ids == tok_id] = 0
        return ids, lengths, offsets

    def answer_batch(
        self,
        face_or_frame: str,
        subtitles: List[Optional[str]],
        user_message: str,
        features: Dict[str, jnp.ndarray],
        rng: Optional[jax.Array] = None,
        max_new_tokens: int = 300,
        do_sample: bool = True,
        top_p: float = 0.9,
        temperature: float = 1.0,
        repetition_penalty: float = 1.0,
        nonverbal_texts: Optional[List[Optional[str]]] = None,
    ) -> List[str]:
        """Batched clip→text: the reference answer_sample semantics
        (sampling, top-p 0.9, temperature/repetition_penalty kwargs with
        1.0 defaults, '###'/eos stop, conversation_video.py:303-388)
        over a whole batch at once. With repetition_penalty != 1.0 only
        GENERATED tokens are penalized (spliced multimodal prompts carry
        patch placeholders, so prompt ids are not HF-meaningful here; the
        reference never sets the penalty on this path)."""
        ids, lengths, offsets = self.build_prompt_batch(
            face_or_frame, subtitles, user_message, nonverbal_texts
        )
        gcfg = gen.GenerateConfig(
            max_new_tokens=max_new_tokens,
            do_sample=do_sample,
            top_p=top_p,
            temperature=temperature,
            repetition_penalty=repetition_penalty,
            eos_token_id=self.tokenizer.eos_token_id,
            stop_token_ids=self._stop_ids,
        )
        if rng is None:
            # advance the instance stream so repeated sampled calls differ
            self._rng, rng = jax.random.split(self._rng)
        max_len = self.max_len
        cache_dtype = jnp.int8 if self.kv_cache_dtype == "int8" else None
        # the speculative path is greedy-only and has no penalty support —
        # penalized requests take the plain compiled decode
        if self.speculative_draft_len > 0 and not do_sample and repetition_penalty == 1.0:
            tokens, num_valid = _answer_spec_jit(
                self.frozen, self.trainable, self.cfg, gcfg,
                jnp.asarray(ids), {m: jnp.asarray(v) for m, v in offsets.items()},
                features, jnp.asarray(lengths),
                max_len + self.speculative_draft_len,  # verify-write headroom
                self.speculative_draft_len, cache_dtype,
            )
        else:
            tokens, num_valid = _answer_jit(
                self.frozen, self.trainable, self.cfg, gcfg,
                jnp.asarray(ids), {m: jnp.asarray(v) for m, v in offsets.items()},
                features, jnp.asarray(lengths), rng, max_len,
                cache_dtype,
            )
        tokens = np.asarray(tokens)
        num_valid = np.asarray(num_valid)
        outputs = []
        for row, nv in zip(tokens, num_valid):
            text = self.tokenizer.decode(row[: int(nv)], skip_special_tokens=True)
            outputs.append(gen.trim_output_text(text))
        return outputs


@partial(jax.jit, static_argnames=("cfg", "gcfg", "max_len", "cache_dtype"))
def _answer_jit(frozen, trainable, cfg, gcfg, input_ids, offsets, features, lengths, rng, max_len,
                cache_dtype=None):
    embeds = affectgpt.build_inputs_embeds(frozen, trainable, cfg, input_ids, features, offsets)
    return gen.generate(
        frozen["llm"], cfg.llm, gcfg, embeds, lengths, rng,
        max_len=max_len, lora=trainable["lora"], cache_dtype=cache_dtype,
    )


@partial(jax.jit, static_argnames=("cfg", "gcfg", "max_len", "draft_len", "cache_dtype"))
def _answer_spec_jit(frozen, trainable, cfg, gcfg, input_ids, offsets, features, lengths,
                     max_len, draft_len, cache_dtype=None):
    embeds = affectgpt.build_inputs_embeds(frozen, trainable, cfg, input_ids, features, offsets)
    return gen.generate_speculative(
        frozen["llm"], cfg.llm, gcfg, embeds, lengths, input_ids,
        max_len=max_len, lora=trainable["lora"], draft_len=draft_len,
        cache_dtype=cache_dtype,
    )
