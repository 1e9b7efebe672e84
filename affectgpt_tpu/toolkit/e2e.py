"""End-to-end raw-media fusion model (toolkit e2e baseline).

Capability-parity with the reference's e2e model (reference:
toolkit/models/e2e_model.py: fine-tune pretrained audio/visual encoders
directly on raw media with a fusion head, instead of frozen-feature
fusion). Here the towers are this framework's encoder modules
(CLIP-style ViT + HuBERT-style wav encoder) with *trainable* params,
topped by the MERBench attention-fusion head. Geometry is configurable
so the same model runs tiny (tests) or production-size.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp

from affectgpt_tpu.models import clip_vit, hubert, nn
from affectgpt_tpu.toolkit.models import FusionArgs, _drop, _heads, _heads_init, _site


@dataclass(frozen=True)
class E2EConfig:
    vision: clip_vit.ClipVisionConfig = field(default_factory=clip_vit.ClipVisionConfig.tiny)
    audio: hubert.HubertConfig = field(default_factory=hubert.HubertConfig.tiny)
    text_dim: int = 768
    hidden_dim: int = 64
    output_dim1: int = 6
    output_dim2: int = 1
    # the reference e2e model regularizes its fusion encoder with
    # args.dropout (e2e_model.py:25,31 MLPEncoder(..., dropout));
    # train-mode only — active iff apply() receives train_rng
    dropout: float = 0.0

    def fusion_args(self) -> FusionArgs:
        return FusionArgs(
            text_dim=self.text_dim,
            audio_dim=self.audio.hidden_size,
            video_dim=self.vision.projection_dim,
            hidden_dim=self.hidden_dim,
            output_dim1=self.output_dim1,
            output_dim2=self.output_dim2,
        )


def init_params(rng: jax.Array, cfg: E2EConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(rng, 6)
    args = cfg.fusion_args()
    d = cfg.hidden_dim
    return {
        "visual": clip_vit.init_vision_params(keys[0], cfg.vision, dtype=dtype),
        "acoustic": hubert.init_params(keys[1], cfg.audio, dtype=dtype),
        "proj_a": nn.dense_init(keys[2], args.audio_dim, d, dtype=dtype),
        "proj_t": nn.dense_init(keys[3], args.text_dim, d, dtype=dtype),
        "proj_v": nn.dense_init(keys[4], args.video_dim, d, dtype=dtype),
        "heads": _heads_init(keys[5], d * 3, args, dtype=dtype),
    }


def apply(params: dict, cfg: E2EConfig, batch, train_rng=None) -> Tuple:
    """batch: frames [b, T, H, W, 3] floats (CLIP-normalized), audio clips
    [b, clips, 1, samples], texts [b, text_dim] (utterance embedding).
    Returns the toolkit 4-tuple.

    train_rng: dropout on the three fusion projections (the reference's
    MLPEncoder(..., dropout) fusion encoder, e2e_model.py:31); None =
    eval mode."""
    frames = batch["frames"]
    b, t = frames.shape[:2]
    flat = frames.reshape(b * t, *frames.shape[2:])
    vfeat = clip_vit.encode_image(params["visual"], cfg.vision, flat)
    vfeat = vfeat.reshape(b, t, -1).mean(axis=1)
    afeat = hubert.encode_clips(params["acoustic"], cfg.audio, batch["audios"]).mean(axis=1)
    key = train_rng if cfg.dropout > 0.0 else None
    a = _drop(_site(key, 0), cfg.dropout, jax.nn.relu(nn.dense(params["proj_a"], afeat)))
    t_ = _drop(_site(key, 1), cfg.dropout, jax.nn.relu(nn.dense(params["proj_t"], batch["texts"])))
    v = _drop(_site(key, 2), cfg.dropout, jax.nn.relu(nn.dense(params["proj_v"], vfeat)))
    feats = jnp.concatenate([a, t_, v], axis=-1)
    emos, vals = _heads(params["heads"], feats)
    return feats, emos, vals, jnp.zeros(())
