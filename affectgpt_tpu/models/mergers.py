"""Temporal mergers and pre-fusion: compress [b, t, d] modality features
into a fixed number of LLM-space tokens.

TPU-native unification of the reference's encode_* family
(reference: my_affectgpt/models/affectgpt.py:420-915). The reference has
separate realtime and preextracted branches that replay identical math
(affectgpt.py:537-610 mirrors :420-535); here there is exactly ONE path:
encoder (or cache) → features [b, t, d] → merger, so realtime/preextracted
parity holds by construction.

Merger variants per modality (selected at trace time from config):
- "qformer":   + learned temporal position embedding, 2-layer Q-Former
               → [b, num_query, 768] → linear proj → [b, num_query, llm_dim]
- "attention": 1-layer MLP attention pooling over time → [b, d]
               → proj → broadcast to [b, num_query, llm_dim]
- "mean":      temporal mean → proj → broadcast.

Pre-fusion ("multi") variants (affectgpt.py:848-915):
- "qformer":   project audio/video hiddens to max dim, concat along time,
               + position embedding, Q-Former → num_multi_query tokens
- "attention": mean-pool each modality, 2-way attention gate, proj,
               broadcast (the shipped best config).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from affectgpt_tpu.models import nn, qformer


@dataclass(frozen=True)
class MergerConfig:
    fusion_type: str  # "qformer" | "attention" | "mean"
    feat_dim: int  # input feature dim (e.g. 768 CLIP, 1024 HuBERT)
    llm_dim: int
    num_query_tokens: int
    max_time: int  # position-embedding slots (video 32, audio 8; affectgpt.py:159,223)

    def qformer_config(self) -> qformer.QFormerConfig:
        return qformer.QFormerConfig(
            encoder_width=self.feat_dim, num_query_tokens=self.num_query_tokens
        )


def init_merger(rng: jax.Array, cfg: MergerConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(rng, 4)
    params: dict = {}
    if cfg.fusion_type == "qformer":
        params["pos_embed"] = nn.embedding_init(keys[0], cfg.max_time, cfg.feat_dim, dtype=dtype)
        params["qformer"] = qformer.init_params(keys[1], cfg.qformer_config(), dtype=dtype)
        proj_in = cfg.qformer_config().hidden_size
    elif cfg.fusion_type == "attention":
        params["attn_mlp"] = nn.dense_init(keys[0], cfg.feat_dim, 1, dtype=dtype)
        proj_in = cfg.feat_dim
    elif cfg.fusion_type == "mean":
        proj_in = cfg.feat_dim
    else:
        raise ValueError(f"Unknown fusion_type: {cfg.fusion_type}")
    params["proj"] = nn.dense_init(keys[2], proj_in, cfg.llm_dim, dtype=dtype)
    return params


def apply_merger(params: dict, cfg: MergerConfig, features: jnp.ndarray,
                 dropout_rng=None) -> jnp.ndarray:
    """[b, t, feat_dim] (or [b, t, q, feat_dim] from BLIP2-style encoders)
    → [b, num_query_tokens, llm_dim].

    4-D inputs get the temporal position embedding added per frame and are
    flattened to [b, t·q, d] (reference affectgpt.py:21-27 qformer case1 /
    mean case1).

    dropout_rng: train-mode switch for the qformer fusion's BERT dropouts
    (the reference's merger Q-Formers are trainable and run under
    model.train()); attention/mean fusion types have no dropout in the
    reference and ignore it."""
    if features.ndim == 4:
        b, t, q_in, d = features.shape
        if cfg.fusion_type == "qformer":
            pos = nn.embedding(params["pos_embed"], jnp.arange(t))  # [t, d]
            h = features + pos[None, :, None, :].astype(features.dtype)
            h = h.reshape(b, t * q_in, d)
            q = qformer.apply(params["qformer"], cfg.qformer_config(), h,
                              dropout_rng=dropout_rng)
            return nn.dense(params["proj"], q)
        features = jnp.mean(features, axis=2)  # [b, t, d] for attention/mean

    b, t, _ = features.shape
    if cfg.fusion_type == "qformer":
        pos = nn.embedding(params["pos_embed"], jnp.arange(t))  # [t, d]
        h = features + pos[None, :, :].astype(features.dtype)
        q = qformer.apply(params["qformer"], cfg.qformer_config(), h,
                          dropout_rng=dropout_rng)
        return nn.dense(params["proj"], q)
    if cfg.fusion_type == "attention":
        if t == 1:
            # single-timestep features bypass the attention weighting
            # entirely (reference preextracted path, affectgpt.py:587-589:
            # `fused_feat = store_hidden_state.squeeze(1)`) — the realtime
            # branch never sees t==1, so the unified path can special-case
            # it at trace time without forking realtime/preextracted
            fused = features[:, 0, :]
        else:
            # unnormalized linear attention pooling (affectgpt.py:505-535):
            # fused = features^T @ mlp(features)
            weights = nn.dense(params["attn_mlp"], features)  # [b, t, 1]
            fused = jnp.einsum("btd,bto->bd", features, weights, preferred_element_type=jnp.float32)
            fused = fused.astype(features.dtype)
    elif cfg.fusion_type == "mean":
        fused = jnp.mean(features, axis=1)
    else:
        raise ValueError(cfg.fusion_type)
    out = nn.dense(params["proj"], fused)  # [b, llm_dim]
    return jnp.broadcast_to(out[:, None, :], (b, cfg.num_query_tokens, out.shape[-1]))


@dataclass(frozen=True)
class MultiFusionConfig:
    fusion_type: str  # "qformer" | "attention"
    video_dim: int
    audio_dim: int
    llm_dim: int
    num_query_tokens: int
    max_time: int = 264  # qformer position slots (affectgpt.py:318)

    @property
    def max_dim(self) -> int:
        return max(self.video_dim, self.audio_dim)

    def qformer_config(self) -> qformer.QFormerConfig:
        return qformer.QFormerConfig(
            encoder_width=self.max_dim, num_query_tokens=self.num_query_tokens
        )


def init_multi_fusion(rng: jax.Array, cfg: MultiFusionConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(rng, 6)
    params = {
        "video_embs": nn.dense_init(keys[0], cfg.video_dim, cfg.max_dim, dtype=dtype),
        "audio_embs": nn.dense_init(keys[1], cfg.audio_dim, cfg.max_dim, dtype=dtype),
    }
    if cfg.fusion_type == "qformer":
        params["pos_embed"] = nn.embedding_init(keys[2], cfg.max_time, cfg.max_dim, dtype=dtype)
        params["qformer"] = qformer.init_params(keys[3], cfg.qformer_config(), dtype=dtype)
        proj_in = cfg.qformer_config().hidden_size
    elif cfg.fusion_type == "attention":
        params["attn_mlp"] = nn.dense_init(keys[2], cfg.max_dim * 2, cfg.max_dim, dtype=dtype)
        params["fc_att"] = nn.dense_init(keys[3], cfg.max_dim, 2, dtype=dtype)
        proj_in = cfg.max_dim
    else:
        raise ValueError(f"Unknown multi fusion_type: {cfg.fusion_type}")
    params["proj"] = nn.dense_init(keys[4], proj_in, cfg.llm_dim, dtype=dtype)
    return params


def apply_multi_fusion(
    params: dict,
    cfg: MultiFusionConfig,
    video_hidden: jnp.ndarray,
    audio_hidden: jnp.ndarray,
    dropout_rng=None,
) -> jnp.ndarray:
    """video_hidden [b, tv, video_dim], audio_hidden [b, ta, audio_dim]
    → [b, num_query_tokens, llm_dim]. dropout_rng: see apply_merger."""
    b = video_hidden.shape[0]
    if cfg.fusion_type == "qformer":
        v = nn.dense(params["video_embs"], video_hidden)  # [b, tv, maxdim]
        a = nn.dense(params["audio_embs"], audio_hidden)  # [b, ta, maxdim]
        h = jnp.concatenate([v, a], axis=1)
        t = h.shape[1]
        pos = nn.embedding(params["pos_embed"], jnp.arange(t))
        h = h + pos[None, :, :].astype(h.dtype)
        q = qformer.apply(params["qformer"], cfg.qformer_config(), h,
                          dropout_rng=dropout_rng)
        return nn.dense(params["proj"], q)

    # attention gate: mean-pool each stream, score 2 modalities, weighted sum
    # (affectgpt.py:464-489).
    v = nn.dense(params["video_embs"], jnp.mean(video_hidden, axis=1))  # [b, maxdim]
    a = nn.dense(params["audio_embs"], jnp.mean(audio_hidden, axis=1))  # [b, maxdim]
    gate = nn.dense(params["fc_att"], nn.dense(params["attn_mlp"], jnp.concatenate([v, a], axis=-1)))  # [b, 2]
    stacked = jnp.stack([v, a], axis=1)  # [b, 2, maxdim]
    fused = jnp.einsum("bmd,bm->bd", stacked, gate, preferred_element_type=jnp.float32)
    fused = fused.astype(v.dtype)
    out = nn.dense(params["proj"], fused)
    return jnp.broadcast_to(out[:, None, :], (b, cfg.num_query_tokens, out.shape[-1]))
