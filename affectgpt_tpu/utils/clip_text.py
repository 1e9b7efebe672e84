"""Shared CLIP text-tower loading + fallback tokenization.

Used by both AU text-feature producers — the precompute entry
(extract_multimodal_features_precompute.extract_au) and the fine-grained
description encoder (scripts/encode_fine_grained.py) — so the tower
resolution (PATH_TO_VISUAL['CLIP_VIT_BASE32'] → converted weights →
random-init smoke fallback) and the byte-fallback tokenization stay one
implementation.
"""

from __future__ import annotations

import os

import numpy as np

from affectgpt_tpu.utils.logging import logger


def load_text_tower():
    """Returns (params, ClipTextConfig) for the ViT-B/32 text tower."""
    import jax

    from affectgpt_tpu import paths
    from affectgpt_tpu.models import clip_vit, convert

    cfg = clip_vit.ClipTextConfig.vit_b_32_text()
    text_dir = paths.PATH_TO_VISUAL.get("CLIP_VIT_BASE32", "")
    if text_dir and os.path.isdir(text_dir):
        import jax.numpy as jnp

        params = jax.tree.map(jnp.asarray, convert.convert_clip_text(text_dir))
    else:
        logger.warning("CLIP text dir missing — random init (smoke mode)")
        params = clip_vit.init_text_params(jax.random.PRNGKey(2), cfg)
    return params, cfg


_CACHED_TOWER = None


def cached_text_tower():
    """Process-wide lazy singleton of load_text_tower() — the realtime AU
    path (base_dataset.load_modalities) encodes one short text per sample
    and must not re-init/convert the tower per call."""
    global _CACHED_TOWER
    if _CACHED_TOWER is None:
        _CACHED_TOWER = load_text_tower()
    return _CACHED_TOWER


def byte_fallback_tokenize(texts, cfg) -> np.ndarray:
    """[N, context_length] int32 ids: raw bytes clipped into the vocab with
    an EOT sentinel — the deterministic stand-in used when no CLIP BPE
    assets exist (feature caches built this way are self-consistent)."""
    ids = np.zeros((len(texts), cfg.context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        enc = [min(b, cfg.vocab_size - 2) for b in str(text).encode()]
        enc = enc[: cfg.context_length - 1]
        ids[i, : len(enc)] = enc
        ids[i, len(enc)] = cfg.vocab_size - 1  # EOT
    return ids


def encode_texts(params, cfg, texts) -> np.ndarray:
    """texts → [N, 512] float32 L2-normalized CLIP text embeddings.

    Row-normalized to match the reference's AU/fine-grained extraction
    (extract_multimodal_features_precompute.py:770: `text_features /
    text_features.norm(dim=-1, keepdim=True)`) so caches built here mix
    with reference-built caches at the same per-row scale."""
    import jax.numpy as jnp

    from affectgpt_tpu.models import clip_vit

    ids = byte_fallback_tokenize(texts, cfg)
    feats = np.asarray(
        clip_vit.encode_text(params, cfg, jnp.asarray(ids)), dtype=np.float32
    )
    norms = np.linalg.norm(feats, axis=-1, keepdims=True)
    return feats / np.maximum(norms, 1e-12)
