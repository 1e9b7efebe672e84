"""CLIP text-tower helper (affectgpt_tpu/utils/clip_text.py): the shared
AU / fine-grained description encoder. Pins the parity contract with the
reference's extraction (extract_multimodal_features_precompute.py:755-777):
row-wise L2-normalized [N, 512] features, deterministic tokenization."""

import numpy as np

from affectgpt_tpu.utils import clip_text


def test_encode_texts_rows_are_unit_norm():
    # the reference stores text_features / text_features.norm(dim=-1) —
    # caches built by both stacks must mix at the same per-row scale
    params, cfg = clip_text.cached_text_tower()
    feats = clip_text.encode_texts(
        params, cfg, ["brow raised, jaw drop", "lip corner puller", "neutral"]
    )
    assert feats.shape == (3, 512)  # ViT-B/32 projection width
    assert feats.dtype == np.float32
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0, rtol=1e-5)


def test_encode_texts_deterministic_and_text_sensitive():
    params, cfg = clip_text.cached_text_tower()
    a = clip_text.encode_texts(params, cfg, ["smiling broadly"])
    b = clip_text.encode_texts(params, cfg, ["smiling broadly"])
    c = clip_text.encode_texts(params, cfg, ["frowning deeply"])
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0  # different text → different row


def test_byte_fallback_tokenize_layout():
    params, cfg = clip_text.cached_text_tower()
    ids = clip_text.byte_fallback_tokenize(["hi", "x" * 500], cfg)
    assert ids.shape == (2, cfg.context_length) and ids.dtype == np.int32
    # EOT sentinel terminates each row; long text clips to context window
    assert ids[0, 2] == cfg.vocab_size - 1
    assert ids[1, cfg.context_length - 1] == cfg.vocab_size - 1
