"""Baichuan2 sentencepiece tokenizer end-to-end (ROADMAP r3: the branch
had never seen a real asset). Constructs a REAL `tokenizer.model` —
a unigram sentencepiece ModelProto serialized through transformers'
vendored protobuf schema — and drives `load_tokenizer('Baichuan2')` over
it. This image has no sentencepiece wheel, so the protobuf fast-converter
fallback (tokenization.load_sentencepiece_fast) is the live path; with
the wheel present the reference's use_fast=False/trust_remote_code slow
path is preferred (reference my_affectgpt/models/tokenizer.py:32-35)."""

import json

import pytest

from affectgpt_tpu import constants, paths, tokenization


def make_sp_model_dir(tmp_path):
    """Write a tiny unigram tokenizer.model + the config files a
    sentencepiece-based HF model dir carries."""
    try:
        from transformers.utils import sentencepiece_model_pb2_new as sp
    except ImportError:
        from transformers.utils import sentencepiece_model_pb2 as sp

    m = sp.ModelProto()
    m.trainer_spec.model_type = sp.TrainerSpec.UNIGRAM
    m.trainer_spec.unk_id = 0
    m.trainer_spec.bos_id = 1
    m.trainer_spec.eos_id = 2
    m.normalizer_spec.add_dummy_prefix = True

    def add(piece, score, ptype=sp.ModelProto.SentencePiece.NORMAL):
        p = m.pieces.add()
        p.piece, p.score, p.type = piece, score, ptype

    add("<unk>", 0.0, sp.ModelProto.SentencePiece.UNKNOWN)
    add("<s>", 0.0, sp.ModelProto.SentencePiece.CONTROL)
    add("</s>", 0.0, sp.ModelProto.SentencePiece.CONTROL)
    for piece, score in [
        ("▁", -2.0), ("▁the", -1.0), ("▁cat", -1.2),
        ("▁sat", -1.3), ("▁hat", -1.4), ("t", -2.3), ("h", -2.7),
        ("e", -2.2), ("c", -2.6), ("a", -2.4), ("s", -2.5), ("o", -2.8),
        ("n", -2.9),
    ]:
        add(piece, score)

    (tmp_path / "tokenizer.model").write_bytes(m.SerializeToString())
    # an sp-backed slow tokenizer class, like a real Baichuan2 dir; with
    # no sentencepiece wheel this class raises ImportError at init, which
    # is exactly the condition the loader's fallback handles
    (tmp_path / "tokenizer_config.json").write_text(
        json.dumps({"tokenizer_class": "LlamaTokenizer"})
    )
    return str(tmp_path)


def test_sentencepiece_fast_roundtrip(tmp_path):
    model_dir = make_sp_model_dir(tmp_path)
    tok = tokenization.load_sentencepiece_fast(model_dir)
    ids = tok.encode("the cat sat", add_special_tokens=False)
    assert tok.convert_ids_to_tokens(ids) == ["▁the", "▁cat", "▁sat"]
    assert tok.decode(ids, skip_special_tokens=True) == "the cat sat"
    assert tok.unk_token == "<unk>"
    assert tok.bos_token == "<s>" and tok.eos_token == "</s>"


def test_load_tokenizer_baichuan2_end_to_end(tmp_path, monkeypatch):
    """The full reference contract on the Baichuan2 branch: sp asset →
    loaded tokenizer with pad=eos and all six modality patch tokens
    registered; encode/decode round-trips; patch ids are stable specials."""
    pytest.importorskip("transformers")
    model_dir = make_sp_model_dir(tmp_path)
    monkeypatch.setitem(paths.PATH_TO_LLM, "Baichuan2", model_dir)

    wrapper = tokenization.load_tokenizer("Baichuan2")
    assert wrapper.pad_token_id == wrapper.eos_token_id
    assert len(wrapper.patch_token_ids) == len(constants.ALL_PATCH_TOKENS)
    base_vocab = 16
    for tok_name, tok_id in wrapper.patch_token_ids.items():
        assert tok_id >= base_vocab, (tok_name, tok_id)

    ids = wrapper.encode("the cat sat")
    assert wrapper.decode(ids, skip_special_tokens=True) == "the cat sat"

    # patch tokens survive an encode→decode cycle as atomic specials
    patch = next(iter(constants.ALL_PATCH_TOKENS))
    ids2 = wrapper.encode(f"the {patch} cat")
    assert wrapper.patch_token_ids[patch] in ids2
