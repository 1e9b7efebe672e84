"""Tokenizer loading with modality patch tokens.

Parity with the reference loader (reference:
my_affectgpt/models/tokenizer.py `load_tokenizer_from_LLM`): per-LLM
bos fix (Qwen uses <|im_start|>), pad=eos, and the six modality patch
tokens registered as special tokens. Also provides a dependency-free
ByteTokenizer with the same interface for tests and tiny models.
"""

from __future__ import annotations

from typing import Dict, List

from affectgpt_tpu import constants, paths


class TokenizerWrapper:
    """Uniform interface over HF tokenizers: ids for specials + plain encode."""

    def __init__(self, hf_tokenizer):
        self.hf = hf_tokenizer
        vocab = hf_tokenizer.get_vocab()
        self.patch_token_ids: Dict[str, int] = {
            tok: vocab[tok] for tok in constants.ALL_PATCH_TOKENS
        }
        self.bos_token_id = hf_tokenizer.bos_token_id
        self.eos_token_id = hf_tokenizer.eos_token_id
        self.pad_token_id = hf_tokenizer.pad_token_id
        self.vocab_size = len(vocab)

    def encode(self, text: str, max_length: int | None = None) -> List[int]:
        ids = self.hf(
            text,
            return_tensors=None,
            add_special_tokens=False,
            truncation=max_length is not None,
            max_length=max_length,
        )["input_ids"]
        return list(ids)

    def decode(self, ids, skip_special_tokens: bool = False) -> str:
        return self.hf.decode(list(ids), skip_special_tokens=skip_special_tokens)


def load_sentencepiece_fast(model_dir: str):
    """Load a sentencepiece `tokenizer.model` WITHOUT the sentencepiece
    wheel (absent from this image): parse the ModelProto with protobuf
    (transformers vendors the schema) and convert it to a fast tokenizer
    through the stock Llama SpmConverter. Covers unigram-type models; a
    BPE-type .model still needs the real sentencepiece wheel (the
    converter's SentencePieceExtractor requires it)."""
    import os

    from transformers import PreTrainedTokenizerFast
    from transformers.convert_slow_tokenizer import LlamaConverter

    try:
        from transformers.utils import sentencepiece_model_pb2_new as sp_pb2
    except ImportError:  # older transformers layout
        from transformers.utils import sentencepiece_model_pb2 as sp_pb2

    vocab_file = os.path.join(model_dir, "tokenizer.model")
    proto = sp_pb2.ModelProto()
    with open(vocab_file, "rb") as handle:
        proto.ParseFromString(handle.read())
    pieces = [p.piece for p in proto.pieces]
    spec = proto.trainer_spec

    class _Slowless:
        """Duck-typed stand-in for the slow tokenizer the converter
        normally wraps — it only reads vocab_file, the bos/eos flags and
        convert_ids_to_tokens for the special ids."""

        def __init__(self):
            self.vocab_file = vocab_file
            self.add_bos_token = True
            self.add_eos_token = False

        def convert_ids_to_tokens(self, index):
            return pieces[index]

    backend = LlamaConverter(_Slowless()).converted()
    return PreTrainedTokenizerFast(
        tokenizer_object=backend,
        unk_token=pieces[spec.unk_id] if spec.unk_id >= 0 else None,
        bos_token=pieces[spec.bos_id] if spec.bos_id >= 0 else None,
        eos_token=pieces[spec.eos_id] if spec.eos_id >= 0 else None,
    )


def load_tokenizer(model_name: str) -> TokenizerWrapper:
    """Load the LLM tokenizer and register patch tokens (reference:
    models/tokenizer.py:31-45)."""
    from transformers import AutoTokenizer

    if model_name == "Baichuan2":
        # Baichuan2 ships a sentencepiece tokenizer behind remote code
        # (reference tokenizer.py:32-33: use_fast=False, trust_remote_code)
        try:
            tokenizer = AutoTokenizer.from_pretrained(
                paths.PATH_TO_LLM[model_name], use_fast=False, trust_remote_code=True
            )
        except ImportError:
            import logging

            logging.getLogger(__name__).warning(
                "sentencepiece wheel unavailable — loading %s tokenizer.model "
                "via the protobuf fast-converter fallback", model_name,
            )
            tokenizer = load_sentencepiece_fast(paths.PATH_TO_LLM[model_name])
    else:
        tokenizer = AutoTokenizer.from_pretrained(paths.PATH_TO_LLM[model_name], use_fast=True)
    if model_name in ("Qwen2", "Qwen25"):
        tokenizer.bos_token = "<|im_start|>"
    tokenizer.pad_token = tokenizer.eos_token
    for tok in constants.ALL_PATCH_TOKENS:
        tokenizer.add_tokens([tok], special_tokens=True)
    return TokenizerWrapper(tokenizer)


class ByteTokenizer:
    """Deterministic byte-level tokenizer with the TokenizerWrapper interface.

    Bytes 0-255 map to ids 0-255; specials and patch tokens get ids above.
    Used by the test-suite and tiny-model smoke paths where no HF tokenizer
    files exist (this framework must be exercisable without pretrained
    assets, unlike the reference which hard-requires downloaded LLMs).
    """

    def __init__(self):
        self.bos_token_id = 256
        self.eos_token_id = 257
        self.pad_token_id = 257  # pad == eos, matching the reference convention
        self.patch_token_ids = {
            tok: 258 + i for i, tok in enumerate(constants.ALL_PATCH_TOKENS)
        }
        self.vocab_size = 258 + len(constants.ALL_PATCH_TOKENS)

    def encode(self, text: str, max_length: int | None = None) -> List[int]:
        ids: List[int] = []
        rest = text
        while rest:
            matched = False
            for tok, tok_id in self.patch_token_ids.items():
                if rest.startswith(tok):
                    ids.append(tok_id)
                    rest = rest[len(tok):]
                    matched = True
                    break
            if not matched:
                ids.extend(rest[0].encode("utf-8", errors="replace"))
                rest = rest[1:]
        if max_length is not None:
            ids = ids[:max_length]
        return ids

    def decode(self, ids, skip_special_tokens: bool = False) -> str:
        inverse = {v: k for k, v in self.patch_token_ids.items()}
        out: List[str] = []
        byte_buf: List[int] = []

        def flush():
            if byte_buf:
                out.append(bytes(byte_buf).decode("utf-8", errors="replace"))
                byte_buf.clear()

        for token_id in ids:
            token_id = int(token_id)
            if token_id < 256:
                byte_buf.append(token_id)
            elif token_id == self.bos_token_id or token_id == self.eos_token_id:
                flush()
                if not skip_special_tokens:
                    out.append("<s>" if token_id == self.bos_token_id else "</s>")
            elif token_id in inverse:
                flush()
                if not skip_special_tokens:
                    out.append(inverse[token_id])
            else:
                flush()
        flush()
        return "".join(out)


def encode_batch(tokenizer, texts):
    """bos + encode each text, right-padded to the batch max (the
    reference's answer_sample prepends bos, conversation_video.py:303+).
    Returns (ids [b, t_pad] int32, lengths [b] int32) — the shared prompt
    staging used by chat.build_prompt_batch, AUAgent.describe_batch and
    the LLM-judge batches (one implementation instead of three copies)."""
    import numpy as np

    encoded = [[tokenizer.bos_token_id] + tokenizer.encode(t) for t in texts]
    lengths = np.array([len(e) for e in encoded], dtype=np.int32)
    ids = np.zeros((len(encoded), int(lengths.max())), dtype=np.int32)
    for i, e in enumerate(encoded):
        ids[i, : len(e)] = e
    return ids, lengths
