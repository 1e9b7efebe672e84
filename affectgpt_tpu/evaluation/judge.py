"""LLM-judge post-processing: description → open-vocabulary labels /
sentiment / onehot / valence.

Capability-parity with the reference's vLLM-based judge (reference:
toolkit/utils/qwen.py:262-380 prompt templates + func_postprocess_qwen
cleanup; my_affectgpt/evaluation/ew_metric.py:31-121 batch extraction).
The CUDA vLLM engine is replaced by this framework's own compiled
batched decode (inference/generate.py); when no LLM weights are
available a deterministic lexicon fallback keeps the evaluation pipeline
runnable end-to-end (labels matched against the emotion-wheel surface
forms).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence

import numpy as np

# -- prompt templates (string parity with qwen.py:270-380) ---------------------


def prompt_reason_to_openset(reason: str) -> str:
    return (
        "Please assume the role of an expert in the field of emotions. "
        "We provide clues that may be related to the emotions of the characters. "
        "Based on the provided clues, please identify the emotional states of the main character. "
        "The main character is the one with the most detailed clues. "
        "Please separate different emotional categories with commas and output only the "
        "clearly identifiable emotional categories in a list format. "
        "If none are identified, please output an empty list. "
        "Input: We cannot recognize his emotional state; Output: [] "
        "Input: His emotional state is happy, sad, and angry; Output: [happy, sad, angry] "
        f"Input: {reason}; Output: "
    )


def prompt_openset_to_sentiment(openset: str) -> str:
    return (
        "Please act as an expert in the field of emotions.             "
        "We provide a few words to describe the emotions of a character.             "
        "Please choose the most likely sentiment from the given candidates: "
        "[positive, negative, neutral]             "
        "Please direct output answer without analyzing process.             "
        "Input: [joyful]; Output: positive             "
        "Input: []; Output: neutral             "
        f"Input: {openset}; Output: "
    )


def prompt_openset_to_onehot(openset: str, candidates: str = "happy, angry, worried, sad, surprise, neutral") -> str:
    return (
        "Please act as an expert in the field of emotions.             "
        "We provide a few words to describe the emotions of a character.             "
        "Please choose the emotion label from the following list that is closest "
        f"to the given words: {candidates}.\n"
        "            Input: [joyful]; Output: happy             "
        "Input: []; Output: neutral             "
        f"Input: {openset}; Output: "
    )


def prompt_reason_to_valence(reason: str) -> str:
    return (
        "Please identify the overall positive or negative emotional polarity of the main characters.  "
        "The output should be a ﬂoating-point number ranging from -1 to 1.  "
        "Here, -1 indicates extremely negative emotions, 0 indicates neutral emotions, "
        "and 1 indicates extremely positive emotions.  "
        "Please provide your judgment as a ﬂoating-point number.  "
        "Input: I am very happy; Output: 1  "
        "Input: I am very angry; Output: -1 "
        "Input: I am neutral; Output: 0 "
        f"Input: {reason}; Output: "
    )


def prompt_reason_merge(reason: str, subtitle: str) -> str:
    """Merge multimodal clue text + subtitle into one reasoning description
    (reference reason_merge_qwen, qwen.py:151-191 — the MER-Caption
    pipeline's fusion step)."""
    if not subtitle:
        raise ValueError("subtitle cannot be empty")
    if reason:
        payload = f"Clue: {reason}；Subtitle: {subtitle}"
        return (
            "Please assume the role of an expert in the field of emotions. "
            "We have provided clues from the video that may be related to the "
            "characters' emotional states. In addition, we have also provided "
            "the subtitle content of the video. Please merge all these "
            "information to infer the emotional states of the characters, and "
            "provide reasoning for your inferences. "
            f"Input: {payload} Output:"
        )
    return (
        "Please assume the role of an expert in the field of emotions. "
        "We have provided the subtitle content of the video. Please infer the "
        "emotional states of the characters, and provide reasoning process "
        f"for your inferences. Input: Subtitle: {subtitle} Output:"
    )


def prompt_reason_to_rank(reason: str, candidates: str = "happy, angry, worried, sad, surprise, neutral") -> str:
    """Rank the one-hot candidates by likelihood (reference
    reason_to_rank_qwen, qwen.py:244-268)."""
    return (
        "Please assume the role of an expert in the emotional domain. "
        "We provide clues that may be related to the emotions of the character. "
        "Based on the provided clues, identify the emotional states of the main "
        "character. We provide a set of emotional candidates, please rank them "
        "in order of likelihood from high to low. "
        f"The candidate set is [{candidates}]. "
        "Please directly output the ranking results. "
        f"Input: {reason}; Output: "
    )


def prompt_reason_to_onehot(reason: str, candidates: str = "happy, angry, worried, sad, surprise, neutral") -> str:
    """Description → single one-hot label directly (reference
    reason_to_onehot_qwen, qwen.py:203-241, few-shot constrained)."""
    return (
        "Please act as an expert in the field of emotions. "
        "We provide clues that related to the character's emotions. Based on "
        "the provided clues, please identify the emotional states of the main "
        "character. The main character is the one with the most detailed clues. "
        "Please select one of the following emotion labels that best matches "
        f"the given clues: [{candidates}]. We would like to emphasize that "
        "please must only output one label from the above candidates. You "
        "cannot output label outside these candidates, like mixed, happiness. "
        "Input: We cannot recognize his emotional state; Output: neutral "
        "Input: His emotional state is joyful, happiness, anger; Output: happy "
        f"Input: {reason}; Output: "
    )


def postprocess_response(response: str) -> str:
    """Strip Input/Output/translation prefixes and newlines (reference
    func_postprocess_qwen, qwen.py:15-31)."""
    response = response.strip()
    for prefix in ("输入", "输出", "翻译", "让我们来翻译一下：", "output", "Output", "input", "Input"):
        if response.startswith(prefix):
            response = response[len(prefix):]
    response = response.strip()
    for prefix in (":", "："):
        if response.startswith(prefix):
            response = response[len(prefix):]
    return response.strip().replace("\n", "").strip()


class LLMJudge:
    """Batch judge over this framework's compiled decode path."""

    def __init__(self, frozen_llm: dict, llm_cfg, tokenizer, max_new_tokens: int = 512,
                 temperature: float = 0.7, top_p: float = 0.8):
        self.frozen_llm = frozen_llm
        self.llm_cfg = llm_cfg
        self.tokenizer = tokenizer
        self.max_new_tokens = max_new_tokens
        self.temperature = temperature
        self.top_p = top_p

    def complete_batch(self, prompts: Sequence[str], batch_size: int = 8) -> List[str]:
        import jax
        import jax.numpy as jnp

        from affectgpt_tpu.inference import generate as gen
        from affectgpt_tpu.models import qwen2

        gcfg = gen.GenerateConfig(
            max_new_tokens=self.max_new_tokens, do_sample=True,
            temperature=self.temperature, top_p=self.top_p,
            eos_token_id=self.tokenizer.eos_token_id,
        )
        out: List[str] = []
        for start in range(0, len(prompts), batch_size):
            chunk = prompts[start : start + batch_size]
            from affectgpt_tpu.tokenization import encode_batch

            ids, lengths = encode_batch(self.tokenizer, chunk)
            t_pad = ids.shape[1]
            embeds = qwen2.embed_tokens(self.frozen_llm, jnp.asarray(ids))
            tokens, num_valid = gen.generate(
                self.frozen_llm, self.llm_cfg, gcfg, embeds, jnp.asarray(lengths),
                jax.random.PRNGKey(start), max_len=t_pad + self.max_new_tokens,
            )
            for row, nv in zip(np.asarray(tokens), np.asarray(num_valid)):
                text = self.tokenizer.decode(row[: int(nv)], skip_special_tokens=True)
                out.append(postprocess_response(gen.trim_output_text(text)))
        return out

    def reason_to_openset(self, reasons: Sequence[str]) -> List[str]:
        return self.complete_batch([prompt_reason_to_openset(r) for r in reasons])

    def openset_to_sentiment(self, opensets: Sequence[str]) -> List[str]:
        return self.complete_batch([prompt_openset_to_sentiment(o) for o in opensets])

    def openset_to_onehot(self, opensets: Sequence[str], candidates: str) -> List[str]:
        return self.complete_batch(
            [prompt_openset_to_onehot(o, candidates) for o in opensets]
        )

    def reason_merge(self, reasons: Sequence[str], subtitles: Sequence[str]) -> List[str]:
        return self.complete_batch(
            [prompt_reason_merge(r, s) for r, s in zip(reasons, subtitles)]
        )

    def reason_to_rank(self, reasons: Sequence[str],
                       candidates: str = "happy, angry, worried, sad, surprise, neutral") -> List[str]:
        return self.complete_batch([prompt_reason_to_rank(r, candidates) for r in reasons])

    def reason_to_onehot(self, reasons: Sequence[str],
                         candidates: str = "happy, angry, worried, sad, surprise, neutral") -> List[str]:
        out = self.complete_batch([prompt_reason_to_onehot(r, candidates) for r in reasons])
        return [o.rstrip("。.").strip() for o in out]


class LexiconJudge:
    """Deterministic fallback: match emotion-wheel surface forms inside the
    description text. No reference equivalent (the reference hard-requires
    a GPU LLM); keeps evaluation runnable without pretrained weights."""

    def __init__(self, vocabulary: Optional[Sequence[str]] = None):
        if vocabulary is None:
            try:
                from affectgpt_tpu.evaluation.wheel import WheelMetrics

                vocabulary = list(WheelMetrics().format_mapping())
            except Exception:
                vocabulary = []
        # longest-first so multi-word emotions win over substrings
        self.vocabulary = sorted(set(vocabulary), key=len, reverse=True)

    def reason_to_openset(self, reasons: Sequence[str]) -> List[str]:
        out = []
        for reason in reasons:
            text = str(reason).lower()
            found = []
            for word in self.vocabulary:
                # lookarounds, not \b: \b never matches next to a non-word
                # edge char, silently dropping terms like "happy (very)"
                if re.search(rf"(?<!\w){re.escape(word)}(?!\w)", text):
                    found.append(word)
            out.append("[" + ", ".join(dict.fromkeys(found)) + "]")
        return out

    def openset_to_sentiment(self, opensets: Sequence[str]) -> List[str]:
        positive = {"happy", "joy", "joyful", "excited", "content", "cheerful", "pleased", "positive"}
        negative = {"sad", "angry", "anger", "fear", "worried", "disgust", "gloomy", "negative", "anxious"}
        out = []
        for openset in opensets:
            words = set(re.findall(r"[a-z]+", str(openset).lower()))
            pos, neg = len(words & positive), len(words & negative)
            out.append("positive" if pos > neg else "negative" if neg > pos else "neutral")
        return out

    def reason_merge(self, reasons: Sequence[str], subtitles: Sequence[str]) -> List[str]:
        # no generation available: concatenate clue + subtitle deterministically
        return [
            (f"{r} The subtitle says: {s}" if r else f"The subtitle says: {s}")
            for r, s in zip(reasons, subtitles)
        ]

    def reason_to_rank(self, reasons: Sequence[str],
                       candidates: str = "happy, angry, worried, sad, surprise, neutral") -> List[str]:
        cand = [c.strip() for c in candidates.split(",")]
        out = []
        for reason in reasons:
            text = str(reason).lower()
            hits = [c for c in cand if re.search(rf"(?<!\w){re.escape(c)}(?!\w)", text)]
            out.append(", ".join(hits + [c for c in cand if c not in hits]))
        return out

    def reason_to_onehot(self, reasons: Sequence[str],
                         candidates: str = "happy, angry, worried, sad, surprise, neutral") -> List[str]:
        cand = [c.strip() for c in candidates.split(",")]
        out = []
        for reason in reasons:
            text = str(reason).lower()
            hits = [c for c in cand if re.search(rf"(?<!\w){re.escape(c)}(?!\w)", text)]
            out.append(hits[0] if hits else "neutral")
        return out
