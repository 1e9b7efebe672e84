"""Evaluate Emotion-LLaMA (or any third-party MLLM) result dumps.

API parity with the reference variant (reference:
AffectGPT/evaluation_Emotion-Llama.py): identical MER-UniBench scoring
over a results root produced by another model — the shared contract is
the `{epoch}.npz` name2reason / filenames+fileitems format, which this
framework reads and writes identically. Output-format quirks of the
baseline (answer prefixes etc.) are normalized before judging.
"""

from __future__ import annotations

import argparse
import re

from affectgpt_tpu.utils.logging import setup_logger


def normalize_baseline_answer(text: str) -> str:
    """Strip common third-party output decorations before label extraction
    (the role of the reference's Emotion-LLaMA-specific parsing)."""
    text = str(text)
    text = re.sub(r"^\s*(answer|response|output)\s*[:：]\s*", "", text, flags=re.I)
    text = text.split("###")[0]
    return text.strip()


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Evaluate third-party MLLM results")
    parser.add_argument("--input-dir", required=True)
    parser.add_argument("--no-llm", action="store_true")
    args = parser.parse_args()
    setup_logger()

    import evaluation
    from affectgpt_tpu.evaluation import ew_metric

    ew_metric.set_reason_normalizer(normalize_baseline_answer)
    evaluation.main_zeroshot_scores(args.input_dir, use_llm=not args.no_llm)
