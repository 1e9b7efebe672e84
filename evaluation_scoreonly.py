"""Score-only evaluation: reuse cached judge outputs, never invoke an LLM.

API parity with the reference variant (reference:
AffectGPT/evaluation-scoreonly.py): identical scoring flow, but the
judge is replaced by a cache-only stub that raises if any `*-openset.npz`
/ `*-sentiment.npz` artifact is missing — run evaluation.py once first
(or reuse artifacts produced by the reference; the npz format matches).
"""

from __future__ import annotations

import argparse

from affectgpt_tpu.utils.logging import setup_logger


class CacheOnlyJudge:
    def _missing(self, *_args, **_kwargs):
        raise RuntimeError(
            "score-only mode: judge cache missing — run evaluation.py (LLM or "
            "--no-llm) once to materialize *-openset.npz / *-sentiment.npz"
        )

    reason_to_openset = _missing
    openset_to_sentiment = _missing
    openset_to_onehot = _missing


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="AffectGPT-TPU score-only evaluation")
    parser.add_argument("--input-dir", required=True)
    args = parser.parse_args()
    setup_logger()

    import evaluation

    evaluation.main_zeroshot_scores(args.input_dir, use_llm=False, judge=CacheOnlyJudge())
