"""Evaluation entry point: per-epoch zero-shot scores over result dirs.

API parity with the reference scorer (reference:
AffectGPT/evaluation.py:199-281 main_zeroshot_scores): discover result
root → dataset class → ground truth → judge label extraction (with npz
caches) → per-epoch score → best-epoch report. The vLLM judge is
replaced by this framework's compiled decode (evaluation/judge.py), with
a deterministic lexicon fallback when no LLM weights exist.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from affectgpt_tpu import registry
from affectgpt_tpu.data.base_dataset import DatasetConfig, ModelDataConfig
from affectgpt_tpu.data.datasets import get_dataset_class  # noqa: F401 — registers datasets
from affectgpt_tpu.evaluation import ew_metric
from affectgpt_tpu.evaluation.wheel import WheelMetrics
from affectgpt_tpu.tokenization import ByteTokenizer
from affectgpt_tpu.utils.logging import logger, setup_logger

DISCRETE = {"MER2023", "MER2024", "MELD", "IEMOCAPFour"}
DIMENSION = {"CMUMOSI", "CMUMOSEI", "SIMS", "SIMSv2"}
OV = {"OVMERDPlus", "OVMERD", "MERCaptionPlus", "MER2025OV"}


def build_judge(use_llm: bool, judge_llm: str = "Qwen25"):
    """LLM judge when real weights exist, lexicon judge otherwise.

    `use_llm=True` with no pretrained weights mounted would hand label
    extraction to a RANDOM-weight LLM (bootstrap.build_model falls back to
    random init with only a log line) — garbage scores, silently. Guard:
    the LLM judge is only built when the weight dir actually exists;
    otherwise fall back to the deterministic LexiconJudge loudly."""
    if use_llm:
        from affectgpt_tpu import paths

        llm_dir = paths.PATH_TO_LLM.get(judge_llm, "")
        if not (llm_dir and os.path.isdir(llm_dir)):
            logger.warning(
                "LLM judge requested but no pretrained %s weights at %r — a "
                "random-weight LLM would emit meaningless extractions; using "
                "the deterministic LexiconJudge instead (pass --no-llm to "
                "silence this warning)", judge_llm, llm_dir,
            )
        else:
            from affectgpt_tpu.bootstrap import build_model
            from affectgpt_tpu.config import Config
            from affectgpt_tpu.evaluation.judge import LLMJudge

            cfg = Config.from_dict({"model": {"llama_model_name": judge_llm}})
            model_cfg, frozen, _, tokenizer = build_model(cfg)
            return LLMJudge(frozen["llm"], model_cfg.llm, tokenizer)
    from affectgpt_tpu.evaluation.judge import LexiconJudge

    return LexiconJudge()


def main_zeroshot_scores(input_dir: str, use_llm: bool = True, judge=None):
    """judge=None builds the default (LLM or lexicon) judge; entry-point
    variants pass their own (score-only cache stub, etc.)."""
    judge = judge if judge is not None else build_judge(use_llm)
    wheel = WheelMetrics()
    data_model_cfg = ModelDataConfig()

    results = {}
    for ds_dir in sorted(glob.glob(os.path.join(input_dir, "result-*"))):
        ds_key = os.path.basename(ds_dir)[len("result-"):]
        ds_name = {
            "mer2023": "MER2023", "mer2024": "MER2024", "meld": "MELD",
            "iemocapfour": "IEMOCAPFour", "cmumosi": "CMUMOSI",
            "cmumosei": "CMUMOSEI", "sims": "SIMS", "simsv2": "SIMSv2",
            "ovmerdplus": "OVMERDPlus",
        }.get(ds_key, ds_key)
        dataset = registry.get("dataset", ds_name)(
            ByteTokenizer(), DatasetConfig(face_or_frame="textonly"), data_model_cfg
        )
        name2gt = dataset.get_test_name2gt()

        epoch_scores = []
        for epoch_npz in sorted(glob.glob(os.path.join(ds_dir, "*.npz"))):
            if epoch_npz.endswith("-openset.npz") or epoch_npz.endswith("-sentiment.npz"):
                continue
            if ds_name in DISCRETE:
                score, _ = ew_metric.score_discrete(epoch_npz, name2gt, judge, wheel)
            elif ds_name in DIMENSION:
                score, _ = ew_metric.score_dimension(epoch_npz, name2gt, judge)
            else:
                score, _, _ = ew_metric.score_ov(epoch_npz, name2gt, judge, wheel)
            epoch_scores.append((os.path.basename(epoch_npz), score))
            logger.info("%s %s score=%.4f", ds_name, os.path.basename(epoch_npz), score)
        if epoch_scores:
            best = max(epoch_scores, key=lambda kv: kv[1])
            results[ds_name] = best
            logger.info("%s BEST %s score=%.4f", ds_name, *best)

    if results:
        mean = float(np.mean([score for _, score in results.values()]))
        logger.info("MEAN over %d datasets: %.4f", len(results), mean)
    return results


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="AffectGPT-TPU evaluation")
    parser.add_argument("--input-dir", required=True, help="result root holding result-* dirs")
    parser.add_argument("--no-llm", action="store_true",
                        help="use the deterministic lexicon judge instead of the LLM")
    parser.add_argument("--cfg-path", default=None,
                        help="experiment YAML; applies its `paths:` overrides so "
                        "ground-truth label files resolve (quality_run.sh)")
    args = parser.parse_args()
    setup_logger()
    if args.cfg_path:
        from affectgpt_tpu.config import Config

        Config.from_file(args.cfg_path)
    main_zeroshot_scores(args.input_dir, use_llm=not args.no_llm)
