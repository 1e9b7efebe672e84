"""Compare two inference result dumps (ours vs the reference's).

Quality-parity tooling for when pretrained weights/corpora are mounted:
takes two `{epoch}.npz` result files (name2reason or filenames/fileitems
format — both sides use the same contract) and reports per-sample text
agreement plus label-level agreement after judge extraction, so
greedy-decode parity against the PyTorch reference can be quantified
(SURVEY §7 'bit-comparable labels' is defined at fixed-seed/greedy +
metric-level equivalence).

Usage:
  python compare_outputs.py --ours out/result-mer2023/5.npz \
      --reference ref/result-mer2023/5.npz [--no-llm]
"""

from __future__ import annotations

import argparse

import numpy as np

from affectgpt_tpu.evaluation.ew_metric import load_name2reason
from affectgpt_tpu.utils.logging import logger, setup_logger


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--ours", required=True)
    parser.add_argument("--reference", required=True)
    parser.add_argument("--no-llm", action="store_true")
    args = parser.parse_args()
    setup_logger()

    ours = load_name2reason(args.ours)
    ref = load_name2reason(args.reference)
    common = sorted(set(ours) & set(ref))
    logger.info("%d common clips (%d ours, %d reference)", len(common), len(ours), len(ref))
    if not common:
        return

    exact = sum(str(ours[n]).strip() == str(ref[n]).strip() for n in common)
    logger.info("exact text match: %d/%d (%.1f%%)", exact, len(common), 100 * exact / len(common))

    # label-level agreement through the judge
    import evaluation

    judge = evaluation.build_judge(use_llm=not args.no_llm)
    ours_labels = judge.reason_to_openset([str(ours[n]) for n in common])
    ref_labels = judge.reason_to_openset([str(ref[n]) for n in common])

    from affectgpt_tpu.data.datasets import string_to_list

    agree, jaccard = 0, []
    for a, b in zip(ours_labels, ref_labels):
        sa, sb = set(string_to_list(a)), set(string_to_list(b))
        agree += sa == sb
        union = sa | sb
        jaccard.append(len(sa & sb) / len(union) if union else 1.0)
    logger.info(
        "label-set agreement: %d/%d exact, mean Jaccard %.3f",
        agree, len(common), float(np.mean(jaccard)),
    )


if __name__ == "__main__":
    main()
