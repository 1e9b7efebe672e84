#!/usr/bin/env bash
# First-quality-run recipe: weights -> (auto-)convert -> preextract ->
# greedy inference -> judge -> score. The moment pretrained checkpoints
# are mounted, a MER-UniBench reproduction starts with zero engineering
# (reference flow: extract_multimodal_features_precompute.py ->
# inference_hybird.py -> evaluation.py).
#
# Real run (weights + corpus mounted):
#   export AFFECTGPT_MODEL_ROOT=/path/to/tools   # LLM/, visual/, audio/ HF dirs
#   export AFFECTGPT_DATA_ROOT=/path/to/dataset  # per-corpus layout (paths.py)
#   scripts/quality_run.sh <cfg.yaml> <dataset> [ckpt_root]
#   - weight conversion happens inside build_model (bootstrap.py) when the
#     model dirs exist: HF safetensors -> JAX pytrees, geometry from the
#     checkpoint's config.json (Qwen2.5 and Llama-2 both supported)
#   - decoding is GREEDY with fixed per-chunk seeds -> byte-reproducible runs
#
# CI staging (no pretrained assets; random tiny weights, synthetic corpus):
#   scripts/quality_run.sh --synthetic <workdir>
set -euo pipefail
cd "$(dirname "$0")/.."
REPO="$(pwd)"

PY="${PYTHON:-python}"

if [[ "${1:-}" == "--synthetic" ]]; then
    WORK="${2:?usage: quality_run.sh --synthetic <workdir>}"
    CFG=$("$PY" "$REPO/scripts/_synth_quality_setup.py" "$WORK")
    DATASET="MER2023"
    CKPT_ARGS=()
    EVAL_ARGS=(--no-llm)  # lexicon judge: no judge weights in CI
    cd "$WORK"
else
    CFG="${1:?usage: quality_run.sh <cfg.yaml> <dataset> [ckpt_root]}"
    DATASET="${2:?usage: quality_run.sh <cfg.yaml> <dataset> [ckpt_root]}"
    CKPT_ARGS=()
    [[ -n "${3:-}" ]] && CKPT_ARGS=(--ckpt_root "$3")
    EVAL_ARGS=()

    # 1) preextract features for the evaluation clips (skip-if-exists
    #    resume; limit via QUALITY_LIMIT for a quick first signal)
    for MODALITY in frame face audio; do
        "$PY" "$REPO/extract_multimodal_features_precompute.py" \
            --dataset "$DATASET" --modality "$MODALITY" \
            ${QUALITY_LIMIT:+--limit "$QUALITY_LIMIT"} || true
    done
fi

NAME=$("$PY" - "$CFG" <<'EOF'
import sys, yaml, os
cfg = yaml.safe_load(open(sys.argv[1]))
print(cfg.get("name") or os.path.splitext(os.path.basename(sys.argv[1]))[0])
EOF
)

# 2) greedy batched inference over the evaluation set
"$PY" "$REPO/inference_hybird.py" --cfg-path "$CFG" --dataset "$DATASET" \
    --greedy --batch_size "${QUALITY_BATCH:-16}" \
    --max_new_tokens "${QUALITY_NEW_TOKENS:-64}" "${CKPT_ARGS[@]}"

# 3) judge + score (LLM judge when judge weights exist, lexicon otherwise)
"$PY" "$REPO/evaluation.py" --input-dir "output/results/$NAME" \
    --cfg-path "$CFG" "${EVAL_ARGS[@]}"

echo "quality_run complete: output/results/$NAME"
