#!/usr/bin/env bash
# One-command released-weight validation (VERDICT r2 #6): download the
# reference's released checkpoints, run the zero-shot EK100-MIR suite
# on each, and print the measured numbers next to the reference's
# published MODEL_ZOO values.  The import path itself is pinned offline
# by full-scale fabricated-checkpoint parity tests
# (tests/test_torch_numerics_parity.py), so any deviation here
# localizes to data/eval, not the weight remap.
#
# Prerequisites (same env vars the reference reads via dotenv):
#   ROOT_VAL         EK100 video dir (320p 15s chunks)
#   VAL_METADATA     EPIC_100_retrieval_test.csv
#   RELEVANCY_PATH   caption_relevancy_EPIC_100_retrieval_test.pkl
#
# Usage: scripts/validate_zoo.sh [CKPT_DIR]
set -euo pipefail

DEST="${1:-checkpoints}"
SELF="$(cd "$(dirname "$0")" && pwd)"

"$SELF/download_checkpoints.sh" "$DEST"

run() { # ckpt model frames expected
  echo "============================================================"
  echo "checkpoint: $1   model: $2"
  echo "reference (docs/MODEL_ZOO.md): $4"
  python -m avion_tpu.eval.validate \
      pretrain_model="$DEST/$1" model.name="$2" \
      data.clip_length="$3" data.chunk_len=15
}

# zero-shot EK100-MIR of the released pretrain checkpoints
# (avg mAP reported as V->T/T->V; reference eval:
#  scripts/main_lavila_pretrain.py --evaluate)
run avion_pretrain_baseline_vitb_best.pt CLIP_VITB16 16 \
    "mAP 27.5/28.4  nDCG 29.1/29.5"
run avion_pretrain_lavila_vitb_best.pt CLIP_VITB16 16 \
    "mAP 31.1/32.9  nDCG 31.9/32.7"
run avion_pretrain_lavila_vitl_best.pt CLIP_VITL14 16 \
    "mAP 36.4/37.6  nDCG 35.1/35.3"

# finetuned MIR checkpoints (max-margin heads; same suite)
run avion_finetune_mir_lavila_vitb_best.pt CLIP_VITB16 16 \
    "avg mAP 52.0  avg nDCG 66.5"
run avion_finetune_mir_lavila_vitl_best.pt CLIP_VITL14 16 \
    "avg mAP 54.5  avg nDCG 69.0"
