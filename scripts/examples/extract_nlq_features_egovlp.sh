#!/usr/bin/env bash
# NLQ feature extraction with the LEGACY EgoVLP dual encoder
# (FrozenInTime + RoBERTa) from a released EgoVLP checkpoint —
# compatibility path beside the native extractor (egonlq/features.py).
# Query text is tokenized in-repo (data/roberta_tokenizer.py) from a
# local HF-format directory — no hub access needed.
# Reference: egonlq/model/model.py + extract_features.py.
set -euo pipefail

CKPT="${EGOVLP_CKPT:-ckpts/egovlp.pth}"            # released .pth
TOKENIZER="${ROBERTA_TOKENIZER:-ckpts/roberta_tok}" # vocab.json+merges.txt
ANNOTATIONS="${NLQ_ANNOTATIONS:-data/nlq_train.json}"
VIDEO_ROOT="${NLQ_VIDEO_ROOT:-data/nlq_videos}"
OUT="${NLQ_FEATURE_DIR:-features/egovlp}"

python -m avion_tpu.egonlq.extract_features \
    --legacy --ckpt "${CKPT}" --tokenizer-dir "${TOKENIZER}" \
    --annotations "${ANNOTATIONS}" --video-root "${VIDEO_ROOT}" \
    --out "${OUT}" --clip-length 4 "$@"
