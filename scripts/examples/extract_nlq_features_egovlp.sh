#!/usr/bin/env bash
# NLQ feature extraction with the LEGACY EgoVLP dual encoder
# (FrozenInTime + RoBERTa) from a released EgoVLP checkpoint —
# compatibility path beside the native extractor (egonlq/features.py).
# Reference: egonlq/model/model.py + extract_features.py.
set -euo pipefail

CKPT="${EGOVLP_CKPT:-ckpts/egovlp.pth}"          # released .pth
TOKENIZER="${ROBERTA_TOKENIZER:-}"                # local HF dir (optional)
VIDEO_ROOT="${NLQ_VIDEO_ROOT:-data/nlq_videos}"
OUT="${NLQ_FEATURE_DIR:-features/egovlp}"

python - "$@" << PY
import json, os, sys
from avion_tpu.egonlq.egovlp import (EgoVLPFeatureExtractor,
                                     load_egovlp_checkpoint)

model, params = load_egovlp_checkpoint("${CKPT}", num_frames=4)
tok = None
if "${TOKENIZER}":
    from transformers import AutoTokenizer
    tok = AutoTokenizer.from_pretrained("${TOKENIZER}")
ex = EgoVLPFeatureExtractor(model, params, tokenizer=tok)
samples = [json.loads(l) for l in open(os.environ.get(
    "NLQ_SAMPLES", "data/nlq_samples.jsonl"))]
ex.extract_to_dir(samples, "${VIDEO_ROOT}", "${OUT}")
print("features ->", "${OUT}")
PY
