#!/usr/bin/env bash
# Production inference server (docs/SERVING.md): embeddings, similarity
# and narration over HTTP with request micro-batching.
set -euo pipefail

python -m avion_tpu.serve \
  model.name=CLIP_VITB16 \
  pretrain_model="${CKPT:-runs/pretrain_vitb/ckpt}" \
  --port "${PORT:-8080}" \
  "$@"
