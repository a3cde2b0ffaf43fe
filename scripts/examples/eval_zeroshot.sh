#!/usr/bin/env bash
# Standalone zero-shot evaluation fan-out (the reference's --evaluate
# path): runs every suite configured via env/.env paths.
set -euo pipefail

python -m avion_tpu.eval.validate \
  model.name=CLIP_VITB16 \
  pretrain_model="${CKPT:-ckpts/avion_pretrain_lavila_vitb_best.pt}" \
  "$@"
