#!/usr/bin/env bash
# EgoNLQ grounding: extract features with a trained dual encoder, then
# train the VSLNet span head (egonlq/main.py analogue).
set -euo pipefail

python -m avion_tpu.egonlq.extract_features \
  model.name=CLIP_VITB16 \
  pretrain_model="${CKPT:-runs/pretrain_vitb/ckpt}" \
  "$@"
python -m avion_tpu.egonlq.train_nlq "$@"
