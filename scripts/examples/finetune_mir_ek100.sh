#!/usr/bin/env bash
# EK100 multi-instance retrieval finetune from a pretrained dual encoder.
set -euo pipefail

python -m avion_tpu.train.finetune_mir \
  model.name=CLIP_VITB16 \
  model.use_grad_checkpointing=true \
  pretrain_model="${PRETRAIN:-runs/pretrain_vitb/ckpt}" \
  data.clip_length=16 data.batch_size=512 \
  optim.optimizer=adamw optim.lr=1e-5 optim.wd=0.05 \
  optim.warmup_epochs=1 optim.epochs=100 \
  output_dir="${OUTPUT_DIR:-runs/finetune_mir}" \
  "$@"
