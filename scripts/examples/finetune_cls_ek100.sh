#!/usr/bin/env bash
# EK100 action-classification finetune (main_lavila_finetune_cls.py
# recipe: VideoClassifier head, mixup/cutmix, LR x batch/128).
set -euo pipefail

python -m avion_tpu.train.finetune_cls \
  model.name=CLIP_VITB16 \
  model.use_grad_checkpointing=true \
  data.dataset=ek100_cls \
  data.clip_length=16 \
  data.batch_size=512 \
  data.num_workers=8 \
  optim.optimizer=sgd optim.lr=0.012 optim.wd=4e-5 \
  optim.warmup_epochs=2 optim.epochs=100 \
  pretrain_model="${PRETRAIN:-runs/pretrain_vitb/ckpt}" \
  output_dir="${OUTPUT_DIR:-runs/finetune_cls}" \
  "$@"
