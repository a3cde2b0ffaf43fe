#!/usr/bin/env bash
# K400 VideoMAE finetune (main_videomae_finetune.py recipe: EMA,
# layer-wise LR decay, RandAugment + RandomErasing, 5x3-view test).
set -euo pipefail

python -m avion_tpu.train.videomae_finetune \
  model.name=VIDEOMAE_VITB16_FT \
  data.dataset=kinetics \
  data.clip_length=16 \
  data.batch_size=1024 \
  data.num_workers=8 \
  optim.optimizer=adamw optim.lr=1e-3 optim.wd=0.05 \
  optim.layer_decay=0.75 optim.warmup_epochs=5 optim.epochs=75 \
  pretrain_model="${PRETRAIN:-runs/videomae_pretrain/ckpt}" \
  output_dir="${OUTPUT_DIR:-runs/videomae_finetune}" \
  "$@"
