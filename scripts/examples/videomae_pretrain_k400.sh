#!/usr/bin/env bash
# VideoMAE ViT-B pretrain on Kinetics-400, 800 epochs, 90% tube masking
# (main_videomae_pretrain.py defaults).
set -euo pipefail

python -m avion_tpu.train.videomae_pretrain \
  model.name=VIDEOMAE_VITB16 \
  model.use_grad_checkpointing=true \
  data.clip_length=16 data.clip_stride=4 \
  data.mask_ratio=0.9 \
  data.batch_size=512 data.num_workers=8 \
  optim.optimizer=adamw optim.lr=1.5e-4 optim.wd=0.05 \
  optim.betas=0.9,0.95 optim.warmup_epochs=40 optim.epochs=800 \
  save_freq=20 \
  output_dir="${OUTPUT_DIR:-runs/videomae_pretrain}" \
  "$@"
