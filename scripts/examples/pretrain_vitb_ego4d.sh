#!/usr/bin/env bash
# Ego4D ViT-B/16 dual-encoder pretrain — the reference's headline config
# (submit/raven/lavilla/lavilla_vitb.sh analogue). Run on every pod
# worker (scripts/launch_tpu_pod.sh) or a single host.
set -euo pipefail

# From-scratch runs (no reference-weight import) go ~15% faster with
# the TPU head geometry + the batch-256 HBM levers:
#   model.name=CLIP_VITB16_H128 model.input_norm=openai \
#   optim.state_dtype=bfloat16
# (H128 fits b256 with the default save_attn policy — docs/PERF.md;
# the 12-head CLIP_VITB16 needs model.remat_policy=save_attn_k10 at
# b256.  Keep CLIP_VITB16 when importing 12-head weights.)
python -m avion_tpu.train.pretrain_clip \
  model.name=CLIP_VITB16 \
  model.use_grad_checkpointing=true \
  model.use_flash_attn=true \
  data.dataset=ego4d \
  data.batch_size=2048 \
  data.clip_length=4 \
  data.crop_size=224 \
  data.scale_min=0.5 data.scale_max=1.0 \
  data.num_workers=8 data.decode_threads=4 \
  optim.optimizer=adamw optim.lr=4e-5 optim.wd=0.05 \
  optim.betas=0.9,0.999 optim.warmup_epochs=1 optim.epochs=5 \
  optim.grad_clip_norm=1.0 \
  local_loss=true \
  output_dir="${OUTPUT_DIR:-runs/pretrain_vitb}" \
  "$@"
