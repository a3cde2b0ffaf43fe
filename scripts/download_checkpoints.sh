#!/usr/bin/env bash
# Zoo bootstrap: fetch the reference's released AVION checkpoints and
# convert each .pt into this framework's orbax layout so eval/finetune
# entries can consume them directly.
#
# Counterpart of the reference's scripts/download_checkpoints.sh
# (same released artifacts, URLs from docs/MODEL_ZOO.md); adds the
# .pt -> orbax conversion step (tools/convert_checkpoint.py).
#
# Usage: scripts/download_checkpoints.sh [DEST_DIR]
set -euo pipefail

DEST="${1:-checkpoints}"
mkdir -p "$DEST"
cd "$DEST"

fetch() { # url, name
  if [ ! -f "$2" ]; then
    wget -q --show-progress "$1" -O "$2"
  fi
}

# EPIC-KITCHENS pretrain (dual encoder)
fetch https://utexas.box.com/shared/static/yp1krj3dsmr8wj0sz01t10bwa9fgq3zy.pt avion_pretrain_baseline_vitb_best.pt
fetch https://utexas.box.com/shared/static/e681nrxivc9makufvrumrfuaopk57h4n.pt avion_pretrain_lavila_vitb_best.pt
fetch https://utexas.box.com/shared/static/1iatmrs7ufdeooce09a61t1n6wsouf4l.pt avion_pretrain_lavila_vitl_best.pt

# Fine-tune (CLS)
fetch https://utexas.box.com/shared/static/2fkvtc67m0f82wmm5cnqfo7wg951lobv.pt avion_finetune_cls_lavila_vitb_best.pt
fetch https://utexas.box.com/shared/static/crnqo9bu0owtfz4yc1yqf8hz6g0ze39b.pt avion_finetune_cls_lavila_vitl_best.pt

# Fine-tune (MIR)
fetch https://utexas.box.com/shared/static/ke5kwfixttb4t7uxdbs9gmiiuu1582dg.pt avion_finetune_mir_lavila_vitb_best.pt
fetch https://utexas.box.com/shared/static/m7f65hg9eonz34g0l2x5r0t92ouh0u4w.pt avion_finetune_mir_lavila_vitl_best.pt

# Kinetics (VideoMAE)
fetch https://utexas.box.com/shared/static/61vjh8k4q3ia8wlns0rmkbnazzxipua9.pt avion_videomae_pretrain_vitb.pt
fetch https://utexas.box.com/shared/static/p9tigkrop86f60ae6o85nbxfwh53dghm.pt avion_videomae_finetune_vitb_best.pt

cd - >/dev/null

# Convert to this framework's orbax layout (CLIP checkpoints; VideoMAE
# converts through the videomae importer).
for name in avion_pretrain_baseline_vitb avion_pretrain_lavila_vitb \
            avion_finetune_mir_lavila_vitb; do
  python -m avion_tpu.tools.convert_checkpoint import \
    --src "$DEST/${name}_best.pt" --dst "$DEST/${name}_orbax" \
    --model CLIP_VITB16 || echo "convert failed for $name (keep .pt)"
done
for name in avion_pretrain_lavila_vitl avion_finetune_mir_lavila_vitl; do
  python -m avion_tpu.tools.convert_checkpoint import \
    --src "$DEST/${name}_best.pt" --dst "$DEST/${name}_orbax" \
    --model CLIP_VITL14 || echo "convert failed for $name (keep .pt)"
done

echo "checkpoints ready under $DEST/"
echo "zero-shot eval: python -m avion_tpu.eval.validate \\"
echo "  model.name=CLIP_VITB16 pretrain_model=$DEST/avion_pretrain_lavila_vitb_best.pt"
