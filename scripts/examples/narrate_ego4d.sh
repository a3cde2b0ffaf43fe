#!/usr/bin/env bash
# Pseudo-narration generation over unlabeled clips with the imported
# LaViLa narrator (second_party/lavilla_narrator/main.py analogue);
# produces the training pkl the pretrain entry consumes.
set -euo pipefail

python - "$@" <<'PY'
import glob
import sys

from avion_tpu.tools.narrator import lavila_captioner, narrate_dataset

videos = sorted(glob.glob(sys.argv[1] if len(sys.argv) > 1
                          else "data/clips/*.mp4"))
cap = lavila_captioner(checkpoint="ckpts/vclm_narrator.pt",
                       num_samples=3, max_len=77)
n = narrate_dataset(videos, cap, "narrations.pkl",
                    window_sec=4.0, stride_sec=2.0,
                    clip_length=4, crop_size=336)
print(f"{n} narrated windows -> narrations.pkl")
PY
