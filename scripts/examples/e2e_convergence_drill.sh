#!/usr/bin/env bash
# Live end-to-end drill on the attached TPU: synthetic seeded-x264
# dataset -> real pretrain entry with worker decode -> SIGTERM
# preemption + auto-resume -> held-out zero-shot sweep -> docs/E2E.md.
# (~30-60 min on a small host; see docs/E2E.md for a recorded run.)
set -euo pipefail

python -m avion_tpu.tools.e2e_convergence \
  --classes 32 --windows 64 --batch 32 --epochs 6 \
  --preempt-step 150 --out "${E2E_DIR:-/tmp/avion_e2e}" \
  --report docs/E2E.md "$@"
