#!/usr/bin/env bash
# Live end-to-end drill on the attached TPU: synthetic learnable
# dataset -> real training entry with worker decode -> SIGTERM
# preemption + auto-resume -> held-out eval from the restored
# checkpoint -> docs/E2E*.md report.
#
# One family per invocation; every training entry has one:
#   (default)          pretrain_clip      -> docs/E2E.md
#   --family videomae  videomae_pretrain  -> docs/E2E_VIDEOMAE.md
#   --family cls       finetune_cls       -> docs/E2E_CLS.md
#   --family mir       finetune_mir       -> docs/E2E_MIR.md
#   --family nlq       egonlq/train_nlq   -> docs/E2E_NLQ.md
# Family defaults (classes/windows/batch/epochs/preempt step/report)
# live in tools/e2e_convergence.py:_FAMILY_DEFAULTS; flags override.
# (~30-60 min decode-bound on a small host for the video families;
# minutes for nlq. See the docs/E2E*.md files for recorded runs.)
set -euo pipefail

# E2E_DIR overrides the per-family default output dir
python -m avion_tpu.tools.e2e_convergence \
  ${E2E_DIR:+--out "$E2E_DIR"} "$@"
