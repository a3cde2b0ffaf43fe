#!/usr/bin/env bash
# Fan a training command out to every worker of a Cloud TPU pod slice.
# The torchrun/sbatch analogue for this framework: every host runs the
# same entry point; jax.distributed + the mesh handle the rest.
#
# Usage:
#   ./scripts/launch_tpu_pod.sh TPU_NAME ZONE -- \
#       python -m avion_tpu.train.pretrain_clip data.root=gs://... ...
set -euo pipefail

TPU_NAME=$1; shift
ZONE=$1; shift
[ "$1" == "--" ] && shift

gcloud compute tpus tpu-vm ssh "$TPU_NAME" \
  --zone="$ZONE" \
  --worker=all \
  --command="cd $(pwd) && $*"
