#!/usr/bin/env bash
# Multi-host training launch (role of the reference's dist_train.sh /
# slurm_train.sh NCCL launchers).  On TPU pod slices, run the same command on
# every host — jax.distributed.initialize() discovers the topology from the
# TPU runtime; on GCE:
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all \
#     --command="cd /path/to/repo && bash tools/scripts/multihost_train.sh $CFG"
set -euo pipefail
CFG=${1:?usage: multihost_train.sh <cfg_file> [extra args...]}
shift || true
python tools/train.py --cfg_file "$CFG" --multihost "$@"
