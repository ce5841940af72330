#!/usr/bin/env bash
# SLURM training launch (parity with the reference's tools/scripts/slurm_train.sh):
#   slurm_train.sh <partition> <job_name> <num_procs> --cfg_file <yaml> [extra args]
# One srun task per host/chip-group; each task runs tools/train.py --multihost,
# which derives the jax.distributed coordinator from the SLURM node list and
# the free port picked here (com_tpu/parallel/mesh.py:init_multihost — the
# role of the reference's init_dist_slurm, common_utils.py:154-168).
set -x

PARTITION=$1
JOB_NAME=$2
NPROCS=$3
PY_ARGS=${@:4}

TASKS_PER_NODE=${TASKS_PER_NODE:-1}
CPUS_PER_TASK=${CPUS_PER_TASK:-16}
SRUN_ARGS=${SRUN_ARGS:-""}

while true
do
    PORT=$(( ((RANDOM<<15)|RANDOM) % 49152 + 10000 ))
    status="$(nc -z 127.0.0.1 $PORT < /dev/null &>/dev/null; echo $?)"
    if [ "${status}" != "0" ]; then
        break;
    fi
done
echo $PORT

srun -p ${PARTITION} \
    --job-name=${JOB_NAME} \
    --ntasks=${NPROCS} \
    --ntasks-per-node=${TASKS_PER_NODE} \
    --cpus-per-task=${CPUS_PER_TASK} \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python -u tools/train.py --multihost --tcp_port $PORT ${PY_ARGS}
