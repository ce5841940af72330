#!/usr/bin/env bash
# SLURM evaluation launch (parity with the reference's slurm_test_mgpu.sh):
#   slurm_test.sh <partition> <num_procs> --cfg_file <yaml> --ckpt <pth> [...]
set -x

PARTITION=$1
NPROCS=$2
PY_ARGS=${@:3}
JOB_NAME=eval

TASKS_PER_NODE=${TASKS_PER_NODE:-1}
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
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python -u tools/test.py --multihost --tcp_port $PORT ${PY_ARGS}
