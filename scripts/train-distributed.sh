#!/bin/bash
# Multi-process data-parallel training launcher (same binary on every
# process; see parallel/distributed.py and README "Multi-process").
#
#   NPROCS=2 COORD=host0:29500 PROCESS_ID=0 ./scripts/train-distributed.sh
#   NPROCS=2 COORD=host0:29500 PROCESS_ID=1 ./scripts/train-distributed.sh
#
# On a CPU fleet add DIST_CPU_DEVICES=<n> for n virtual devices/process.
# model-output and the corpus must be SHARED storage (the trainer verifies
# the fleet agrees on the resume point).
set -e

: "${NPROCS:?set NPROCS (total process count)}"
: "${COORD:?set COORD (coordinator host:port)}"
: "${PROCESS_ID:?set PROCESS_ID (0..NPROCS-1)}"

python -m musicstyletransfer_tpu.cli.main \
--dist-coordinator "$COORD" \
--dist-num-processes "$NPROCS" \
--dist-process-id "$PROCESS_ID" \
${DIST_CPU_DEVICES:+--dist-num-cpu-devices "$DIST_CPU_DEVICES" --cpu} \
--batch-size 32 \
--kl-loss 1.0 \
--validation-split 0.1 \
--max-seq-len 64 \
--data "${DATA:-./work/data/guitar_bass}" \
--model-output "${MODEL_DIR:-models/distributed}" \
--out-samples "${OUT:-/tmp/out-distributed}" \
--checkpoint-frequency 1000 \
--epochs 10000 \
--optimizer adam \
--optimizer-params clip_gradient:1.0 \
--learning-rate 0.0003 \
--e-n-layers 2 \
--e-rnn-hidden-dim 256 \
--e-num-heads 8 \
--latent-dim 256 \
--d-n-layers 1 \
--d-rnn-hidden-dim 128 \
"$@"
