#!/bin/bash
# GAN training run with the reference's hyperparameters
# (reference: scripts/train.sh:5-23 — its entry module
# music_style_transfer.GAN.main is absent from the reference repo;
# cli/gan.py reconstructs it, see models/gan.py).
set -euo pipefail
cd "$(dirname "$0")/.."

DATA="${DATA:-work/data/guitar_bass}"

python -m musicstyletransfer_tpu.cli.gan \
  --batch-size 32 \
  --out-samples /tmp/mst-gan-out \
  --max-seq-len 64 \
  --slices-per-quarter-note 4 \
  --data "$DATA" \
  --sampling-frequency 50 \
  --epochs 10000 \
  --discriminator-update-steps 5 \
  --model-output models/gan \
  --g-learning-rate 0.00005 \
  --g-n-layers 1 \
  --g-rnn-hidden-dim 256 \
  --g-emb-hidden-dim 256 \
  --noise-dim 64 \
  --d-learning-rate 0.00005 \
  --d-n-layers 1 \
  --d-rnn-hidden-dim 256 \
  --d-emb-hidden-dim 256 \
  "$@"
