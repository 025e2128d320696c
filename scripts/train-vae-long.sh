#!/bin/bash
# Long-sequence VAE with sequence-parallel ring attention: the time axis
# shards over the mesh's model axis (--tp carries the ring) and K/V chunks
# rotate via ppermute (ops/ring_attention.py). Any max-seq-len works (the
# ring pads the time axis internally); 2046 keeps the decoder's T = L+2 at
# a round 2048.
# On a single chip the ring is ineligible and the stacks fall back to the
# HBM-streaming flash kernel — same command, graceful degradation (TP
# defaults to 1 so the command runs anywhere; set TP=2.. on a multi-chip
# host to engage the ring — make_mesh rejects TP > device count).
# Single-chip step-time table for these lengths: BASELINE.md
# "Long-sequence training".
set -e

python -m musicstyletransfer_tpu.cli.main \
--batch-size 4 \
--kl-loss 0.5 \
--validation-split 0.1 \
--max-seq-len 2046 \
--data "${DATA:-./work/data/guitar_bass}" \
--model-output models/long \
--out-samples /tmp/out-long \
--sampling-frequency 2000 \
--checkpoint-frequency 1000 \
--num-checkpoints-not-improved 32 \
--epochs 10000 \
--optimizer adam \
--optimizer-params clip_gradient:1.0 \
--learning-rate 0.0002 \
--e-n-layers 4 \
--e-dropout 0.1 \
--e-rnn-hidden-dim 512 \
--e-num-heads 8 \
--latent-dim 512 \
--d-n-layers 2 \
--d-rnn-hidden-dim 256 \
--d-dropout 0.1 \
--use-flash-attention \
--kl-anneal-steps 2000 \
--free-bits 0.02 \
--ring-attention \
--tp "${TP:-1}" \
"$@"
# --kl-anneal-steps 2000 --free-bits 0.02: same documented divergence
# family as train-vae.sh (the plain objective collapses the latent),
# but with a SMALLER floor than the corpus-scale scripts' 0.1 — at
# L=2046 the 51-nat floor (0.1 x 512 dims) hands the latent enough
# capacity to override the class conditioning: transfers keep the
# SOURCE register. 0.02 flips register to the target AND improves
# teacher-forced quality (both operating points measured, BASELINE.md
# round-4 long-sequence rerun). Pass --kl-anneal-steps 0 --free-bits 0
# for the bare reference objective.
