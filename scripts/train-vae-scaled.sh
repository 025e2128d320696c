#!/bin/bash
# Scaled VAE (BASELINE.json config #4): wider hidden/latent, longer note
# sequences, Pallas flash attention. Point --data at a large corpus (e.g. a
# Lakh MIDI subset laid out as class subdirectories).
set -e

python -m musicstyletransfer_tpu.cli.main \
--batch-size 16 \
--kl-loss 0.5 \
--validation-split 0.1 \
--max-seq-len 512 \
--data "${DATA:-./work/data/guitar_bass}" \
--model-output models/scaled \
--out-samples /tmp/out-scaled \
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
--free-bits 0.1 \
--steps-per-dispatch 4 \
"$@"
# --remat removed in round 3: the measured sweep (scripts/mfu-sweep.py)
# shows remat costs 23-29% at this size — activations fit HBM, recompute
# buys nothing. Pass --remat yourself for bigger variants that OOM.
# --steps-per-dispatch 4: per-dispatch host cost through the tunnel grew
# to ~9.5 ms for this program class (device op time unchanged at 11.65
# ms/step — BASELINE.md "dispatch-cost shift"); 4 steps per program
# amortizes it to noise. Exact same semantics as 4 single steps.
# --kl-anneal-steps 2000 --free-bits 0.1: same documented divergence
# as train-vae.sh — the plain objective measurably collapses the
# latent at this scale (KL 0.001 on the round-3 scaled run;
# BASELINE.md scaled-run footnote). Pass --kl-anneal-steps 0
# --free-bits 0 for the bare reference objective.
