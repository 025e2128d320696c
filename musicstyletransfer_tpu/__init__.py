"""musicstyletransfer_tpu: a TPU-native (JAX/XLA/Pallas/pjit) MIDI music
style-transfer framework.

Capability parity target: slyforce/MusicStyleTransfer (see SURVEY.md).
The architecture is idiomatic JAX, not a translation:

- ``midi``      — event vocabulary, SMF byte codec, MIDI<->token streams
                  (reference: music_style_transfer/MIDIUtil/*).
- ``data``      — corpus loading, tensorization, static-shape batching
                  (reference: VarAutoEncoder/data.py).
- ``models``    — class-conditional sequence-VAE transformer (flax.linen)
                  (reference: VarAutoEncoder/model.py, transformer.py).
- ``ops``       — Pallas TPU kernels for the hot paths.
- ``parallel``  — jax.sharding mesh / pjit partitioning rules.
- ``training``  — losses, metrics, fused jitted train step, trainer loop,
                  checkpointing (reference: trainer.py, loss.py, metrics.py).
- ``inference`` — on-device autoregressive decoding (lax.while_loop + KV
                  cache), style transfer, samplers (reference: sampler.py).
- ``cli``       — argparse surface and entry points (reference: config.py,
                  main.py).
"""

__version__ = "0.1.0"
