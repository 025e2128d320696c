"""Legacy LSTM decoder variant (feature parity with the reference's
LSTMDecoder, model.py:131-203).

The latent+class conditioning enters through the initial (h, c) state:
``latent2hid(z) + class_emb(class)`` produces 2*hidden features split into
h0 and c0, repeated across layers (reference: model.py:155-167). Unlike the
transformer decoder there is no prepended conditioning position, so the
training output aligns with the labels directly.

Presents the same (``__call__``, ``prefill``, ``step_token``) surface as the
transformer ``VAEDecoder`` so the jitted decode loop (inference/decode.py)
works unchanged — the "cache" pytree is the tuple of per-layer LSTM
carries.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .config import DecoderConfig, LSTMConfig


class LSTMDecoder(nn.Module):
    config: DecoderConfig
    dtype: Any = jnp.float32

    def setup(self) -> None:
        c = self.config
        lc = c.lstm_config or LSTMConfig()
        self.lstm_cfg = lc
        H = lc.hidden_dim
        self.latent2hid = nn.Dense(2 * H, dtype=self.dtype, name="latent2hid")
        self.class_emb = nn.Embed(c.num_classes, 2 * H, dtype=self.dtype,
                                  name="class_emb")
        self.token_emb = nn.Embed(c.output_dim, H, dtype=self.dtype,
                                  name="token_emb")
        self.rnns = [
            nn.RNN(nn.OptimizedLSTMCell(H, dtype=self.dtype), name=f"rnn{i}")
            for i in range(lc.n_layers)
        ]
        self.drop = nn.Dropout(lc.dropout)
        self.output_layer = nn.Dense(c.output_dim, dtype=jnp.float32,
                                     name="output_layer")

    def _initial_carries(self, z: jax.Array, classes: jax.Array):
        """Per-layer (c, h) carries from latent+class (model.py:155-167).

        The reference splits the 2H transform into [h, c] and repeats the
        same pair for every layer.
        """
        transform = self.latent2hid(z.astype(self.dtype)) + self.class_emb(classes)
        h0, c0 = jnp.split(transform, 2, axis=-1)
        return tuple((c0, h0) for _ in range(self.lstm_cfg.n_layers))

    def __call__(
        self,
        tokens: jax.Array,
        seq_lens: jax.Array,
        z: jax.Array,
        classes: jax.Array,
        train: bool,
    ) -> jax.Array:
        """tokens: SOS-prefixed [B, L+1]; returns logits [B, L+1, V].

        seq_lens is unused: like the reference LSTM path, padded positions
        are processed and masked by the loss.
        """
        del seq_lens
        x = self.token_emb(tokens)
        carries = self._initial_carries(z, classes)
        for i, rnn in enumerate(self.rnns):
            x = rnn(x, initial_carry=carries[i])
            if i + 1 < len(self.rnns):
                x = self.drop(x, deterministic=not train)
        return self.output_layer(x.astype(jnp.float32))

    # --- incremental decoding (same surface as VAEDecoder) --------------

    def prefill(self, z: jax.Array, classes: jax.Array, max_len: int):
        del max_len  # carries are O(1); no sequence-length cache needed
        return self._initial_carries(z, classes)

    def step_token(
        self, token_t: jax.Array, cache, t: jax.Array, classes=None
    ) -> Tuple[jax.Array, Any]:
        # t: recurrent state carries all positional context. classes: the
        # LSTM only supports initial-state conditioning (StyleVAE.setup
        # rejects per_step + lstm), so the argument is accepted for surface
        # uniformity with VAEDecoder.step_token and ignored.
        del t, classes
        x = self.token_emb(token_t)
        new_carries = []
        for i, rnn in enumerate(self.rnns):
            carry, x = rnn.cell(cache[i], x)
            new_carries.append(carry)
        return self.output_layer(x.astype(jnp.float32)), tuple(new_carries)
