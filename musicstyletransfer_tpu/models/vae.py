"""Class-conditional sequence VAE (encoder, decoder, model).

Reference: VarAutoEncoder/model.py:57-296. Divergences (per SURVEY.md §7):

- the latent head emits (mu, **logvar**) instead of an unconstrained
  "stddev" (fixes §8.3); sampling uses sigma = exp(0.5 * logvar);
- the decoder is causal in training (fixes §8.5) and returns **logits**
  (the loss applies log-softmax; the reference softmaxes then logs,
  loss.py:19-21);
- incremental decoding uses explicit static-shape KV caches so sampling is
  one jitted on-device loop (replaces DecoderState, model.py:107-128).

Shapes follow the reference data layout: ``tokens`` are SOS-prefixed
[B, L+1]; the decoder prepends a conditioning state built from
``latent2hid(z) + class_emb(class)`` (reference: model.py:229-232) giving
[B, L+2] positions; position 0's output is dropped so predictions align
with labels [B, L+1] (reference: model.py:250-257).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..midi.vocab import PAD_ID
from .config import DecoderConfig, EncoderConfig, ModelConfig
from .transformer import Cache, TransformerStack


def _dtype(name: str) -> Any:
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


def _embed_tokens_mxu(emb: nn.Embed, tokens: jax.Array, dtype) -> jax.Array:
    """Batched token-embedding lookup as a one-hot matmul.

    nn.Embed's take/scatter-add pair profiles at ~5% of the scaled train
    step on v5e (the backward scatter-add serializes); the one-hot
    contraction rides the MXU instead, and its backward is another matmul
    (one_hot^T @ g). Numerically exact for the forward (each output row
    multiplies the table by 1.0 exactly once, f32 accumulation); only used
    on the big [B, T] training lookups — scalar-per-step decode lookups
    keep the gather."""
    table = jnp.asarray(emb.embedding, dtype)
    oh = jax.nn.one_hot(tokens, table.shape[0], dtype=dtype)
    return jnp.dot(oh, table, preferred_element_type=jnp.float32).astype(dtype)


class VAEEncoder(nn.Module):
    """Token+class embeddings -> transformer -> position-0 state -> (mu, logvar).

    Reference: model.py:57-104 (Encoder).
    """

    config: EncoderConfig
    dtype: Any = jnp.float32

    def setup(self) -> None:
        c = self.config
        d = c.transformer_config.model_size
        self.token_emb = nn.Embed(c.input_dim, d, dtype=self.dtype, name="token_emb")
        self.class_emb = nn.Embed(c.num_classes, d, dtype=self.dtype, name="class_emb")
        self.encoder = TransformerStack(
            config=c.transformer_config, causal=False, dtype=self.dtype, name="encoder"
        )
        self.latent_proj = nn.Dense(2 * c.latent_dim, dtype=jnp.float32,
                                    name="latent_proj")

    def __call__(
        self, tokens: jax.Array, classes: jax.Array, train: bool
    ) -> Tuple[jax.Array, jax.Array]:
        key_mask = tokens != PAD_ID  # reference: model.py:81-83
        x = _embed_tokens_mxu(self.token_emb, tokens, self.dtype) + (
            self.class_emb(classes)[:, None, :]
        )
        h = self.encoder(x, key_mask, train)
        h0 = h[:, 0, :]  # position-0 readout (reference: model.py:97)
        mu, logvar = jnp.split(self.latent_proj(h0.astype(jnp.float32)), 2, axis=-1)
        # Clamp logvar: exp(logvar) feeds both the KL and the
        # reparameterized sigma, so an unconstrained head is an overflow
        # channel — one spike batch pushes a dim's logvar up, exp() goes
        # inf in f32, and the whole run NaNs (observed at the wide config,
        # BASELINE.md round-5 wide rerun). +/-8 spans sigma in
        # [0.018, 54.6], far beyond any useful posterior, and is the
        # identity for healthy values. (The reference's head is even less
        # constrained — raw "stddev" with no positivity, model.py:100-104.)
        logvar = jnp.clip(logvar, -8.0, 8.0)
        return mu, logvar


class VAEDecoder(nn.Module):
    """Conditioning-state-prepended causal transformer decoder -> logits.

    Reference: model.py:206-272 (Decoder).
    """

    config: DecoderConfig
    dtype: Any = jnp.float32

    def setup(self) -> None:
        c = self.config
        d = c.transformer_config.model_size
        self.latent2hid = nn.Dense(d, dtype=self.dtype, name="latent2hid")
        self.class_emb = nn.Embed(c.num_classes, d, dtype=self.dtype, name="class_emb")
        self.token_emb = nn.Embed(c.output_dim, d, dtype=self.dtype, name="token_emb")
        self.decoder = TransformerStack(
            config=c.transformer_config, causal=True, dtype=self.dtype, name="decoder"
        )
        self.output_layer = nn.Dense(c.output_dim, dtype=jnp.float32,
                                     name="output_layer")

    def initial_state(self, z: jax.Array, classes: jax.Array) -> jax.Array:
        """[B, D] conditioning embedding (reference: model.py:229-232)."""
        return self.latent2hid(z.astype(self.dtype)) + self.class_emb(classes)

    @property
    def per_step_conditioning(self) -> bool:
        return getattr(self.config, "class_conditioning", "initial") == "per_step"

    def _step_bias(self, classes: Optional[jax.Array]) -> jax.Array:
        """Per-position class-embedding bias (class_conditioning="per_step")."""
        assert classes is not None, (
            "class_conditioning='per_step' decoders need the classes array "
            "at every decode step"
        )
        return self.class_emb(classes)

    def __call__(
        self,
        tokens: jax.Array,
        seq_lens: jax.Array,
        z: jax.Array,
        classes: jax.Array,
        train: bool,
    ) -> jax.Array:
        """tokens: SOS-prefixed [B, L+1]; returns logits [B, L+1, V]."""
        init = self.initial_state(z, classes)[:, None, :]  # [B, 1, D]
        tok = _embed_tokens_mxu(self.token_emb, tokens, self.dtype)
        if self.per_step_conditioning:
            tok = tok + self._step_bias(classes)[:, None, :]
        x = jnp.concatenate([init, tok], axis=1)  # [B, L+2, D]
        # Valid positions: conditioning state + seq_lens real tokens
        # (reference: model.py:246-247 masks to seq_length + 1).
        positions = jnp.arange(x.shape[1])
        key_mask = positions[None, :] < (seq_lens[:, None] + 1)
        h = self.decoder(x, key_mask, train)
        h = h[:, 1:, :]  # drop the conditioning position (model.py:253)
        return self.output_layer(h.astype(jnp.float32))

    # --- incremental decoding -------------------------------------------

    def step_embedded(
        self, x_t: jax.Array, cache: Cache, t: jax.Array
    ) -> Tuple[jax.Array, Cache]:
        """One decode position from an already-embedded input [B, D]."""
        h_t, cache = self.decoder.step(x_t, cache, t)
        return self.output_layer(h_t.astype(jnp.float32)), cache

    def step_token(
        self,
        token_t: jax.Array,
        cache: Cache,
        t: jax.Array,
        classes: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Cache]:
        """One decode position from token ids [B]. ``classes`` is required
        (and used) only under per-step class conditioning."""
        x_t = self.token_emb(token_t)
        if self.per_step_conditioning:
            x_t = x_t + self._step_bias(classes)
        return self.step_embedded(x_t, cache, t)

    def step_ragged(
        self,
        token_t: jax.Array,
        cache: Cache,
        t: jax.Array,
        classes: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Cache]:
        """One decode position with PER-ROW positions ``t`` [S] — the
        continuous-batching engine's slots (inference/streaming.py)."""
        x_t = self.token_emb(token_t)
        if self.per_step_conditioning:
            x_t = x_t + self._step_bias(classes)
        h_t, cache = self.decoder.step_ragged(x_t, cache, t)
        return self.output_layer(h_t.astype(jnp.float32)), cache

    def prefill(self, z: jax.Array, classes: jax.Array, max_len: int) -> Cache:
        """Build the cache and process position 0 (the conditioning state).

        Position 0's prediction is dropped in training (model.py:253) and is
        likewise unused here: generation starts by feeding SOS at position 1,
        whose logits predict the first real token.
        """
        cache = self.decoder.init_cache(z.shape[0], max_len, dtype=self.dtype)
        x0 = self.initial_state(z, classes)
        _, cache = self.step_embedded(x0, cache, jnp.asarray(0))
        return cache


class StyleVAE(nn.Module):
    """Encoder + reparameterized sampling + decoder (reference: model.py:275-296)."""

    config: ModelConfig

    def setup(self) -> None:
        dt = _dtype(self.config.dtype)
        self.encoder = VAEEncoder(config=self.config.encoder_config, dtype=dt,
                                  name="encoder")
        if self.config.decoder_config.decoder_type == "lstm":
            if getattr(self.config.decoder_config, "class_conditioning",
                       "initial") != "initial":
                raise ValueError(
                    "class_conditioning='per_step' requires the transformer "
                    "decoder (the legacy LSTM keeps the reference's "
                    "initial-state conditioning)"
                )
            from .lstm import LSTMDecoder

            self.decoder = LSTMDecoder(
                config=self.config.decoder_config, dtype=dt, name="decoder"
            )
        else:
            self.decoder = VAEDecoder(
                config=self.config.decoder_config, dtype=dt, name="decoder"
            )

    def __call__(
        self,
        tokens: jax.Array,
        seq_lens: jax.Array,
        classes: jax.Array,
        train: bool = True,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        mu, logvar = self.encoder(tokens, classes, train)
        if train:
            eps = jax.random.normal(self.make_rng("sample"), mu.shape, mu.dtype)
            z = mu + eps * jnp.exp(0.5 * logvar)  # reference: model.py:292
        else:
            z = mu  # deterministic encode at inference (reference: sampler.py:148)
        logits = self.decoder(tokens, seq_lens, z, classes, train)
        return logits, mu, logvar

    # Pure-function entry points for the jitted inference loop
    # (used via .apply(..., method=...)).

    def encode(
        self, tokens: jax.Array, seq_lens: jax.Array, classes: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        del seq_lens  # lengths are implied by the PAD mask
        return self.encoder(tokens, classes, train=False)

    def decode_prefill(self, z: jax.Array, classes: jax.Array, max_len: int) -> Cache:
        return self.decoder.prefill(z, classes, max_len)

    def decode_step(
        self,
        token_t: jax.Array,
        cache: Cache,
        t: jax.Array,
        classes: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Cache]:
        return self.decoder.step_token(token_t, cache, t, classes)

    def decode_init(self, z: jax.Array, classes: jax.Array) -> jax.Array:
        """[B, D] conditioning state (the fused decode kernel's position 0)."""
        return self.decoder.initial_state(z, classes)

    def decode_step_ragged(
        self,
        token_t: jax.Array,
        cache: Cache,
        t: jax.Array,
        classes: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Cache]:
        return self.decoder.step_ragged(token_t, cache, t, classes)


def make_model(config: ModelConfig) -> StyleVAE:
    return StyleVAE(config=config)


def init_params(model: StyleVAE, rng: jax.Array, max_seq_len: int):
    """Initialize a parameter pytree with dummy static-shape inputs."""
    tokens = jnp.zeros((1, max_seq_len + 1), jnp.int32)
    seq_lens = jnp.ones((1,), jnp.int32)
    classes = jnp.zeros((1,), jnp.int32)
    p_rng, s_rng = jax.random.split(rng)
    return model.init(
        {"params": p_rng, "sample": s_rng}, tokens, seq_lens, classes, train=False
    )["params"]
