"""Class-conditional sequence GAN for MIDI generation (TPU-native).

The reference repo ships a GAN launch script (`scripts/train.sh:5` invokes
``music_style_transfer.GAN.main``) but the GAN module itself is absent from
the repository — only its artifacts survive: the flag surface in train.sh
(--g-n-layers / --g-rnn-hidden-dim / --g-emb-hidden-dim / --noise-dim /
--d-* / --discriminator-update-steps / --g-learning-rate /
--d-learning-rate) and the GAN-leftover ``BinaryCrossEntropy`` with label
smoothing + negative-label downweighting (reference loss.py:27-80, plus the
--label-smoothing / --negative-label-downscaling flags at config.py:52-53).
This module reconstructs that capability from those artifacts as an
original TPU-first design; where the reference leaves no evidence, the
design notes below state the choice.

Design (idiomatic JAX, everything under jit):

- **Generator**: per-step noise + class-conditional initial LSTM state,
  rolled out with ``nn.scan`` (ONE fused XLA while-style program — no
  Python in the loop). At each step the previous token enters as an
  embedding; in ``soft`` mode that embedding is the softmax distribution
  contracted with the embedding table (a dense MXU matmul — the standard
  continuous relaxation that keeps the generator differentiable end to
  end), in ``hard`` mode it is the embedding of a sampled token id
  (inference). Both modes share one parameter set.
- **Discriminator**: token *distributions* (one-hot for real data, soft
  for generated) contracted with an embedding table — again a dense MXU
  matmul, which makes real and fake inputs the same dtype/shape so one
  compiled program serves both — plus a class embedding, an LSTM stack,
  and a per-timestep real/fake logit head. Per-timestep discrimination
  gives the generator a dense training signal (every prefix is judged).
- Training (training/gan_trainer.py) alternates jitted discriminator and
  generator steps with separate optimizers/learning rates and
  ``discriminator_update_steps`` D-updates per G-update, exactly the
  knobs train.sh records.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .config import Config, register_config


def _dtype(name: str) -> Any:
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


@register_config
@dataclasses.dataclass(frozen=True)
class GeneratorConfig(Config):
    """Flag surface from the reference's scripts/train.sh:11-16."""

    n_layers: int = 1        # --g-n-layers
    hidden_dim: int = 256    # --g-rnn-hidden-dim
    emb_dim: int = 256       # --g-emb-hidden-dim
    noise_dim: int = 64      # --noise-dim
    num_classes: int = 2
    output_dim: int = 293
    max_seq_len: int = 64


@register_config
@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig(Config):
    """Flag surface from the reference's scripts/train.sh:17-20."""

    n_layers: int = 1        # --d-n-layers
    hidden_dim: int = 256    # --d-rnn-hidden-dim
    emb_dim: int = 256       # --d-emb-hidden-dim
    num_classes: int = 2
    input_dim: int = 293
    # Projection conditioning (Miyato & Koyama): makes the real/fake
    # boundary class-dependent. Measured on guitar_bass (BASELINE.md):
    # the only configuration where generated classes actually separate
    # (octave JS own 0.142 vs other 0.176); additive-input-only
    # conditioning reads flat (0.194 vs 0.195) but keeps denser note
    # output at the same step budget.
    projection: bool = True


@register_config
@dataclasses.dataclass(frozen=True)
class GANConfig(Config):
    generator_config: GeneratorConfig = dataclasses.field(
        default_factory=GeneratorConfig
    )
    discriminator_config: DiscriminatorConfig = dataclasses.field(
        default_factory=DiscriminatorConfig
    )
    dtype: str = "bfloat16"


class _GeneratorCell(nn.Module):
    """One rollout step; lifted over time by nn.scan (params broadcast)."""

    config: GeneratorConfig
    dtype: Any
    hard: bool

    @nn.compact
    def __call__(self, carry, x):
        c = self.config
        carries, prev_emb, class_emb, temperature = carry
        noise_t, key_t = x

        # Class conditioning at EVERY step, not just the initial state:
        # over a 64-step rollout the initial (h0, c0) washes out, while the
        # discriminator sees its class embedding at every position —
        # asymmetric conditioning measurably fails to separate classes
        # (BASELINE.md's GAN note).
        x_in = (
            nn.Dense(c.emb_dim, dtype=self.dtype, name="noise2emb")(noise_t)
            + prev_emb
            + class_emb
        )
        h = x_in
        new_carries = []
        for i in range(c.n_layers):
            cell = nn.OptimizedLSTMCell(
                c.hidden_dim, dtype=self.dtype, name=f"lstm{i}"
            )
            carry_i, h = cell(carries[i], h)
            new_carries.append(carry_i)
        logits = nn.Dense(c.output_dim, dtype=jnp.float32, name="out")(
            h.astype(jnp.float32)
        )
        scaled = logits / temperature

        token_emb = nn.Embed(
            c.output_dim, c.emb_dim, dtype=self.dtype, name="token_emb"
        )
        tokens_t = jax.random.categorical(key_t, scaled)
        if self.hard:
            next_emb = token_emb(tokens_t)
        else:
            soft = jax.nn.softmax(scaled).astype(self.dtype)
            # Soft embedding: distribution @ table — differentiable, MXU.
            next_emb = soft @ jnp.asarray(token_emb.embedding, self.dtype)
        return (
            (tuple(new_carries), next_emb, class_emb, temperature),
            (logits, tokens_t),
        )


class Generator(nn.Module):
    """noise [B, L, noise_dim] + classes [B] -> (logits [B, L, V], tokens [B, L])."""

    config: GeneratorConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        noise: jax.Array,
        classes: jax.Array,
        key: jax.Array,
        hard: bool = False,
        temperature: float = 1.0,
    ) -> Tuple[jax.Array, jax.Array]:
        c = self.config
        B, L, _ = noise.shape
        # Class-conditional initial state: per-class learned (h0, c0),
        # repeated across layers (the same conditioning idiom as the VAE's
        # LSTM decoder, models/lstm.py).
        hc = nn.Embed(c.num_classes, 2 * c.hidden_dim, dtype=self.dtype,
                      name="class2state")(classes)
        h0, c0 = jnp.split(hc, 2, axis=-1)
        carries0 = tuple((c0, h0) for _ in range(c.n_layers))
        prev0 = jnp.zeros((B, c.emb_dim), self.dtype)
        # Per-step class conditioning (constant through the scan carry).
        cemb = nn.Embed(c.num_classes, c.emb_dim, dtype=self.dtype,
                        name="class2emb")(classes)
        temp = jnp.asarray(temperature, jnp.float32)

        cell = nn.scan(
            _GeneratorCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )(config=c, dtype=self.dtype, hard=hard, name="cell")

        xs = (jnp.swapaxes(noise, 0, 1), jax.random.split(key, L))
        _, (logits, tokens) = cell((carries0, prev0, cemb, temp), xs)
        return jnp.swapaxes(logits, 0, 1), jnp.swapaxes(tokens, 0, 1)


class Discriminator(nn.Module):
    """Token distributions [B, L, V] + classes [B] -> per-step logits [B, L]."""

    config: DiscriminatorConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, token_dists: jax.Array, classes: jax.Array) -> jax.Array:
        c = self.config
        # Embedding as a Dense over the vocab axis: one MXU matmul serving
        # both one-hot (real) and soft (generated) inputs.
        x = nn.Dense(c.emb_dim, use_bias=False, dtype=self.dtype,
                     name="token_emb")(token_dists.astype(self.dtype))
        x = x + nn.Embed(c.num_classes, c.emb_dim, dtype=self.dtype,
                         name="class_emb")(classes)[:, None, :]
        for i in range(c.n_layers):
            x = nn.RNN(
                nn.OptimizedLSTMCell(c.hidden_dim, dtype=self.dtype),
                name=f"rnn{i}",
            )(x)
        h = x.astype(jnp.float32)
        logits = nn.Dense(1, dtype=jnp.float32, name="head")(h)[..., 0]
        if c.projection:
            # Projection conditioning (Miyato & Koyama, cGANs with
            # projection discriminator): logit_t = head(h_t) + <h_t,
            # v_class>. The additive input embedding alone lets D
            # discriminate without ever USING the class, so the generator
            # feels no pressure to separate classes; the inner-product
            # term makes the real/fake boundary itself class-dependent.
            proj = nn.Embed(c.num_classes, c.hidden_dim, dtype=jnp.float32,
                            name="class_proj")(classes)
            logits = logits + jnp.einsum("blh,bh->bl", h, proj)
        return logits


def make_generator(config: GANConfig) -> Generator:
    return Generator(config=config.generator_config, dtype=_dtype(config.dtype))


def make_discriminator(config: GANConfig) -> Discriminator:
    return Discriminator(
        config=config.discriminator_config, dtype=_dtype(config.dtype)
    )


def init_gan_params(config: GANConfig, rng: jax.Array):
    """(generator_params, discriminator_params) from one seed."""
    g_rng, d_rng, roll_rng = jax.random.split(rng, 3)
    gen, disc = make_generator(config), make_discriminator(config)
    gc = config.generator_config
    noise = jnp.zeros((1, gc.max_seq_len, gc.noise_dim), jnp.float32)
    classes = jnp.zeros((1,), jnp.int32)
    g_params = gen.init(g_rng, noise, classes, roll_rng, hard=False)["params"]
    dists = jnp.zeros(
        (1, gc.max_seq_len, config.discriminator_config.input_dim), jnp.float32
    )
    d_params = disc.init(d_rng, dists, classes)["params"]
    return g_params, d_params


def generate_tokens(
    gen: Generator,
    g_params,
    classes: jax.Array,
    key: jax.Array,
    temperature: float = 1.0,
) -> jax.Array:
    """Sample hard token sequences [B, max_seq_len] for the given classes."""
    c = gen.config
    noise_key, roll_key = jax.random.split(key)
    noise = jax.random.normal(
        noise_key, (classes.shape[0], c.max_seq_len, c.noise_dim), jnp.float32
    )
    _, tokens = gen.apply(
        {"params": g_params}, noise, classes, roll_key, hard=True,
        temperature=temperature,
    )
    return tokens
