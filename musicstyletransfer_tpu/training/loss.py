"""Losses: masked token cross-entropy + variational KL (pure JAX).

Reference: VarAutoEncoder/loss.py:1-80. Divergences (SURVEY.md §7 stage 4):

- CE is computed from **logits** via log-softmax (the reference softmaxes in
  the model then takes log in the loss — loss.py:19-21 — which is
  numerically unstable);
- KL uses the (mu, logvar) parameterization: with sigma^2 = exp(logvar) the
  formula 0.5 * sum(sigma^2 + mu^2 - 1 - log sigma^2) is identical to the
  reference's (loss.py:8-12), but sigma is positive by construction;
- per-sample CE normalization is selectable: "valid" (mean over non-PAD
  positions, the default) or "length" (mean over the full time axis, the
  reference's arithmetic at loss.py:23).

``binary_cross_entropy`` mirrors the reference's GAN-leftover BCE
(loss.py:27-80) for API completeness; the VAE trainer does not use it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..midi.vocab import PAD_ID


def kl_divergence(mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """Per-sample KL(q(z|x) || N(0, I)), summed over latent dims.

    Reference: loss.py:4-12 (VariationalKLLoss).
    """
    return 0.5 * jnp.sum(jnp.exp(logvar) + mu * mu - 1.0 - logvar, axis=-1)


def masked_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    label_smoothing: float = 0.0,
    normalize: str = "valid",
) -> jax.Array:
    """Per-sample PAD-masked token cross-entropy.

    logits: [B, T, V]; labels: [B, T] int ids. Positions where
    ``labels == PAD_ID`` contribute zero (reference: loss.py:16-18).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    V = logits.shape[-1]
    if label_smoothing > 0.0:
        smooth = label_smoothing / (V - 1)
        on = 1.0 - label_smoothing
        nll = -(
            on * jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
            + smooth * (jnp.sum(logp, axis=-1)
                        - jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0])
        )
    else:
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    mask = (labels != PAD_ID).astype(nll.dtype)
    masked = nll * mask
    if normalize == "valid":
        return jnp.sum(masked, axis=-1) / jnp.maximum(jnp.sum(mask, axis=-1), 1.0)
    if normalize == "length":
        return jnp.mean(masked, axis=-1)  # reference arithmetic (loss.py:23)
    raise ValueError(f"unknown normalize mode {normalize!r}")


def vae_loss(
    logits: jax.Array,
    labels: jax.Array,
    mu: jax.Array,
    logvar: jax.Array,
    kl_weight,
    label_smoothing: float = 0.0,
    normalize: str = "valid",
    free_bits: float = 0.0,
):
    """Total loss = mean CE + kl_weight * mean KL (reference: trainer.py:170-172).

    ``kl_weight`` may be a traced scalar (KL annealing). ``free_bits`` > 0
    clamps the per-dimension KL from below before summing (standard
    posterior-collapse mitigation; the reference has neither knob and its
    latent collapses on the bundled corpus).

    Returns (scalar_total, dict of scalar components).
    """
    ce = masked_cross_entropy(logits, labels, label_smoothing, normalize)
    if free_bits > 0.0:
        per_dim = 0.5 * (jnp.exp(logvar) + mu * mu - 1.0 - logvar)
        kl = jnp.sum(jnp.maximum(per_dim, free_bits), axis=-1)
    else:
        kl = kl_divergence(mu, logvar)
    total = jnp.mean(ce) + kl_weight * jnp.mean(kl)
    return total, {"ce_loss": jnp.mean(ce), "kl_loss": jnp.mean(kl),
                   "total_loss": total}


def binary_cross_entropy(
    pred: jax.Array,
    label: jax.Array,
    from_sigmoid: bool = False,
    label_smoothing: float = 0.0,
    negative_label_downweighting: bool = True,
) -> jax.Array:
    """GAN-leftover BCE with smoothing + negative downweighting.

    Reference: loss.py:27-80 (unused by the VAE trainer; kept for parity).
    """
    if not from_sigmoid:
        pred = jax.nn.sigmoid(pred)
    s_label = (1.0 - label_smoothing) * label + label_smoothing * 0.5
    bce = -(s_label * jnp.log(1e-12 + pred)
            + (1.0 - s_label) * jnp.log(1e-12 + (1.0 - pred)))
    if negative_label_downweighting:
        axes = tuple(range(1, label.ndim))
        n_pos = jnp.sum(label == 1.0, axis=axes, keepdims=True)
        n_neg = jnp.sum(label != 1.0, axis=axes, keepdims=True)
        downweight = n_pos / (n_neg + 1e-12)
        bce = jnp.where(label == 0.0, downweight * bce, bce)
    return jnp.mean(bce, axis=tuple(range(1, bce.ndim)))
