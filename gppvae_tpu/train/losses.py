"""Loss terms shared by the training drivers.

Conventions (documented here once; every driver follows them):
  * images y ∈ [0,1]; decoders emit logits; ŷ = sigmoid(logits).
  * per-sample terms are SUMMED over pixels/latent dims, then MEANED over
    the batch — so reported losses are per-sample and comparable across
    batch sizes, and the implicit objective is (1/N)·(full-dataset ELBO).
  * the VAE pretrain objective is recon + KL(q ‖ N(0, I)) (SURVEY.md §3.1);
    the GPPVAE objective swaps the KL's cross-entropy part for the GP NLL
    surrogate and keeps the encoder entropy as `neg_entropy` (the
    reference's "pen_term"; SURVEY.md §3.2 — exact ELBO decomposition:
    −E[log p] = recon + gp_nll − H[q], H[q] = ½Σ logvar + const).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def gaussian_recon_nll(
    y: jax.Array, y_hat: jax.Array, sigma_y: float | jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Per-sample Gaussian reconstruction NLL and pixel MSE.

    recon_n = ‖y_n − ŷ_n‖² / (2σ_y²) + (D/2)·log(2πσ_y²). Returns
    (recon (B,), mse (B,)) — mse is the parity metric (BASELINE.json:2).
    """
    d = y.shape[1:]
    D = math.prod(d)
    sq = jnp.sum(jnp.square(y - y_hat).reshape(y.shape[0], -1), axis=1)
    var = jnp.square(sigma_y)
    recon = sq / (2.0 * var) + 0.5 * D * jnp.log(2.0 * math.pi * var)
    return recon, sq / D


def kl_standard_normal(mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """Per-sample KL(N(μ, diag e^logvar) ‖ N(0, I)), summed over latent dims."""
    return 0.5 * jnp.sum(
        jnp.square(mu) + jnp.exp(logvar) - 1.0 - logvar, axis=1
    )


def neg_entropy(logvar: jax.Array) -> jax.Array:
    """Per-sample −H[q(z|y)] up to an additive constant: −½ Σ_l logvar.

    The GPPVAE "pen_term": with the GP prior supplying the cross-entropy
    part, the remaining ELBO piece is the (negative) encoder entropy.
    """
    return -0.5 * jnp.sum(logvar, axis=1)
