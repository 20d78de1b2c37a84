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


# |logit| above which f32 sigmoid rounds to exactly 0/1 is ~16.6
# (ln 2^24); past it the recon gradient is EXACTLY zero and that output
# unit can never recover. The barrier sits just below the cliff.
SAT_LOGIT_BOUND = 15.0


def logit_saturation_penalty(
    logits: jax.Array, bound: float = SAT_LOGIT_BOUND
) -> jax.Array:
    """Per-sample quadratic barrier keeping decoder logits alive.

    Root-caused in round 3 (BASELINE.md "saturation death"): on data with
    exact-0/1 pixels the Gaussian-on-sigmoid recon pushes background
    logits toward ±∞; once |logit| crosses ~17, f32 sigmoid returns
    exactly 0/1, its gradient is exactly zero, and the decoder is
    silently, PERMANENTLY dead — every long bf16 soak ended in this state
    (oos pinned at the binary-prediction MSE 0.0254, σ_y at its matching
    MLE √0.0254). relu(|l|−bound)² is identically zero — value AND
    gradient — while |logits| < bound, so healthy trajectories (goldens,
    reference-regime runs) are bit-unchanged; the prediction cost of
    capping at 15 is (1−sigmoid(15))² ≈ 1e-13 per pixel, far below any
    target floor. Returns a per-sample (B,) sum-over-pixels penalty (the
    barrier gradient 2·excess per pixel dominates the saturation push,
    which is ≤ s(1−s)/σ² ≈ 4e-3 at the bound even at σ=0.009, so unit
    weight pins offending logits essentially at the bound).
    """
    excess = jax.nn.relu(jnp.abs(logits) - bound)
    return jnp.sum(jnp.square(excess).reshape(logits.shape[0], -1), axis=1)


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
