"""Out-of-sample conditional generation (SURVEY.md §3.4).

For held-out (object, view) grid cells: GP-predictive latent means from the
training latents, decoded to images — no encoder involvement. Pixel MSE vs
the ground-truth held-out images is THE parity metric (BASELINE.json:2).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from gppvae_tpu import gp


def oos_predict_images(
    decode_fn: Callable[[jax.Array], jax.Array],
    V_star: jax.Array,
    factors: gp.GPFactors,
    Z: jax.Array,
    v_sigs,
) -> jax.Array:
    """ŷ* = sigmoid(decoder(K(*,·) K⁻¹ Z)) for held-out feature rows."""
    z_star = gp.predict_latents(V_star, factors, Z, v_sigs)
    return jax.nn.sigmoid(decode_fn(z_star))


def pixel_mse(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(y_true - y_pred))
