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


def predict_heldout(
    model,
    params,
    fixed_W,
    Z0: jax.Array,
    d_tr: jax.Array,
    q_tr: jax.Array,
    d_ho: jax.Array,
    q_ho: jax.Array,
    y_ho: jax.Array,
    *,
    x_map=None,
    extra_effects: tuple = (),
    row_weights=None,
):
    """The full OOS pipeline shared by the trainers and the eval CLI:
    build train/held-out feature rows from the current GP params, factorize,
    GP-predict latents from Z0, decode, report pixel MSE.

    params: {'vae': …, 'gp': {'X', ['W'], 'log_vs', 'log_vn'}}; fixed_W is
    the dis-mode view feature matrix (ignored when params carry a learned W).
    extra_effects: additional random effects beyond the object×view product
    ('object' / 'view'), matching the trainer's config.
    row_weights: optional (N,) 0/1 mask zeroing padded training rows (the
    mesh trainers pad N to the data-axis size); a zeroed feature row
    contributes nothing to the Woodbury factors or K⁻¹Z, so the prediction
    equals the unpadded one exactly.
    """
    from gppvae_tpu.models import VAE

    W = params["gp"].get("W", fixed_W)
    X = params["gp"]["X"]
    V_tr = gp.build_effect_rows(X, W, d_tr, q_tr,
                                extra_effects=extra_effects, x_map=x_map)
    if row_weights is not None:
        V_tr = [v * row_weights[:, None] for v in V_tr]
    V_ho = gp.build_effect_rows(X, W, d_ho, q_ho,
                                extra_effects=extra_effects, x_map=x_map)
    v_sig, v_noise = gp.variances_from_log(
        params["gp"]["log_vs"], params["gp"]["log_vn"]
    )
    v_sigs = [jnp.reshape(v_sig, (-1,))[i] for i in range(len(V_tr))]
    factors = gp.factorize(V_tr, v_sigs, v_noise)
    decode = lambda z: model.apply(params["vae"], z, method=VAE.decode)
    y_pred = oos_predict_images(decode, V_ho, factors, Z0, v_sigs)
    return y_pred, pixel_mse(y_ho, y_pred)
