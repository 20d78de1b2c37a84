"""Dense (materialized-K) reference implementations — test oracle only.

The Woodbury path in gppvae_tpu.gp.woodbury never materializes K; these
O(N³) formulas exist so the property tests (SURVEY.md §4.2) can check it
against closed-form dense linear algebra on small N. Never used in training.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


def materialize_K(
    Vs: Sequence[jax.Array] | jax.Array,
    v_sigs: Sequence[jax.Array] | jax.Array,
    v_noise: jax.Array,
) -> jax.Array:
    if isinstance(Vs, jax.Array) or not isinstance(Vs, (list, tuple)):
        Vs, v_sigs = [Vs], [v_sigs]
    N = Vs[0].shape[0]
    K = v_noise * jnp.eye(N, dtype=Vs[0].dtype)
    for V, v in zip(Vs, v_sigs, strict=True):
        K = K + v * (V @ V.T)
    return K


def dense_nll(Z: jax.Array, K: jax.Array, *, include_const: bool = True) -> jax.Array:
    """½[L·log|K| + tr(Zᵀ K⁻¹ Z) (+ N·L·log 2π)] via dense Cholesky."""
    N, L = Z.shape
    Lk = jnp.linalg.cholesky(K)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lk)))
    W = jax.scipy.linalg.solve_triangular(Lk, Z, lower=True)
    quad = jnp.sum(jnp.square(W))
    out = 0.5 * (L * logdet + quad)
    if include_const:
        out = out + 0.5 * N * L * math.log(2.0 * math.pi)
    return out


def dense_predict(
    K_star_train: jax.Array, K: jax.Array, Z: jax.Array
) -> jax.Array:
    """z* = K(*, train) K⁻¹ Z by dense solve."""
    return K_star_train @ jnp.linalg.solve(K, Z)


def dense_predict_cov(
    K_star_train: jax.Array, K_star_star: jax.Array, K: jax.Array
) -> jax.Array:
    """Joint posterior covariance over the * rows by dense solve:
    Cov = K(*,*) − K(*,·) K⁻¹ K(·,*). K_star_star must already include the
    new rows' noise term (v_n I) if the Woodbury side being checked does
    (predict_cov_from_core always adds it)."""
    return K_star_star - K_star_train @ jnp.linalg.solve(K, K_star_train.T)
