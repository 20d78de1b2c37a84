"""Nyström rank compression: exactness at full rank, monotone approximation,
differentiability, and GP-NLL compatibility."""

import jax
import jax.numpy as jnp
import numpy as np

from gppvae_tpu import gp
from gppvae_tpu.gp.nystrom import (
    compress_rank,
    nystrom_features,
    pivoted_cholesky_landmarks,
)


def _lowrank_V(key, n=200, r_true=6, r_embed=40):
    k1, k2 = jax.random.split(key)
    A = jax.random.normal(k1, (n, r_true), jnp.float64)
    B = jax.random.normal(k2, (r_true, r_embed), jnp.float64)
    return A @ B  # rank r_true inside R^{r_embed}


def test_exact_when_landmarks_cover_rank():
    V = _lowrank_V(jax.random.PRNGKey(0))
    Phi = compress_rank(V, m=10)  # > true rank 6
    assert Phi.shape[1] <= 10
    np.testing.assert_allclose(Phi @ Phi.T, V @ V.T, atol=1e-5)


def test_rank_detection_stops_early():
    V = _lowrank_V(jax.random.PRNGKey(1), r_true=4)
    idx = pivoted_cholesky_landmarks(np.asarray(V), m=30)
    assert len(idx) == 4  # pivoting finds the true rank and stops


def test_approximation_error_monotone():
    key = jax.random.PRNGKey(2)
    V = jax.random.normal(key, (150, 64), jnp.float64)  # full-rank 64
    K = np.asarray(V @ V.T)
    errs = []
    for m in (8, 16, 32, 64):
        Phi = compress_rank(V, m)
        errs.append(np.linalg.norm(K - np.asarray(Phi @ Phi.T)))
    assert errs[0] > errs[1] > errs[2]
    assert errs[3] < 1e-6 * np.linalg.norm(K)


def test_differentiable_and_nll_compatible():
    V = jnp.asarray(_lowrank_V(jax.random.PRNGKey(3)), jnp.float64)
    idx = pivoted_cholesky_landmarks(np.asarray(V), m=10)
    Z = jax.random.normal(jax.random.PRNGKey(4), (V.shape[0], 3), jnp.float64)

    def nll(V):
        Phi = nystrom_features(V, idx)
        return gp.gp_nll_from_features(Z, Phi, jnp.float64(0.8), jnp.float64(0.3))

    val, grad = jax.value_and_grad(nll)(V)
    assert np.isfinite(val)
    assert np.isfinite(np.asarray(grad)).all()
    # compressed NLL ≈ exact NLL (V is exactly rank-6 ≤ 10 landmarks)
    exact = gp.gp_nll_from_features(Z, V, jnp.float64(0.8), jnp.float64(0.3))
    np.testing.assert_allclose(val, exact, rtol=1e-8)
