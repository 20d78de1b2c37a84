"""Nyström rank compression via pivoted Cholesky landmark selection.

The remaining scaling axis of the low-rank GP is R, the feature rank
(R = M·M_w, and rff_features·M_w under the RBF object kernel): every solve
is O(N·R²). When R grows past what the Woodbury core tolerates, compress it
with a Nyström approximation anchored at m landmark rows chosen by greedy
pivoted Cholesky (maximum residual diagonal — the classic low-rank kernel
approximation; cf. PAPERS.md "lazy pivoted Cholesky / farthest point
sampling" and the GPyTorch/SVGP scalable-GP lines this fork's thesis
explored, SURVEY.md §2.1 "thesis extensions"):

    K = V Vᵀ ≈ Φ Φᵀ,   Φ = V V_Sᵀ L_SS⁻ᵀ,   V_S V_Sᵀ = L_SS L_SSᵀ

Exact whenever the landmarks span the row space (m ≥ rank(V)); the greedy
pivot rule makes the truncation error the best-diagonal-greedy one. Φ is
differentiable in V (landmarks are data-chosen constants), so it composes
with the Taylor surrogate and joint training unchanged.

Landmark selection runs once, host-side, without materializing K:
O(N·m·R) work and O(N·m) memory.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pivoted_cholesky_landmarks(
    V: np.ndarray, m: int, tol: float = 1e-10
) -> np.ndarray:
    """Greedy pivoted-Cholesky selection of ≤ m landmark row indices of
    K = V Vᵀ (never materialized). Returns int32 indices, possibly fewer
    than m if the residual diagonal drops below tol·max-diag (rank found).
    """
    V = np.asarray(V, dtype=np.float64)
    n = V.shape[0]
    m = min(m, n)
    d = np.sum(V * V, axis=1)  # residual diagonal of K
    scale = float(d.max()) if n else 0.0
    L = np.zeros((n, m))  # partial Cholesky columns
    idx = []
    for k in range(m):
        p = int(np.argmax(d))
        if d[p] <= tol * scale:
            break
        idx.append(p)
        col = V @ V[p] - L[:, :k] @ L[p, :k]  # K[:, p] − Σ L L[p]
        L[:, k] = col / np.sqrt(d[p])
        d = np.maximum(d - L[:, k] ** 2, 0.0)
    return np.asarray(idx, dtype=np.int32)


def nystrom_features(
    V: jax.Array, landmark_idx: jax.Array | np.ndarray, jitter: float = 1e-10
) -> jax.Array:
    """Φ = V V_Sᵀ L_SS⁻ᵀ so that Φ Φᵀ is the Nyström approximation of V Vᵀ.

    Differentiable in V; jit-safe (landmark_idx is a fixed index array).
    Output rank = len(landmark_idx).
    """
    idx = jnp.asarray(landmark_idx)
    V_S = V[idx]  # (m, R)
    C = V @ V_S.T  # (N, m) cross-covariance K(·, S)
    K_SS = V_S @ V_S.T
    m = K_SS.shape[0]
    # jitter scaled to the landmark kernel's own magnitude
    eps = jitter * (jnp.trace(K_SS) / m + 1.0)
    L_SS = jax.lax.linalg.cholesky(K_SS + eps * jnp.eye(m, dtype=V.dtype))
    return jax.scipy.linalg.solve_triangular(L_SS, C.T, lower=True).T


def compress_rank(
    V: np.ndarray | jax.Array, m: int, tol: float = 1e-10
) -> jax.Array:
    """One-shot convenience: select landmarks and return Φ (N, ≤m)."""
    idx = pivoted_cholesky_landmarks(np.asarray(V), m, tol)
    return nystrom_features(jnp.asarray(V), idx)
