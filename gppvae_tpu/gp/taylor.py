"""First-order Taylor surrogate of the full-dataset GP NLL.

Rebuild of the reference's Taylor-coefficient machinery (SURVEY.md §3.2
Phase B / §2.1 gp.py "taylor_coeff"). Once per epoch the full-dataset NLL
nll(Z, V, θ) is evaluated at the refreshed latents Z₀ and current features
V₀, and its exact first-order coefficients are extracted **by autodiff** (the
reference hand-derives them — autodiff removes the survey's #2-ranked risk,
"silently wrong Taylor coefficients still train", SURVEY.md §7).

The surrogate distributes the full-data GP term over minibatches: for batch
indices I with per-sample differentiable latents z_n(φ) and feature rows
v_n(X, W),

    gp_term(I) = Σ_{n∈I} ⟨dZ_n, z_n⟩ + Σ_{n∈I} ⟨dV_n, v_n⟩
                 + (|I|/N)·⟨dθ, θ⟩                      (+ const/N·|I|)

so that over one epoch (each sample visited once) the accumulated gradient
equals the gradient of the exact full-dataset NLL at the expansion point.
Variance-component coefficients dθ ride along at |I|/N weight since they do
not decompose per sample.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


class TaylorCoefficients(NamedTuple):
    """Expansion point value and exact gradients of the full-data GP NLL."""

    value: jax.Array  # () nll at the expansion point
    dZ: jax.Array  # (N, L) ∂nll/∂Z
    dV: Any  # (N, R) ∂nll/∂V — or a matching pytree for multiple effects
    daux: Any  # pytree: ∂nll/∂(variance raw params, …)


def taylor_expand(
    nll_fn: Callable[[jax.Array, jax.Array, Any], jax.Array],
    Z0: jax.Array,
    V0: jax.Array,
    aux0: Any,
) -> TaylorCoefficients:
    """Evaluate nll_fn and its gradients at the expansion point.

    nll_fn(Z, V, aux) must be the *exact* full-dataset Woodbury NLL
    (gp.gp_nll_from_features composed with the variance transform). All
    inputs are treated as free variables; jit this whole call. V0 may be a
    single (N, R) array or a pytree of them (multiple random effects).
    """
    value, (dZ, dV, daux) = jax.value_and_grad(nll_fn, argnums=(0, 1, 2))(Z0, V0, aux0)
    return TaylorCoefficients(value=value, dZ=dZ, dV=dV, daux=daux)


def surrogate_batch_term(
    coeffs: TaylorCoefficients,
    idx: jax.Array,
    z_batch: jax.Array,
    v_batch: jax.Array,
    aux: Any,
    num_total: int,
    *,
    weights: jax.Array | None = None,
) -> jax.Array:
    """Per-minibatch GP loss term from the Taylor surrogate.

    idx: (b,) dataset indices of the batch; z_batch: (b, L) differentiable
    latents; v_batch: (b, R) differentiable feature rows — or a pytree of
    them matching coeffs.dV (multiple random effects); aux: the live
    (differentiable) variance raw params. The coefficients are constants
    (stop-gradient'd by construction — they were computed in a separate
    trace), so d(term)/d(z_batch) = dZ[idx] exactly, etc.

    weights: optional (b,) 0/1 row mask (train/batching.py pads the final
    batch of an epoch by wrap-around); masked rows contribute nothing, and
    the variance-coefficient share scales with the VALID row count, so the
    epoch-accumulated gradient equals the exact full-data NLL gradient for
    any N — not just bs | N.
    """
    dZb = jax.lax.stop_gradient(coeffs.dZ[idx])
    dVb = jax.tree.map(lambda a: jax.lax.stop_gradient(a[idx]), coeffs.dV)
    if weights is None:
        term = jnp.sum(dZb * z_batch) + sum(
            jnp.sum(g * v)
            for g, v in zip(
                jax.tree.leaves(dVb), jax.tree.leaves(v_batch), strict=True
            )
        )
        frac = idx.shape[0] / num_total
    else:
        # PROMOTE weights, never downcast: the old z_batch.dtype cast made
        # jnp.sum(weights) count 0/1 rows in bf16, which cannot represent
        # integers above 256 — the variance-coefficient share (and so the
        # exact-epoch-gradient identity in the module docstring) would
        # silently break for bf16 latents at bs > 256. Promotion keeps the
        # count ≥f32-exact while preserving the f64 oracles' precision
        # (weights follow z up to f64) — bit-identical on every trainer
        # path (f32 z, f32 weights).
        weights = weights.astype(jnp.promote_types(weights.dtype, z_batch.dtype))
        term = jnp.sum(weights * jnp.sum(dZb * z_batch, axis=1)) + sum(
            jnp.sum(weights * jnp.sum(g * v, axis=1))
            for g, v in zip(
                jax.tree.leaves(dVb), jax.tree.leaves(v_batch), strict=True
            )
        )
        frac = jnp.sum(weights) / num_total
    daux = jax.lax.stop_gradient(coeffs.daux)
    aux_dot = sum(
        jnp.vdot(g, a)
        for g, a in zip(jax.tree.leaves(daux), jax.tree.leaves(aux), strict=True)
    )
    return term + frac * aux_dot
