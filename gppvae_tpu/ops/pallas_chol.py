"""Fused Pallas NLL core: blocked Cholesky + triangular solve + log-det +
quadratic form in ONE kernel (SURVEY.md §2.2 table: the MAGMA/cuSOLVER
replacement; §3.3 innermost math).

Computes, for B = I_R + G/v_n with L_B = chol(B):

    logdet = 2·Σ log diag(L_B)
    wn²    = ‖L_B⁻¹ UtZ‖_F²
    nll    = ½[ L·(N·log v_n + logdet) + (zn² − wn²/v_n)/v_n + N·L·log 2π ]

entirely on-chip: the R×R core and the R×L projection stay in VMEM through
factorization, solve and reduction — no HBM round-trips between the four
XLA ops this replaces (cholesky → triangular_solve → square-sum → scalar
assembly), and no O(R³) XLA while-loops.

The Cholesky is left-looking column-by-column (sequential in R — R ≤ ~256
here, the survey's honest note that the win is NOT flops but fusion and
kernel-launch elision). Padding: G zero-padded to Rp gives an identity
block in B (log-det contribution 0); UtZ zero rows solve to zero.

Backward is a hand-derived closed form over the same Woodbury quantities,
with M = B⁻¹UtZ and T = tr(UtZᵀ M) (note quad = (zn − T/v_n)/v_n and
∂T/∂B = −M Mᵀ):

    ∂nll/∂G   = ½[ L·B⁻¹/v_n + M Mᵀ/v_n³ ]
    ∂nll/∂UtZ = −M/v_n²
    ∂nll/∂zn  = 1/(2 v_n)
    ∂nll/∂v_n = ½[ L(N/v_n − tr(B⁻¹G)/v_n²) − zn/v_n² + 2T/v_n³
                   − tr(G M Mᵀ)/v_n⁴ ]

computed from the forward kernel's own residuals: the kernel also emits
X = L_B⁻¹ and W = L_B⁻¹UtZ, so M = XᵀW and B⁻¹ = XᵀX are two dense dots —
no XLA cholesky/trisolve custom calls in the backward at all (they were a
serial per-epoch chain worth ~7% of device time, trace_r3b).
Every formula is validated against autodiff of the pure-jnp core in
tests/test_pallas_ops.py.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gppvae_tpu.ops.dispatch import register_pallas

_LANE = 128
_LOG2PI = math.log(2.0 * math.pi)


def _interpret() -> bool:
    return os.environ.get("GPPVAE_PALLAS_INTERPRET") == "1"


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _nll_core_kernel(g_ref, utz_ref, scal_ref, nll_ref, x_ref, w_ref,
                     l_scratch):
    """scal_ref (SMEM, (4,)): [zn, v_n, N, L_true].

    Besides the NLL scalar the kernel emits W = L_B⁻¹ UtZ (already computed
    for the quadratic form) and X = L_B⁻¹ (one extra forward substitution):
    they are the backward pass's residuals — M = Xᵀ W and B⁻¹ = Xᵀ X are
    then two MXU dots, which removed the XLA-side cholesky custom call +
    two cho_solves (4 serial trisolves) the old backward re-ran per epoch
    (trace_r3b multiply_reduce_fusion.63's serial Phase-B chain)."""
    Rp = g_ref.shape[0]
    zn, vn, n_rows, l_dims = (
        scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3]
    )
    rows = jax.lax.broadcasted_iota(jnp.int32, (Rp, 1), 0)
    cols2d = jax.lax.broadcasted_iota(jnp.int32, (Rp, Rp), 1)

    # ---- left-looking Cholesky of B = I + G/vn, column j at a time.
    # Mosaic constraint: no dynamic indexing along the lane (last) dim —
    # columns are read via lane-masked reductions and written via masked
    # full-matrix selects; only sublane (dim-0) pl.ds slicing is used.
    l_scratch[:] = jnp.zeros_like(l_scratch)

    def chol_col(j, logdet):
        ljrow = l_scratch[pl.ds(j, 1), :]  # (1, Rp) row j of L so far
        # s[i] = Σ_k L[i,k]·L[j,k]  — contract lane dims, no transpose
        s = jax.lax.dot_general(
            l_scratch[:], ljrow,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Rp, 1)
        # column j of B as (Rp,1): lane-masked reduce of G, plus I
        gcol = jnp.sum(
            jnp.where(cols2d == j, g_ref[:], 0.0), axis=1, keepdims=True
        )
        c = gcol / vn + jnp.where(rows == j, 1.0, 0.0) - s  # (Rp, 1)
        djj = jnp.sum(jnp.where(rows == j, c, 0.0))
        d = jnp.sqrt(djj)
        newcol = jnp.where(rows > j, c / d, jnp.where(rows == j, d, 0.0))
        l_scratch[:] = jnp.where(cols2d == j, newcol, l_scratch[:])
        return logdet + 2.0 * jnp.log(d)

    logdet = jax.lax.fori_loop(0, Rp, chol_col, jnp.float32(0.0))

    # ---- forward substitution W = L⁻¹ UtZ, row j at a time (into the
    # w_ref output block, VMEM-resident throughout)
    w_ref[:] = jnp.zeros_like(w_ref)

    cols = jax.lax.broadcasted_iota(jnp.int32, (1, Rp), 1)

    def solve_row(j, _):
        ljrow = l_scratch[pl.ds(j, 1), :]  # (1, Rp)
        acc = jnp.dot(ljrow, w_ref[:], preferred_element_type=jnp.float32)
        ljj = jnp.sum(jnp.where(cols == j, ljrow, 0.0))
        w_ref[pl.ds(j, 1), :] = (utz_ref[pl.ds(j, 1), :] - acc) / ljj
        return 0

    jax.lax.fori_loop(0, Rp, solve_row, 0)

    # ---- forward substitution X = L⁻¹ (RHS = I), same recurrence
    x_ref[:] = jnp.zeros_like(x_ref)

    def solve_row_x(j, _):
        ljrow = l_scratch[pl.ds(j, 1), :]  # (1, Rp)
        acc = jnp.dot(ljrow, x_ref[:], preferred_element_type=jnp.float32)
        ljj = jnp.sum(jnp.where(cols == j, ljrow, 0.0))
        ej = jnp.where(cols == j, 1.0, 0.0)  # row j of I
        x_ref[pl.ds(j, 1), :] = (ej - acc) / ljj
        return 0

    jax.lax.fori_loop(0, Rp, solve_row_x, 0)

    # ---- reductions + assembly
    wn2 = jnp.sum(w_ref[:] * w_ref[:])
    quad = (zn - wn2 / vn) / vn
    nll_ref[0, 0] = 0.5 * (
        l_dims * (n_rows * jnp.log(vn) + logdet)
        + quad
        + n_rows * l_dims * _LOG2PI
    )


@jax.jit
def _nll_core_pallas(G, UtZ, zn, vn, n_rows, l_dims):
    R = G.shape[0]
    L = UtZ.shape[1]
    Rp = _round_up(max(R, 8), _LANE)
    Lp = _round_up(max(L, 8), _LANE)
    Gp = jnp.pad(G, ((0, Rp - R), (0, Rp - R)))
    UtZp = jnp.pad(UtZ, ((0, Rp - R), (0, Lp - L)))
    scal = jnp.stack([
        zn.astype(jnp.float32),
        vn.astype(jnp.float32),
        jnp.asarray(n_rows, jnp.float32),
        jnp.asarray(l_dims, jnp.float32),
    ])
    nll, X, W = pl.pallas_call(
        _nll_core_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((Rp, Rp), jnp.float32),
            jax.ShapeDtypeStruct((Rp, Lp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((Rp, Rp), jnp.float32),
        ],
        interpret=_interpret(),
    )(Gp, UtZp, scal)
    # padded blocks carry an identity tail (X) / zero rows (W): slice the
    # true factors for the backward residuals
    return nll[0, 0], X[:R, :R], W[:R, :L]


# ------------------------------------------------------------------ VJP


def _core_fwd(G, UtZ, zn, vn, n_rows, l_dims):
    nll, X, W = _nll_core_pallas(G, UtZ, zn, vn, n_rows, l_dims)
    return nll, (G, UtZ, zn, vn, X, W)


def _core_bwd(n_rows, l_dims, res, ct):
    # X = L_B⁻¹ and W = L_B⁻¹UtZ ride out of the forward kernel, so the
    # Woodbury backward quantities are two dense dots (MXU) instead of a
    # serial XLA cholesky + cho_solve chain re-run per epoch:
    G, UtZ, zn, vn, X, W = res
    n = jnp.asarray(n_rows, G.dtype)
    Ld = jnp.asarray(l_dims, G.dtype)
    M = X.T @ W       # B⁻¹ UtZ  (= L⁻ᵀ L⁻¹ UtZ)
    Binv = X.T @ X    # B⁻¹
    MMt = M @ M.T
    T = jnp.sum(UtZ * M)
    gG = 0.5 * (Ld * Binv / vn + MMt / vn**3)
    gUtZ = -M / vn**2
    gzn = 1.0 / (2.0 * vn)
    gvn = 0.5 * (
        Ld * (n / vn - jnp.sum(Binv * G) / vn**2)
        - zn / vn**2
        + 2.0 * T / vn**3
        - jnp.sum(G * MMt) / vn**4
    )
    return (ct * gG, ct * gUtZ, ct * gzn, ct * gvn)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def nll_core_pallas(G, UtZ, zn, vn, n_rows, l_dims):
    """Fused Woodbury NLL core with hand-derived backward."""
    return _nll_core_pallas(G, UtZ, zn, vn, n_rows, l_dims)[0]


nll_core_pallas.defvjp(_core_fwd, _core_bwd)


def _dispatch_nll_core(G, UtZ, zn, vn, n_rows, l_dims):
    if G.dtype != jnp.float32 or UtZ.dtype != jnp.float32:
        return NotImplemented
    if not (_on_tpu() or _interpret()):
        return NotImplemented
    if G.shape[0] > 512:  # VMEM budget for the single-tile factorization
        return NotImplemented
    return nll_core_pallas(G, UtZ, zn, vn, n_rows, l_dims)


register_pallas("woodbury_nll_core", _dispatch_nll_core)
