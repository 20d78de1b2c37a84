"""Pallas TPU kernels for the GP hot path (SURVEY.md §2.2 table).

The reference gets these from cuBLAS as three separate GEMM/reduction calls;
the TPU-native win is *fusion over the N axis*: U (N×R) and Z (N×L) are the
big HBM-resident operands, and Phase B needs

    G   = Uᵀ U          (R×R Gram)
    UtZ = Uᵀ Z          (R×L projection)
    zn² = ‖Z‖_F²

all three of which stream the same rows. `factor_prep` computes them in ONE
pass: each grid step loads a (TILE_N × R) U-tile and (TILE_N × L) Z-tile
into VMEM once, feeds both MXU contractions and the VPU reduction, and
accumulates into resident VMEM outputs — ⅓ the HBM traffic of the separate
calls that XLA emits (it will not fuse three dots over a shared operand).

Non-tile-aligned N, R, L (SURVEY.md §7 hard-part #5) are zero-padded: padded
U columns produce zero Gram/projection rows (harmless to the Woodbury core:
B gets an identity block whose log-det contribution is 0), padded rows
contribute nothing.

Backward passes are closed-form small-rank GEMMs (dU = U·(dG+dGᵀ) + Z·dUtZᵀ,
dZ = U·dUtZ + 2·dzn·Z) that XLA already lowers optimally, so the custom_vjp
uses plain jnp there — Pallas only where it beats XLA.

Kernels register with the ops dispatch layer and decline (NotImplemented)
off-TPU or for unsupported dtypes, falling back to XLA. Set
GPPVAE_PALLAS_INTERPRET=1 to run them in interpreter mode (CPU tests).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gppvae_tpu.ops.dispatch import register_pallas

_LANE = 128
_TILE_N = 512


def _round_up_lane(x: int) -> int:
    return -(-x // _LANE) * _LANE


def _fits_vmem(r: int, l: int, tile: int) -> bool:
    """Conservative VMEM budget check (floats): double-buffered input tiles
    plus the resident accumulator blocks must stay well under ~16 MB."""
    rp, lp = _round_up_lane(r), _round_up_lane(l)
    floats = 2 * tile * (rp + lp) + rp * rp + rp * lp
    return floats * 4 <= 10 * 1024 * 1024


def tile_n(n: int = 0, r: int = 0, l: int = 0) -> int:
    """Per-shape N-tile, from the on-device sweep (BASELINE.md "TILE_N
    sweep", 2026-08-16): at N≈6k throughput is flat across 256–2048 (the
    pass is launch/grid-overhead bound), while at N=64k it rises ~11% from
    512→2048 (HBM-streaming bound) — so large N takes the largest tile that
    fits the VMEM budget. GPPVAE_TILE_N overrides for sweeps — but still
    halves until the tile fits VMEM (an oversized override would otherwise
    fail at Mosaic compile instead of declining like every other path)."""
    env = os.environ.get("GPPVAE_TILE_N")
    t = int(env) if env else (2048 if n >= 32768 else _TILE_N)
    while t > 128 and not _fits_vmem(r, l, t):
        t //= 2
    return t


def _interpret() -> bool:
    return os.environ.get("GPPVAE_PALLAS_INTERPRET") == "1"


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _factor_prep_kernel(u_ref, z_ref, g_ref, utz_ref, zn_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        g_ref[:] = jnp.zeros_like(g_ref)
        utz_ref[:] = jnp.zeros_like(utz_ref)
        zn_ref[0, 0] = jnp.float32(0.0)

    u = u_ref[:]
    z = z_ref[:]
    g_ref[:] += jax.lax.dot_general(
        u, u, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    utz_ref[:] += jax.lax.dot_general(
        u, z, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    zn_ref[0, 0] += jnp.sum(z * z)


@functools.partial(jax.jit, static_argnums=(2,))
def _factor_prep_pallas(U: jax.Array, Z: jax.Array, tile_n: int):
    N, R = U.shape
    _, L = Z.shape
    Np = _round_up(N, tile_n)
    Rp = _round_up(R, _LANE)
    Lp = _round_up(L, _LANE)
    Upad = jnp.pad(U, ((0, Np - N), (0, Rp - R)))
    Zpad = jnp.pad(Z, ((0, Np - N), (0, Lp - L)))

    grid = (Np // tile_n,)
    g, utz, zn = pl.pallas_call(
        _factor_prep_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, Rp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, Lp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((Rp, Rp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Rp, Lp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Rp, Rp), jnp.float32),
            jax.ShapeDtypeStruct((Rp, Lp), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Np * Rp * (Rp + Lp) + 2 * Np * Lp,
            bytes_accessed=4 * Np * (Rp + Lp) + 4 * (Rp * Rp + Rp * Lp),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(Upad, Zpad)
    return g[:R, :R], utz[:R, :L], zn[0, 0]


# ------------------------------------------------------------------ VJP


def _fp_fwd(U, Z):
    out = _factor_prep_pallas(U, Z, tile_n(U.shape[0], U.shape[1], Z.shape[1]))
    return out, (U, Z)


def _fp_bwd(res, cts):
    U, Z = res
    dG, dUtZ, dzn = cts
    # G = UᵀU is consumed symmetrically downstream but cotangents may not be;
    # the exact transpose is U(dG + dGᵀ).
    dU = U @ (dG + dG.T) + Z @ dUtZ.T
    dZ = U @ dUtZ + (2.0 * dzn) * Z
    return dU, dZ


@jax.custom_vjp
def factor_prep_pallas(U: jax.Array, Z: jax.Array):
    """(G, UᵀZ, ‖Z‖²) in one fused pass. float32, any N/R/L (padded)."""
    return _factor_prep_pallas(U, Z, tile_n(U.shape[0], U.shape[1], Z.shape[1]))


factor_prep_pallas.defvjp(_fp_fwd, _fp_bwd)


def _dispatch_factor_prep(U, Z):
    if U.dtype != jnp.float32 or Z.dtype != jnp.float32:
        return NotImplemented
    if not (_on_tpu() or _interpret()):
        return NotImplemented
    tile = tile_n(U.shape[0], U.shape[1], Z.shape[1])
    if not _fits_vmem(U.shape[1], Z.shape[1], tile):
        return NotImplemented  # huge-R configs even at tile 128: XLA handles it
    return factor_prep_pallas(U, Z)


register_pallas("factor_prep", _dispatch_factor_prep)
# no pallas gram: a standalone Uᵀ U is a single XLA dot that the MXU already
# handles optimally — the fused kernel only pays when G/UtZ/‖Z‖² share one
# pass (running it with a dummy Z would stream a wasted zero operand)
