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

Where that wins and where it doesn't (round-3 device-trace A/B,
BASELINE.md "kernel-level factor_prep"): with lane-ALIGNED R (128..1024)
and HBM-resident operands the fused pass beats XLA's two dots 1.3–2×.
With lane-unaligned R, XLA:TPU feeds the custom call through a
tiled→packed relayout (~117 GB/s) that no kernel code can avoid, and when
U comes from an in-program producer XLA fuses the producer into its own
dot but must materialize it for the opaque call — in both regimes XLA
wins, so the dispatch declines (see _dispatch_factor_prep).

Non-tile-aligned N (SURVEY.md §7 hard-part #5) is handled by masking the
ragged last tile's rows inside the kernel — NOT by a host-side jnp.pad:
padding materialized full copies of U and Z in HBM before the kernel ran
(at N=65k/R=56 that was ~5× the kernel's own traffic) and was the round-3
kernel A/B's root cause for losing the bandwidth-bound regime to XLA.
R and L need no padding at all: each N-tile block spans the full row, a
contiguous HBM region, and Mosaic lane-pads VMEM internally.

MXU precision matches the XLA fallback it replaces (`_xla_factor_prep`
uses default-precision jnp.dot): on real TPU inputs are cast to bfloat16
for a single MXU pass with f32 accumulation — exactly XLA's TPU default —
instead of the multi-pass true-f32 Mosaic dot that made the round-3 A/B
lose the compute-bound regime ~2×. Interpret/CPU keeps f32 operands,
matching CPU XLA's default, so parity tests hold on both platforms.
GPPVAE_PALLAS_F32=1 forces f32 operands on TPU for accuracy A/Bs.

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


def _mxu_dtype() -> jnp.dtype:
    """Operand dtype for the kernel's MXU contractions. On real TPU, match
    the XLA fallback's default-precision jnp.dot (bf16 operands, one MXU
    pass, f32 accumulation); in interpret mode match CPU XLA (full f32).
    GPPVAE_PALLAS_F32=1 forces f32 operands on TPU (multi-pass, ~2× slower
    at compute-bound R — the round-3 A/B's measured loss)."""
    if _interpret() or os.environ.get("GPPVAE_PALLAS_F32") == "1":
        return jnp.float32
    return jnp.bfloat16


def _make_factor_prep_kernel(n: int, tile: int, mxu_dtype):
    ragged = n % tile != 0

    def kernel(u_ref, z_ref, g_ref, utz_ref, zn_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            g_ref[:] = jnp.zeros_like(g_ref)
            utz_ref[:] = jnp.zeros_like(utz_ref)
            zn_ref[0, 0] = jnp.float32(0.0)

        u = u_ref[:]
        z = z_ref[:]
        if ragged:
            # Last tile reads past N: those rows are unspecified — zero
            # them (sublane mask; lane-dim masking is never needed because
            # blocks span the full row).
            rows = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
            valid = rows < (n - i * tile)
            u = jnp.where(valid, u, 0.0)
            z = jnp.where(valid, z, 0.0)
        um = u.astype(mxu_dtype)
        zm = z.astype(mxu_dtype)
        g_ref[:] += jax.lax.dot_general(
            um, um, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        utz_ref[:] += jax.lax.dot_general(
            um, zm, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        zn_ref[0, 0] += jnp.sum(z * z)

    return kernel


@functools.partial(jax.jit, static_argnums=(2,))
def _factor_prep_pallas(U: jax.Array, Z: jax.Array, tile_n: int):
    N, R = U.shape
    _, L = Z.shape
    grid = (_round_up(N, tile_n) // tile_n,)
    g, utz, zn = pl.pallas_call(
        _make_factor_prep_kernel(N, tile_n, _mxu_dtype()),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, R), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((R, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, R), jnp.float32),
            jax.ShapeDtypeStruct((R, L), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * R * (R + L) + 2 * N * L,
            bytes_accessed=4 * N * (R + L) + 4 * (R * R + R * L),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(U, Z)
    return g, utz, zn[0, 0]


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
    if not _interpret() and U.shape[1] % _LANE != 0:
        # Performance decline, measured (round-3 kernel A/B, BASELINE.md):
        # XLA:TPU hands custom calls lane-UNALIGNED operands through a
        # tiled→packed relayout copy that streams at ~117 GB/s (vs
        # ~671 GB/s for aligned operands) — nothing inside Pallas can
        # avoid it (operand layouts aren't controllable), so at R=56 the
        # kernel loses ~2× to XLA's fused dots no matter what the kernel
        # does. Aligned R (128..1024): the kernel WINS 1.3–2× (one fused
        # pass over U vs XLA's two dots). Unaligned L rides along fine
        # (Z's traffic is small); only U's lane dim gates.
        return NotImplemented
    tile = tile_n(U.shape[0], U.shape[1], Z.shape[1])
    if not _fits_vmem(U.shape[1], Z.shape[1], tile):
        return NotImplemented  # huge-R configs even at tile 128: XLA handles it
    return factor_prep_pallas(U, Z)


register_pallas("factor_prep", _dispatch_factor_prep)
# no pallas gram: a standalone Uᵀ U is a single XLA dot that the MXU already
# handles optimally — the fused kernel only pays when G/UtZ/‖Z‖² share one
# pass (running it with a dummy Z would stream a wasted zero operand)
