"""Backend dispatch for the GP hot ops.

XLA implementations live here (they are one-liners); Pallas implementations
register themselves lazily from gppvae_tpu/ops/pallas_gemm.py and
pallas_chol.py to keep import time low and to avoid importing pallas on
platforms without it.
"""

from __future__ import annotations

import contextlib
import os
from typing import Callable

import jax
import jax.numpy as jnp

_BACKEND = os.environ.get("GPPVAE_OPS_BACKEND", "xla")
_PALLAS_IMPLS: dict[str, Callable] = {}
_PALLAS_LOADED = False
# (Mesh, data_axis_name) under SPMD training — lets the pallas backend run
# its fused kernels per-shard inside shard_map with psum'd R-sized outputs
# (SURVEY.md §5 "Gram UᵀU … computed per-shard then psum over ICI")
_MESH_AXIS: tuple | None = None


def set_mesh(mesh, axis_name: str | None = None) -> None:
    """Declare the SPMD mesh for subsequent ops (None clears). Row-major
    operands of N-streaming ops must be sharded on dim 0 over `axis_name`
    (defaults to the mesh's first axis) with equal shards."""
    global _MESH_AXIS
    _MESH_AXIS = None if mesh is None else (mesh, axis_name or mesh.axis_names[0])


def get_mesh():
    return _MESH_AXIS


@contextlib.contextmanager
def use_mesh(mesh, axis_name: str | None = None):
    global _MESH_AXIS
    prev = _MESH_AXIS
    set_mesh(mesh, axis_name)
    try:
        yield
    finally:
        _MESH_AXIS = prev


def set_backend(name: str) -> None:
    global _BACKEND
    if name not in ("xla", "pallas"):
        raise ValueError(f"unknown ops backend {name!r}; want 'xla' or 'pallas'")
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


@contextlib.contextmanager
def use_backend(name: str):
    global _BACKEND
    prev = _BACKEND
    set_backend(name)
    try:
        yield
    finally:
        _BACKEND = prev


def _load_pallas() -> None:
    """Import the Pallas kernel modules once, on first 'pallas' dispatch."""
    global _PALLAS_LOADED
    if _PALLAS_LOADED:
        return
    _PALLAS_LOADED = True
    try:
        from gppvae_tpu.ops import pallas_chol, pallas_gemm  # noqa: F401
    except ImportError:  # pragma: no cover — platform without pallas support
        # ONLY missing-dependency imports fall back silently; any other
        # exception (a typo'd refactor, a renamed symbol) must surface —
        # a blanket except would permanently and silently degrade the
        # 'pallas' backend to XLA, hiding kernel regressions from the
        # TPU test tier and every benchmark (review finding).
        pass


def register_pallas(name: str, fn: Callable) -> None:
    _PALLAS_IMPLS[name] = fn


def _dispatch(name: str, xla_fn: Callable, impl: str | None, *args):
    if impl is not None and impl not in ("xla", "pallas"):
        # same contract as set_backend: a typo'd impl ('Pallas', 'palas')
        # must not silently measure/validate the XLA path instead
        raise ValueError(f"unknown ops impl {impl!r}; want 'xla' or 'pallas'")
    backend = impl or _BACKEND
    if backend == "pallas":
        _load_pallas()
        fn = _PALLAS_IMPLS.get(name)
        if fn is not None:
            out = fn(*args)
            if out is NotImplemented:  # kernel declined (shape/dtype/platform)
                return xla_fn(*args)
            return out
    return xla_fn(*args)


# ---------------------------------------------------------------- XLA impls


def _xla_gram(U: jax.Array) -> jax.Array:
    return jnp.dot(U.T, U, preferred_element_type=U.dtype)


def _xla_matmul_tn(A: jax.Array, B: jax.Array) -> jax.Array:
    return jnp.dot(A.T, B, preferred_element_type=A.dtype)


def _xla_sqnorm(X: jax.Array) -> jax.Array:
    return jnp.sum(jnp.square(X))


def _xla_factor_prep(U: jax.Array, Z: jax.Array):
    return (
        jnp.dot(U.T, U, preferred_element_type=U.dtype),
        jnp.dot(U.T, Z, preferred_element_type=U.dtype),
        jnp.sum(jnp.square(Z)),
    )


def _xla_woodbury_nll_core(G, UtZ, zn, vn, n_rows, l_dims):
    import math

    R = G.shape[0]
    B = jnp.eye(R, dtype=G.dtype) + G / vn
    Lb = jax.lax.linalg.cholesky(B)
    logdet = n_rows * jnp.log(vn) + 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lb)))
    W = jax.scipy.linalg.solve_triangular(Lb, UtZ, lower=True)
    quad = (zn - jnp.sum(jnp.square(W)) / vn) / vn
    return 0.5 * (
        l_dims * logdet + quad + n_rows * l_dims * math.log(2.0 * math.pi)
    )


# ------------------------------------------------------------- public ops


def gram(U: jax.Array, *, impl: str | None = None) -> jax.Array:
    """Uᵀ U for tall-skinny U (N×R, N ≫ R). The Phase-B Gram (SURVEY §3.3)."""
    return _dispatch("gram", _xla_gram, impl, U)


def matmul_tn(A: jax.Array, B: jax.Array, *, impl: str | None = None) -> jax.Array:
    """Aᵀ B with A: (N, R), B: (N, L) — the Uᵀ Z projection."""
    return _dispatch("matmul_tn", _xla_matmul_tn, impl, A, B)


def sqnorm(X: jax.Array, *, impl: str | None = None) -> jax.Array:
    """‖X‖_F² as a fused single-pass reduction."""
    return _dispatch("sqnorm", _xla_sqnorm, impl, X)


def factor_prep(U: jax.Array, Z: jax.Array, *, impl: str | None = None):
    """(Uᵀ U, Uᵀ Z, ‖Z‖²) — the Phase-B factor prep, fused in one HBM pass
    on the pallas backend (SURVEY.md §3.3's Gram + projection + reduction).

    Under a declared mesh (set_mesh) with the pallas backend, the fused
    kernel runs per-shard inside shard_map and the R-sized outputs are
    psum'd over the data axis — Pallas and N-sharding compose instead of
    excluding each other. The XLA path stays auto-SPMD (GSPMD partitions
    the dots itself)."""
    if (impl or _BACKEND) == "pallas" and _MESH_AXIS is not None:
        return _factor_prep_shard_map(U, Z, impl)
    return _dispatch("factor_prep", _xla_factor_prep, impl, U, Z)


def _factor_prep_shard_map(U: jax.Array, Z: jax.Array, impl: str | None = None):
    """Per-shard fused Gram/projection/norm + psum over the data axis.

    Each device streams only its N/ndev rows of U and Z through the Pallas
    kernel (which may still decline per-shard and fall back to XLA); the
    wire traffic is one R×R + R×L + scalar psum over ICI per call."""
    mesh, axis = _MESH_AXIS
    from jax.sharding import PartitionSpec as P

    def local(u, z):
        # thread the caller's explicit impl through (an explicit 'pallas'
        # was previously dropped here and the global backend decided —
        # a parity test under set_mesh could compare XLA to XLA vacuously)
        out = _dispatch("factor_prep", _xla_factor_prep, impl, u, z)
        return jax.lax.psum(tuple(out), axis)

    # check_vma=False: pallas_call's out_shapes carry no varying-mesh-axes
    # annotation; replication of the outputs is guaranteed by the psum above
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis)), out_specs=(P(), P(), P()),
        check_vma=False,
    )(U, Z)


def woodbury_nll_core(G, UtZ, zn, vn, n_rows, l_dims, *, impl: str | None = None):
    """The NLL tail from the R-sized core: Cholesky of B = I + G/vn,
    triangular solve, log-det and quadratic form → scalar NLL (with const).
    One fused kernel + hand-derived VJP on the pallas backend; n_rows/l_dims
    are the true (unpadded) N and L."""
    return _dispatch(
        "woodbury_nll_core", _xla_woodbury_nll_core, impl,
        G, UtZ, zn, vn, n_rows, l_dims,
    )
