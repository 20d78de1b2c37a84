"""Pallas kernel parity tests (SURVEY.md §4.1).

Default tier runs the kernels in interpreter mode on CPU (the Pallas
sanitizer story, SURVEY.md §5); the tpu-marked tier compiles them for the
real chip. Shapes include non-tile-aligned N/R/L (padding paths).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gppvae_tpu import gp, ops


@pytest.fixture(autouse=True)
def _interpret_mode():
    if not os.environ.get("RUN_TPU_TESTS"):
        os.environ["GPPVAE_PALLAS_INTERPRET"] = "1"
        yield
        del os.environ["GPPVAE_PALLAS_INTERPRET"]
    else:
        yield


def _rand(key, n, r, l):
    k1, k2 = jax.random.split(key)
    U = jax.random.normal(k1, (n, r), jnp.float32)
    Z = jax.random.normal(k2, (n, l), jnp.float32)
    return U, Z


@pytest.mark.parametrize(
    "n,r,l",
    [
        (512, 128, 128),  # tile-aligned
        (999, 56, 16),    # nothing aligned (benchmark-ish R, L)
        (64, 3, 1),       # tiny
        (6400, 56, 16),   # benchmark shape
    ],
)
def test_factor_prep_matches_xla(n, r, l):
    U, Z = _rand(jax.random.PRNGKey(0), n, r, l)
    g_ref, utz_ref, zn_ref = ops.factor_prep(U, Z, impl="xla")
    g, utz, zn = ops.factor_prep(U, Z, impl="pallas")
    np.testing.assert_allclose(g, g_ref, rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(utz, utz_ref, rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(zn, zn_ref, rtol=2e-5)


def test_factor_prep_gradients_match_xla():
    U, Z = _rand(jax.random.PRNGKey(1), 300, 20, 7)
    ka, kb = jax.random.split(jax.random.PRNGKey(5))
    A = jax.random.normal(ka, (20, 20), jnp.float32)  # asymmetric cotangent
    B = jax.random.normal(kb, (20, 7), jnp.float32)

    def loss(impl):
        def f(U, Z):
            G, UtZ, zn = ops.factor_prep(U, Z, impl=impl)
            return jnp.sum(G * A) + jnp.sum(UtZ * B) + 3.0 * zn

        return f

    gU_ref, gZ_ref = jax.grad(loss("xla"), argnums=(0, 1))(U, Z)
    gU, gZ = jax.grad(loss("pallas"), argnums=(0, 1))(U, Z)
    np.testing.assert_allclose(gU, gU_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gZ, gZ_ref, rtol=1e-4, atol=1e-4)


def test_gram_backend_contract():
    # standalone gram has no registered pallas impl (a single XLA dot is
    # already optimal); the dispatch must fall through cleanly
    U, _ = _rand(jax.random.PRNGKey(2), 777, 37, 1)
    g_ref = ops.gram(U, impl="xla")
    g = ops.gram(U, impl="pallas")  # falls back to XLA
    np.testing.assert_allclose(g, g_ref, rtol=2e-5, atol=1e-4)


def test_nll_same_under_both_backends():
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    V = jax.random.normal(k1, (640, 24), jnp.float32)
    Z = jax.random.normal(k2, (640, 12), jnp.float32)
    vs, vn = jnp.float32(0.8), jnp.float32(0.3)
    with ops.use_backend("xla"):
        ref = gp.gp_nll_from_features(Z, V, vs, vn)
    with ops.use_backend("pallas"):
        out = gp.gp_nll_from_features(Z, V, vs, vn)
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_float64_falls_back_to_xla():
    # f64 isn't TPU-supported; dispatch must silently decline to XLA
    U = jnp.ones((32, 4), jnp.float64)
    Z = jnp.ones((32, 2), jnp.float64)
    g, utz, zn = ops.factor_prep(U, Z, impl="pallas")
    np.testing.assert_allclose(g, 32.0 * jnp.ones((4, 4)))
    np.testing.assert_allclose(zn, 64.0)


@pytest.mark.tpu
@pytest.mark.parametrize(
    "n,r",
    [
        (6400, 128),   # lane-aligned R: exercises the compiled kernel
        (6401, 256),   # aligned R, ragged N: in-kernel row masking
        (6400, 56),    # unaligned R: perf-declines to XLA on TPU (still exact)
    ],
)
def test_factor_prep_on_tpu_compiled(n, r):
    U, Z = _rand(jax.random.PRNGKey(4), n, r, 16)
    g_ref, utz_ref, zn_ref = ops.factor_prep(U, Z, impl="xla")
    g, utz, zn = ops.factor_prep(U, Z, impl="pallas")
    np.testing.assert_allclose(g, g_ref, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(utz, utz_ref, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(zn, zn_ref, rtol=1e-4)


class TestNLLCore:
    """Fused chol+trisolve+logdet kernel and its hand-derived VJP."""

    def _problem(self, seed=0, n=500, r=24, l=9):
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        U = jax.random.normal(k1, (n, r), jnp.float32)
        Z = jax.random.normal(k2, (n, l), jnp.float32)
        G = U.T @ U
        UtZ = U.T @ Z
        zn = jnp.sum(Z * Z)
        vn = jnp.float32(0.37)
        return G, UtZ, zn, vn, n, l

    @pytest.mark.parametrize("r,l", [(24, 9), (128, 128), (56, 16), (3, 1)])
    def test_value_matches_xla(self, r, l):
        G, UtZ, zn, vn, n, l = self._problem(0, 500, r, l)
        ref = ops.woodbury_nll_core(G, UtZ, zn, vn, n, l, impl="xla")
        out = ops.woodbury_nll_core(G, UtZ, zn, vn, n, l, impl="pallas")
        np.testing.assert_allclose(out, ref, rtol=3e-6)

    def test_hand_vjp_matches_autodiff(self):
        G, UtZ, zn, vn, n, l = self._problem(1)

        def f(impl):
            return lambda G, UtZ, zn, vn: ops.woodbury_nll_core(
                G, UtZ, zn, vn, n, l, impl=impl
            )

        ref = jax.grad(f("xla"), argnums=(0, 1, 2, 3))(G, UtZ, zn, vn)
        out = jax.grad(f("pallas"), argnums=(0, 1, 2, 3))(G, UtZ, zn, vn)
        for a, b in zip(out, ref):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)

    def test_full_nll_gradients_both_backends(self):
        # end-to-end: grad of gp_nll_from_features w.r.t. (Z, V, variances)
        k1, k2 = jax.random.split(jax.random.PRNGKey(2))
        V = jax.random.normal(k1, (300, 20), jnp.float32)
        Z = jax.random.normal(k2, (300, 8), jnp.float32)

        def nll(Z, V, lvs, lvn, impl):
            with ops.use_backend(impl):
                return gp.gp_nll_from_features(
                    Z, V, jnp.exp(lvs), jnp.exp(lvn)
                )

        args = (Z, V, jnp.float32(-0.2), jnp.float32(-1.0))
        ref = jax.grad(nll, argnums=(0, 1, 2, 3))(*args, "xla")
        out = jax.grad(nll, argnums=(0, 1, 2, 3))(*args, "pallas")
        for a, b in zip(out, ref):
            np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5)


@pytest.mark.tpu
def test_nll_core_on_tpu_compiled():
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    U = jax.random.normal(k1, (6400, 56), jnp.float32)
    Z = jax.random.normal(k2, (6400, 16), jnp.float32)
    G, UtZ, zn = U.T @ U, U.T @ Z, jnp.sum(Z * Z)
    vn = jnp.float32(0.4)
    ref = ops.woodbury_nll_core(G, UtZ, zn, vn, 6400, 16, impl="xla")
    out = ops.woodbury_nll_core(G, UtZ, zn, vn, 6400, 16, impl="pallas")
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_tile_n_override_respects_vmem_budget(monkeypatch):
    """GPPVAE_TILE_N is a sweep override, not a footgun: an oversized tile
    is halved until it fits the VMEM budget instead of failing at Mosaic
    compile (round-2 VERDICT weak #4)."""
    from gppvae_tpu.ops.pallas_gemm import _fits_vmem, tile_n

    monkeypatch.setenv("GPPVAE_TILE_N", "1024")
    assert tile_n(4096, 56, 16) == 1024  # fits → honored verbatim
    # R=2048 at tile 1024 blows the budget → halve-until-fits
    t = tile_n(4096, 2048, 8)
    assert t < 1024
    assert _fits_vmem(2048, 8, t) or t == 128


def test_factor_prep_declines_large_rank_to_xla():
    """RFF-scale R must fall back to XLA (VMEM budget guard), not abort."""
    U = jnp.ones((256, 2048), jnp.float32)
    Z = jnp.ones((256, 8), jnp.float32)
    g, utz, zn = ops.factor_prep(U, Z, impl="pallas")  # silently XLA
    np.testing.assert_allclose(g[0, 0], 256.0)
    np.testing.assert_allclose(zn, 2048.0)
