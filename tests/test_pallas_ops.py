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


def test_gram_matches_xla():
    U, _ = _rand(jax.random.PRNGKey(2), 777, 37, 1)
    g_ref = ops.gram(U, impl="xla")
    g = ops.gram(U, impl="pallas")
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
def test_factor_prep_on_tpu_compiled():
    U, Z = _rand(jax.random.PRNGKey(4), 6400, 56, 16)
    g_ref, utz_ref, zn_ref = ops.factor_prep(U, Z, impl="xla")
    g, utz, zn = ops.factor_prep(U, Z, impl="pallas")
    np.testing.assert_allclose(g, g_ref, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(utz, utz_ref, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(zn, zn_ref, rtol=1e-4)
