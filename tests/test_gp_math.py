"""Math property tests: Woodbury path vs dense oracles (SURVEY.md §4.2).

Small N so K can be materialized; float64 on CPU so tolerances are tight.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gppvae_tpu import gp
from gppvae_tpu.gp import dense


def _random_problem(key, N=96, L=7, P=11, Q=5, M=3, Mw=4, dtype=jnp.float64):
    ks = jax.random.split(key, 6)
    X = jax.random.normal(ks[0], (P, M), dtype)
    W = jax.random.normal(ks[1], (Q, Mw), dtype)
    d = jax.random.randint(ks[2], (N,), 0, P)
    q = jax.random.randint(ks[3], (N,), 0, Q)
    Z = jax.random.normal(ks[4], (N, L), dtype)
    V = gp.build_V(X, W, d, q, normalize_X=True, normalize_W=True)
    v_sig = jnp.asarray(0.7, dtype)
    v_noise = jnp.asarray(0.3, dtype)
    return Z, V, v_sig, v_noise, (X, W, d, q)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_woodbury_nll_matches_dense(seed):
    Z, V, v_sig, v_noise, _ = _random_problem(jax.random.PRNGKey(seed))
    nll_wood = gp.gp_nll_from_features(Z, V, v_sig, v_noise)
    K = dense.materialize_K(V, v_sig, v_noise)
    nll_dense = dense.dense_nll(Z, K)
    np.testing.assert_allclose(nll_wood, nll_dense, rtol=1e-10)


def test_nll_matches_scipy_multivariate_normal():
    Z, V, v_sig, v_noise, _ = _random_problem(jax.random.PRNGKey(3), N=48, L=3)
    from scipy.stats import multivariate_normal

    K = np.asarray(dense.materialize_K(V, v_sig, v_noise))
    logpdf = sum(
        multivariate_normal.logpdf(np.asarray(Z[:, l]), mean=None, cov=K)
        for l in range(Z.shape[1])
    )
    nll_wood = gp.gp_nll_from_features(Z, V, v_sig, v_noise)
    np.testing.assert_allclose(nll_wood, -logpdf, rtol=1e-9)


def test_logdet_matches_slogdet():
    Z, V, v_sig, v_noise, _ = _random_problem(jax.random.PRNGKey(4))
    factors = gp.factorize(V, v_sig, v_noise)
    K = dense.materialize_K(V, v_sig, v_noise)
    sign, logdet = jnp.linalg.slogdet(K)
    assert sign == 1.0
    np.testing.assert_allclose(factors.logdet, logdet, rtol=1e-10)


def test_kinv_apply_matches_dense_solve():
    Z, V, v_sig, v_noise, _ = _random_problem(jax.random.PRNGKey(5))
    factors = gp.factorize(V, v_sig, v_noise)
    M = gp.kinv_z_core(factors, Z)
    kinv_z = (Z - factors.U @ M) / factors.v_noise
    K = dense.materialize_K(V, v_sig, v_noise)
    np.testing.assert_allclose(kinv_z, jnp.linalg.solve(K, Z), rtol=1e-8)


def test_multiple_random_effects():
    key = jax.random.PRNGKey(6)
    ks = jax.random.split(key, 3)
    N, L = 64, 5
    V1 = jax.random.normal(ks[0], (N, 4), jnp.float64)
    V2 = jax.random.normal(ks[1], (N, 6), jnp.float64)
    Z = jax.random.normal(ks[2], (N, L), jnp.float64)
    v1, v2, vn = jnp.float64(0.5), jnp.float64(1.2), jnp.float64(0.4)
    nll_wood = gp.gp_nll_from_features(Z, [V1, V2], [v1, v2], vn)
    K = dense.materialize_K([V1, V2], [v1, v2], vn)
    np.testing.assert_allclose(nll_wood, dense.dense_nll(Z, K), rtol=1e-10)


def test_predictive_matches_dense():
    key = jax.random.PRNGKey(7)
    Z, V, v_sig, v_noise, (X, W, d, q) = _random_problem(key)
    # held-out rows: fresh (object, view) combinations
    d_star = jnp.array([0, 3, 7], dtype=d.dtype)
    q_star = jnp.array([1, 4, 2], dtype=q.dtype)
    V_star = gp.build_V(X, W, d_star, q_star, normalize_X=True, normalize_W=True)

    factors = gp.factorize(V, v_sig, v_noise)
    z_star = gp.predict_latents(V_star, factors, Z, v_sig)

    K = dense.materialize_K(V, v_sig, v_noise)
    K_star = v_sig * (V_star @ V.T)
    np.testing.assert_allclose(z_star, dense.dense_predict(K_star, K, Z), rtol=1e-8)


def test_fourier_view_features_periodic_unit_norm():
    angles = jnp.linspace(0.0, 2 * jnp.pi, 16, endpoint=False, dtype=jnp.float64)
    Wf = gp.fourier_view_features(angles, num_freqs=3)
    np.testing.assert_allclose(jnp.linalg.norm(Wf, axis=1), 1.0, rtol=1e-12)
    # kernel depends only on angle difference (stationarity / periodicity)
    Kv = Wf @ Wf.T
    np.testing.assert_allclose(Kv[0, 3], Kv[5, 8], rtol=1e-10)
    np.testing.assert_allclose(jnp.diagonal(Kv), 1.0, rtol=1e-12)
    # wrap-around: k(θ_0, θ_15) == k(θ_0, θ_1)
    np.testing.assert_allclose(Kv[0, 15], Kv[0, 1], rtol=1e-10)


def test_view_features_reject_degenerate_rank():
    """num_freqs=0 / degree=0 would silently build a rank-1 CONSTANT view
    kernel (no view discrimination) — the library rejects it, matching the
    trainer's view_feature_dim validation (round-3 VERDICT weak #7)."""
    import pytest as _pytest

    angles = jnp.linspace(0.0, 2 * jnp.pi, 8, endpoint=False)
    with _pytest.raises(ValueError, match="num_freqs"):
        gp.fourier_view_features(angles, num_freqs=0)
    with _pytest.raises(ValueError, match="degree"):
        gp.polynomial_view_features(jnp.linspace(0.0, 1.0, 8), degree=0)


def test_kron_rows_hadamard_identity():
    key = jax.random.PRNGKey(8)
    a, b = jax.random.split(key)
    Xr = jax.random.normal(a, (10, 3), jnp.float64)
    Wr = jax.random.normal(b, (10, 4), jnp.float64)
    V = gp.kron_rows(Xr, Wr)
    np.testing.assert_allclose(V @ V.T, (Xr @ Xr.T) * (Wr @ Wr.T), rtol=1e-12)


class TestTaylor:
    def _setup(self, key):
        Z0, V0, v_sig, v_noise, _ = _random_problem(key, N=80, L=6)
        aux0 = {"log_vs": jnp.log(v_sig)[None], "log_vn": jnp.log(v_noise)}

        def nll_fn(Z, V, aux):
            return gp.gp_nll_from_features(
                Z, V, jnp.exp(aux["log_vs"][0]), jnp.exp(aux["log_vn"])
            )

        return nll_fn, Z0, V0, aux0

    def test_value_at_expansion_point(self):
        nll_fn, Z0, V0, aux0 = self._setup(jax.random.PRNGKey(9))
        coeffs = gp.taylor_expand(nll_fn, Z0, V0, aux0)
        np.testing.assert_allclose(coeffs.value, nll_fn(Z0, V0, aux0), rtol=1e-12)

    def test_first_order_matches_finite_difference(self):
        nll_fn, Z0, V0, aux0 = self._setup(jax.random.PRNGKey(10))
        coeffs = gp.taylor_expand(nll_fn, Z0, V0, aux0)
        key = jax.random.PRNGKey(11)
        kz, kv, k1, k2 = jax.random.split(key, 4)
        dZ_dir = jax.random.normal(kz, Z0.shape, Z0.dtype)
        dV_dir = jax.random.normal(kv, V0.shape, V0.dtype)
        daux_dir = {
            "log_vs": jax.random.normal(k1, (1,), Z0.dtype),
            "log_vn": jax.random.normal(k2, (), Z0.dtype),
        }
        eps = 1e-6
        plus = nll_fn(
            Z0 + eps * dZ_dir,
            V0 + eps * dV_dir,
            jax.tree.map(lambda a, d: a + eps * d, aux0, daux_dir),
        )
        minus = nll_fn(
            Z0 - eps * dZ_dir,
            V0 - eps * dV_dir,
            jax.tree.map(lambda a, d: a - eps * d, aux0, daux_dir),
        )
        fd = (plus - minus) / (2 * eps)
        analytic = (
            jnp.vdot(coeffs.dZ, dZ_dir)
            + jnp.vdot(coeffs.dV, dV_dir)
            + jnp.vdot(coeffs.daux["log_vs"], daux_dir["log_vs"])
            + jnp.vdot(coeffs.daux["log_vn"], daux_dir["log_vn"])
        )
        np.testing.assert_allclose(analytic, fd, rtol=1e-6)

    def test_surrogate_epoch_gradient_equals_full_gradient(self):
        """Summing the per-batch surrogate gradients over a full epoch must
        reproduce the exact full-dataset NLL gradient at the expansion point
        (the load-bearing property of Phase C, SURVEY.md §3.2)."""
        nll_fn, Z0, V0, aux0 = self._setup(jax.random.PRNGKey(12))
        coeffs = gp.taylor_expand(nll_fn, Z0, V0, aux0)
        N = Z0.shape[0]
        bs = 16

        def epoch_surrogate(Z, V, aux):
            total = 0.0
            for start in range(0, N, bs):
                idx = jnp.arange(start, start + bs)
                total = total + gp.surrogate_batch_term(
                    coeffs, idx, Z[idx], V[idx], aux, N
                )
            return total

        g_sur = jax.grad(epoch_surrogate, argnums=(0, 1, 2))(Z0, V0, aux0)
        g_full = jax.grad(nll_fn, argnums=(0, 1, 2))(Z0, V0, aux0)
        np.testing.assert_allclose(g_sur[0], g_full[0], rtol=1e-10)
        np.testing.assert_allclose(g_sur[1], g_full[1], rtol=1e-10)
        for a, b in zip(jax.tree.leaves(g_sur[2]), jax.tree.leaves(g_full[2])):
            np.testing.assert_allclose(a, b, rtol=1e-10)

    def test_surrogate_epoch_gradient_non_divisible_batches(self):
        """Same identity when bs ∤ N: the trainers' masked wrap-around plan
        (train/batching.epoch_batches) must leave the accumulated epoch
        gradient exact — the round-1 dropped-rows hole (VERDICT weak #3)."""
        from gppvae_tpu.train.batching import epoch_batches

        nll_fn, Z0, V0, aux0 = self._setup(jax.random.PRNGKey(13))
        coeffs = gp.taylor_expand(nll_fn, Z0, V0, aux0)
        N, bs = Z0.shape[0], 13  # N=80: 7 batches, last one 11 rows padding
        batches, weights = epoch_batches(jax.random.PRNGKey(14), N, bs)
        assert batches.shape == (7, bs)
        # every row appears exactly once with weight 1
        flat = np.asarray(batches.reshape(-1))[np.asarray(weights.reshape(-1)) > 0]
        assert sorted(flat.tolist()) == list(range(N))

        def epoch_surrogate(Z, V, aux):
            total = 0.0
            for b in range(batches.shape[0]):
                idx, w = batches[b], weights[b]
                total = total + gp.surrogate_batch_term(
                    coeffs, idx, Z[idx], V[idx], aux, N, weights=w
                )
            return total

        g_sur = jax.grad(epoch_surrogate, argnums=(0, 1, 2))(Z0, V0, aux0)
        g_full = jax.grad(nll_fn, argnums=(0, 1, 2))(Z0, V0, aux0)
        np.testing.assert_allclose(g_sur[0], g_full[0], rtol=1e-10)
        np.testing.assert_allclose(g_sur[1], g_full[1], rtol=1e-10)
        for a, b in zip(jax.tree.leaves(g_sur[2]), jax.tree.leaves(g_full[2])):
            np.testing.assert_allclose(a, b, rtol=1e-10)


def test_rff_map_approximates_rbf_kernel():
    from gppvae_tpu import gp

    key = jax.random.PRNGKey(20)
    F = jax.random.normal(key, (12, 4), jnp.float64) * 0.7
    ell = 0.9
    phi, m = gp.make_rff_map(4, 4096, lengthscale=ell, seed=1)
    K_hat = phi(F.astype(jnp.float32)) @ phi(F.astype(jnp.float32)).T
    d2 = jnp.sum((F[:, None, :] - F[None, :, :]) ** 2, axis=-1)
    K_true = jnp.exp(-d2 / (2 * ell**2))
    np.testing.assert_allclose(K_hat, K_true, atol=0.08)


def test_predictive_variance_matches_dense():
    key = jax.random.PRNGKey(21)
    Z, V, v_sig, v_noise, (X, W, d, q) = _random_problem(key)
    d_star = jnp.array([1, 4, 9], dtype=d.dtype)
    q_star = jnp.array([0, 2, 3], dtype=q.dtype)
    V_star = gp.build_V(X, W, d_star, q_star, normalize_X=True, normalize_W=True)

    factors = gp.factorize(V, v_sig, v_noise)
    mean, var = gp.predict_latents(V_star, factors, Z, v_sig, return_var=True)

    K = dense.materialize_K(V, v_sig, v_noise)
    K_star = v_sig * (V_star @ V.T)
    k_ss = v_sig * jnp.sum(V_star * V_star, axis=1) + v_noise
    var_dense = k_ss - jnp.sum(K_star * jnp.linalg.solve(K, K_star.T).T, axis=1)
    np.testing.assert_allclose(mean, dense.dense_predict(K_star, K, Z), rtol=1e-8)
    np.testing.assert_allclose(var, var_dense, rtol=1e-8)
    assert (np.asarray(var) > 0).all()


def test_predictive_cov_matches_dense():
    """predict_cov_from_core: the full n×n joint posterior covariance from
    the R-sized core equals the dense-oracle K** − K*· K⁻¹ K·* (+ vₙI),
    its diagonal equals predict_from_core's per-row variance exactly, it
    is PSD, and duplicated request rows satisfy the algebraic identity
    cov[i,j] = cov[i,i] − v_noise (identical cells differ only by their
    independent noise)."""
    key = jax.random.PRNGKey(22)
    Z, V, v_sig, v_noise, (X, W, d, q) = _random_problem(key)
    # rows 0 and 3 are the SAME (object, view) cell
    d_star = jnp.array([1, 4, 9, 1], dtype=d.dtype)
    q_star = jnp.array([0, 2, 3, 0], dtype=q.dtype)
    V_star = gp.build_V(X, W, d_star, q_star, normalize_X=True, normalize_W=True)

    factors = gp.factorize(V, v_sig, v_noise)
    core = gp.posterior_core(factors, Z)
    mean, cov = gp.predict_cov_from_core(V_star, core, v_sig)

    K = dense.materialize_K(V, v_sig, v_noise)
    K_star = v_sig * (V_star @ V.T)
    K_ss = v_sig * (V_star @ V_star.T) + v_noise * jnp.eye(4, dtype=K.dtype)
    cov_dense = dense.dense_predict_cov(K_star, K_ss, K)
    np.testing.assert_allclose(cov, cov_dense, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(mean, dense.dense_predict(K_star, K, Z), rtol=1e-8)

    mean2, var = gp.predict_from_core(V_star, core, v_sig, return_var=True)
    np.testing.assert_allclose(np.diagonal(np.asarray(cov)), var, rtol=1e-9)
    np.testing.assert_allclose(mean, mean2, rtol=0)

    assert (np.linalg.eigvalsh(np.asarray(cov)) > 0).all()
    np.testing.assert_allclose(
        cov[0, 3], cov[0, 0] - v_noise, rtol=1e-9
    )
    # symmetry (the B⁻¹ quadratic form must come out exactly symmetric)
    np.testing.assert_allclose(cov, np.asarray(cov).T, rtol=1e-12)
