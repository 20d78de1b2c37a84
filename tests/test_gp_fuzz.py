"""Hypothesis fuzzing of the Woodbury path vs the dense oracle.

Randomized shapes/seeds/variances beyond the fixed cases in test_gp_math —
the padding and conditioning corners a hand-picked grid misses.
"""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from gppvae_tpu import gp
from gppvae_tpu.gp import dense


@settings(max_examples=5, deadline=None, derandomize=True)
@given(
    n=st.integers(4, 180),
    r=st.integers(1, 24),
    l=st.integers(1, 9),
    seed=st.integers(0, 2**31 - 1),
    log_vs=st.floats(-3.0, 3.0),
    log_vn=st.floats(-4.0, 2.0),
)
def test_nll_matches_dense_fuzz(n, r, l, seed, log_vs, log_vn):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    V = jax.random.normal(k1, (n, r), jnp.float64)
    Z = jax.random.normal(k2, (n, l), jnp.float64)
    vs = jnp.float64(np.exp(log_vs))
    vn = jnp.float64(np.exp(log_vn))
    wood = gp.gp_nll_from_features(Z, V, vs, vn)
    ref = dense.dense_nll(Z, dense.materialize_K(V, vs, vn))
    np.testing.assert_allclose(wood, ref, rtol=1e-8)


@settings(max_examples=3, deadline=None, derandomize=True)
@given(
    n=st.integers(8, 120),
    n_star=st.integers(1, 10),
    r=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1),
)
def test_predictive_matches_dense_fuzz(n, n_star, r, seed):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    V = jax.random.normal(ks[0], (n, r), jnp.float64)
    V_star = jax.random.normal(ks[1], (n_star, r), jnp.float64)
    Z = jax.random.normal(ks[2], (n, 4), jnp.float64)
    vs, vn = jnp.float64(0.9), jnp.float64(0.2)
    factors = gp.factorize(V, vs, vn)
    mean, var = gp.predict_latents(V_star, factors, Z, vs, return_var=True)
    K = dense.materialize_K(V, vs, vn)
    Ks = vs * (V_star @ V.T)
    np.testing.assert_allclose(mean, dense.dense_predict(Ks, K, Z), rtol=1e-7)
    kss = vs * jnp.sum(V_star**2, axis=1) + vn
    var_ref = kss - jnp.sum(Ks * jnp.linalg.solve(K, Ks.T).T, axis=1)
    np.testing.assert_allclose(var, var_ref, rtol=1e-7)
    assert (np.asarray(var) > 0).all()


@settings(max_examples=8, deadline=None, derandomize=True)
@given(
    seed=st.integers(0, 2**31 - 1),
    log_mag=st.floats(-6.0, 8.0),
    clip=st.floats(0.5, 1e6),
)
def test_spike_guard_matches_optax_fuzz(seed, log_mag, clip):
    """spike_guard (one fused Σg² pass) must be bit-identical to
    optax.chain(clip_by_global_norm, adam) on finite gradients across
    random magnitudes — both below the threshold (exact pass-through) and
    above it (same clip arithmetic)."""
    import optax

    from gppvae_tpu.train.train_gppvae import spike_guard

    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    params = {
        "a": jax.random.normal(k1, (3, 5), jnp.float32),
        "b": jax.random.normal(k2, (7,), jnp.float32),
    }
    grads = jax.tree.map(lambda p: p * jnp.float32(10.0**log_mag), params)

    guarded = spike_guard(optax.adam(1e-3), clip)
    ref = optax.chain(optax.clip_by_global_norm(clip), optax.adam(1e-3))
    gs, rs = guarded.init(params), ref.init(params)
    for _ in range(2):
        gu, gs = guarded.update(grads, gs, params)
        ru, rs = ref.update(grads, rs, params)
        for a, b in zip(jax.tree.leaves(gu), jax.tree.leaves(ru)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(gs["notfinite_count"]) == 0


@settings(max_examples=5, deadline=None, derandomize=True)
@given(
    n=st.integers(6, 80),
    n_new=st.integers(2, 40),
    r=st.integers(1, 16),
    n_parts=st.integers(1, 5),
    seed=st.integers(0, 2**31 - 1),
)
def test_extend_posterior_core_partition_invariant_fuzz(
    n, n_new, r, n_parts, seed
):
    """Streaming conditioning must be PARTITION-invariant: folding the new
    rows in any split (one batch, row-by-row, ragged chunks — whatever a
    deployment's observation stream delivers) lands on the same posterior
    as one factorization over the union. The fixed tests pin one/two
    composed updates; this fuzzes random ragged partitions in f64."""
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    V = jax.random.normal(ks[0], (n, r), jnp.float64)
    Z = jax.random.normal(ks[1], (n, 3), jnp.float64)
    V_new = jax.random.normal(ks[2], (n_new, r), jnp.float64)
    Z_new = jax.random.normal(ks[3], (n_new, 3), jnp.float64)
    vs, vn = jnp.float64(0.8), jnp.float64(0.3)

    core = gp.posterior_core(gp.factorize(V, vs, vn), Z)
    # random ragged partition of the new rows into n_parts chunks
    rng = np.random.default_rng(seed)
    cuts = np.sort(rng.choice(np.arange(1, n_new),
                              size=min(n_parts - 1, n_new - 1),
                              replace=False)) if n_parts > 1 else []
    streamed = core
    for lo, hi in zip([0, *cuts], [*cuts, n_new]):
        streamed = gp.extend_posterior_core(
            streamed, V_new[lo:hi], vs, Z_new[lo:hi]
        )

    oneshot = gp.posterior_core(
        gp.factorize(jnp.concatenate([V, V_new]), vs, vn),
        jnp.concatenate([Z, Z_new]),
    )
    np.testing.assert_allclose(streamed.M, oneshot.M, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(streamed.G, oneshot.G, rtol=1e-9, atol=1e-12)
    # predictive surface agrees too (mean and variance)
    V_star = jax.random.normal(jax.random.PRNGKey(seed + 1), (4, r),
                               jnp.float64)
    m1, v1 = gp.predict_from_core(V_star, streamed, vs, return_var=True)
    m2, v2 = gp.predict_from_core(V_star, oneshot, vs, return_var=True)
    np.testing.assert_allclose(m1, m2, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(v1, v2, rtol=1e-9, atol=1e-12)
