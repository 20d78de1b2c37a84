"""Integration smoke for the flagship GPPVAE loop: both modes train, losses
decrease, out-of-sample MSE improves and beats trivial baselines
(SURVEY.md §4.4)."""

import numpy as np
import pytest

from gppvae_tpu.data import build_rotated_digits
from gppvae_tpu.train import (
    GPPVAETrainConfig,
    VAETrainConfig,
    train_gppvae,
    train_vae,
)


@pytest.fixture(scope="module")
def small_ds():
    return build_rotated_digits("synthetic", num_objects=16, num_views=8, seed=0)


@pytest.fixture(scope="module")
def pretrained_vae(small_ds):
    config = VAETrainConfig(
        zdim=8, epochs=4, batch_size=16, lr=1e-3, seed=0,
        enc_features=(8, 16), dec_features=(16, 8),
    )
    return train_vae(small_ds, config)


@pytest.mark.parametrize("mode", ["joint", "dis"])
def test_gppvae_trains(small_ds, pretrained_vae, mode, tmp_path):
    config = GPPVAETrainConfig(
        mode=mode, zdim=8, epochs=4, batch_size=16, lr_vae=5e-4, lr_gp=5e-3,
        seed=0, obj_feature_dim=4, view_num_freqs=2,
        enc_features=(8, 16), dec_features=(16, 8),
        outdir=str(tmp_path / mode), panel_every=3,
    )
    result = train_gppvae(small_ds, config, vae_params=pretrained_vae.vae_params)
    h = result.history
    assert len(h) == 4
    losses = [r["loss"] for r in h]
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], f"loss not decreasing: {losses}"
    # full-data GP NLL (per sample) must also fall as the prior fits
    assert h[-1]["gp_nll_full"] < h[0]["gp_nll_full"]
    # out-of-sample conditional generation must improve as training proceeds
    # (absolute quality vs trivial baselines is asserted in the longer golden
    # run — a 4-epoch smoke is underfit by construction)
    assert h[-1]["oos_mse"] < h[0]["oos_mse"], [r["oos_mse"] for r in h]
    assert h[-1]["oos_mse"] < 0.25
    # artifacts
    out = tmp_path / mode
    assert (out / "metrics.jsonl").exists()
    assert list(out.glob("panel_*.png"))
    assert (out / "final_state").exists()


def test_dis_mode_keeps_view_kernel_fixed(small_ds, pretrained_vae):
    config = GPPVAETrainConfig(
        mode="dis", zdim=8, epochs=1, batch_size=16,
        obj_feature_dim=4, view_num_freqs=2,
        enc_features=(8, 16), dec_features=(16, 8),
    )
    result = train_gppvae(small_ds, config, vae_params=pretrained_vae.vae_params)
    assert "W" not in result.params["gp"], "dis mode must not learn view features"
    assert result.fixed_W is not None
    # fixed Fourier features of the 8 angles: rank 2·2+1
    assert result.fixed_W.shape == (8, 5)


def test_joint_mode_learns_view_features(small_ds, pretrained_vae):
    config = GPPVAETrainConfig(
        mode="joint", zdim=8, epochs=2, batch_size=16, lr_gp=1e-2,
        obj_feature_dim=4, view_num_freqs=2,
        enc_features=(8, 16), dec_features=(16, 8),
    )
    result = train_gppvae(small_ds, config, vae_params=pretrained_vae.vae_params)
    W = np.asarray(result.params["gp"]["W"])
    from gppvae_tpu import gp
    import jax.numpy as jnp

    W0 = np.asarray(
        gp.fourier_view_features(jnp.asarray(small_ds.view_aux[:, 0]), num_freqs=2)
    )
    assert not np.allclose(W, W0), "joint mode must update view features"


def test_noise_floor_survives_collapsed_variance(small_ds, pretrained_vae):
    """log_vn initialized pathologically low must not NaN the Cholesky
    (gp.variances_from_log floors the noise)."""
    config = GPPVAETrainConfig(
        mode="dis", zdim=8, epochs=1, batch_size=16,
        obj_feature_dim=4, view_num_freqs=2, init_v_noise=1e-12,
        enc_features=(8, 16), dec_features=(16, 8),
    )
    result = train_gppvae(small_ds, config, vae_params=pretrained_vae.vae_params)
    assert np.isfinite(result.history[0]["loss"])
    assert np.isfinite(result.history[0]["oos_mse"])


def test_learnable_sigma_y(small_ds, pretrained_vae):
    config = GPPVAETrainConfig(
        mode="joint", zdim=8, epochs=2, batch_size=16, lr_gp=1e-2,
        obj_feature_dim=4, view_num_freqs=2, learn_sigma_y=True, sigma_y=0.3,
        enc_features=(8, 16), dec_features=(16, 8),
    )
    result = train_gppvae(small_ds, config, vae_params=pretrained_vae.vae_params)
    assert np.isfinite([h["loss"] for h in result.history]).all()
    log_sy = float(result.params["gp"]["log_sy"])
    assert log_sy != np.log(0.3), "sigma_y must receive gradient updates"
    # MLE pulls sigma_y toward the actual residual scale (well below 0.3)
    assert log_sy < np.log(0.3)


def test_profile_phases_path(small_ds, pretrained_vae):
    """The phase-per-dispatch profiling path trains and reports timings."""
    config = GPPVAETrainConfig(
        mode="joint", zdim=8, epochs=2, batch_size=16,
        obj_feature_dim=4, view_num_freqs=2, profile_phases=True,
        enc_features=(8, 16), dec_features=(16, 8),
    )
    result = train_gppvae(small_ds, config, vae_params=pretrained_vae.vae_params)
    h = result.history
    assert len(h) == 2
    assert "sec_A_refresh_B_solve" in h[0]
    assert "sec_C_minibatch" in h[0]
    assert h[-1]["loss"] < h[0]["loss"] * 5  # sane magnitude, trains


def test_bad_mode_and_batch_size_raise(small_ds):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown mode"):
        train_gppvae(small_ds, GPPVAETrainConfig(mode="frankenstein"))
    with _pytest.raises(ValueError, match="batch_size"):
        train_gppvae(
            small_ds,
            GPPVAETrainConfig(
                mode="dis", zdim=8, epochs=1, batch_size=10_000,
                enc_features=(8,), dec_features=(8,),
            ),
        )


def test_extra_random_effects_train(small_ds, pretrained_vae, tmp_path):
    """K = v1·(product) + v2·(object) + v3·(view) + vn·I end-to-end (the
    reference GP's n_rand_effs capability)."""
    config = GPPVAETrainConfig(
        mode="joint", zdim=8, epochs=3, batch_size=16, lr_gp=5e-3,
        obj_feature_dim=4, view_num_freqs=2,
        extra_effects=("object", "view"),
        enc_features=(8, 16), dec_features=(16, 8),
        outdir=str(tmp_path),
    )
    result = train_gppvae(small_ds, config, vae_params=pretrained_vae.vae_params)
    h = result.history
    assert np.isfinite([r["loss"] for r in h]).all()
    assert h[-1]["loss"] < h[0]["loss"]
    assert h[-1]["oos_mse"] < h[0]["oos_mse"]
    assert result.params["gp"]["log_vs"].shape == (3,)
    # generate CLI round-trips extra_effects from config.json
    import json as _json

    from gppvae_tpu.eval.generate import main as gen_main

    gen_main([
        "--state", str(tmp_path / "final_state"),
        "--data", "synthetic", "--num_objects", "16", "--num_views", "8",
        "--outdir", str(tmp_path),
    ])


def test_logit_saturation_penalty_properties():
    """The saturation-death barrier (round-3 root cause): identically zero
    — value AND gradient — for in-range logits, so healthy trajectories
    are untouched; beyond the bound the gradient pulls back toward the
    gradient-alive sigmoid region."""
    import jax
    import jax.numpy as jnp

    from gppvae_tpu.train.losses import (
        SAT_LOGIT_BOUND,
        logit_saturation_penalty,
    )

    healthy = jnp.array([[-14.9, 0.0, 5.0, SAT_LOGIT_BOUND]])
    assert float(logit_saturation_penalty(healthy).sum()) == 0.0
    g = jax.grad(lambda l: jnp.sum(logit_saturation_penalty(l)))(healthy)
    assert float(jnp.abs(g).max()) == 0.0  # bit-exact no-op when healthy

    dead = jnp.array([[25.0, -30.0, 0.0, 1.0]])
    pen = float(logit_saturation_penalty(dead).sum())
    assert pen == (25.0 - 15.0) ** 2 + (30.0 - 15.0) ** 2
    gd = jax.grad(lambda l: jnp.sum(logit_saturation_penalty(l)))(dead)
    assert float(gd[0, 0]) > 0 and float(gd[0, 1]) < 0  # pulls back
    assert float(gd[0, 2]) == 0.0 == float(gd[0, 3])


def test_sat_penalty_knob_live_and_harmless(small_ds, pretrained_vae):
    """End-to-end knob check: the barrier is reachable from config (some
    logits graze the bound even on short runs, so trajectories differ)
    while staying harmless — both runs finite with equivalent fit. The
    bit-exact-when-healthy property is covered by the unit test above and
    by the regenerated goldens."""
    kw = dict(
        mode="joint", zdim=8, epochs=2, batch_size=16, seed=0,
        obj_feature_dim=4, view_num_freqs=2,
        enc_features=(8, 16), dec_features=(16, 8),
    )
    vp = pretrained_vae.vae_params
    on = train_gppvae(small_ds, GPPVAETrainConfig(**kw, sat_penalty=1.0),
                      vae_params=vp)
    off = train_gppvae(small_ds, GPPVAETrainConfig(**kw, sat_penalty=0.0),
                       vae_params=vp)
    assert all(np.isfinite(h["loss"]) for h in on.history + off.history)
    assert on.history[-1]["loss"] != off.history[-1]["loss"]  # knob live
    np.testing.assert_allclose(
        on.history[-1]["mse"], off.history[-1]["mse"], rtol=0.1,
        err_msg="barrier must not materially change short-run fit",
    )


def test_resolve_grad_accum_auto():
    """grad_accum_steps=-1 resolves the documented k ≈ (N/bs)/45 rule from
    the dataset's true N; explicit values pass through; nonsense rejected."""
    import pytest as _pytest

    from gppvae_tpu.train.train_gppvae import resolve_grad_accum

    assert resolve_grad_accum(1, 5700, 128) == 1
    assert resolve_grad_accum(7, 5700, 128) == 7
    # benchmark shape: ceil(5700/128) = 45 steps/epoch → k = 1
    assert resolve_grad_accum(-1, 5700, 128) == 1
    # 16× N: 713 steps/epoch → k = 16 (the BASELINE.md large-N rule)
    assert resolve_grad_accum(-1, 16 * 5700, 128) == 16
    assert resolve_grad_accum(-1, 64, 128) == 1  # tiny N floors at 1
    with _pytest.raises(ValueError, match="grad_accum_steps"):
        resolve_grad_accum(0, 5700, 128)


def test_grad_accum_auto_trains(small_ds, pretrained_vae):
    """The -1 auto knob reaches the trainer end-to-end (resolves to k=1 at
    this tiny N, so it must be bit-identical to the default)."""
    kw = dict(
        mode="joint", zdim=8, epochs=2, batch_size=16, seed=0,
        obj_feature_dim=4, view_num_freqs=2,
        enc_features=(8, 16), dec_features=(16, 8),
    )
    vp = pretrained_vae.vae_params
    base = train_gppvae(small_ds, GPPVAETrainConfig(**kw), vae_params=vp)
    auto = train_gppvae(small_ds, GPPVAETrainConfig(**kw, grad_accum_steps=-1),
                        vae_params=vp)
    for a, b in zip(auto.history, base.history):
        assert a["loss"] == b["loss"] and a["oos_mse"] == b["oos_mse"]


def test_grad_accum_steps(small_ds, pretrained_vae):
    """Gradient accumulation (the large-N trust-region knob): k>1 trains,
    stays finite, genuinely changes the step cadence (trajectory differs
    from per-minibatch), and still learns (loss decreases)."""
    kw = dict(
        mode="joint", zdim=8, epochs=4, batch_size=16, seed=0,
        obj_feature_dim=4, view_num_freqs=2,
        enc_features=(8, 16), dec_features=(16, 8), epochs_per_dispatch=2,
    )
    vp = pretrained_vae.vae_params
    base = train_gppvae(small_ds, GPPVAETrainConfig(**kw), vae_params=vp)
    acc = train_gppvae(small_ds, GPPVAETrainConfig(**kw, grad_accum_steps=3),
                       vae_params=vp)
    assert all(np.isfinite(h["loss"]) for h in acc.history)
    assert acc.history[-1]["loss"] != base.history[-1]["loss"]
    assert acc.history[-1]["loss"] < acc.history[0]["loss"]


def test_refresh_every_steps(small_ds, pretrained_vae):
    """Sub-epoch Taylor refresh: k < steps-per-epoch re-expands the
    surrogate mid-epoch — trains, stays finite, genuinely changes the
    trajectory, still learns; k >= steps-per-epoch is the documented
    no-op (bit-identical to the default once-per-epoch refresh)."""
    kw = dict(
        mode="joint", zdim=8, epochs=4, batch_size=16, seed=0,
        obj_feature_dim=4, view_num_freqs=2,
        enc_features=(8, 16), dec_features=(16, 8), epochs_per_dispatch=2,
    )
    vp = pretrained_vae.vae_params
    base = train_gppvae(small_ds, GPPVAETrainConfig(**kw), vae_params=vp)
    sub = train_gppvae(
        small_ds, GPPVAETrainConfig(**kw, refresh_every_steps=3),
        vae_params=vp,
    )
    assert all(np.isfinite(h["loss"]) for h in sub.history)
    assert sub.history[-1]["loss"] != base.history[-1]["loss"]
    assert sub.history[-1]["loss"] < sub.history[0]["loss"]
    # k >= nb (ceil(106/16)=7) must leave the program unchanged
    noop = train_gppvae(
        small_ds, GPPVAETrainConfig(**kw, refresh_every_steps=100),
        vae_params=vp,
    )
    for a, b in zip(noop.history, base.history):
        assert a["loss"] == b["loss"] and a["oos_mse"] == b["oos_mse"]


def test_polish_schedule_runs_f32_tail(small_ds, pretrained_vae):
    """Automatic mixed precision (round-2 VERDICT #2): polish_epochs runs
    the tail in f32. The bulk phase is byte-identical to a plain bf16 run;
    a polish covering the WHOLE run equals a plain f32 run (the polish
    program IS the f32 program — same params/opt state/RNG stream)."""
    kw = dict(
        mode="joint", zdim=8, epochs=4, batch_size=16, seed=0,
        obj_feature_dim=4, view_num_freqs=2,
        enc_features=(8, 16), dec_features=(16, 8), epochs_per_dispatch=2,
    )
    vp = pretrained_vae.vae_params
    pol = train_gppvae(
        small_ds,
        GPPVAETrainConfig(**kw, compute_dtype="bfloat16", polish_epochs=2),
        vae_params=vp,
    )
    assert len(pol.history) == 4
    assert pol.model.dtype == np.float32  # result model is the polish model

    bf16 = train_gppvae(
        small_ds, GPPVAETrainConfig(**kw, compute_dtype="bfloat16"),
        vae_params=vp,
    )
    for key in ("loss", "gp_nll_full", "oos_mse"):
        np.testing.assert_allclose(
            [h[key] for h in pol.history[:2]],
            [h[key] for h in bf16.history[:2]], rtol=1e-6,
            err_msg=f"polish perturbed the bulk phase ({key})",
        )

    f32 = train_gppvae(small_ds, GPPVAETrainConfig(**kw), vae_params=vp)
    full = train_gppvae(
        small_ds,
        GPPVAETrainConfig(**kw, compute_dtype="bfloat16", polish_epochs=4),
        vae_params=vp,
    )
    for key in ("loss", "gp_nll_full", "oos_mse"):
        np.testing.assert_allclose(
            [h[key] for h in full.history],
            [h[key] for h in f32.history], rtol=1e-6,
            err_msg=f"whole-run polish must equal the plain f32 run ({key})",
        )


def test_flat_image_storage_matches_nhwc(small_ds, pretrained_vae):
    """flat_images_threshold=0 forces the large-N flat (N, H·W·C) storage;
    gather+reshape must reproduce the NHWC trajectory exactly (the gathered
    batch VALUES are identical — only the HBM layout changes)."""
    kw = dict(
        mode="joint", zdim=8, epochs=2, batch_size=16, lr_vae=5e-4,
        lr_gp=5e-3, seed=0, obj_feature_dim=4, view_num_freqs=2,
        enc_features=(8, 16), dec_features=(16, 8), panel_every=0,
    )
    # default is flat (threshold 0); the ref run forces the NHWC layout
    # back so the equivalence is actually exercised
    ref = train_gppvae(
        small_ds, GPPVAETrainConfig(**kw, flat_images_threshold=10**9),
        vae_params=pretrained_vae.vae_params,
    )
    flat = train_gppvae(
        small_ds, GPPVAETrainConfig(**kw, flat_images_threshold=0),
        vae_params=pretrained_vae.vae_params,
    )
    for key in ("loss", "recon_term", "gp_term", "gp_nll_full", "oos_mse"):
        np.testing.assert_allclose(
            [h[key] for h in flat.history], [h[key] for h in ref.history],
            rtol=1e-6, atol=1e-8,
            err_msg=f"flat-vs-NHWC trajectory mismatch on {key!r}",
        )


def test_spike_guard_semantics():
    """The fused Σg² guard (train_gppvae.spike_guard) must (a) be bit-exact
    vs optax clip+adam on healthy gradients, (b) clip exactly like
    optax.clip_by_global_norm above the threshold, and (c) skip the step —
    zero updates, inner state untouched, counter bumped — on nonfinite
    gradients. One reduction pass replaces the old clip-norm + reduce_and
    pair (round-3 second pass, BASELINE.md)."""
    import jax
    import jax.numpy as jnp
    import optax

    from gppvae_tpu.train.train_gppvae import spike_guard

    params = {"a": jnp.arange(6.0, dtype=jnp.float32).reshape(2, 3),
              "b": jnp.ones((4,), jnp.float32)}
    healthy = jax.tree.map(lambda p: 0.01 * (p + 1.0), params)
    clip = 1.0

    guarded = spike_guard(optax.adam(1e-3), clip)
    reference = optax.chain(optax.clip_by_global_norm(clip), optax.adam(1e-3))

    gs, rs = guarded.init(params), reference.init(params)
    for _ in range(3):
        gu, gs = guarded.update(healthy, gs, params)
        ru, rs = reference.update(healthy, rs, params)
        for a, b in zip(jax.tree.leaves(gu), jax.tree.leaves(ru)):
            np.testing.assert_array_equal(a, b)  # bit-exact below threshold
    assert int(gs["notfinite_count"]) == 0

    # (b) clipping arm: huge finite gradient → same values as optax's clip
    spiky = jax.tree.map(lambda p: 1e6 * (p + 1.0), params)
    gu, gs2 = guarded.update(spiky, gs, params)
    ru, _ = reference.update(spiky, rs, params)
    for a, b in zip(jax.tree.leaves(gu), jax.tree.leaves(ru)):
        np.testing.assert_allclose(a, b, rtol=1e-6)
    assert int(gs2["notfinite_count"]) == 0

    # (c) nonfinite gradient → zero updates, inner state untouched, count+1
    bad = jax.tree.map(lambda g: g.at[0].set(jnp.nan), healthy)
    gu, gs3 = guarded.update(bad, gs2, params)
    assert all(not np.any(np.asarray(u)) for u in jax.tree.leaves(gu))
    for a, b in zip(jax.tree.leaves(gs3["inner"]), jax.tree.leaves(gs2["inner"])):
        np.testing.assert_array_equal(a, b)
    assert int(gs3["notfinite_count"]) == 1


def test_take_rows_onehot_backward_matches_gather():
    """take_rows: forward bit-identical to A[idx]; backward (one-hot matmul
    for small tables) matches the gather's scatter-add transpose, including
    duplicate indices accumulating."""
    import jax
    import jax.numpy as jnp

    from gppvae_tpu.gp.features import _ONEHOT_BWD_MAX_ROWS, take_rows

    key = jax.random.PRNGKey(3)
    A = jax.random.normal(key, (12, 5), jnp.float32)  # below threshold
    idx = jnp.asarray([0, 3, 3, 7, 11, 3], jnp.int32)  # duplicates
    ct = jax.random.normal(jax.random.fold_in(key, 1), (6, 5), jnp.float32)

    np.testing.assert_array_equal(take_rows(A, idx), A[idx])

    f_new = lambda A: jnp.sum(take_rows(A, idx) * ct)
    f_ref = lambda A: jnp.sum(A[idx] * ct)
    np.testing.assert_allclose(
        jax.grad(f_new)(A), jax.grad(f_ref)(A), rtol=1e-6, atol=1e-7
    )

    # large tables fall back to the plain gather (scatter backward)
    B = jax.random.normal(key, (_ONEHOT_BWD_MAX_ROWS + 1, 5), jnp.float32)
    g_new = jax.grad(lambda M: jnp.sum(take_rows(M, idx) * ct))(B)
    g_ref = jax.grad(lambda M: jnp.sum(M[idx] * ct))(B)
    np.testing.assert_array_equal(g_new, g_ref)
