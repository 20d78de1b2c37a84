"""Integration smoke: vanilla VAE trains and loss decreases (SURVEY.md §4.4)."""

import numpy as np

from gppvae_tpu.data import build_rotated_digits
from gppvae_tpu.train import VAETrainConfig, train_vae


def test_vae_smoke_loss_decreases(tmp_path):
    ds = build_rotated_digits("synthetic", num_objects=12, num_views=8, seed=0)
    config = VAETrainConfig(
        zdim=8,
        epochs=3,
        batch_size=16,
        lr=1e-3,
        seed=0,
        enc_features=(8, 16),
        dec_features=(16, 8),
        outdir=str(tmp_path / "out"),
        panel_every=2,
    )
    result = train_vae(ds, config)
    losses = [h["loss"] for h in result.history]
    assert len(losses) == 3
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    # artifacts: vae_weights handoff + panel + metrics jsonl
    out = tmp_path / "out"
    assert (out / "vae_weights").exists()
    assert (out / "metrics.jsonl").exists()
    assert list(out.glob("panel_*.png"))


def test_vae_weights_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from gppvae_tpu.checkpoint import load_vae_weights, save_vae_weights

    ds = build_rotated_digits("synthetic", num_objects=6, num_views=4, seed=1)
    config = VAETrainConfig(
        zdim=4, epochs=1, batch_size=8, enc_features=(8,), dec_features=(8,),
    )
    result = train_vae(ds, config)
    path = str(tmp_path / "w")
    save_vae_weights(path, result.vae_params)
    restored = load_vae_weights(path, abstract_params=result.vae_params)
    for a, b in zip(jax.tree.leaves(result.vae_params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored params drive the model
    y = jnp.asarray(ds.images[:2])
    logits, *_ = result.model.apply(restored, y, jax.random.PRNGKey(0))
    assert logits.shape == y.shape


def test_vae_flat_image_storage_matches_nhwc(tmp_path):
    """flat_images_threshold=0 forces the large-N flat storage; the
    trajectory must match NHWC exactly (same gathered values)."""
    from gppvae_tpu.data import build_rotated_digits

    ds = build_rotated_digits("synthetic", num_objects=12, num_views=8, seed=0)
    kw = dict(zdim=8, epochs=3, batch_size=16, lr=1e-3, seed=0,
              enc_features=(8, 16), dec_features=(16, 8))
    # default is flat; force NHWC on the ref side so the test is not vacuous
    ref = train_vae(ds, VAETrainConfig(**kw, flat_images_threshold=10**9))
    flat = train_vae(ds, VAETrainConfig(**kw, flat_images_threshold=0))
    for key in ("loss", "recon_term", "kl_term", "mse", "val_mse"):
        np.testing.assert_allclose(
            [h[key] for h in flat.history], [h[key] for h in ref.history],
            rtol=1e-6, atol=1e-8,
            err_msg=f"flat-vs-NHWC VAE trajectory mismatch on {key!r}",
        )
