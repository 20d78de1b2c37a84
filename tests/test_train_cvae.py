"""CVAE baseline: trains, conditions on view, OOS via per-object latent mean."""

import numpy as np

from gppvae_tpu.data import build_rotated_digits
from gppvae_tpu.train import CVAETrainConfig, train_cvae


def test_cvae_trains_and_oos_improves(tmp_path):
    ds = build_rotated_digits("synthetic", num_objects=16, num_views=8, seed=0)
    config = CVAETrainConfig(
        zdim=8, epochs=6, batch_size=16, lr=1e-3, seed=0,
        enc_features=(8, 16), dec_features=(16, 8),
        epochs_per_dispatch=3, outdir=str(tmp_path),
    )
    result = train_cvae(ds, config)
    h = result.history
    losses = [r["loss"] for r in h]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert h[-1]["oos_mse"] < h[0]["oos_mse"]
    assert (tmp_path / "metrics.jsonl").exists()
    # round-4 driver artifacts: weights handoff + full state + OOS panel
    assert (tmp_path / "cvae_weights").exists()
    assert (tmp_path / "final_state").exists()
    assert (tmp_path / "oos_panel.png").exists()
    from gppvae_tpu.checkpoint import load_vae_weights

    restored = load_vae_weights(str(tmp_path / "cvae_weights"), result.params)
    import jax

    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(result.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cvae_cli_flags_reach_config(monkeypatch):
    """train-cvae CLI contract: every flag lands in CVAETrainConfig
    (same discipline as test_cli.py's train-vae/train-gppvae checks)."""
    import importlib

    mod = importlib.import_module("gppvae_tpu.train.train_cvae")
    captured = {}
    monkeypatch.setattr(
        mod, "train_cvae",
        lambda ds, config, **kw: captured.update(config=config) or None,
    )
    mod.main([
        "--data", "synthetic", "--num_objects", "6", "--num_views", "4",
        "--epochs", "2", "--zdim", "5", "--bs", "8", "--lr", "3e-4",
        "--beta_kl", "0.5", "--sat_penalty", "0.0", "--dtype", "bfloat16",
        "--dec_upsample", "subpixel", "--epochs_per_dispatch", "2",
        "--enc_features", "8,16", "--dec_features", "16,8",
        "--outdir", "/tmp/cli_cfg_test_cvae",
    ])
    c = captured["config"]
    assert c.zdim == 5 and c.batch_size == 8 and c.lr == 3e-4
    assert c.epochs == 2 and c.epochs_per_dispatch == 2
    assert c.beta_kl == 0.5 and c.sat_penalty == 0.0
    assert c.compute_dtype == "bfloat16" and c.dec_upsample == "subpixel"
    assert c.enc_features == (8, 16) and c.dec_features == (16, 8)
    assert c.outdir == "/tmp/cli_cfg_test_cvae"


def test_cvae_view_conditioning_matters():
    """Decoding the same latent under different views must differ — the
    conditioning path is live."""
    import jax
    import jax.numpy as jnp

    from gppvae_tpu.models import CVAE

    model = CVAE(zdim=4, image_shape=(32, 32, 1), num_views=8,
                 enc_features=(8,), dec_features=(8,))
    y = jnp.zeros((2, 32, 32, 1))
    q = jnp.array([0, 3])
    params = model.init(jax.random.PRNGKey(0), y, q, jax.random.PRNGKey(1))
    z = jnp.ones((2, 4))
    out0 = model.apply(params, z, jnp.array([0, 0]), method=CVAE.decode)
    out3 = model.apply(params, z, jnp.array([3, 3]), method=CVAE.decode)
    assert float(jnp.abs(out0 - out3).max()) > 1e-4
