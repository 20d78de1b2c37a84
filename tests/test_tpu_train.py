"""Real-TPU end-to-end tier (RUN_TPU_TESTS=1): the fused GPPVAE pipeline
compiles and trains on the actual chip with the pallas ops backend."""

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def test_fused_gppvae_on_tpu():
    import jax

    assert jax.default_backend() == "tpu"
    from gppvae_tpu.data import build_rotated_digits
    from gppvae_tpu.train import GPPVAETrainConfig, train_gppvae

    ds = build_rotated_digits("synthetic", num_objects=24, num_views=8, seed=0)
    config = GPPVAETrainConfig(
        mode="joint", zdim=8, epochs=6, batch_size=32, lr_gp=5e-3,
        obj_feature_dim=4, view_num_freqs=2,
        enc_features=(8, 16), dec_features=(16, 8),
        epochs_per_dispatch=3, ops_backend="pallas",
    )
    result = train_gppvae(ds, config)
    losses = [h["loss"] for h in result.history]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert result.history[-1]["oos_mse"] < result.history[0]["oos_mse"]
