"""RBF object kernel (RFF) training path — the thesis-extension stretch."""

import numpy as np

from gppvae_tpu.data import build_rotated_digits
from gppvae_tpu.train import GPPVAETrainConfig, train_gppvae


def test_gppvae_rbf_object_kernel_trains(tmp_path):
    ds = build_rotated_digits("synthetic", num_objects=12, num_views=8, seed=0)
    config = GPPVAETrainConfig(
        mode="joint", zdim=8, epochs=3, batch_size=16, lr_gp=5e-3,
        obj_feature_dim=4, view_num_freqs=2,
        object_kernel="rbf", rff_features=16, rff_lengthscale=1.2,
        enc_features=(8, 16), dec_features=(16, 8),
        outdir=str(tmp_path),
    )
    result = train_gppvae(ds, config)
    losses = [h["loss"] for h in result.history]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert np.isfinite(result.history[-1]["oos_mse"])
    # generate CLI round-trips the rbf config from config.json

    from gppvae_tpu.eval.generate import main

    main([
        "--state", str(tmp_path / "final_state"),
        "--data", "synthetic", "--num_objects", "12", "--num_views", "8",
        "--outdir", str(tmp_path),
    ])
