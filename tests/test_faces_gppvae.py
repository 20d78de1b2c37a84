"""Face-view GPPVAE (BASELINE.json:10): larger conv stacks, object×pose
product kernel with learned view features, 3-channel images."""

import numpy as np

from gppvae_tpu.data import build_faceplace
from gppvae_tpu.train import GPPVAETrainConfig, train_gppvae


def test_faceview_gppvae_trains(tmp_path):
    ds = build_faceplace("synthetic", num_people=12, num_poses=5,
                         image_size=32, seed=0)
    assert ds.image_shape == (32, 32, 3)
    config = GPPVAETrainConfig(
        mode="joint", zdim=12, epochs=3, batch_size=12, lr_gp=5e-3,
        obj_feature_dim=4, view_feature_dim=3, view_num_freqs=1,
        enc_features=(8, 16), dec_features=(16, 8),
        outdir=str(tmp_path), panel_every=2,
    )
    result = train_gppvae(ds, config)
    h = result.history
    losses = [r["loss"] for r in h]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert np.isfinite(h[-1]["oos_mse"])
    # pose aux is (Q, 1) linear positions → Fourier features still apply;
    # joint mode must carry a learned W of the configured shape
    assert result.params["gp"]["W"].shape[0] == 5


def test_history_plot(tmp_path):
    from gppvae_tpu.eval.plots import plot_history

    ds = build_faceplace("synthetic", num_people=8, num_poses=4,
                         image_size=32, seed=1)
    config = GPPVAETrainConfig(
        mode="dis", zdim=8, epochs=2, batch_size=8,
        obj_feature_dim=4, view_num_freqs=1,
        enc_features=(8,), dec_features=(8,),
        outdir=str(tmp_path),
    )
    train_gppvae(ds, config)
    out = plot_history(str(tmp_path / "metrics.jsonl"))
    assert (tmp_path / "history.png").exists()
    assert out.endswith("history.png")
