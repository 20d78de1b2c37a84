"""Golden-parity fixtures (SURVEY.md §4.3): frozen tiny configs with
committed loss trajectories. Guards every numeric in the pipeline — data
gen, init, GP math, Taylor surrogate, optimizer wiring — against silent
drift. CPU-tier only (fixed platform ⇒ tight tolerance).

Regenerate after an *intentional* numeric change:
    GOLDEN_REGEN=1 python -m pytest tests/test_golden.py -q
"""

import json
import os
import pathlib

import numpy as np
import pytest

from gppvae_tpu.data import build_rotated_digits
from gppvae_tpu.train import (
    GPPVAETrainConfig,
    VAETrainConfig,
    train_gppvae,
    train_vae,
)

GOLDEN_PATH = pathlib.Path(__file__).parent / "goldens" / "trajectories.json"
REGEN = os.environ.get("GOLDEN_REGEN") == "1"
RTOL = 1e-5  # SURVEY.md §4.3 target: ≤1e-5 rel fp32 (fixed platform, same
# jit program, deterministic seeds — reruns are observed bit-identical; the
# margin only absorbs XLA-version drift)

_TRACKED_VAE = ("loss", "recon_term", "kl_term", "mse")
_TRACKED_GPP = ("loss", "recon_term", "gp_term", "pen_term", "gp_nll_full", "oos_mse")


def _dataset():
    return build_rotated_digits("synthetic", num_objects=10, num_views=8, seed=7)


def _run_vae(ds):
    config = VAETrainConfig(
        zdim=6, epochs=2, batch_size=16, lr=1e-3, seed=7,
        enc_features=(8, 16), dec_features=(16, 8),
    )
    return train_vae(ds, config)


def _traj(history, keys):
    return {k: [round(float(h[k]), 8) for h in history] for k in keys}


@pytest.fixture(scope="module")
def goldens():
    if GOLDEN_PATH.exists():
        return json.loads(GOLDEN_PATH.read_text())
    return {}


def _check_or_regen(goldens, name, traj):
    if REGEN or name not in goldens:
        goldens[name] = traj
        GOLDEN_PATH.parent.mkdir(exist_ok=True)
        GOLDEN_PATH.write_text(json.dumps(goldens, indent=1, sort_keys=True))
        if not REGEN:
            pytest.skip(f"golden {name!r} created; rerun to compare")
        return
    for k, vals in goldens[name].items():
        np.testing.assert_allclose(
            traj[k], vals, rtol=RTOL, err_msg=f"{name}:{k} drifted"
        )


def test_golden_vae(goldens):
    ds = _dataset()
    result = _run_vae(ds)
    _check_or_regen(goldens, "vae", _traj(result.history, _TRACKED_VAE))


def test_golden_cvae(goldens):
    from gppvae_tpu.train import CVAETrainConfig, train_cvae

    ds = _dataset()
    config = CVAETrainConfig(
        zdim=6, epochs=2, batch_size=16, lr=1e-3, seed=7,
        enc_features=(8, 16), dec_features=(16, 8),
    )
    result = train_cvae(ds, config)
    traj = _traj(result.history, ("loss", "recon_term", "kl_term", "mse", "oos_mse"))
    _check_or_regen(goldens, "cvae", traj)


@pytest.mark.parametrize("mode", ["dis", "joint"])
def test_golden_gppvae(goldens, mode):
    ds = _dataset()
    vae = _run_vae(ds)
    config = GPPVAETrainConfig(
        mode=mode, zdim=6, epochs=3, batch_size=16, lr_vae=5e-4, lr_gp=5e-3,
        seed=7, obj_feature_dim=4, view_num_freqs=2,
        enc_features=(8, 16), dec_features=(16, 8),
    )
    result = train_gppvae(ds, config, vae_params=vae.vae_params)
    _check_or_regen(goldens, f"gppvae_{mode}", _traj(result.history, _TRACKED_GPP))
