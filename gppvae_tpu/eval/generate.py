"""Standalone out-of-sample conditional generation CLI (BASELINE.json:11).

Loads a trained GPPVAE state, refreshes the training latents with the saved
encoder, and generates images for the held-out (object, view) grid cells
from GP-predictive latents alone (SURVEY.md §3.4) — reporting the pixel-MSE
parity metric and writing a truth/prediction panel.

    python -m gppvae_tpu.eval.generate --state out/gppvae/final_state \
        --data synthetic --mode joint [--num_objects 400 --num_views 16]
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from gppvae_tpu import gp
from gppvae_tpu.checkpoint import load_pytree
from gppvae_tpu.data.dataset import GridDataset
from gppvae_tpu.eval.oos import predict_heldout
from gppvae_tpu.eval.panels import save_panel
from gppvae_tpu.models import VAE, encode_all


def generate_heldout(
    state: dict,
    dataset: GridDataset,
    *,
    zdim: int,
    enc_features=(32, 64, 128),
    dec_features=(128, 64, 32),
    object_kernel: str = "linear",
    rff_features: int = 32,
    rff_lengthscale: float = 1.0,
    extra_effects: tuple = (),
    seed: int = 0,
) -> tuple[np.ndarray, float]:
    """Returns (predicted heldout images, pixel MSE vs ground truth)."""
    params = state["params"]
    fixed_W = state.get("fixed_W")
    x_map = None
    if object_kernel == "rbf":
        x_map, _ = gp.make_rff_map(
            params["gp"]["X"].shape[1], rff_features, rff_lengthscale, seed=seed
        )
    model = VAE(
        zdim=zdim,
        image_shape=tuple(dataset.image_shape),
        enc_features=tuple(enc_features),
        dec_features=tuple(dec_features),
    )
    tr, ho = dataset.train_idx, dataset.heldout_idx
    images_tr = jnp.asarray(dataset.images[tr])
    d_tr = jnp.asarray(dataset.object_ids[tr])
    q_tr = jnp.asarray(dataset.view_ids[tr])
    chunk = min(1024, len(tr))  # same activation cap as the trainer's Phase A

    @jax.jit
    def run(params, fixed_W):
        Z0 = encode_all(model, params["vae"], images_tr, chunk)
        return predict_heldout(
            model, params, fixed_W, Z0, d_tr, q_tr,
            jnp.asarray(dataset.object_ids[ho]),
            jnp.asarray(dataset.view_ids[ho]),
            jnp.asarray(dataset.images[ho]),
            x_map=x_map, extra_effects=tuple(extra_effects),
        )

    y_pred, mse = run(params, fixed_W)
    return np.asarray(y_pred), float(mse)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="GPPVAE out-of-sample generation")
    p.add_argument("--state", required=True, help="final_state checkpoint dir")
    p.add_argument("--data", default="synthetic")
    p.add_argument("--num_objects", type=int, default=400)
    p.add_argument("--num_views", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--zdim", type=int, default=None)
    p.add_argument("--outdir", default=None)
    args = p.parse_args(argv)

    from gppvae_tpu.config.datasets import build_dataset_from_flag

    # model architecture from the run's sidecar config.json (written by
    # train_gppvae next to its checkpoints), overridable by --zdim
    run_dir = os.path.dirname(os.path.abspath(args.state))
    arch = {
        "zdim": 16, "enc_features": (32, 64, 128),
        "dec_features": (128, 64, 32), "object_kernel": "linear",
        "rff_features": 32, "rff_lengthscale": 1.0, "extra_effects": (),
        "seed": 0,
    }
    cfg_path = os.path.join(run_dir, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            saved = json.load(f)
        arch.update({k: saved[k] for k in arch if k in saved})
    if args.zdim is not None:
        arch["zdim"] = args.zdim

    ds = build_dataset_from_flag(args.data, args.num_objects, args.num_views, args.seed)
    state = load_pytree(args.state)
    y_pred, mse = generate_heldout(state, ds, **arch)
    print(json.dumps({"heldout_mse": mse, "n_heldout": len(ds.heldout_idx)}))
    outdir = args.outdir or os.path.dirname(os.path.abspath(args.state))
    save_panel(
        os.path.join(outdir, "oos_panel.png"),
        [ds.images[ds.heldout_idx[:12]], y_pred[:12]],
    )


if __name__ == "__main__":
    main()
