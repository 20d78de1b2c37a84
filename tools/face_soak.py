"""ROADMAP #4: long face-view soak proving the saturation barrier stays
inert on real-valued (non-binary) data. Two arms, same seed: sat_penalty=1
(default) vs 0. If the barrier is inert the trajectories must be
bit-identical; also report max|logit| distance from the ~15 bound."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gppvae_tpu.data import build_faceplace
from gppvae_tpu.models.vae import VAE
from gppvae_tpu.train.train_gppvae import GPPVAETrainConfig, train_gppvae
from gppvae_tpu.utils.metrics import NullLogger

ds = build_faceplace("synthetic", num_people=50, num_poses=8,
                     image_size=128, seed=0)

results = {}
for sat in (1.0, 0.0):
    cfg = GPPVAETrainConfig(
        mode="joint", zdim=32, epochs=1000, batch_size=64,
        obj_feature_dim=8, view_num_freqs=3, seed=0,
        epochs_per_dispatch=50, dec_upsample="subpixel",
        compute_dtype="bfloat16", sat_penalty=sat,
    )
    res = train_gppvae(ds, cfg, log=NullLogger())
    oos = np.array([h["oos_mse"] for h in res.history], dtype=np.float64)
    results[sat] = (res, oos)
    print(json.dumps({
        "sat_penalty": sat,
        "oos_first": round(float(oos[0]), 5),
        "oos_100": round(float(oos[99]), 5),
        "oos_500": round(float(oos[499]), 5),
        "oos_final": round(float(oos[-1]), 5),
        "oos_min": round(float(oos.min()), 5),
        "all_finite": bool(np.isfinite([h["loss"] for h in res.history]).all()),
    }), flush=True)

# max |logit| on the trained default-arm model (f32 decode of encoder means)
res, _ = results[1.0]
model = VAE(zdim=32, image_shape=tuple(ds.image_shape),
            upsample="subpixel")
imgs = jnp.asarray(ds.images[ds.train_idx[:256]]).reshape(-1, *ds.image_shape)
mu, _ = model.apply(res.params["vae"], imgs, method=VAE.encode)
logits = model.apply(res.params["vae"], mu, method=VAE.decode)
maxl = float(jnp.max(jnp.abs(logits)))

oos_a, oos_b = results[1.0][1], results[0.0][1]
print(json.dumps({
    "max_abs_logit": round(maxl, 3),
    "bound": 15.0,
    "traj_max_abs_oos_diff": float(np.max(np.abs(oos_a - oos_b))),
    "trajectories_identical": bool(np.array_equal(oos_a, oos_b)),
}), flush=True)
