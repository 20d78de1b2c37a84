"""BASELINE.md 'Round-4 shape exploration' falsification probe (N/bs grid via BS env).

Falsification probe for the round-4 shape_explore conclusion:
"face-variant MFU (16.6% at N=332) tracks SMALL N, not the conv shapes."
If true, the same 128² face program at 8x the rows should approach the
digits MFU plateau (~32%). One config, same measurement as shape_explore.
"""
import json
import sys
import time

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from gppvae_tpu.data import build_faceplace
from gppvae_tpu.train import GPPVAETrainConfig, train_gppvae
from gppvae_tpu.utils.flops import gppvae_epoch_flops
from gppvae_tpu.utils.metrics import NullLogger

BF16_PEAK = 197e12

import os
BS = int(os.environ.get("BS", "64"))
for people in (400,):
    ds = build_faceplace("synthetic", num_people=people, num_poses=8,
                         image_size=128, seed=0)
    cfg = GPPVAETrainConfig(
        mode="joint", zdim=32, epochs=40, batch_size=BS,
        obj_feature_dim=8, view_num_freqs=3, seed=0,
        epochs_per_dispatch=20, compute_dtype="bfloat16",
        dec_upsample="subpixel",
    )
    t0 = time.perf_counter()
    res = train_gppvae(ds, cfg, log=NullLogger())
    wall = time.perf_counter() - t0
    times = sorted(h["sec_epoch"] for h in res.history[20:])
    sec = times[len(times) // 2]
    n_train = len(ds.train_idx)
    fl = gppvae_epoch_flops(
        image_shape=ds.image_shape, enc_features=cfg.enc_features,
        dec_features=cfg.dec_features, zdim=cfg.zdim,
        n_train=n_train, n_heldout=len(ds.heldout_idx),
        batch_size=cfg.batch_size,
        rank=cfg.obj_feature_dim * (2 * cfg.view_num_freqs + 1),
        upsample="subpixel",
    )["total"]
    print(json.dumps({
        "people": people, "bs": BS, "n_train": n_train, "sec_epoch": round(sec, 4),
        "images_per_sec": round(n_train / sec),
        "achieved_tflops": round(fl / sec / 1e12, 2),
        "mfu_vs_bf16_peak": round(fl / sec / BF16_PEAK, 4),
        "oos_mse": round(float(res.history[-1]["oos_mse"]), 5),
        "wall_s": round(wall, 1),
    }), flush=True)
