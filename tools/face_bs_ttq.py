"""BASELINE.md 'Round-4 face batch-size time-to-quality A/B' (keep bs=64 at N=332).

Time-to-quality A/B at the BENCH face config (50x8, 128², R=56,
bf16+subpixel): bs=64 (current benched value) vs bs=128 (the measured
conv-emitter sweet spot). Decide by oos-vs-WALL, not per-epoch rate:
fewer/larger steps must not slow convergence per second. Same protocol as
round-3's digits bs sweep ("128 still wins time-to-quality")."""
import json
import sys
import time

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from gppvae_tpu.data import build_faceplace
from gppvae_tpu.train import GPPVAETrainConfig, train_gppvae
from gppvae_tpu.utils.metrics import NullLogger

ds = build_faceplace("synthetic", num_people=50, num_poses=8,
                     image_size=128, seed=0)

for bs in (64, 128):
    cfg = GPPVAETrainConfig(
        mode="joint", zdim=32, epochs=400, batch_size=bs,
        obj_feature_dim=8, view_num_freqs=3, seed=0,
        epochs_per_dispatch=40, compute_dtype="bfloat16",
        dec_upsample="subpixel",
    )
    res = train_gppvae(ds, cfg, log=NullLogger())
    hist = res.history
    # cumulative wall from per-epoch sec_epoch; report oos at wall
    # checkpoints so the two arms are compared at EQUAL SECONDS
    wall, marks = 0.0, {}
    targets = [2, 4, 6, 8, 10, 12, 14]
    for h in hist:
        wall += h["sec_epoch"]
        for t in targets:
            if t not in marks and wall >= t:
                marks[t] = h["oos_mse"]
    oos = [h["oos_mse"] for h in hist]
    print(json.dumps({
        "bs": bs,
        "sec_epoch_med": round(sorted(h["sec_epoch"] for h in hist[40:])[
            (len(hist) - 40) // 2], 4),
        "total_wall_s": round(wall, 1),
        "oos_at_wall_s": {str(t): round(float(v), 5)
                          for t, v in sorted(marks.items())},
        "oos_100": round(float(oos[99]), 5),
        "oos_400": round(float(oos[-1]), 5),
        "oos_min": round(float(min(oos)), 5),
    }), flush=True)
