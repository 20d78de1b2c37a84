"""Benchmark: rotated-MNIST-shaped GPPVAE sec/epoch (BASELINE.json:2).

Runs the flagship GPPVAE-joint config at the paper's benchmark shape
(P=400 objects × Q=16 views → N=6400 train-ish rows, 32×32 images,
zdim=16, R = 8·7 = 56) on whatever device JAX selects (the real TPU under
the driver), measures steady-state sec/epoch (median over post-compile
epochs), and prints ONE JSON line.

vs_baseline: the reference publishes no benchmark numbers
(BASELINE.json:13 "published": {}; see BASELINE.md). If a reference number
ever lands in BASELINE.json as {"published": {"sec_epoch": X}}, this script
reports X / ours (speedup, >1 = faster than reference); until then null.
"""

import json
import time


def main():
    import jax

    from gppvae_tpu.data import build_rotated_digits
    from gppvae_tpu.train import GPPVAETrainConfig, train_gppvae
    from gppvae_tpu.utils.metrics import NullLogger

    ds = build_rotated_digits(
        "synthetic", num_objects=400, num_views=16, image_size=32, seed=0,
        cache_dir="/tmp/gppvae_bench_cache",
    )
    epochs = 30
    config = GPPVAETrainConfig(
        mode="joint", zdim=16, epochs=epochs, batch_size=128,
        obj_feature_dim=8, view_num_freqs=3, seed=0,
        epochs_per_dispatch=10,  # fused pipeline: one host sync per 10 epochs
    )

    t0 = time.perf_counter()
    result = train_gppvae(ds, config, log=NullLogger())
    total = time.perf_counter() - t0

    # drop the first dispatch (compile); median of the steady-state epochs
    times = sorted(h["sec_epoch"] for h in result.history[10:])
    sec_epoch = times[len(times) // 2]

    baseline = None
    try:
        with open("BASELINE.json") as f:
            baseline = json.load(f).get("published", {}).get("sec_epoch")
    except Exception:
        pass
    vs = (baseline / sec_epoch) if baseline else None

    print(json.dumps({
        "metric": "rotated_mnist_gppvae_joint_sec_per_epoch",
        "value": round(sec_epoch, 4),
        "unit": "s/epoch",
        "vs_baseline": vs,
        "extra": {
            "device": str(jax.devices()[0]),
            "images_per_sec": round(len(ds.train_idx) / sec_epoch),
            "n_train": int(len(ds.train_idx)),
            "epochs_timed": epochs - 10,
            "total_wall_s": round(total, 1),
            "final_oos_mse": round(result.history[-1]["oos_mse"], 5),
        },
    }))


if __name__ == "__main__":
    main()
