"""Unified CLI: python -m gppvae_tpu <command> [args...]

Commands mirror the reference's per-script entry points (SURVEY.md §2.1)
plus the rebuild's eval tooling:

    build-data    build + store a GridDataset .npz   (data/build_cli.py)
    train-vae     vanilla conv-VAE pretrain          (train/train_vae.py)
    train-gppvae  GPPVAE dis/joint training          (train/train_gppvae.py)
    train-cvae    CVAE comparison baseline           (train/train_cvae.py)
    generate      out-of-sample conditional generation (eval/generate.py)
    serve         answer (object, view) requests from an exported
                  server-state artifact               (eval/serving.py)
    plot          history figure from metrics.jsonl  (eval/plots.py)
"""

import sys

_COMMANDS = {
    "build-data": ("gppvae_tpu.data.build_cli", "main"),
    "train-vae": ("gppvae_tpu.train.train_vae", "main"),
    "train-gppvae": ("gppvae_tpu.train.train_gppvae", "main"),
    "train-cvae": ("gppvae_tpu.train.train_cvae", "main"),
    "generate": ("gppvae_tpu.eval.generate", "main"),
    "serve": ("gppvae_tpu.eval.serving", "main"),
    "plot": ("gppvae_tpu.eval.plots", "main"),
}
# full-pipeline scripts living at the repo root (available when run from a
# checkout): validate = pretrain→dis→joint accuracy ordering, bench = perf


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print(__doc__)
        raise SystemExit(0 if len(sys.argv) >= 2 else 1)
    cmd = sys.argv[1]
    if cmd not in _COMMANDS:
        print(f"unknown command {cmd!r}; choose from {sorted(_COMMANDS)}")
        raise SystemExit(2)
    import importlib

    module, fn = _COMMANDS[cmd]
    getattr(importlib.import_module(module), fn)(sys.argv[2:])


if __name__ == "__main__":
    main()
