"""gppvae_tpu — a TPU-native Gaussian Process Prior VAE framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
PyTorch implementation of Casale et al. 2018, "Gaussian Process Prior
Variational Autoencoders" (NeurIPS 2018, arXiv:1810.11738); see SURVEY.md at
the repo root for the reference analysis (reference: ahmerb/GPPVAE,
pysrc/faceplace/{vae,gp,train_vae,train_gppvae}.py — mount unavailable, so
parity claims cite SURVEY.md sections instead of file:line).

Layers (bottom → top):
  ops/        tiled Pallas kernels + XLA fallbacks for the GP linear algebra
  gp/         low-rank (Woodbury) GP prior: NLL, Taylor surrogate, predictive
  models/     conv Encoder/Decoder (flax.linen), VAE assembly
  parallel/   device mesh, shardings, shard_map'd sharded-N GP reductions
  data/       rotated-digits builder, FacePlace loader, splits
  train/      train_vae / train_gppvae drivers (vanilla, dis, joint)
  eval/       out-of-sample GP-predictive generation, MSE, image panels
  config/     typed configs + reference-flag-compatible CLI
  checkpoint/ orbax save/restore, --vae_weights handoff
  utils/      metrics JSONL, timers, rng
"""

__version__ = "0.1.0"
