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


def _maybe_enable_compile_cache() -> None:
    """Opt-in persistent XLA compilation cache (GPPVAE_COMPILE_CACHE=<dir>).

    A cold multi-program pipeline (pretrain → GPPVAE → eval) spends minutes
    in compiles on a fresh interpreter (~30-60 s per program through the
    remote-TPU relay, CLAUDE.md); with the cache, repeat invocations of the
    same CLI configs reload serialized executables instead. Off by default:
    mutating global jax config at import time is only acceptable when the
    user explicitly asked via the env var. Harmless where a backend cannot
    serialize executables (cache simply misses).
    GPPVAE_COMPILE_CACHE_MIN_SECS overrides the min-compile-time admission
    threshold (default 1.0 s — skip caching trivial programs)."""
    import os

    cache = os.environ.get("GPPVAE_COMPILE_CACHE")
    if not cache:
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser(cache))
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(os.environ.get("GPPVAE_COMPILE_CACHE_MIN_SECS", "1.0")),
    )


_maybe_enable_compile_cache()
