"""Typed configs + reference-flag-compatible dataset selection."""

from gppvae_tpu.config.datasets import build_dataset_from_flag

__all__ = ["build_dataset_from_flag"]
