"""Shared utilities: structured metrics, phase timers, rng helpers."""

from gppvae_tpu.utils.metrics import MetricsLogger, NullLogger
from gppvae_tpu.utils.profiling import maybe_trace
from gppvae_tpu.utils.timers import PhaseTimer

__all__ = ["MetricsLogger", "NullLogger", "PhaseTimer", "maybe_trace"]
