"""Wall-clock phase timers for the epoch loop (SURVEY.md §5: tracing).

Phases A/B/C of the GPPVAE epoch are timed individually; sec/epoch is the
benchmark headline. Use `jax.block_until_ready` at phase boundaries so the
numbers mean device time, not dispatch time.
"""

from __future__ import annotations

import contextlib
import time


class PhaseTimer:
    def __init__(self):
        self.totals: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0

    def reset(self) -> dict[str, float]:
        out, self.totals = self.totals, {}
        return out
