"""Profiling hooks (SURVEY.md §5 tracing/profiling).

Wraps a training run in a jax.profiler trace when a directory is given —
view with TensorBoard/XProf (`tensorboard --logdir <dir>`). Degrades to a
no-op if the device plugin can't capture (the remote-TPU dev tunnel).
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def maybe_trace(trace_dir: str | None):
    if not trace_dir:
        yield
        return
    import jax

    # guard only the profiler's startup — an exception from the traced BODY
    # must propagate untouched, never be mislabeled as a profiler failure
    cm = None
    try:
        cm = jax.profiler.trace(trace_dir)
        cm.__enter__()
    except Exception as e:  # pragma: no cover — plugin without profiler
        import warnings

        warnings.warn(f"profiler trace unavailable: {e}")
        cm = None
    try:
        yield
    finally:
        if cm is not None:
            cm.__exit__(None, None, None)


def annotate(name: str):
    """Named trace span decorator/context for host-side phases."""
    import jax

    return jax.profiler.TraceAnnotation(name)
