"""Test harness configuration.

Default tier runs on CPU with a virtual 8-device mesh (the standard JAX
substitute for a fake distributed backend — SURVEY.md §4.5) and float64
enabled so math property tests can compare against dense oracles at tight
tolerance. Set RUN_TPU_TESTS=1 to instead run on the real TPU (tpu-marked
tests only make sense there).

Env vars must be set before jax initializes, hence the os.environ writes at
import time.
"""

import os

import jax

if not os.environ.get("RUN_TPU_TESTS"):
    # The dev box boots every interpreter with the axon remote-TPU plugin
    # already registered (sitecustomize imports jax with JAX_PLATFORMS=axon),
    # so env vars set here are too late — update the live config instead.
    # Must run before any backend initializes.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    # x64 only on the CPU tier (dense-oracle math tests); on TPU it breaks
    # Mosaic (int64 indices) and f64 doesn't lower anyway.
    jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RUN_TPU_TESTS"):
        return
    skip_tpu = pytest.mark.skip(reason="requires real TPU (set RUN_TPU_TESTS=1)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)
