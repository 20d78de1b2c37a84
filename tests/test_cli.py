"""Unified CLI smoke."""

import subprocess
import sys


def _run(*args):
    return subprocess.run(
        [sys.executable, "-m", "gppvae_tpu", *args],
        capture_output=True, text=True, timeout=120,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
             "PYTHONPATH": "/root/repo"},
    )


def test_help():
    r = _run("--help")
    assert r.returncode == 0
    assert "train-gppvae" in r.stdout


def test_unknown_command():
    r = _run("frobnicate")
    assert r.returncode == 2
    assert "unknown command" in r.stdout
