"""TPU-relay triage as code (the CLAUDE.md prose, executable).

The dev box routes every TPU dispatch through a local stdio-tunnel relay
(127.0.0.1:8113). Two distinct failure modes were hit in rounds 3-4:

  WEDGED  after heavy sustained load: ports answer (or the plugin hangs at
          backend init), even `jnp.ones(8).sum()` blocks for minutes. It
          recovers ON ITS OWN — retry with patience; do NOT restart the
          relay (its transport is its parent's stdio pipe: a fresh copy of
          tpu_init.py just frames bytes into your shell).
  DEAD    the relay process exited (round 3, ~6 h in): every port refuses,
          no tpu_init in `ps`. Only the infra can restore it — pivot to
          CPU-side work (jax.config.update("jax_platforms", "cpu")).

Usage:
    python tools/relay_probe.py            # one probe, prints the verdict
    python tools/relay_probe.py --watch    # loop until OK (logs to stdout)
    python tools/relay_probe.py --watch --interval 90 --log /tmp/tpu.log

The probe runs a tiny jnp op in a SUBPROCESS under a timeout, so a hung
backend init can never wedge the calling process (the same machinery as
bench.py's bounded-retry entry). Exit code: 0 = TPU OK, 1 = not OK (single
probe mode); --watch exits 0 when the relay comes back.
"""

from __future__ import annotations

import argparse
import socket
import subprocess
import sys
import time

RELAY_PORT = 8113
_PROBE = (
    "import jax, jax.numpy as jnp; "
    "assert float(jnp.ones(8).sum()) == 8.0; "
    "print(jax.default_backend(), jax.devices()[0])"
)


def port_state(port: int = RELAY_PORT, timeout: float = 5.0) -> str:
    """'open' | 'refused' | 'timeout' for the relay's TCP port."""
    s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    s.settimeout(timeout)
    try:
        s.connect(("127.0.0.1", port))
        return "open"
    except ConnectionRefusedError:
        return "refused"
    except OSError:
        return "timeout"
    finally:
        s.close()


def probe(timeout_s: float = 90.0) -> tuple[str, str]:
    """Returns (verdict, detail); verdict ∈ {'ok', 'dead', 'wedged'}.

    'dead' = fast failure or refused port (relay process gone — only infra
    restores it); 'wedged' = the op hung (recovers on its own, retry)."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE],
            capture_output=True, timeout=timeout_s, text=True,
        )
    except subprocess.TimeoutExpired:
        return "wedged", f"probe op hung >{timeout_s:.0f}s (retry later)"
    if r.returncode == 0:
        return "ok", r.stdout.strip().splitlines()[-1]
    port = port_state()
    tail = (r.stderr or "").strip().splitlines()
    detail = tail[-1] if tail else f"rc={r.returncode}"
    if port == "refused":
        return "dead", f"port {RELAY_PORT} refused; {detail}"
    return "wedged", f"port {RELAY_PORT} {port}; {detail}"


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="TPU relay triage probe")
    p.add_argument("--watch", action="store_true",
                   help="loop until the TPU answers (exit 0 on recovery)")
    p.add_argument("--interval", type=float, default=90.0,
                   help="seconds between probes in --watch mode")
    p.add_argument("--timeout", type=float, default=90.0,
                   help="per-probe hang timeout")
    p.add_argument("--log", default=None,
                   help="also append status lines to this file")
    args = p.parse_args(argv)

    def emit(line: str) -> None:
        print(line, flush=True)
        if args.log:
            with open(args.log, "a") as f:
                f.write(line + "\n")

    while True:
        verdict, detail = probe(args.timeout)
        emit(f"{time.strftime('%H:%M:%S')} TPU_{verdict.upper()} {detail}")
        if verdict == "ok":
            return 0
        if not args.watch:
            return 1
        time.sleep(args.interval)


if __name__ == "__main__":
    raise SystemExit(main())
