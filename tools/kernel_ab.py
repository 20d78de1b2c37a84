"""Kernel-level Pallas-vs-XLA A/B for the fused Phase-B factor_prep
(one-pass {UᵀU, UᵀZ, ‖Z‖²}) across R — the evidence behind "the Pallas
kernels are the large-R path" (BASELINE.md round-3 end-to-end A/B is
neutral because Phase B is 3–5% of epoch FLOPs at the bench shape).

Timing is DEVICE time from a jax.profiler trace (parsed with
tools/trace_summary.summarize_trace), not wall clock: the shared relay
adds ~25-30 ms of drift-prone round-trip per dispatch, which dwarfs and
corrupts µs-scale kernel timings (two wall-clock harnesses failed here —
CLAUDE.md relay lessons). Each program runs K reps of the kernel inside
one lax.scan; per-rep input perturbation defeats XLA's loop-invariant
hoisting, and a no-kernel baseline program with the same perturbation adds
is measured and subtracted. Prints one JSON line per (N, R).
"""
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from gppvae_tpu import ops
from trace_summary import summarize_trace

L = 16


def _program_device_s(impl: str, N: int, R: int, K: int) -> float:
    """Device seconds for one dispatch scanning the kernel over K
    pre-materialized DISTINCT (U, Z) inputs. Stacked real inputs (not
    per-rep perturbation arithmetic) so (a) XLA cannot hoist the kernel
    out of the loop or fuse input math into its dot while the opaque
    custom call can't, and (b) the consumer is sum(abs(·)), which XLA's
    algebraic simplifier cannot collapse the way it rewrites
    sum(dot(A,B)) into dots of reduced operands — both failure modes
    observed with earlier harnesses (see git history of this file)."""
    key = jax.random.PRNGKey(0)
    Us = jax.random.normal(key, (K, N, R), jnp.float32) / jnp.sqrt(R)
    Zs = jax.random.normal(jax.random.fold_in(key, 1), (K, N, L),
                           jnp.float32)

    @jax.jit
    def run(Us, Zs):
        def body(c, uz):
            G, UtZ, zn = ops.factor_prep(uz[0], uz[1], impl=impl)
            return (c + jnp.sum(jnp.abs(G)) + jnp.sum(jnp.abs(UtZ))
                    + jnp.sum(jnp.abs(zn))), None

        return jax.lax.scan(body, 0.0, (Us, Zs))[0]

    # compile WITHOUT executing (AOT): the traced call below is then the
    # first real execution — a prior identical call could be served from
    # the relay's memo and leave the trace empty
    run.lower(Us, Zs).compile()
    with tempfile.TemporaryDirectory() as d:
        with jax.profiler.trace(d):
            float(run(Us, Zs))
        paths = glob.glob(os.path.join(d, "**", "*.trace.json.gz"),
                          recursive=True)
        s = summarize_trace(paths[0])
    return s["device_time_per_dispatch_s"] / K


def main():
    for N in (5700, 65550):
        for R in (56, 256, 512, 1024):
            K = max(4, min(16, (1 << 31) // (N * R * 4)))  # ≤~2 GB stack
            row = {"N": N, "R": R, "L": L, "reps": K}
            for impl in ("xla", "pallas"):
                t = _program_device_s(impl, N, R, K)
                row[f"{impl}_us"] = round(t * 1e6, 1)
            row["speedup"] = round(
                row["xla_us"] / max(row["pallas_us"], 1e-9), 2)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
