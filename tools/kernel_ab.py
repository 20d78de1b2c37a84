"""Kernel-level Pallas-vs-XLA A/B for the fused Phase-B factor_prep
(one-pass {UᵀU, UᵀZ, ‖Z‖²}) across R — the evidence behind the dispatch
rule in ops/pallas_gemm.py: the fused kernel runs only for lane-aligned R
(where it wins 1.3–2×) and declines to XLA otherwise.

Methodology (three harnesses died to get here — keep these rules):
- DEVICE time from a jax.profiler trace (tools/trace_summary), never wall
  clock: the shared relay adds ~25-30 ms of drift-prone round-trip per
  dispatch (CLAUDE.md relay lessons).
- Loop-dispatch over M DISTINCT pre-materialized (U, Z) buffers, one
  jitted call each, NOT a lax.scan over a stacked (M, N, R) array: inside
  a scan XLA fuses the per-rep dynamic-slice into its own dots but must
  MATERIALIZE the slice for the opaque custom call — the scan harness
  taxed only the Pallas arm (round-3 finding; a ~2× phantom penalty).
  Distinct buffers also defeat relay-side memoization.
- Module windows quantize to ~100 µs through the relay, so N is scaled up
  (262144 rows ≈ 0.5-1.3 ms per dispatch) and M=12-24 windows averaged.

Two regimes are reported per R:
  resident  — operands are plain device arrays (the serving / large-R
              path, where Phase B dominates and U is reused across calls)
  produced  — U is materialized by an in-program elementwise producer
              (the fused-trainer shape: XLA fuses the producer into its
              dot; the custom call forces a materialization first)
Prints one JSON line per (N, R, regime).
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
from gppvae_tpu.ops.pallas_gemm import factor_prep_pallas
from trace_summary import summarize_trace


def _pallas_raw(U, Z):
    """The kernel itself, bypassing the dispatch's perf-decline rule —
    the A/B must measure the kernel even where dispatch routes to XLA."""
    return factor_prep_pallas(U, Z)

L = 16
N = 262144


def _dev_us_per_dispatch(f, pairs) -> float:
    jax.block_until_ready(pairs)
    with tempfile.TemporaryDirectory() as d:
        with jax.profiler.trace(d):
            outs = [f(U, Z) for U, Z in pairs]
            jax.block_until_ready(outs)
        paths = glob.glob(os.path.join(d, "**", "*.trace.json.gz"),
                          recursive=True)
        s = summarize_trace(paths[0])
    return s["device_time_per_dispatch_s"] * 1e6


def nll_rows(rs):
    """A/B the Woodbury NLL core fwd+bwd: pallas (on-chip chol/solve kernel
    + X-residual backward, two MXU dots) vs xla (plain-jnp autodiff:
    cholesky + trisolve custom calls re-run in the backward). Yields one
    row dict per R (importable — bench.py's `kernels` block reuses it).

    R-sized work is ~µs — far below the relay's ~100 µs window quantization
    — so each timed dispatch CHAINS K=64 value_and_grad iterations through
    a data dependency (G += 1e-30·dG) and reports device µs/iteration.
    Unlike factor_prep, both arms stream only KB-sized operands, so the
    scan-slice materialization penalty that poisoned custom-call timing on
    big operands is negligible here."""
    K = 64
    for R in rs:
        k = jax.random.split(jax.random.PRNGKey(R), 2)
        n_rows = 4096
        U = jax.random.normal(k[0], (n_rows, R), jnp.float32) * 0.3
        Z = jax.random.normal(k[1], (n_rows, L), jnp.float32)
        G0, UtZ0 = U.T @ U, U.T @ Z
        zn, vn = jnp.sum(Z * Z), jnp.float32(0.7)

        row = {"R": R, "L": L, "n_rows": n_rows, "chain": K}
        for impl in ("xla", "pallas"):
            def f(G, UtZ, impl=impl):
                return ops.woodbury_nll_core(
                    G, UtZ, zn, vn, n_rows, L, impl=impl
                )

            def chain(G, UtZ, f=f):
                def body(carry, _):
                    G, UtZ = carry
                    (v, (dG, dUtZ)) = jax.value_and_grad(
                        f, argnums=(0, 1)
                    )(G, UtZ)
                    return (G + 1e-30 * dG, UtZ + 1e-30 * dUtZ), v

                _, vs = jax.lax.scan(body, (G, UtZ), None, length=K)
                return jnp.sum(vs)

            g = jax.jit(chain)
            g.lower(G0, UtZ0).compile()
            us = _dev_us_per_dispatch(
                lambda G, UtZ: g(G, UtZ), [(G0, UtZ0)] * 8
            )
            row[f"{impl}_us_per_iter"] = round(us / K, 1)
        row["speedup"] = round(
            row["xla_us_per_iter"] / max(row["pallas_us_per_iter"], 1e-9), 2
        )
        yield row


def factor_prep_rows(rs, regimes=("resident", "produced"), reps=None):
    """factor_prep A/B rows (one per R×regime), importable by bench.py's
    `kernels` block. Methodology per the module docstring: distinct
    pre-materialized buffer pairs, one jitted dispatch each, device time
    from a profiler trace."""
    key = jax.random.PRNGKey(0)
    for R in rs:
        M = reps if reps is not None else (24 if R <= 256 else 12)
        n = N // 2 if R >= 1024 else N  # keep the buffer pool under ~8 GB HBM
        pairs = [
            (jax.random.normal(jax.random.fold_in(key, R * 100 + m),
                               (n, R), jnp.float32),
             jax.random.normal(jax.random.fold_in(key, R * 100 + m + 50),
                               (n, L), jnp.float32))
            for m in range(M)
        ]
        for regime in regimes:
            row = {"N": n, "R": R, "L": L, "regime": regime, "reps": M}
            impls = {
                "xla": lambda U, Z: ops.factor_prep(U, Z, impl="xla"),
                "pallas": _pallas_raw,
            }
            for impl, base in impls.items():
                if regime == "resident":
                    f = jax.jit(base)
                else:
                    f = jax.jit(lambda U, Z, base=base: base(U * 1.0001, Z))
                f.lower(*pairs[0]).compile()
                row[f"{impl}_us"] = round(_dev_us_per_dispatch(f, pairs), 1)
            row["speedup"] = round(
                row["xla_us"] / max(row["pallas_us"], 1e-9), 2)
            yield row
        del pairs


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "nll":
        for row in nll_rows(tuple(int(a) for a in sys.argv[2:]) or (56, 128, 256, 512)):
            print(json.dumps(row), flush=True)
        return
    rs = tuple(int(a) for a in sys.argv[1:]) or (56, 128, 256, 512, 1024)
    for row in factor_prep_rows(rs):
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
