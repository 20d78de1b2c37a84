"""Hot linear-algebra ops with switchable backends (XLA ↔ Pallas).

The reference leans on cuBLAS/MAGMA through torch for its GP linear algebra
(SURVEY.md §2.2); here every hot op goes through this dispatch layer so the
GP math in `gppvae_tpu.gp` is backend-agnostic:

  * 'xla'    — jax.numpy; XLA already lowers these to the MXU optimally for
               most shapes. Always available; the correctness reference.
  * 'pallas' — hand-tuned TPU kernels in gppvae_tpu/ops/pallas_*.py (tiled
               Gram, fused squared-norm reductions, …) for the HBM-resident
               N-sized operands of the GP phase.

Select globally with `set_backend('pallas')`, per-call with `impl=`, or via
the GPPVAE_OPS_BACKEND environment variable. Pallas kernels silently fall
back to XLA for shapes/dtypes they do not cover (e.g. float64 in tests, tiny
ranks) so the math layer never needs to care.
"""

from gppvae_tpu.ops.dispatch import (
    factor_prep,
    get_backend,
    get_mesh,
    set_backend,
    set_mesh,
    use_backend,
    use_mesh,
    gram,
    matmul_tn,
    sqnorm,
    woodbury_nll_core,
)

__all__ = [
    "factor_prep",
    "get_backend",
    "get_mesh",
    "set_backend",
    "set_mesh",
    "use_backend",
    "use_mesh",
    "gram",
    "matmul_tn",
    "sqnorm",
    "woodbury_nll_core",
]
