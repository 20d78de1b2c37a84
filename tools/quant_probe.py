"""int8-MXU quantization probe for the serving decoder (round-4 negative
result — run before ever building a quant subsystem).

v5e's MXU has 2x the int8 peak of bf16 (394 vs 197 TOPS), so an int8
post-training-quantized serving decoder looks like a 2x capacity lever on
paper. This probe measures whether the decoder's convs are actually
MXU-peak-bound at our shapes. Three parts:

  1. support: does XLA:TPU compile s8xs8->s32 `conv_general_dilated`,
     including the lhs-dilated subpixel lowering? (It does.)
  2. speed: bf16 vs int8 decoder-shaped conv chain (face 128^2, feats
     128/64/32, the 4x4 lhs-dilated stages + 3x3 logit conv), scanned with
     STEP-DEPENDENT inputs — `jnp.roll(x, i)` per step — so XLA cannot
     hoist the loop-invariant chain out of the scan. An earlier version of
     this probe measured an impossible 615 TF/s in bf16 because every scan
     step computed the same value and XLA ran the chain once per dispatch;
     same lesson as BASELINE.md's rotate-the-request-indices serving
     protocol: a benchmark step must DEPEND on the loop counter.
  3. capacity asymptote: the real `serving.predict_images` program at the
     face shape with rotated indices and a long (K=50) chain, plus its
     decode-only and GP-only pieces.

Round-4 measured verdict (1x v5e, 2026-08-18, BASELINE.md "int8 probe"):
int8 is 1.04-1.09x — the decoder is conv-EMITTER/bandwidth-bound at these
channel counts (16-26% MFU), nowhere near the MXU peak where int8's 2x
lives, and the full predict_images path is decode-bound with the GP and
sigmoid fused to noise. An int8 quant subsystem would add a quality
tradeoff for a ~9% capacity win: declined.

Usage: PYTHONPATH=/root/.axon_site:. python tools/quant_probe.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

B, FEATS, H0, C, ZDIM = 200, (128, 64, 32), 16, 3, 32
P, Q, M, MW = 50, 8, 8, 7


def _burst_time(fn, args, K):
    """min-of-3 wall for K step-dependent reps inside ONE dispatch."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def burst(*a):
        def step(_, i):
            y = fn(i, *a)
            return None, jnp.sum(y.astype(jnp.float32))

        _, s = jax.lax.scan(step, None, jnp.arange(K, dtype=jnp.int32))
        return s

    _ = jax.device_get(burst(*args))  # compile outside the timing
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.device_get(burst(*args))
        reps.append(time.perf_counter() - t0)
    return min(reps) / K


def probe_support():
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(np.random.randint(-127, 127, (8, 32, 32, 32)), jnp.int8)
    w = jnp.asarray(np.random.randint(-127, 127, (4, 4, 32, 32)), jnp.int8)
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    print(f"int8 lhs-dilated conv: OK ({y.dtype} {y.shape})")


def probe_chain_speed(K: int = 50):
    import jax
    import jax.numpy as jnp

    def make_ws(dtype):
        ws, cin = [], FEATS[0]
        for f in FEATS:
            ws.append(jnp.asarray(
                np.random.randint(-8, 8, (4, 4, cin, f)), dtype))
            cin = f
        ws.append(jnp.asarray(
            np.random.randint(-8, 8, (3, 3, cin, C)), dtype))
        return ws

    def chain(x, ws, acc):
        h = x
        for w in ws[:-1]:
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc,
            )
            # requantize (int8) / activation (bf16) between stages
            h = ((h // 64).astype(x.dtype) if x.dtype == jnp.int8
                 else jax.nn.elu(h).astype(x.dtype))
        return jax.lax.conv_general_dilated(
            h, ws[-1], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc,
        )

    out = {}
    for name, dtype, acc in (("bf16", jnp.bfloat16, jnp.float32),
                             ("int8", jnp.int8, jnp.int32)):
        ws = make_ws(dtype)
        x0 = jnp.asarray(np.random.randint(-4, 4, (B, H0, H0, FEATS[0])),
                         dtype)
        t = _burst_time(
            lambda i, x: chain(jnp.roll(x, i, axis=0), ws, acc), (x0,), K)
        out[name] = t
        print(f"decoder chain {name}: {t*1000:.3f} ms/batch "
              f"-> {B/t:,.0f} img/s")
    print(f"int8 speedup: {out['bf16']/out['int8']:.2f}x")


def probe_serving_asymptote(K: int = 50):
    import jax
    import jax.numpy as jnp

    from gppvae_tpu import gp
    from gppvae_tpu.eval import serving
    from gppvae_tpu.models import VAE

    model = VAE(zdim=ZDIM, image_shape=(128, 128, 3), dtype=jnp.bfloat16,
                upsample="subpixel")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)),
                        jax.random.PRNGKey(1))
    ks = jax.random.split(jax.random.PRNGKey(3), 6)
    R = M * MW
    state = serving.ServerState(
        core=gp.PosteriorCore(
            M=jax.random.normal(ks[0], (R, ZDIM)) * 0.1,
            G=jnp.eye(R) + 0.1 * jax.random.normal(ks[1], (R, R)),
            Lb=jnp.linalg.cholesky(jnp.eye(R) * 2.0),
            v_noise=jnp.asarray(0.1),
        ),
        X=jax.random.normal(ks[2], (P, M)),
        W=jax.random.normal(ks[3], (Q, MW)),
        v_sig=jnp.ones((1,)),
        vae_params=params,
    )
    d = jnp.asarray(np.random.randint(0, P, (B,)), jnp.int32)
    q = jnp.asarray(np.random.randint(0, Q, (B,)), jnp.int32)
    z0 = jax.random.normal(ks[4], (B, ZDIM))

    t = _burst_time(
        lambda i, dd, qq: serving.predict_images(
            model, state, (dd + i) % P, (qq + i) % Q), (d, q), K)
    print(f"predict_images (real): {t*1000:.3f} ms/batch "
          f"-> {B/t:,.0f} img/s")
    t = _burst_time(
        lambda i, z: model.apply(params, jnp.roll(z, i, axis=0),
                                 method=VAE.decode), (z0,), K)
    print(f"decode only:           {t*1000:.3f} ms/batch "
          f"-> {B/t:,.0f} img/s")


def main():
    import jax

    print("devices:", jax.devices())
    probe_support()
    probe_chain_speed()
    probe_serving_asymptote()


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
