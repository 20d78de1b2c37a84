"""Multi-device tests on the virtual 8-CPU mesh (SURVEY.md §4.5).

Checks that (a) the sharded-N GP math produces the same numbers as
single-device, (b) the full GPPVAE training step compiles and runs with
row-sharded data and replicated params, (c) shardings propagate (Z stays
row-sharded through phase A).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gppvae_tpu import gp
from gppvae_tpu.parallel import make_mesh, row_sharding, shard_rows

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def test_sharded_nll_matches_single_device():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    N, R, L = 512, 24, 8
    V = jax.random.normal(k1, (N, R), jnp.float64)
    Z = jax.random.normal(k2, (N, L), jnp.float64)
    vs, vn = jnp.float64(0.8), jnp.float64(0.3)

    ref = gp.gp_nll_from_features(Z, V, vs, vn)

    mesh = make_mesh(8)
    Vs, Zs = shard_rows(mesh, V, Z)
    out = jax.jit(gp.gp_nll_from_features)(Zs, Vs, vs, vn)
    np.testing.assert_allclose(out, ref, rtol=1e-12)


def test_sharded_taylor_grads_match():
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    N, R, L = 256, 12, 4
    V = jax.random.normal(k1, (N, R), jnp.float64)
    Z = jax.random.normal(k2, (N, L), jnp.float64)
    aux = {"log_vs": jnp.float64(0.0), "log_vn": jnp.float64(-1.0)}

    def nll_fn(Z, V, aux):
        return gp.gp_nll_from_features(
            Z, V, jnp.exp(aux["log_vs"]), jnp.exp(aux["log_vn"])
        )

    ref = gp.taylor_expand(nll_fn, Z, V, aux)

    mesh = make_mesh(8)
    Vs, Zs = shard_rows(mesh, V, Z)
    out = jax.jit(lambda Z, V, a: gp.taylor_expand(nll_fn, Z, V, a))(Zs, Vs, aux)
    np.testing.assert_allclose(out.value, ref.value, rtol=1e-12)
    np.testing.assert_allclose(out.dZ, ref.dZ, rtol=1e-10)
    np.testing.assert_allclose(out.dV, ref.dV, rtol=1e-10)
    # coefficient rows must stay row-sharded (no silent all-gather to host)
    assert out.dZ.sharding.is_equivalent_to(row_sharding(mesh), ndim=2)


def test_factor_prep_shard_map_pallas_interpret_parity(monkeypatch):
    """Pallas under the mesh (round-2): ops.factor_prep with backend
    'pallas' + a declared mesh runs the fused kernel per-shard inside
    shard_map (interpret mode on CPU) and psums the R-sized outputs —
    values AND gradients must match the plain XLA result."""
    monkeypatch.setenv("GPPVAE_PALLAS_INTERPRET", "1")
    from gppvae_tpu import ops

    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    N, R, L = 256, 24, 8
    U = jax.random.normal(k1, (N, R), jnp.float32)
    Z = jax.random.normal(k2, (N, L), jnp.float32)

    ref = ops.factor_prep(U, Z, impl="xla")

    def loss(u, z, impl=None):
        g, utz, zn = ops.factor_prep(u, z, impl=impl)
        return jnp.sum(g * g) + jnp.sum(utz) + zn

    ref_grads = jax.grad(loss, argnums=(0, 1))(U, Z, "xla")

    mesh = make_mesh(8)
    Us, Zs = shard_rows(mesh, U, Z)
    with ops.use_backend("pallas"), ops.use_mesh(mesh):
        out = jax.jit(lambda u, z: ops.factor_prep(u, z))(Us, Zs)
        grads = jax.jit(jax.grad(loss, argnums=(0, 1)))(Us, Zs)
    # fp32: per-shard partial sums reorder the N-reduction (8 shards);
    # atol covers near-zero entries of the ~1e3-magnitude gradients
    for o, r in zip(out, ref):
        np.testing.assert_allclose(o, r, rtol=3e-4, atol=1e-3)
    for g, r in zip(grads, ref_grads):
        np.testing.assert_allclose(g, r, rtol=3e-4, atol=1e-3)


def test_gppvae_mesh_pallas_matches_xla(monkeypatch):
    """End-to-end: GPPVAE on the mesh with ops_backend='pallas' (interpret
    kernels inside shard_map) reproduces the mesh-XLA trajectory."""
    monkeypatch.setenv("GPPVAE_PALLAS_INTERPRET", "1")
    from gppvae_tpu.data import build_rotated_digits
    from gppvae_tpu.train import GPPVAETrainConfig, train_gppvae

    ds = build_rotated_digits("synthetic", num_objects=16, num_views=8, seed=0)
    mesh = make_mesh(8)
    kw = dict(
        mode="joint", zdim=8, epochs=1, batch_size=16,
        obj_feature_dim=4, view_num_freqs=2,
        enc_features=(8, 16), dec_features=(16, 8),
    )
    a = train_gppvae(ds, GPPVAETrainConfig(**kw, ops_backend="xla"), mesh=mesh)
    b = train_gppvae(ds, GPPVAETrainConfig(**kw, ops_backend="pallas"), mesh=mesh)
    for key in ("loss", "gp_term", "gp_nll_full", "oos_mse"):
        np.testing.assert_allclose(
            a.history[0][key], b.history[0][key], rtol=5e-4,
            err_msg=f"pallas-vs-xla mesh mismatch on {key!r}",
        )


def test_gppvae_mesh_subpixel_matches_mesh_resize():
    """The subpixel decoder composes with the mesh: one DP-sharded epoch in
    subpixel mode equals the same mesh epoch with the literal resize
    decoder (the rewrite is exact, so only fp32 reassociation separates
    them; same mesh ⇒ same row-trimming ⇒ identical data)."""
    from gppvae_tpu.data import build_rotated_digits
    from gppvae_tpu.train import GPPVAETrainConfig, train_gppvae

    ds = build_rotated_digits("synthetic", num_objects=16, num_views=8, seed=0)
    mesh = make_mesh(8)
    kw = dict(
        mode="joint", zdim=8, epochs=1, batch_size=16,
        obj_feature_dim=4, view_num_freqs=2,
        enc_features=(8, 16), dec_features=(16, 8),
    )
    ref = train_gppvae(ds, GPPVAETrainConfig(**kw), mesh=mesh)
    sub = train_gppvae(
        ds, GPPVAETrainConfig(**kw, dec_upsample="subpixel"), mesh=mesh
    )
    for key in ("loss", "recon_term", "gp_term", "gp_nll_full", "oos_mse"):
        np.testing.assert_allclose(
            sub.history[0][key], ref.history[0][key], rtol=5e-4, atol=1e-6,
            err_msg=f"mesh subpixel-vs-resize mismatch on {key!r}",
        )


def test_gppvae_mesh_chunked_encode_matches_full():
    """Phase-A chunking composes with the mesh (round-2, VERDICT weak #7):
    encode_chunk < N/ndev must not change the math."""
    from gppvae_tpu.data import build_rotated_digits
    from gppvae_tpu.train import GPPVAETrainConfig, train_gppvae

    ds = build_rotated_digits("synthetic", num_objects=16, num_views=8, seed=0)
    mesh = make_mesh(8)
    kw = dict(
        mode="joint", zdim=8, epochs=1, batch_size=16,
        obj_feature_dim=4, view_num_freqs=2,
        enc_features=(8, 16), dec_features=(16, 8),
    )
    full = train_gppvae(ds, GPPVAETrainConfig(**kw, encode_chunk=4096), mesh=mesh)
    chunked = train_gppvae(ds, GPPVAETrainConfig(**kw, encode_chunk=8), mesh=mesh)
    for key in ("loss", "gp_nll_full", "oos_mse"):
        np.testing.assert_allclose(
            full.history[0][key], chunked.history[0][key], rtol=1e-4,
            err_msg=f"chunked-vs-full Phase A mismatch on {key!r}",
        )


def test_serving_on_mesh_matches_single_device():
    """DP serving: replicated R-sized state + row-sharded request batch
    reproduces single-device predictions (pure data parallelism — only
    fp32 reduction order separates them)."""
    from gppvae_tpu.data import build_rotated_digits
    from gppvae_tpu.eval import build_server_state, predict_images
    from gppvae_tpu.parallel import trim_to_multiple
    from gppvae_tpu.train import GPPVAETrainConfig, train_gppvae
    from gppvae_tpu.utils.metrics import NullLogger

    ds = build_rotated_digits("synthetic", num_objects=8, num_views=8,
                              image_size=32, seed=0)
    cfg = GPPVAETrainConfig(mode="joint", zdim=8, epochs=1, batch_size=16,
                            obj_feature_dim=4, view_num_freqs=1,
                            enc_features=(8, 16), dec_features=(16, 8))
    res = train_gppvae(ds, cfg, log=NullLogger())
    mesh = make_mesh(8)
    sh = row_sharding(mesh)
    tr = ds.train_idx[: trim_to_multiple(len(ds.train_idx), 8)]
    images_tr = jnp.asarray(ds.images[tr])
    d_tr, q_tr = jnp.asarray(ds.object_ids[tr]), jnp.asarray(ds.view_ids[tr])
    ref_state = build_server_state(res.model, res.params, res.fixed_W,
                                   images_tr, d_tr, q_tr)
    # encode_chunk < n so the CHUNKED sharded fold actually runs (the
    # chunk>=n path ignores batch_sharding)
    mesh_state = build_server_state(
        res.model, res.params, res.fixed_W,
        shard_rows(mesh, images_tr), d_tr, q_tr, batch_sharding=sh,
        encode_chunk=8,
    )
    ho = ds.heldout_idx[: trim_to_multiple(len(ds.heldout_idx), 8)]
    d_ho, q_ho = jnp.asarray(ds.object_ids[ho]), jnp.asarray(ds.view_ids[ho])
    y_ref = predict_images(res.model, ref_state, d_ho, q_ho)
    y_mesh = jax.jit(
        lambda s, d, q: predict_images(res.model, s, d, q, batch_sharding=sh)
    )(mesh_state, d_ho, q_ho)
    np.testing.assert_allclose(np.asarray(y_mesh), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)

    # streaming conditioning composes with the mesh too: the sharded-encode
    # fold of new rows equals the single-device fold
    from gppvae_tpu.eval.serving import observe

    y_obs = jnp.asarray(ds.images[ho])
    ref2 = observe(res.model, ref_state, y_obs, d_ho, q_ho)
    mesh2 = observe(res.model, mesh_state, shard_rows(mesh, y_obs),
                    d_ho, q_ho, batch_sharding=sh, encode_chunk=8)
    np.testing.assert_allclose(np.asarray(mesh2.core.M),
                               np.asarray(ref2.core.M),
                               rtol=1e-5, atol=1e-6)
    y_ref2 = predict_images(res.model, ref2, d_ho, q_ho)
    y_mesh2 = predict_images(res.model, mesh2, d_ho, q_ho)
    np.testing.assert_allclose(np.asarray(y_mesh2), np.asarray(y_ref2),
                               rtol=1e-5, atol=1e-6)


def test_gppvae_mesh_nondivisible_n_matches_single_device():
    """Mesh exactness for ANY N (round-2 VERDICT Missing #2): when
    N % ndev != 0 the trainer pads the shard axis with weight-0 wrap-around
    rows instead of dropping rows — the mesh trajectory must equal the
    single-device one on the SAME (untrimmed) data."""
    from gppvae_tpu.data import build_rotated_digits
    from gppvae_tpu.train import GPPVAETrainConfig, train_gppvae

    # 13 objects × 8 views: train split is not a multiple of 8
    ds = build_rotated_digits("synthetic", num_objects=13, num_views=8, seed=0)
    assert len(ds.train_idx) % 8 != 0, "fixture must exercise padding"
    config = GPPVAETrainConfig(
        mode="joint", zdim=8, epochs=2, batch_size=16,
        obj_feature_dim=4, view_num_freqs=2,
        enc_features=(8, 16), dec_features=(16, 8),
    )
    mesh_hist = train_gppvae(ds, config, mesh=make_mesh(8)).history
    ref_hist = train_gppvae(ds, config, mesh=None).history
    for m, r in zip(mesh_hist, ref_hist):
        for key in ("loss", "recon_term", "gp_term", "gp_nll_full",
                    "oos_mse", "v_sig", "v_noise"):
            np.testing.assert_allclose(
                m[key], r[key], rtol=1e-4, atol=1e-6,
                err_msg=f"nondivisible-N mesh mismatch on {key!r} "
                        f"(epoch {m['epoch']})",
            )


@pytest.mark.parametrize(
    "knobs,rtol",
    [
        ({"grad_accum_steps": 2}, 1e-4),
        ({"refresh_every_steps": 3}, 1e-4),
        # bf16 compute: shard-order reassociation of bf16 products drifts
        # more than the f32 cases' ≲1e-6 — tolerance reflects that
        ({"compute_dtype": "bfloat16", "polish_epochs": 1}, 2e-3),
    ],
    ids=["grad_accum", "refresh_mid_epoch", "polish_tail"],
)
def test_gppvae_mesh_round3_knobs_match_single_device(knobs, rtol):
    """The round-3 training knobs must compose with the mesh (round-3
    VERDICT weak #3): MultiSteps state under psum'd grads
    (grad_accum_steps), Phase A+B re-expansion segments under shard_map
    (refresh_every_steps), and the f32 polish tail each reproduce the
    single-device trajectory on a 8-way DP mesh."""
    from gppvae_tpu.data import build_rotated_digits
    from gppvae_tpu.train import GPPVAETrainConfig, train_gppvae

    ds = build_rotated_digits("synthetic", num_objects=16, num_views=8, seed=0)
    config = GPPVAETrainConfig(
        mode="joint", zdim=8, epochs=2, batch_size=16,
        obj_feature_dim=4, view_num_freqs=2,
        enc_features=(8, 16), dec_features=(16, 8), **knobs,
    )
    mesh_hist = train_gppvae(ds, config, mesh=make_mesh(8)).history
    ref_hist = train_gppvae(ds, config, mesh=None).history
    assert len(mesh_hist) == len(ref_hist) == 2
    for m, r in zip(mesh_hist, ref_hist):
        for key in ("loss", "recon_term", "gp_term", "gp_nll_full",
                    "oos_mse", "v_sig", "v_noise"):
            np.testing.assert_allclose(
                m[key], r[key], rtol=rtol, atol=1e-6,
                err_msg=f"mesh-vs-single-device mismatch on {key!r} with "
                        f"{knobs} (epoch {m['epoch']})",
            )


def test_gppvae_mesh_train_set_smaller_than_data_axis():
    """Padding must survive N < ndev (ADVICE.md round-3): the pad exceeds
    the train set, so wrap-around rows must CYCLE the index vector — and
    the tiny-N mesh trajectory must still equal single-device."""
    from gppvae_tpu.data import build_rotated_digits
    from gppvae_tpu.train import GPPVAETrainConfig, train_gppvae

    # 3 objects × 2 views, 1 heldout view/object → 3 train rows < 8 devices
    ds = build_rotated_digits("synthetic", num_objects=3, num_views=2, seed=0)
    assert len(ds.train_idx) < 8, "fixture must exercise pad > num_train"
    config = GPPVAETrainConfig(
        mode="joint", zdim=8, epochs=2, batch_size=2,
        obj_feature_dim=4, view_num_freqs=1,
        enc_features=(8, 16), dec_features=(16, 8),
    )
    mesh_hist = train_gppvae(ds, config, mesh=make_mesh(8)).history
    ref_hist = train_gppvae(ds, config, mesh=None).history
    for m, r in zip(mesh_hist, ref_hist):
        for key in ("loss", "recon_term", "gp_term", "gp_nll_full", "oos_mse"):
            np.testing.assert_allclose(
                m[key], r[key], rtol=1e-4, atol=1e-6,
                err_msg=f"tiny-N mesh mismatch on {key!r} (epoch {m['epoch']})",
            )


def test_gppvae_trains_on_mesh():
    from gppvae_tpu.data import build_rotated_digits
    from gppvae_tpu.train import GPPVAETrainConfig, train_gppvae

    ds = build_rotated_digits("synthetic", num_objects=16, num_views=8, seed=0)
    mesh = make_mesh(8)
    config = GPPVAETrainConfig(
        mode="joint", zdim=8, epochs=2, batch_size=16,
        obj_feature_dim=4, view_num_freqs=2,
        enc_features=(8, 16), dec_features=(16, 8),
    )
    result = train_gppvae(ds, config, mesh=mesh)
    losses = [h["loss"] for h in result.history]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert np.isfinite(result.history[-1]["oos_mse"])


def test_vae_trains_on_mesh():
    from gppvae_tpu.data import build_rotated_digits
    from gppvae_tpu.train import VAETrainConfig, train_vae

    # 13 objects × 8 views = 104 rows: NOT divisible by 8 (exercises padding)
    ds = build_rotated_digits("synthetic", num_objects=13, num_views=8, seed=0)
    mesh = make_mesh(8)
    config = VAETrainConfig(
        zdim=8, epochs=2, batch_size=16, enc_features=(8, 16),
        dec_features=(16, 8), epochs_per_dispatch=2,
    )
    result = train_vae(ds, config, mesh=mesh)
    losses = [h["loss"] for h in result.history]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_tp_sharded_kernels_match_single_device(monkeypatch):
    """TP at a meaningful coverage (round-2 VERDICT weak #5): lower the
    shard threshold so MANY kernels actually split over the model axis,
    then assert the dp×tp trajectory equals single-device — TP must be a
    layout choice, never a math change."""
    import functools
    import importlib

    tg = importlib.import_module("gppvae_tpu.train.train_gppvae")
    from gppvae_tpu.data import build_rotated_digits
    from gppvae_tpu.parallel import make_mesh_2d, shard_params_model_axis
    from gppvae_tpu.train import GPPVAETrainConfig, train_gppvae

    ds = build_rotated_digits("synthetic", num_objects=16, num_views=8, seed=0)
    config = GPPVAETrainConfig(
        mode="joint", zdim=8, epochs=2, batch_size=16,
        obj_feature_dim=4, view_num_freqs=2,
        enc_features=(8, 16), dec_features=(16, 8),
    )
    ref = train_gppvae(ds, config, mesh=None).history

    monkeypatch.setattr(
        tg, "shard_params_model_axis",
        functools.partial(shard_params_model_axis, min_size=1 << 8),
    )
    mesh = make_mesh_2d(4, 2)
    res = train_gppvae(ds, config, mesh=mesh)
    # several kernels (not just one big dense) must carry the model axis
    n_tp = sum(
        1 for x in jax.tree.leaves(res.params)
        if hasattr(x, "sharding") and "model" in str(getattr(x.sharding, "spec", ""))
    )
    assert n_tp >= 3, f"only {n_tp} TP-sharded kernels — threshold too high"
    for m, r in zip(res.history, ref):
        for key in ("loss", "recon_term", "gp_term", "gp_nll_full", "oos_mse"):
            np.testing.assert_allclose(
                m[key], r[key], rtol=1e-4, atol=1e-6,
                err_msg=f"TP-vs-single-device mismatch on {key!r}",
            )


def test_gppvae_trains_on_2d_mesh_dp_tp():
    """dp×tp: rows shard over 'data', large dense kernels over 'model'."""
    from gppvae_tpu.data import build_rotated_digits
    from gppvae_tpu.parallel import make_mesh_2d, shard_params_model_axis
    from gppvae_tpu.train import GPPVAETrainConfig, train_gppvae

    ds = build_rotated_digits("synthetic", num_objects=16, num_views=8, seed=0)
    mesh = make_mesh_2d(4, 2)
    config = GPPVAETrainConfig(
        mode="joint", zdim=8, epochs=2, batch_size=16,
        obj_feature_dim=4, view_num_freqs=2,
        enc_features=(8, 16), dec_features=(16, 8),
    )
    result = train_gppvae(ds, config, mesh=mesh)
    losses = [h["loss"] for h in result.history]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # at least one kernel actually carries a model-axis sharding
    import jax as _jax

    specs = [
        x.sharding.spec
        for x in _jax.tree.leaves(result.params)
        if hasattr(x, "sharding") and hasattr(x.sharding, "spec")
    ]
    assert any("model" in str(s) for s in specs), specs


def test_tp_warns_on_nondivisible_kernels():
    """Round-4 VERDICT Weak #5: kernels large enough for TP whose last dim
    doesn't divide the model axis must be replicated WITH a warning naming
    them — never silently. Divisible configs stay silent."""
    import warnings

    from gppvae_tpu.parallel import make_mesh_2d, shard_params_model_axis

    mesh = make_mesh_2d(4, 2)
    bad = {"dense": {"kernel": jnp.zeros((64, 65))}}  # 65 % 2 != 0
    with pytest.warns(UserWarning, match="REPLICATED.*dense.*kernel"):
        out = shard_params_model_axis(mesh, bad, min_size=1 << 8)
    assert "model" not in str(out["dense"]["kernel"].sharding.spec)

    good = {"dense": {"kernel": jnp.zeros((64, 64))}}
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        out = shard_params_model_axis(mesh, good, min_size=1 << 8)
    assert "model" in str(out["dense"]["kernel"].sharding.spec)


# ---------------------------------------------------------------------------
# SPMD wire audit (round-4 VERDICT Missing #1): the equality tests above
# prove the mesh computes the right NUMBERS; these prove its communication
# STRUCTURE — nothing N-sized or pixel-dataset-sized crosses the mesh.
# ---------------------------------------------------------------------------

_HLO_SAMPLE = """\
  %ar = f32[12,12]{1,0} all-reduce(f32[12,12]{1,0} %x), replica_groups={}, op_name="a"
  %tup = (f32[8,4]{1,0}, s32[16]{0}) all-reduce(%a, %b), metadata={op_name="jit(fused)/psum"}
  %ag.s = bf16[64,128]{1,0} all-gather-start(%y), dimensions={0}
  %ag.d = bf16[64,128]{1,0} all-gather-done(%ag.s)
  %cp = u8[2,2]{1,0} collective-permute(%z), source_target_pairs={{0,1}}
  %ar2 = f32[4]{0} all-reduce(f32[4]{0} %all-gather-done.5), op_name="chained"
  %noise = f32[999,999]{1,0} add(%p, %q)
"""


def test_parse_collectives_units():
    """HLO parser: tuple shapes sum, async -done OPS excluded (but a real
    collective whose OPERAND is a %…-done value must NOT be dropped — the
    substring skip was a false-pass hole, round-5 review), layouts
    stripped, dtype byte widths honored, op_name attribution captured."""
    from gppvae_tpu.parallel import parse_collectives

    colls = parse_collectives(_HLO_SAMPLE)
    by_op = {(c.op, c.shape): c for c in colls}
    assert len(colls) == 5  # the -done OP and the add are not collectives
    assert by_op[("all-reduce", "f32[4]")].op_name == "chained"
    assert by_op[("all-reduce", "f32[12,12]")].bytes == 12 * 12 * 4
    assert by_op[("all-reduce", "f32[12,12]")].op_name == "a"
    tup = by_op[("all-reduce", "f32[8,4],s32[16]")]
    assert tup.bytes == 8 * 4 * 4 + 16 * 4
    assert tup.op_name == "jit(fused)/psum"
    assert by_op[("all-gather", "bf16[64,128]")].bytes == 64 * 128 * 2
    assert by_op[("collective-permute", "u8[2,2]")].bytes == 4


def _audit_fixture(heldout_per_object=None):
    from gppvae_tpu.data import build_rotated_digits
    from gppvae_tpu.train import GPPVAETrainConfig

    kw = {}
    if heldout_per_object is not None:
        kw["heldout_per_object"] = heldout_per_object
    ds = build_rotated_digits("synthetic", num_objects=8, num_views=8,
                              image_size=32, seed=0, **kw)
    # encode_chunk pinned below both differential N values (the TP encoder
    # legitimately psums chunk-bounded partial activations; the default
    # chunk min(1024, N) tracks N at these shapes)
    cfg = GPPVAETrainConfig(
        mode="joint", zdim=8, epochs=1, batch_size=16,
        obj_feature_dim=4, view_num_freqs=1, encode_chunk=32,
        enc_features=(8, 16), dec_features=(16, 8),
    )
    return ds, cfg


def test_wire_audit_structure_holds_with_n_differential():
    """The fused training step's compiled collectives are all R/param/bs-
    sized AND their signature multiset is identical at two dataset sizes —
    the decisive N-independence proof (tools/spmd_audit.py is the verbose
    CLI twin; dryrun_multichip runs the same assert every round)."""
    from gppvae_tpu.parallel import assert_wire_structure

    ds1, cfg = _audit_fixture()
    ds2, _ = _audit_fixture(heldout_per_object=3)
    audit = assert_wire_structure(ds1, cfg, make_mesh(8), dataset_2=ds2)
    assert audit["n_collectives"] > 0  # a mesh program with no psums is fishy
    assert audit["max_bytes"] <= audit["budget"]
    assert audit["n_differential"][0] != audit["n_differential"][1]


def test_wire_audit_serving_fold_and_dp_predict():
    """Serving scale-out has the same wire discipline as training: the mesh
    FOLD (build_server_state — row-sharded encode + Woodbury factorize) may
    psum only R-sized reductions, and DP serving (predict_images over
    row-sharded requests against a replicated R-sized state) must move
    nothing image- or N-sized. Both proven by budget + differential via
    audit_lowered (the generic half of the training audit)."""
    from gppvae_tpu.data import build_rotated_digits
    from gppvae_tpu.eval.serving import build_server_state, predict_images
    from gppvae_tpu.models import VAE
    from gppvae_tpu.parallel import audit_lowered

    mesh = make_mesh(8)
    sh = row_sharding(mesh)
    model = VAE(zdim=8, image_shape=(32, 32, 1), enc_features=(8, 16),
                dec_features=(16, 8))
    ds = build_rotated_digits("synthetic", num_objects=8, num_views=8,
                              image_size=32, seed=0)
    vae_params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((2, 32, 32, 1), jnp.float32),
                            jax.random.PRNGKey(1))
    X = jax.random.normal(jax.random.PRNGKey(2), (8, 4), jnp.float32)
    W = jax.random.normal(jax.random.PRNGKey(3), (8, 3), jnp.float32)
    params = {"vae": vae_params, "gp": {"X": X, "log_vs": jnp.float32(0.0),
                                        "log_vn": jnp.float32(-1.0)}}
    # R = 4·3 = 12 → the psum'd Gram+projection is ~1 KB; anything bigger
    # than a few KB on the wire is structure leaking, not bookkeeping
    budget = 4096

    def fold_audit(n):
        imgs = shard_rows(mesh, jnp.asarray(ds.images[ds.train_idx][:n]))
        d = shard_rows(mesh, jnp.asarray(ds.object_ids[ds.train_idx][:n]))
        q = shard_rows(mesh, jnp.asarray(ds.view_ids[ds.train_idx][:n]))
        low = jax.jit(
            lambda p, i, dd, qq: build_server_state(
                model, p, W, i, dd, qq, encode_chunk=32,
                batch_sharding=sh)
        ).lower(params, imgs, d, q)
        return audit_lowered(low)

    a48, a32 = fold_audit(48), fold_audit(32)
    assert a48["max_bytes"] <= budget, a48["collectives"]
    assert a48["signature"] == a32["signature"], (a48["signature"],
                                                  a32["signature"])
    assert a48["n_collectives"] > 0  # the R-sized psums must exist

    state = build_server_state(
        model, params, W,
        jnp.asarray(ds.images[ds.train_idx][:48]),
        jnp.asarray(ds.object_ids[ds.train_idx][:48]),
        jnp.asarray(ds.view_ids[ds.train_idx][:48]),
    )

    def predict_audit(n):
        d = shard_rows(mesh, jnp.zeros((n,), jnp.int32))
        q = shard_rows(mesh, jnp.zeros((n,), jnp.int32))
        low = jax.jit(
            lambda s, dd, qq: predict_images(model, s, dd, qq,
                                             batch_sharding=sh)
        ).lower(state, d, q)
        return audit_lowered(low)

    p16, p24 = predict_audit(16), predict_audit(24)
    assert p16["max_bytes"] <= budget, p16["collectives"]
    assert p16["signature"] == p24["signature"]


def test_wire_audit_catches_nsized_traffic(monkeypatch):
    """Negative control — the audit must FAIL on the program it was built to
    catch: global-offset encode chunking (pad+reshape of the row-sharded
    image array at offsets that don't align with per-device blocks → XLA
    re-lays-out pixel rows with N-scaling collective-permutes; the round-5
    fix is models/vae.py _encode_all_sharded). Forcing _row_shard_count→1
    re-enables exactly that legacy path (the trainer itself rounds
    encode_chunk to a mesh multiple, so no config can reach it any more).
    If this ever passes silently the audit has lost its teeth."""
    import gppvae_tpu.models.vae as vae_mod
    from gppvae_tpu.parallel import assert_wire_structure

    monkeypatch.setattr(vae_mod, "_row_shard_count", lambda s: 1)
    ds1, cfg = _audit_fixture()
    ds2, _ = _audit_fixture(heldout_per_object=3)
    with pytest.raises(AssertionError, match="signatures CHANGE"):
        assert_wire_structure(ds1, cfg, make_mesh(8), dataset_2=ds2)
