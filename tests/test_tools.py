"""The perf-audit tools are evidence generators for BASELINE.md claims —
pin their parsers so a refactor cannot silently change what the numbers
mean. Uses the committed round-3 trace artifact as the fixture."""

import gzip
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO / "tools"))


def test_summarize_trace_on_committed_artifact(tmp_path):
    """summarize_trace parses the committed one-epoch dispatch slice
    (demo/trace_r3c) and reproduces the shape of the committed summary:
    the same dominant module, a sane occupancy, and an op breakdown that
    sums to ~100%."""
    from trace_summary import summarize_trace

    src = REPO / "demo" / "trace_r3c" / "dispatch_slice.trace.json.gz"
    committed = json.loads((REPO / "demo" / "trace_r3c" / "summary.json").read_text())

    s = summarize_trace(str(src))
    assert s["module"] == committed["module"]
    assert s["n_dispatches"] >= 1
    total = sum(s["op_breakdown_pct"].values())
    assert 95.0 <= total <= 105.0, s["op_breakdown_pct"]
    # the slice keeps the full module-window event (ops are filtered to one
    # epoch, the window is not), so per-dispatch time must reproduce the
    # committed full-dispatch number
    slice_s = s["device_time_per_dispatch_s"]
    committed_s = committed["device_time_per_dispatch_s"]
    assert abs(slice_s - committed_s) < 0.1 * committed_s


def test_hlo_audit_copy_parser():
    from hlo_audit import audit_hlo_text

    hlo = "\n".join([
        "ENTRY %main {",
        "  %copy.1 = f32[128,32,32,1]{3,2,1,0} copy(%fusion.9)",
        "  %copy.2 = bf16[5700,16]{1,0} copy(%param.0)",
        "  %cs.1 = (f32[64,64]{1,0}, u32[]) copy-start(%fusion.3)",
        "  %notacopy = f32[8]{0} add(%a, %b)",
        "}",
    ])
    out = audit_hlo_text(hlo)
    assert out["n_copy_ops"] == 3
    # 128·32·32·1·4 + 5700·16·2 + 64·64·4
    assert out["total_copy_bytes"] == 128 * 32 * 32 * 4 + 5700 * 16 * 2 + 64 * 64 * 4
    kinds = {r["op"] for r in out["ranked"]}
    assert any(k.startswith("copy-start") for k in kinds)


def test_relay_probe_port_state_and_cli():
    """relay_probe's TCP triage primitive: a port nothing listens on is
    'refused' (the DEAD-relay signature); the CLI parses. The subprocess
    probe itself is exercised operationally (bench.py shares its logic),
    not here — under the CPU-forced test config it would hang on the axon
    plugin by design."""
    from relay_probe import RELAY_PORT, port_state

    assert isinstance(RELAY_PORT, int)
    # port 1 on localhost: nothing listens there in this sandbox
    assert port_state(port=1, timeout=2.0) in ("refused", "timeout")


def test_shape_explore_tiny_variants(tmp_path, capsys, monkeypatch):
    """shape_explore's measurement loop (variant build → train → stats →
    analytic MFU) on monkeypatched tiny variants, including the channel
    tiler; the real five-shape run is TPU-queue work."""
    import json

    import shape_explore
    from gppvae_tpu.data import build_rotated_digits

    def tiny(seed):
        ds = build_rotated_digits("synthetic", num_objects=8, num_views=8,
                                  image_size=32, seed=seed)
        kw = dict(zdim=8, batch_size=16, enc_features=(8, 16),
                  dec_features=(16, 8))
        yield "digits32", ds, kw
        yield "digits32c8", shape_explore._tile_channels(ds, 8), kw

    monkeypatch.setattr(shape_explore, "_variants", tiny)
    out = str(tmp_path / "shapes.json")
    shape_explore.main(["--epochs", "2", "--epd", "1", "--out", out])
    rec = json.loads(open(out).read())["shape_explore"]
    assert set(rec) == {"digits32", "digits32c8"}
    assert rec["digits32c8"]["image_shape"] == [32, 32, 8]
    for r in rec.values():
        assert r["sec_epoch"] > 0 and r["flops_per_epoch"] > 0
    # channel tiling must scale the analytic FLOPs up
    assert (rec["digits32c8"]["flops_per_epoch"]
            > rec["digits32"]["flops_per_epoch"])


def _art(value=0.016, sha="aaaa", sustained=50000, s_sha="bbbb",
         s_batch=200, dtype="float32", verdict="PASS", sec=0.047):
    """Minimal bench artifact for bench_diff tests."""
    return {
        "metric": "rotated_mnist_gppvae_joint_sec_per_epoch",
        "value": value, "unit": "s/epoch", "vs_baseline": None,
        "extra": {
            "program_sha1": sha,
            "configs": {
                "face_view_128": {
                    "sec_epoch": sec, "sec_epoch_min": sec,
                    "serving_sustained_b200_images_per_sec": sustained,
                    "serving_batch": s_batch,
                    "serving_program_sha1": s_sha, "model_dtype": dtype,
                },
                "face_accuracy_64": {"verdict": verdict},
                "kernels": {"win_ok": True,
                            "dispatch_declines_at_r56": True},
            },
        },
    }


def test_bench_diff_same_program_regression_and_drift_band():
    """bench_diff applies the repo's arbitration discipline: same
    program_sha1 + wall beyond the band = regression; inside the band =
    relay drift (ok); sha change = non-comparable, never a regression."""
    from bench_diff import diff

    base = _art()
    # inside the drift band: ok
    s = diff(base, _art(value=0.017))
    assert s["ok"] and not s["regressions"]
    # beyond the band, same sha: REGRESSION
    s = diff(base, _art(value=0.022))
    assert not s["ok"] and "program_sha1" in s["regressions"][0]
    # beyond the band, different sha: program changed -> non-comparable
    s = diff(base, _art(value=0.022, sha="cccc"))
    assert s["ok"] and s["non_comparable"]
    assert "trace" in s["non_comparable"][0]


def test_bench_diff_serving_identity_gates_comparison():
    """Serving rows compare only at equal (sha, dtype, batch) — the
    ADVICE round-4 #3 protocol rule, mechanised."""
    from bench_diff import diff

    base = _art()
    # slower at IDENTICAL serving identity: regression
    s = diff(base, _art(sustained=30000))
    assert not s["ok"] and "serving sustained" in s["regressions"][0]
    # slower but at a different batch: non-comparable, not a regression
    s = diff(base, _art(sustained=30000, s_batch=50))
    assert s["ok"]
    assert any("NOT comparable" in m for m in s["non_comparable"])
    # different precision likewise
    s = diff(base, _art(sustained=30000, dtype="bfloat16"))
    assert s["ok"] and any("NOT comparable" in m
                           for m in s["non_comparable"])


def test_bench_diff_verdict_flips_are_regressions():
    from bench_diff import diff

    base = _art()
    s = diff(base, _art(verdict="FAIL"))
    assert not s["ok"] and "PASS -> FAIL" in s["regressions"][0]
    new = _art()
    new["extra"]["configs"]["kernels"]["win_ok"] = False
    s = diff(base, new)
    assert not s["ok"] and any("win_ok" in m for m in s["regressions"])


def test_bench_diff_loads_wrapper_logs_and_cli(tmp_path, capsys):
    """load_artifact accepts the raw artifact, the driver wrapper (parsed
    or tail), and a log whose last JSON line is the artifact; the CLI
    exits 0/1 by verdict."""
    import json as _json

    from bench_diff import load_artifact, main

    art = _art()
    raw = tmp_path / "raw.json"
    raw.write_text(_json.dumps(art))
    wrapped = tmp_path / "wrap.json"
    wrapped.write_text(_json.dumps(
        {"cmd": "python bench.py", "rc": 0, "parsed": [art], "n": 1}))
    tail = tmp_path / "tail.json"
    tail.write_text(_json.dumps(
        {"cmd": "python bench.py", "rc": 0, "parsed": None,
         "tail": "noise\n" + _json.dumps(art) + "\n"}))
    log = tmp_path / "run.log"
    log.write_text("INFO starting\n" + _json.dumps(art) + "\n")
    for p in (raw, wrapped, tail, log):
        assert load_artifact(str(p))["value"] == art["value"]
    assert main([str(raw), str(wrapped)]) == 0
    slow = tmp_path / "slow.json"
    slow.write_text(_json.dumps(_art(value=0.022)))
    assert main([str(raw), str(slow)]) == 1
    out = capsys.readouterr().out
    assert "REGRESSION" in out
