"""Protocol-aware diff of two bench.py artifacts (cross-round no-regress check).

The repo's measurement discipline (BASELINE.md "relay lessons", round-4/5
serving rows) says a wall-clock delta is only evidence of regression when
the PROTOCOL and the PROGRAM are the same:

- trainer wall numbers drift run-to-run through the relay (±5%, spread
  recorded per config) — arbitrate by `program_sha1` (lowered-StableHLO
  identity): same sha + slower beyond the drift band = real regression;
  different sha = different program, arbitrate by trace, not wall;
- serving rows are comparable only at equal (serving_program_sha1,
  model_dtype, serving_batch) — batch is the protocol (ADVICE round-4 #3:
  the sustained key renamed to carry the batch for exactly this reason);
- accuracy / face-convergence / kernel-win verdicts must stay PASS/true
  regardless of wall.

This tool applies those rules mechanically so a human (or the judge) can
run `python tools/bench_diff.py OLD.json NEW.json` across rounds and get
REGRESSION / SLOWER-but-unarbitrated / NON-COMPARABLE verdicts instead of
eyeballing JSON. Accepts raw bench artifacts (the `{"metric": ...}` line),
the driver's BENCH_r*.json wrapper (`{"cmd", "rc", "parsed", "tail"}`), or
a log file whose last JSON line is the artifact.

Exit status: 0 = no regressions, 1 = at least one, 2 = inputs unusable.
"""

from __future__ import annotations

import argparse
import json
import sys

# wall drift band: relay run-to-run drift is ±5% on sec_epoch_min
# (BASELINE.md round-3 "relay drift band"); require a 15% excursion on the
# *min* before calling a same-program wall delta a regression.
DEFAULT_DRIFT = 0.15

SUSTAINED_KEYS = (
    # round-5 name (batch in the key = the protocol) then legacy round-4
    "serving_sustained_b200_images_per_sec",
    "serving_sustained_images_per_sec",
)


def _extract_json_objects(text: str) -> list[dict]:
    """Every parseable one-line JSON object in `text` (last wins)."""
    out = []
    for line in text.splitlines():
        line = line.strip()
        if not (line.startswith("{") and line.endswith("}")):
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(obj, dict):
            out.append(obj)
    return out


def load_artifact(path: str) -> dict:
    """Raw artifact | driver wrapper | log file -> the artifact dict."""
    with open(path) as f:
        text = f.read()
    try:
        obj = json.loads(text)
    except json.JSONDecodeError:
        obj = None
    if isinstance(obj, dict):
        if "metric" in obj:
            return obj
        # driver wrapper: {"cmd", "rc", "parsed", "tail"}
        parsed = obj.get("parsed")
        if isinstance(parsed, list) and parsed:
            parsed = parsed[-1]
        if isinstance(parsed, dict) and "metric" in parsed:
            return parsed
        tail = obj.get("tail")
        if isinstance(tail, str):
            cands = [o for o in _extract_json_objects(tail) if "metric" in o]
            if cands:
                return cands[-1]
            raise SystemExit(
                f"{path}: driver wrapper has no parseable artifact (tail is "
                "front-truncated?) — use the full artifact file, e.g. the "
                "demo/bench_r*_builder.json the builder committed"
            )
        raise SystemExit(f"{path}: JSON but not a bench artifact or wrapper")
    # not a single JSON doc: treat as a log, take the last artifact line
    cands = [o for o in _extract_json_objects(text) if "metric" in o]
    if cands:
        return cands[-1]
    raise SystemExit(f"{path}: no bench artifact JSON line found")


def _cfgs(art: dict) -> dict:
    return art.get("extra", {}).get("configs", {}) or {}


def _serving_identity(row: dict) -> tuple | None:
    """(sha, dtype, batch) when the row carries a serving identity.

    The batch rides as `serving_batch` on face rows and `batch` on the
    oos_serving row — fall through so two rows at different batches can
    never read as same-identity just because the preferred key is absent."""
    sha = row.get("serving_program_sha1")
    if sha is None:
        return None
    return (sha, row.get("model_dtype"),
            row.get("serving_batch", row.get("batch")))


def diff(old: dict, new: dict, drift: float = DEFAULT_DRIFT) -> dict:
    """Compare two artifacts; returns the verdict summary dict."""
    regressions: list[str] = []
    warnings: list[str] = []
    non_comparable: list[str] = []
    ok_lines: list[str] = []

    old_sha = old.get("extra", {}).get("program_sha1")
    new_sha = new.get("extra", {}).get("program_sha1")

    # ---- headline -------------------------------------------------------
    ov, nv = old.get("value"), new.get("value")
    if isinstance(ov, (int, float)) and isinstance(nv, (int, float)) and ov > 0:
        ratio = nv / ov
        tag = f"headline {old.get('metric')}: {ov} -> {nv} ({ratio:.3f}x)"
        if ratio > 1 + drift:
            if old_sha and old_sha == new_sha:
                regressions.append(
                    f"{tag} with IDENTICAL program_sha1 {new_sha} — a real "
                    "slowdown, not relay drift"
                )
            elif old_sha and new_sha and old_sha != new_sha:
                non_comparable.append(
                    f"{tag} but program_sha1 changed "
                    f"({old_sha} -> {new_sha}): program differs — arbitrate "
                    "by device trace (tools/trace_summary.py), not wall"
                )
            else:
                warnings.append(f"{tag} and no program_sha1 to arbitrate")
        else:
            ok_lines.append(tag + (" [same program]"
                                   if old_sha and old_sha == new_sha else ""))

    # ---- per-config wall + throughput ------------------------------------
    oc, nc = _cfgs(old), _cfgs(new)
    same_program = bool(old_sha) and old_sha == new_sha
    for name in sorted(set(oc) & set(nc)):
        o, n = oc[name], nc[name]
        if not (isinstance(o, dict) and isinstance(n, dict)):
            continue
        osec = o.get("sec_epoch_min", o.get("sec_epoch"))
        nsec = n.get("sec_epoch_min", n.get("sec_epoch"))
        if isinstance(osec, (int, float)) and isinstance(nsec, (int, float)) \
                and osec > 0:
            r = nsec / osec
            if r > 1 + drift:
                msg = f"config {name}: sec_epoch_min {osec} -> {nsec} ({r:.2f}x)"
                # only the headline program's sha is recorded; same-sha bench
                # runs built every config from the same code, so treat the
                # global sha as the arbiter, but keep these one level softer
                (warnings if not same_program else regressions).append(
                    msg + (" [same bench program identity]" if same_program
                           else " [program identity unknown — check trace]"))
        # serving rows: protocol identity required before comparing
        for key in SUSTAINED_KEYS + ("sustained_images_per_sec",):
            if key in o or key in n:
                o_val = next((o[k] for k in SUSTAINED_KEYS +
                              ("sustained_images_per_sec",) if k in o), None)
                n_val = next((n[k] for k in SUSTAINED_KEYS +
                              ("sustained_images_per_sec",) if k in n), None)
                if o_val is None or n_val is None:
                    break
                oid, nid = _serving_identity(o), _serving_identity(n)
                if oid is None or nid is None or oid != nid:
                    non_comparable.append(
                        f"config {name}: serving sustained {o_val} vs {n_val} "
                        f"NOT comparable — identity (sha, dtype, batch) "
                        f"{oid} vs {nid}"
                    )
                elif o_val > 0 and n_val / o_val < 1 - drift:
                    regressions.append(
                        f"config {name}: serving sustained {o_val} -> {n_val} "
                        f"({n_val / o_val:.2f}x) at IDENTICAL serving "
                        f"identity {nid}"
                    )
                else:
                    ok_lines.append(
                        f"config {name}: serving sustained {o_val} -> {n_val} "
                        f"[same identity]")
                break

    # ---- verdict blocks must not flip -------------------------------------
    for name in sorted(set(oc) & set(nc)):
        o, n = oc[name], nc[name]
        if not (isinstance(o, dict) and isinstance(n, dict)):
            continue
        if o.get("verdict") == "PASS" and n.get("verdict") not in (None, "PASS"):
            regressions.append(
                f"config {name}: verdict PASS -> {n.get('verdict')}")
        for flag in ("win_ok", "dispatch_declines_at_r56"):
            if o.get(flag) is True and n.get(flag) is False:
                regressions.append(f"config {name}: {flag} true -> false")

    return {
        "ok": not regressions,
        "regressions": regressions,
        "warnings": warnings,
        "non_comparable": non_comparable,
        "comparable_ok": ok_lines,
        "program_sha1": {"old": old_sha, "new": new_sha},
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("old", help="older artifact / BENCH_r*.json / log")
    p.add_argument("new", help="newer artifact / BENCH_r*.json / log")
    p.add_argument("--drift", type=float, default=DEFAULT_DRIFT,
                   help="relative band treated as relay drift (default 0.15)")
    args = p.parse_args(argv)
    summary = diff(load_artifact(args.old), load_artifact(args.new),
                   drift=args.drift)
    for k in ("comparable_ok", "non_comparable", "warnings", "regressions"):
        for line in summary[k]:
            print(f"[{k.upper().rstrip('S').replace('_', ' ')}] {line}")
    print(json.dumps(summary))
    return 0 if summary["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
