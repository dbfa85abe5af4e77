"""Performance regression gate: compare a `bench.py --all` run against
the committed baseline (VERDICT r3 task 3).

The reference's timedemo exists to detect regressions
(``NQ/cl_demo.c:364-382``: frames / seconds / fps printed after a
deterministic replay); this module is the framework's machine-checked
version of that discipline — ``python bench.py --check`` re-runs the
config suite and exits nonzero naming every metric that regressed past
tolerance vs ``bench_baseline.json``.

Field policy (keys walked recursively through each config dict):
* ``fps`` / ``*_fps``: higher is better — fail when current
  < (1 - fps_tol) * baseline.  These are device-resident measurement
  loops and run-to-run stable; fps_tol defaults to 12%.
* ``*_ms`` / ``ms_per_*``: lower is better — fail when current
  > (1 + ms_tol) * baseline.  End-to-end ms figures include axon relay
  dispatches (~20 ms/call, docs/PERF.md §8) whose variance is large, so
  ms_tol defaults to 75% — the gate catches a decompiled/fallback path
  (order-of-magnitude), not dispatch jitter.  The DEVICE-RESIDENT ms
  figures (``DEVICE_MS_KEYS``: fused on-device measurement loops, a few
  % run-to-run) get their own 25% ceiling so a 1.7x kernel regression
  cannot hide under the relay-sized blanket.
* ``exact`` and other booleans: must not flip from True to False.
* baseline fields missing from the run (or measured as an ``*_error``)
  fail; NEW fields in the run pass (they join the baseline at the next
  ``--check-update``).

``bench_baseline.json`` records ``{"mode": "full"|"quick", "results":
[...]}`` — quick-mode numbers use smaller batches and are only
comparable to quick baselines, so mismatched modes refuse to compare.
"""

from __future__ import annotations

import json
from pathlib import Path

FPS_TOL = 0.12
MS_TOL = 0.75
#: device-resident ms figures (fused on-device measurement loops — the
#: relay dispatch is amortized or absent, so run-to-run spread is a few
#: %): a 1.7x silent regression under the blanket 75% would hide a real
#: kernel fault, so they get their own tight ceiling (VERDICT r4 #6).
DEVICE_MS_TOL = 0.25
DEVICE_MS_KEYS = frozenset({
    "device_ms",            # config 1: on-device rebuild fori-loop
    "per_frame_ms",         # config 5: static-ray posed loop
    "per_frame_ms_scale2",
    "ms_per_batch",         # config 7: fused equirect chain
})

BASELINE_PATH = Path(__file__).resolve().parents[2] / "bench_baseline.json"


def _walk(d, prefix=""):
    """Yield (dotted_key, leaf) for every leaf in a nested dict."""
    for k, v in d.items():
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            yield from _walk(v, key)
        else:
            yield key, v


def _kind(key: str):
    """Classify a metric key: 'fps' (higher better), 'ms' (lower
    better), 'bool', or None (not gated).

    ``first_*`` keys are ungated: a first call's cost is dominated by
    jit compile-cache state (a persistent-cache hit is ~200 ms where a
    real TPU compile after any HLO-changing refactor is 1-2 s — a 5-7x
    swing with no kernel change, observed r3->r4 on configs 2/3), so
    they are informational only; the warm rebuild medians next to them
    are the gated numbers."""
    leaf = key.rsplit(".", 1)[-1]
    if leaf.startswith("first_"):
        return None
    # token match, not suffix match: per_frame_fps_scale2 and
    # chunked_fps_1024 are gated metrics too (a suffix-only test
    # silently exempted every suffixed key)
    tokens = leaf.split("_")
    if "fps" in tokens:
        return "fps"
    if leaf in DEVICE_MS_KEYS:
        return "ms_device"
    if "ms" in tokens:
        return "ms"
    if leaf == "exact":
        return "bool"
    return None


def compare_results(baseline, current, fps_tol=FPS_TOL, ms_tol=MS_TOL):
    """Compare two ``run_all`` result lists; return a list of failure
    strings (empty = gate passes).

    Configs are matched by their ``config`` field.  A baseline value of
    None (a guarded measurement that failed when the baseline was
    captured) gates nothing.
    """
    failures = []
    cur_by_id = {r.get("config"): r for r in current}
    for base in baseline:
        cid = base.get("config")
        name = base.get("name", str(cid))
        cur = cur_by_id.get(cid)
        if cur is None:
            failures.append(f"config {cid} ({name}): missing from run")
            continue
        cur_leaves = dict(_walk(cur))
        for key, bval in _walk(base):
            if key in ("config", "name") or bval is None:
                continue
            kind = _kind(key)
            if kind is None:
                continue
            cval = cur_leaves.get(key)
            if cval is None:
                err = cur_leaves.get(key.replace("_fps", "_error"), "absent")
                failures.append(
                    f"config {cid} ({name}): {key} not measured ({err}); "
                    f"baseline {bval}")
                continue
            if kind == "bool":
                if bool(bval) and not bool(cval):
                    failures.append(
                        f"config {cid} ({name}): {key} flipped True -> "
                        f"{cval}")
            elif kind == "fps":
                floor = (1.0 - fps_tol) * float(bval)
                if float(cval) < floor:
                    failures.append(
                        f"config {cid} ({name}): {key} regressed "
                        f"{bval} -> {cval} (floor {floor:.1f}, "
                        f"-{(1 - float(cval) / float(bval)) * 100:.1f}%)")
            elif kind in ("ms", "ms_device"):
                tol = DEVICE_MS_TOL if kind == "ms_device" else ms_tol
                ceil = (1.0 + tol) * float(bval)
                if float(cval) > ceil:
                    failures.append(
                        f"config {cid} ({name}): {key} regressed "
                        f"{bval} -> {cval} ms (ceiling {ceil:.1f}"
                        f"{', device-resident tier' if kind == 'ms_device' else ''})")
    return failures


def load_baseline(path=None):
    path = Path(path or BASELINE_PATH)
    if not path.exists():
        raise FileNotFoundError(
            f"{path} not committed — capture it with "
            "`python bench.py --check-update` on the bench chip")
    data = json.loads(path.read_text())
    return data["mode"], data["results"]


def save_baseline(results, mode, path=None):
    path = Path(path or BASELINE_PATH)
    path.write_text(json.dumps({"mode": mode, "results": results},
                               indent=1) + "\n")
    return path


def run_check(quick=False, update=False, fps_tol=FPS_TOL, ms_tol=MS_TOL,
              only=None):
    """Entry for ``bench.py --check[-update] [--configs 0,2,5-7]``.
    Returns process exit code; prints one JSON line per config plus the
    gate verdict.

    ``only`` restricts the run to a subset of config indices so the gate
    fits a bounded slot (the full suite is ~15-20 min on the chip):
    comparison then gates only the selected configs, and an update
    MERGES the re-measured configs into the committed baseline (the
    unselected entries are kept verbatim — a partial update must never
    silently drop the rest of the suite from the gate)."""
    from blinky_tpu.bench.configs import run_all

    mode = "quick" if quick else "full"
    results = run_all(quick=quick, only=only)
    for r in results:
        print(json.dumps(r))
    if update:
        if only is not None:
            base_mode, baseline = load_baseline()
            if base_mode != mode:
                print(json.dumps({
                    "metric": "bench_check", "status": "mode-mismatch",
                    "baseline_mode": base_mode, "run_mode": mode,
                    "hint": "a partial --check-update merges into the "
                            "committed baseline; modes must match"}))
                return 2
            new_by_id = {r.get("config"): r for r in results}
            results = [new_by_id.pop(b.get("config"), b) for b in baseline]
            results.extend(new_by_id.values())  # brand-new configs append
        path = save_baseline(results, mode)
        print(json.dumps({"metric": "bench_check", "status": "updated",
                          "baseline": str(path), "mode": mode,
                          "configs": sorted(r.get("config") for r in results)}))
        return 0
    base_mode, baseline = load_baseline()
    if base_mode != mode:
        print(json.dumps({
            "metric": "bench_check", "status": "mode-mismatch",
            "baseline_mode": base_mode, "run_mode": mode,
            "hint": "re-run with the baseline's mode or --check-update"}))
        return 2
    if only is not None:
        sel = set(only)
        baseline = [b for b in baseline if b.get("config") in sel]
    failures = compare_results(baseline, results,
                               fps_tol=fps_tol, ms_tol=ms_tol)
    print(json.dumps({
        "metric": "bench_check",
        "status": "fail" if failures else "pass",
        "failures": failures,
        "fps_tol": fps_tol, "ms_tol": ms_tol,
    }))
    return 1 if failures else 0
