"""The perf regression gate (bench/check.py): a deliberately slowed
metric must trip it, noise within tolerance must not."""

import json

import pytest

from blinky_tpu.bench.check import (
    compare_results, load_baseline, save_baseline,
)

BASE = [
    {"config": 4, "name": "batched", "plain_fps": 23000.0,
     "rubix_texels_fps": 33000.0, "build_ms": 100.0,
     "rubix_rowcrop_fps": None},
    {"config": 0, "name": "roundtrip", "exact": True, "remap_ms": 60.0},
    {"config": 1, "name": "sweep",
     "stereographic": {"warm_ms": 35.0, "device_ms": 1.9}},
]


def _clone():
    return json.loads(json.dumps(BASE))


def test_gate_passes_on_identical_and_faster_runs():
    assert compare_results(BASE, _clone()) == []
    cur = _clone()
    cur[0]["plain_fps"] = 99999.0  # faster never fails
    cur[1]["remap_ms"] = 1.0       # lower ms never fails
    assert compare_results(BASE, cur) == []


def test_slowed_kernel_trips_fps():
    cur = _clone()
    cur[0]["rubix_texels_fps"] = 33000.0 * 0.8  # a silent 20% regression
    fails = compare_results(BASE, cur)
    assert len(fails) == 1 and "rubix_texels_fps" in fails[0]
    # ...but 10% sits inside the 12% fps tolerance
    cur[0]["rubix_texels_fps"] = 33000.0 * 0.9
    assert compare_results(BASE, cur) == []


def test_ms_regression_uses_loose_relay_tolerance():
    cur = _clone()
    cur[1]["remap_ms"] = 60.0 * 1.5   # relay jitter: inside 75%
    assert compare_results(BASE, cur) == []
    cur[1]["remap_ms"] = 60.0 * 3.0   # a decompiled path: way out
    fails = compare_results(BASE, cur)
    assert len(fails) == 1 and "remap_ms" in fails[0]


def test_nested_keys_and_bool_flips():
    cur = _clone()
    cur[2]["stereographic"]["device_ms"] = 10.0  # 5x the on-device rebuild
    cur[1]["exact"] = False
    fails = compare_results(BASE, cur)
    assert any("device_ms" in f for f in fails)
    assert any("exact" in f for f in fails)


def test_missing_measurement_and_missing_config_fail():
    cur = _clone()
    del cur[0]["plain_fps"]
    fails = compare_results(BASE, cur)
    assert any("plain_fps not measured" in f for f in fails)
    fails = compare_results(BASE, [c for c in _clone() if c["config"] != 0])
    assert any("config 0" in f and "missing" in f for f in fails)


def test_guarded_none_baseline_gates_nothing():
    cur = _clone()
    cur[0]["rubix_rowcrop_fps"] = 5.0  # baseline None: no gate
    assert compare_results(BASE, cur) == []


def test_first_call_keys_are_ungated():
    """first_* timings are jit compile-cache state, not kernel perf: a
    cache miss after an HLO-changing refactor swings them 5-7x with no
    regression (observed r3->r4 on configs 2/3)."""
    base = _clone()
    base[2]["stereographic"]["first_ms"] = 1500.0
    base[0]["first_build_ms"] = 200.0
    cur = json.loads(json.dumps(base))
    cur[2]["stereographic"]["first_ms"] = 15000.0
    cur[0]["first_build_ms"] = 2000.0
    assert compare_results(base, cur) == []


def test_new_fields_pass_and_errors_fail():
    cur = _clone()
    cur[0]["brand_new_fps"] = 1.0  # joins the baseline at --check-update
    assert compare_results(BASE, cur) == []
    base = _clone()
    base[0]["guarded_fps"] = 100.0
    cur = _clone()
    cur[0]["guarded_fps"] = None
    cur[0]["guarded_error"] = "XlaRuntimeError"
    fails = compare_results(base, cur)
    assert any("guarded_fps not measured (XlaRuntimeError)" in f
               for f in fails)


def test_baseline_roundtrip(tmp_path):
    p = tmp_path / "b.json"
    save_baseline(BASE, "full", p)
    mode, results = load_baseline(p)
    assert mode == "full" and results == BASE
    with pytest.raises(FileNotFoundError, match="check-update"):
        load_baseline(tmp_path / "missing.json")


def test_committed_baseline_loads():
    """The repo ships a captured full-mode baseline for the gate."""
    mode, results = load_baseline()
    assert mode == "full"
    assert {r["config"] for r in results} >= set(range(8))


def test_suffixed_metric_keys_are_gated():
    """per_frame_fps_scale2 / chunked_fps_1024-style keys are metrics
    too: suffix-only matching silently exempted every suffixed key from
    the gate (round-4 review); config/name strings still classify as
    ungated."""
    base = _clone()
    base[0]["per_frame_fps_scale2"] = 140.0
    base[0]["chunked_fps_1024"] = 22000.0
    base[1]["warp_ms_scale2"] = 10.0
    base[0]["plain_config"] = "panini 1080p B=4224"
    cur = json.loads(json.dumps(base))
    cur[0]["plain_config"] = "different string"  # never gated
    assert compare_results(base, cur) == []
    cur[0]["per_frame_fps_scale2"] = 100.0
    cur[0]["chunked_fps_1024"] = 15000.0
    cur[1]["warp_ms_scale2"] = 30.0
    fails = compare_results(base, cur)
    assert len(fails) == 3
    assert any("per_frame_fps_scale2" in f for f in fails)
    assert any("chunked_fps_1024" in f for f in fails)
    assert any("warp_ms_scale2" in f for f in fails)


def _patched_gate(monkeypatch, tmp_path, measured, baseline=BASE,
                  mode="full"):
    """Point the gate at a temp baseline and a canned run_all result."""
    from blinky_tpu.bench import check, configs

    p = tmp_path / "baseline.json"
    save_baseline(json.loads(json.dumps(baseline)), mode, p)
    monkeypatch.setattr(check, "BASELINE_PATH", p)
    calls = {}

    def fake_run_all(quick=False, only=None):
        calls["only"] = only
        sel = set(range(8)) if only is None else set(only)
        return [json.loads(json.dumps(r)) for r in measured
                if r["config"] in sel]

    monkeypatch.setattr(configs, "run_all", fake_run_all)
    return check, p, calls


def test_check_subset_gates_only_selected_configs(
        tmp_path, monkeypatch, capsys):
    """--configs runs/gates a subset: the unselected baseline configs
    must NOT fail as 'missing from run' (the full suite is ~15-20 min
    on the chip — the gate has to fit bounded CI/driver slots in
    segments)."""
    measured = _clone()
    measured[0]["plain_fps"] = 1.0  # config 4 regressed — but unselected
    check, _, calls = _patched_gate(monkeypatch, tmp_path, measured)
    assert check.run_check(only=[0, 1]) == 0
    assert calls["only"] == [0, 1]
    out = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert out[-1]["status"] == "pass"
    # selecting the regressed config trips it
    assert check.run_check(only=[4]) == 1
    out = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert out[-1]["status"] == "fail"
    assert any("plain_fps" in f for f in out[-1]["failures"])


def test_partial_check_update_merges_into_baseline(
        tmp_path, monkeypatch, capsys):
    """A --configs N --check-update must merge the re-measured configs
    into the committed baseline, keeping every unselected entry verbatim
    — a partial refresh must never silently drop the rest of the suite
    from the gate."""
    measured = _clone()
    measured[0]["plain_fps"] = 50000.0  # config 4, intended improvement
    measured.append({"config": 9, "name": "brand-new", "new_fps": 1.0})
    check, p, _ = _patched_gate(monkeypatch, tmp_path, measured)
    assert check.run_check(update=True, only=[4, 9]) == 0
    mode, merged = load_baseline(p)
    assert mode == "full"
    by_id = {r["config"]: r for r in merged}
    assert by_id[4]["plain_fps"] == 50000.0     # refreshed
    assert by_id[0] == BASE[1]                  # kept verbatim
    assert by_id[1] == BASE[2]
    assert by_id[9]["name"] == "brand-new"      # new config appended
    # mode mismatch refuses the merge (quick numbers into a full file)
    assert check.run_check(update=True, only=[4], quick=True) == 2


def test_full_check_update_still_replaces_wholesale(
        tmp_path, monkeypatch, capsys):
    measured = [{"config": 0, "name": "only", "fps": 1.0}]
    check, p, _ = _patched_gate(monkeypatch, tmp_path, measured)
    assert check.run_check(update=True) == 0
    _, new = load_baseline(p)
    assert new == measured


def test_parse_configs_arg():
    import bench

    assert bench.parse_configs_arg(["bench.py", "--check"]) is None
    assert bench.parse_configs_arg(
        ["bench.py", "--check", "--configs", "0,2,5-7"]) == [0, 2, 5, 6, 7]
    assert bench.parse_configs_arg(["x", "--configs", "3"]) == [3]
    with pytest.raises(SystemExit):
        bench.parse_configs_arg(["x", "--configs"])


def test_run_all_rejects_unknown_config_index():
    from blinky_tpu.bench.configs import run_all

    with pytest.raises(ValueError, match="unknown config indices"):
        run_all(only=[99])


def test_configs_flag_is_not_an_internal_marker():
    """--configs is a top-level gate flag: it must not match bench.py's
    internal-flag detector (which skips the bounded device_alive probe —
    a subset gate against a dead relay would hang unbounded)."""
    internal_prefixes = ("--config4k", "--config-", "--headline",
                         "--calibrate-probe")
    assert not any("--configs".startswith(p) for p in internal_prefixes)
    for real_internal in ("--config4k-plain", "--config-eq-texels",
                          "--config-rowcrop-rubix", "--headline-compact",
                          "--calibrate-probe"):
        assert any(real_internal.startswith(p) for p in internal_prefixes)


def test_device_resident_ms_uses_tight_tolerance():
    """device_ms / per_frame_ms / ms_per_batch are fused on-device
    measurement loops (a few % run-to-run): a 1.5x slowdown must trip
    the 25% device tier even though it sits inside the 75% relay
    blanket (VERDICT r4 #6)."""
    base = _clone()
    base[0]["per_frame_ms"] = 20.0
    base[0]["ms_per_batch"] = 44.0
    cur = json.loads(json.dumps(base))
    # inside 25%: passes
    cur[2]["stereographic"]["device_ms"] = 1.9 * 1.2
    cur[0]["per_frame_ms"] = 20.0 * 1.2
    cur[0]["ms_per_batch"] = 44.0 * 1.2
    assert compare_results(base, cur) == []
    # a deliberately slowed device rebuild: 1.5x trips the device tier
    cur[2]["stereographic"]["device_ms"] = 1.9 * 1.5
    cur[0]["per_frame_ms"] = 20.0 * 1.5
    cur[0]["ms_per_batch"] = 44.0 * 1.5
    fails = compare_results(base, cur)
    assert len(fails) == 3
    assert all("device-resident tier" in f for f in fails)
    # ...while a relay-inclusive ms at 1.5x still passes (75% blanket)
    cur2 = json.loads(json.dumps(base))
    cur2[1]["remap_ms"] = 60.0 * 1.5
    assert compare_results(base, cur2) == []
