"""HBM-aware batch derivation (bench/autobatch.py): the calibrated
live-set model must reproduce the round-3 hand-tuned batches and respect
the measured OOM boundaries (module docstring table)."""

import pytest

from blinky_tpu.bench.autobatch import (
    effective_budget_bytes,
    feasible_batch,
    planes_bytes_per_lane,
    posed_bytes_per_lane,
    rows_bytes_per_lane,
    screen_bytes_per_lane,
    texels_bytes_per_lane,
)

# panini@180 1080p compaction stats (deterministic; the bench recomputes
# them from the lensmap at run time)
TEXELS = 1_696_377
ROWS, ROWS_RUBIX = 3663, 7132


@pytest.mark.parametrize("src,out,expect", [
    (texels_bytes_per_lane(TEXELS), screen_bytes_per_lane(1920, 1080), 4224),
    (texels_bytes_per_lane(TEXELS, rgba=True),
     screen_bytes_per_lane(1920, 1080, rgba=True), 1024),
    (rows_bytes_per_lane(ROWS, 1080), screen_bytes_per_lane(1920, 1080), 2560),
    (rows_bytes_per_lane(ROWS_RUBIX, 1080),
     screen_bytes_per_lane(1920, 1080), 1536),
    (rows_bytes_per_lane(ROWS, 1080, rgba=True),
     screen_bytes_per_lane(1920, 1080, rgba=True), 640),
    (planes_bytes_per_lane(1080, 5, padded=False),
     screen_bytes_per_lane(1920, 1080), 2048),
    (planes_bytes_per_lane(2160, 5, padded=False),
     screen_bytes_per_lane(3840, 2160), 512),
    (planes_bytes_per_lane(2160, 5, expanded=True, padded=False),
     screen_bytes_per_lane(3840, 2160), 256),
])
def test_derived_batches_match_calibration_table(src, out, expect):
    assert feasible_batch(src, out) == expect


def test_oom_boundaries_respected():
    """The measured failures must derive strictly below their OOM batch:
    row-crop B=2816 OOMed, texels B=6016 OOMed."""
    b_rows = feasible_batch(rows_bytes_per_lane(ROWS, 1080),
                            screen_bytes_per_lane(1920, 1080))
    assert b_rows < 2816
    b_tex = feasible_batch(texels_bytes_per_lane(TEXELS),
                           screen_bytes_per_lane(1920, 1080))
    assert b_tex < 6016


def test_quantum_cap_and_override(monkeypatch):
    assert feasible_batch(1, 0, budget=1000, quantum=128) == 896
    # a full tile that doesn't fit is NOT forced: a partial tile is slow,
    # an over-budget batch OOMs (and post-OOM allocs cascade-fail)
    assert feasible_batch(10**15, 0) == 1
    assert feasible_batch(260_000_000, 0) == 62       # 4K rubix-RGBA class
    assert feasible_batch(1, 0, cap=37) == 37         # cap wins (frame count)
    monkeypatch.setenv("BLINKY_HBM_BYTES", "31500000000")
    assert effective_budget_bytes() > 30_000_000_000  # other chips scale


def test_render_posed_chunks_transparently(monkeypatch):
    """A pose batch beyond the feasible chunk splits into slices of the
    same cached kernel, bit-identical to the one-shot render."""
    import numpy as np

    from blinky_tpu.api import Session
    from blinky_tpu.io.cubemap import synthetic_cubemap_batch

    W, H, S, B = 64, 48, 48, 5
    poses = np.asarray([(0.0, 0.0, 0.0), (5.0, -12.0, 0.0),
                        (-20.0, 33.0, 10.0), (89.0, 180.0, 0.0),
                        (0.0, 271.0, -45.0)])
    frames = synthetic_cubemap_batch(S, B)
    sess = Session(W, H, platesize=S)
    whole = np.asarray(sess.render_posed(frames, poses))
    # shrink the budget so the cap lands at 2 poses (per-lane ~0.164 MB)
    monkeypatch.setenv("BLINKY_HBM_BYTES", "330000")
    sess2 = Session(W, H, platesize=S)
    chunked = np.asarray(sess2.render_posed(frames, poses))
    np.testing.assert_array_equal(whole, chunked)


def test_plain_layouts_count_device_padding():
    """Review round 4: the PLAIN [P, S, S, B] device layout zero-pads a
    P < MAX_PLATES source to MAX_PLATES planes (RemapKernel.__call__,
    prep_posed_inputs) and the expanded layout is always 2*MAX_PLATES
    (expand_frames_tinted) — the model must budget what the device
    actually holds, or a 'fast'-globe (P=2) recording derives an
    OOM-sized batch."""
    assert planes_bytes_per_lane(1080, 2) == planes_bytes_per_lane(1080, 6)
    assert planes_bytes_per_lane(1080, 2, expanded=True) == \
        planes_bytes_per_lane(1080, 6, expanded=True)
    assert posed_bytes_per_lane(1080, 2, 1920, 1080) == \
        posed_bytes_per_lane(1080, 6, 1920, 1080)
    # slabs (compact_planes) really hold only the kept planes
    assert planes_bytes_per_lane(1080, 2, padded=False) \
        == 2 * 1080 * 1080
    # an already-expanded posed source (P=12) is counted as-is
    assert posed_bytes_per_lane(1080, 12, 1920, 1080) \
        > posed_bytes_per_lane(1080, 6, 1920, 1080)


def test_posed_layout_counts_index_tables():
    """Posed pipelines keep per-pose [H/k, W/k] i32 index tables live, so
    their feasible chunks are smaller than the static remap's; the
    render_scale knob shrinks the table term."""
    full = posed_bytes_per_lane(1080, 6, 1920, 1080)
    static = planes_bytes_per_lane(1080, 6) + screen_bytes_per_lane(1920, 1080)
    assert full > static
    k2 = posed_bytes_per_lane(1080, 6, 1920, 1080, render_scale=2)
    assert k2 < full
    assert feasible_batch(full, 0) < feasible_batch(static, 0)


def test_calibrate_finds_oom_boundary(tmp_path, monkeypatch, capsys):
    """bench --calibrate walks 128-lane steps from the derived batch to
    the first (simulated) OOM and reports a C interval that brackets
    the true capacity; the committed constant's position is stated."""
    import json

    from blinky_tpu.bench import calibrate
    from blinky_tpu.bench.autobatch import effective_budget_bytes

    per_lane = 3.77e6
    monkeypatch.setattr(calibrate, "probe_layout_bytes", lambda: per_lane)
    monkeypatch.setattr(calibrate, "CALIBRATION_PATH",
                        tmp_path / "cal.json")
    # simulate a chip whose true capacity sits 2 quanta above the
    # committed budget
    c_true = effective_budget_bytes() + 2 * 128 * per_lane + 1
    probe = lambda b: b * per_lane <= c_true  # noqa: E731
    assert calibrate.run_calibrate(probe=probe) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "ok"
    assert out["C_ok"] <= c_true < out["C_fail"]
    assert out["first_fail_batch"] == out["last_ok_batch"] + 128
    assert (tmp_path / "cal.json").exists()
    disk = json.loads((tmp_path / "cal.json").read_text())
    assert disk["C_ok"] == out["C_ok"]
    assert out["implied_fraction_lo"] < out["implied_fraction_hi"]
    assert "committed_inside_interval" in out


def test_calibrate_derived_batch_must_run(tmp_path, monkeypatch, capsys):
    """If even the planner's derived batch OOMs, --calibrate errors
    loudly instead of reporting a bogus interval."""
    import json

    from blinky_tpu.bench import calibrate

    monkeypatch.setattr(calibrate, "probe_layout_bytes", lambda: 3.77e6)
    monkeypatch.setattr(calibrate, "CALIBRATION_PATH",
                        tmp_path / "cal.json")
    assert calibrate.run_calibrate(probe=lambda b: False) == 1
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "error"
    assert not (tmp_path / "cal.json").exists()


def test_calibrate_non_oom_failure_aborts(tmp_path, monkeypatch, capsys):
    """A probe that dies for a NON-OOM reason (timeout, relay outage,
    import error) aborts the walk with status=error instead of being
    recorded as the OOM boundary — a bogus boundary would re-derive
    EFFECTIVE_FRACTION too low (the calibration file is the only
    sanctioned source for that constant)."""
    import json

    from blinky_tpu.bench import calibrate

    monkeypatch.setattr(calibrate, "probe_layout_bytes", lambda: 3.77e6)
    monkeypatch.setattr(calibrate, "CALIBRATION_PATH",
                        tmp_path / "cal.json")

    calls = []

    def probe(b):
        calls.append(b)
        if len(calls) == 1:  # the derived batch runs fine...
            return True
        raise calibrate.CalibrationProbeError(  # ...then the relay dies
            f"probe B={b} timed out after 900s — relay outage or hang, "
            "not a measured OOM")

    assert calibrate.run_calibrate(probe=probe) == 1
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "error"
    assert "timed out" in out["detail"]
    assert not (tmp_path / "cal.json").exists()


def test_spawn_probe_classifies_failures(monkeypatch):
    """_spawn_probe: exit-0 -> True; nonzero WITH an OOM marker in
    stderr -> False (a real boundary); nonzero without a marker and
    timeouts -> CalibrationProbeError."""
    import subprocess

    from blinky_tpu.bench import calibrate

    def fake_run(args, **kw):
        mode = fake_run.mode
        if mode == "ok":
            return subprocess.CompletedProcess(args, 0, '{"ok": true}', "")
        if mode == "oom":
            raise subprocess.CalledProcessError(
                1, args, output="",
                stderr="RESOURCE_EXHAUSTED: Out of memory allocating ...")
        if mode == "crash":
            raise subprocess.CalledProcessError(
                1, args, output="", stderr="ModuleNotFoundError: no spam")
        raise subprocess.TimeoutExpired(args, 900)

    monkeypatch.setattr(calibrate.subprocess, "run", fake_run)
    fake_run.mode = "ok"
    assert calibrate._spawn_probe(128, "bench.py", 900.0) is True
    fake_run.mode = "oom"
    assert calibrate._spawn_probe(128, "bench.py", 900.0) is False
    fake_run.mode = "crash"
    with pytest.raises(calibrate.CalibrationProbeError, match="OOM marker"):
        calibrate._spawn_probe(128, "bench.py", 900.0)
    fake_run.mode = "timeout"
    with pytest.raises(calibrate.CalibrationProbeError, match="timed out"):
        calibrate._spawn_probe(128, "bench.py", 900.0)


def test_calibrate_no_oom_found_preserves_committed_file(
        tmp_path, monkeypatch, capsys):
    """A walk that never reaches an OOM produced NO measured boundary:
    it must not clobber a previously committed real calibration and
    must exit nonzero (round-5 review) — bench_calibration.json is the
    ONLY sanctioned source for re-deriving EFFECTIVE_FRACTION."""
    import json

    from blinky_tpu.bench import calibrate

    committed = '{"status": "ok", "C_ok": 123}\n'
    path = tmp_path / "cal.json"
    path.write_text(committed)
    monkeypatch.setattr(calibrate, "probe_layout_bytes", lambda: 3.77e6)
    monkeypatch.setattr(calibrate, "CALIBRATION_PATH", path)
    assert calibrate.run_calibrate(probe=lambda b: True) == 1
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "no-oom-found"
    assert out["first_fail_batch"] is None
    assert "nothing written" in out["detail"]
    assert path.read_text() == committed  # the real boundary survives
