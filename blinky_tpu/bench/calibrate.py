"""Measure the HBM planner's budget constant on THIS chip (VERDICT r4 #7).

``bench/autobatch.py``'s ``EFFECTIVE_FRACTION = 1.0286`` was calibrated
to one surviving edge on one v5e (16.21e9 model-bytes ran, 16.98e9
OOMed).  The planner's own rule is "recalibrate only from measured OOM
boundaries" — this module is the one command that produces such a
boundary: ``python bench.py --calibrate`` walks the texel-compacted
1080p layout's batch axis in 128-lane steps from the derived batch
until the first OOM, each attempt in its OWN subprocess (post-OOM
allocations cascade-fail in a shared process, CLAUDE.md), and reports
the implied budget interval

    C_ok   = per_lane_bytes * last_feasible_B     (a measured run)
    C_fail = per_lane_bytes * first_failing_B     (a measured OOM)

so ``EFFECTIVE_FRACTION`` can be re-derived on any chip as
``C / BLINKY_HBM_BYTES`` instead of trusted.  The result is written
next to ``bench_baseline.json`` as ``bench_calibration.json``.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

CALIBRATION_PATH = (Path(__file__).resolve().parents[2]
                    / "bench_calibration.json")

#: the probed layout: texel-compacted u8 1080p (the headline's source).
#: Chosen because its per-lane cost is the SMALLEST of the production
#: layouts, so the 128-lane step gives the finest C resolution
#: (~0.5e9 bytes/step vs ~0.8e9 for row-crop).
WIDTH, HEIGHT, PLATESIZE = 1920, 1080, 1080


def probe_layout_bytes():
    """The probed layout's per-lane bytes, from the ACTUAL compaction
    stats (host lensmap build; same numbers run_gather_throughput uses)."""
    import numpy as np

    from blinky_tpu import globes, lenses
    from blinky_tpu.bench.autobatch import (
        screen_bytes_per_lane, texels_bytes_per_lane,
    )
    from blinky_tpu.kernels.remap import compact_texels
    from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale

    g = globes.get("cube")
    lens = lenses.get("panini", g)
    scale = calc_scale(Zoom("fov", 180), lens, WIDTH, HEIGHT)
    lm = build_lensmap(lens, g, scale, WIDTH, HEIGHT, PLATESIZE,
                       backend="numpy").to_numpy()
    texels, _ = compact_texels(lm)
    return (texels_bytes_per_lane(int(np.asarray(texels).size))
            + screen_bytes_per_lane(WIDTH, HEIGHT))


def run_probe(batch: int) -> None:
    """(internal, own process) one feasibility attempt: allocate the
    texel-compacted source at *batch* lanes and run one full gather.
    Prints ``{"ok": true}`` on success; an OOM kills the process (the
    parent reads the exit code)."""
    from blinky_tpu.bench.throughput import run_gather_throughput

    run_gather_throughput(batch=batch, iters=1, rubix=False, rgba=False,
                          texel_compact=True)
    print(json.dumps({"ok": True, "batch": batch}))


class CalibrationProbeError(RuntimeError):
    """A probe subprocess failed for a reason that is NOT a device OOM
    (timeout, relay outage, import error...).  Such a failure must abort
    the calibration instead of being recorded as the OOM boundary —
    bench_calibration.json is the ONLY sanctioned source for re-deriving
    ``EFFECTIVE_FRACTION``, and a bogus boundary would re-derive the
    planner constant too low."""


#: stderr markers that identify a genuine device out-of-memory kill.
#: XLA raises RESOURCE_EXHAUSTED; older paths surface "out of memory".
_OOM_MARKERS = ("RESOURCE_EXHAUSTED", "Out of memory", "out of memory",
                "OOM")


def _spawn_probe(batch: int, bench_path: str, timeout: float) -> bool:
    try:
        subprocess.run(
            [sys.executable, bench_path, "--calibrate-probe", str(batch)],
            capture_output=True, text=True, timeout=timeout, check=True)
        return True
    except subprocess.TimeoutExpired:
        raise CalibrationProbeError(
            f"probe B={batch} timed out after {timeout:.0f}s — relay "
            "outage or hang, not a measured OOM")
    except subprocess.CalledProcessError as e:
        err = (e.stderr or "") + (e.stdout or "")
        if any(m in err for m in _OOM_MARKERS):
            return False  # a verified device OOM: a real boundary
        tail = err.strip().splitlines()[-3:]
        raise CalibrationProbeError(
            f"probe B={batch} died (exit {e.returncode}) without an OOM "
            f"marker; stderr tail: {' | '.join(tail) if tail else '<empty>'}")


def run_calibrate(probe=None, quantum: int = 128, max_steps: int = 12,
                  timeout: float = 900.0) -> int:
    """Walk B upward from the planner's derived batch until the first
    OOM; report the measured budget interval and how the committed
    constant sits inside it.  ``probe`` is injectable for tests
    (``probe(batch) -> bool``); the default spawns bench.py
    subprocesses."""
    from blinky_tpu.bench.autobatch import (
        EFFECTIVE_FRACTION, device_hbm_bytes, feasible_batch,
    )

    bench_path = str(Path(__file__).resolve().parents[2] / "bench.py")
    if probe is None:
        probe = lambda b: _spawn_probe(b, bench_path, timeout)  # noqa: E731

    per_lane = probe_layout_bytes()
    b0 = feasible_batch(per_lane, 0)
    try:
        if not probe(b0):
            print(json.dumps({
                "metric": "hbm_calibration", "status": "error",
                "detail": f"derived batch B={b0} failed — the committed "
                          "budget is ALREADY over this chip's capacity "
                          "(set BLINKY_HBM_BYTES and re-derive)"}))
            return 1
        last_ok, first_fail = b0, None
        for step in range(1, max_steps + 1):
            b = b0 + step * quantum
            if probe(b):
                last_ok = b
            else:
                first_fail = b
                break
    except CalibrationProbeError as e:
        # a non-OOM probe failure invalidates the walk: do NOT write a
        # calibration file, and say exactly what died
        print(json.dumps({
            "metric": "hbm_calibration", "status": "error",
            "detail": str(e)}))
        return 1
    hbm = device_hbm_bytes()
    out = {
        "metric": "hbm_calibration",
        "status": "ok" if first_fail is not None else "no-oom-found",
        "layout": f"texels-u8-{WIDTH}x{HEIGHT}",
        "per_lane_bytes": int(per_lane),
        "last_ok_batch": last_ok,
        "first_fail_batch": first_fail,
        "C_ok": int(per_lane * last_ok),
        "C_fail": None if first_fail is None else int(per_lane * first_fail),
        "implied_fraction_lo": round(per_lane * last_ok / hbm, 4),
        "implied_fraction_hi": (
            None if first_fail is None
            else round(per_lane * first_fail / hbm, 4)),
        "committed_fraction": EFFECTIVE_FRACTION,
        "hbm_bytes": hbm,
    }
    if first_fail is None:
        # the walk never reached an OOM (a chip with more headroom than
        # max_steps quanta, or an inflated BLINKY_HBM_BYTES): there is
        # NO measured boundary — do not clobber a previously committed
        # real one with a boundary-free record, and exit nonzero so a
        # driver can't mistake this for a calibration
        out["detail"] = (f"no OOM within {max_steps} steps above the "
                         "derived batch — nothing written (a committed "
                         "bench_calibration.json, if any, is preserved); "
                         "raise max_steps to find the boundary")
        print(json.dumps(out))
        return 1
    lo, hi = out["implied_fraction_lo"], out["implied_fraction_hi"]
    out["committed_inside_interval"] = bool(
        lo <= EFFECTIVE_FRACTION <= hi)
    out["committed_vs_measured_pct"] = round(
        (EFFECTIVE_FRACTION / lo - 1.0) * 100, 2)
    CALIBRATION_PATH.write_text(json.dumps(out, indent=1) + "\n")
    out["written"] = str(CALIBRATION_PATH)
    print(json.dumps(out))
    return 0
