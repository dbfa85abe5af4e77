"""HBM-aware batch sizing (VERDICT r3 task 8): derive feasible B from
the source layout instead of hand constants.

The reference sizes its plate buffers from the live screen dimensions
every frame (``F_RenderView``'s realloc-on-resize, ``fisheye.c:703-727``);
this module is the batched analog: each pipeline states its per-lane
byte cost and the planner returns the largest 128-quantum batch that
fits the device budget.

Live-set model (validated on the v5e)
-------------------------------------
A measurement loop's per-lane live set is **source + gathered screen**:
even though the bench loops only reduce the output
(``out.reshape(-1)[0]`` inside ``fori_loop``), XLA materializes the
full [H·W, B] gather result — a derived B=6016 texel run failed with
"Used 21.14G of 15.75G", i.e. exactly (1.70 src + 2.07 out) MB/lane.
With that model ONE budget C = 16.2e9 model-bytes reproduces EVERY
round-3 hand-tuned batch exactly and respects every OOM boundary:

| layout (1080p unless noted)  | per-lane MB | hand B | derived B |
|---|---|---|---|
| texel-compacted u8           | 3.77        | 4224   | 4224      |
| texel-compacted RGBA         | 15.1        | 1024   | 1024      |
| row-cropped u8               | 6.03        | 2688 (2816 OOM) | 2560 |
| row-cropped rubix u8         | 9.77        | 1536   | 1536      |
| row-cropped RGBA             | 24.1        | 640    | 640       |
| plane-compacted u8           | 7.90        | 2048   | 2048      |
| 4K plane-compacted u8        | 31.6        | 512    | 512       |
| 4K plane-compacted rubix     | 54.9        | 256    | 256       |

(The "plane-compacted" rows are SLAB layouts — ``padded=False``; plain
[P, S, S, B] sources are budgeted at the device's zero-padded
MAX_PLATES/2*MAX_PLATES plane count, see ``planes_bytes_per_lane``.)

Mesh-aware derivation (round 5): ``feasible_batch(n_devices=n)``
returns the GLOBAL batch for a DP-sharded run — n x the per-device
feasible batch, each shard 128-quantum — because the sharded pipelines
hold per device exactly the single-device live set for their B-shard
(source shard + screen shard; only the lensmap/ray-table replicates,
a few MB inside the model's ~3% slack):

| layout (1080p)               | per-lane MB | n_dev | derived B |
|---|---|---|---|
| texel-compacted u8           | 3.77        | 1     | 4224      |
| texel-compacted u8           | 3.77        | 4     | 16896     |
| plane-compacted u8           | 7.90        | 8     | 16384     |

The sharded callers (``run_sharded_scaling`` / ``run_posed_sharded_
scaling`` with ``per_device_batch/poses=None``, ``cli reproject
--shard --batch 0``) derive through this; a derived-B sharded run is
asserted bit-equal to single-device in the driver dryrun.

C sits ABOVE the 15.75 GB physical capacity because the src+out model
over-counts what XLA actually keeps live by a roughly constant ~3%
(buffer reuse across loop iterations); the measured feasibility wall in
model units is a tight interval — 16.21e9 ran (row-crop B=2688, 4K
B=512) and 16.98e9 OOMed (row-crop B=2816), with the derived-too-big
points (texels B=6016 = 22.7e9, "Used 21.14G of 15.75G") far out.  C is
calibrated to the surviving edge; round-4 validated the derived
headline/4K batches on-chip (33.5k fps / 4.2k fps, within noise of the
hand numbers — docs/PERF.md §7).  Override the physical size with
``BLINKY_HBM_BYTES`` for other chips (C scales proportionally); the
backend's ``memory_stats`` is preferred when it reports (the axon relay
returns none).

Round-5 measured boundary (``python bench.py --calibrate``, committed
as ``bench_calibration.json``): the texel-compacted 1080p walk ran at
B=4352 and OOMed at B=4480 — an implied-fraction interval of
[1.0417, 1.0723].  The committed 1.0286 sits 1.26 % BELOW the
interval's floor: deliberately conservative (the planner must never
derive an OOMing batch; near-edge allocations also cascade-fail the
process after any OOM, CLAUDE.md).  Re-run ``--calibrate`` on a new
chip/runtime before considering a bump, and keep the constant under
the measured ``implied_fraction_lo``.
"""

from __future__ import annotations

import os

V5E_HBM_BYTES = 15_750_000_000
EFFECTIVE_FRACTION = 1.0286  # C = 16.2e9 MODEL bytes (see docstring: the
# src+out model over-counts the true live set by ~3%)
QUANTUM = 128  # the batch axis is the gathered rows' minor dim: partial
# 128-lane tiles waste up to ~15x (docs/PERF.md §9)


def device_hbm_bytes() -> int:
    """Physical device memory: backend-reported when available, else the
    documented v5e capacity, overridable via ``BLINKY_HBM_BYTES``."""
    env = os.environ.get("BLINKY_HBM_BYTES")
    if env:
        return int(env)
    try:
        import jax

        stats = jax.devices()[0].memory_stats()
        if stats and stats.get("bytes_limit"):
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return V5E_HBM_BYTES


def effective_budget_bytes() -> int:
    return int(device_hbm_bytes() * EFFECTIVE_FRACTION)


def feasible_batch(src_bytes_per_lane, out_bytes_per_lane, *,
                   budget=None, quantum=QUANTUM, cap=None,
                   n_devices=1) -> int:
    """Largest batch (multiple of *quantum*) whose per-lane live set
    (source + materialized output) fits the budget; *cap* bounds it
    (e.g. the number of available frames).

    ``budget`` is PER DEVICE (the planner models one chip's HBM); with
    ``n_devices > 1`` the global batch is n_devices x the per-device
    feasible batch — the DP-sharded pipelines hold each device's own
    B-shard of source + screen, with only the lensmap/ray-table
    replicated (a few MB, inside the model's ~3% slack), so per-device
    feasibility is exactly the single-device problem.  Each SHARD stays
    quantum-aligned (the batch axis is the gathered rows' minor dim on
    every device).

    When even one *quantum* of lanes doesn't fit, the un-quantized
    count is returned instead (never bumped up to a full tile: a
    partial lane tile wastes bandwidth but an over-budget batch OOMs,
    and per CLAUDE.md a device OOM cascade-fails the process's later
    allocations).  Always >= 1 so callers can chunk by it."""
    budget = effective_budget_bytes() if budget is None else int(budget)
    per_lane = float(src_bytes_per_lane) + float(out_bytes_per_lane)
    b = int(budget // max(per_lane, 1.0))
    bq = b // quantum * quantum
    b = bq if bq >= quantum else b
    n_dev = max(int(n_devices), 1)
    b = max(b, 1) * n_dev
    if cap is not None:
        c = int(cap)
        if n_dev > 1 and c >= n_dev:
            # a sharded batch must split evenly over the devices
            c = c // n_dev * n_dev
        b = min(b, c)
    return b


# ---------------------------------------------------------------- layouts

def screen_bytes_per_lane(width, height, rgba=False) -> int:
    """The materialized [H, W] gather output, per lane."""
    return width * height * (4 if rgba else 1)


def planes_bytes_per_lane(planesize, nplanes, rgba=False,
                          expanded=False, padded=True) -> int:
    """[NP, S, S, B] plate-plane source: one lane's bytes.

    ``padded=True`` (default) models the PLAIN device layout: the remap
    and posed kernels zero-pad a P < MAX_PLATES source up to MAX_PLATES
    planes on device (``RemapKernel.__call__``, ``prep_posed_inputs``),
    and the expanded raw||tinted layout is always 2*MAX_PLATES planes
    (``expand_frames_tinted`` zero-fills the tail) — counting the raw P
    under-budgets low-poly globes and OOMs.  Pass ``padded=False`` for
    plane-compacted SLAB sources (``kernels.remap.compact_planes``),
    which really do hold only the kept planes."""
    from blinky_tpu.palette import MAX_PLATES

    if expanded:
        np_ = 2 * MAX_PLATES if padded else 2 * nplanes
    else:
        np_ = max(nplanes, MAX_PLATES) if padded else nplanes
    return np_ * planesize * planesize * (4 if rgba else 1)


def rows_bytes_per_lane(nrows, platesize, rgba=False) -> int:
    """Row-cropped stack [R_rows, S, B] (kernels.remap.compact_rows)."""
    return nrows * platesize * (4 if rgba else 1)


def texels_bytes_per_lane(ntexels, rgba=False) -> int:
    """Texel-compacted source [R, B] (kernels.remap.compact_texels);
    R already counts only referenced texels, rubix included (the
    expanded index space references one texel per pixel either half)."""
    return ntexels * (4 if rgba else 1)


def posed_bytes_per_lane(planesize, nplanes, width, height,
                         render_scale=1, rgba=False,
                         expanded=False) -> int:
    """The static-ray/fused posed pipelines keep, per pose lane: the
    source planes, the [H/k, W/k] i32 index table + bool validity, and
    the full-res screen."""
    k = int(render_scale)
    px = (width // k) * (height // k)
    return (planes_bytes_per_lane(planesize, nplanes, rgba, expanded)
            + 4 * px + px + screen_bytes_per_lane(width, height, rgba))
