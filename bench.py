#!/usr/bin/env python
"""Driver benchmark entry: prints ONE JSON line.

Headline metric (BASELINE.md): 1080p warped frames/sec/chip, target
>= 10,000 on TPU v5e.  Measures the steady-state batched cubemap->screen
remap (panini + cube, f_fov 180, the reference's default view) on the
attached chip.
"""

import json
import sys

TARGET = 10_000.0


def main() -> None:
    batch = 1024
    iters = 8
    if "--all" in sys.argv:
        # the full BASELINE.json config suite: one JSON line per config
        from blinky_tpu.bench.configs import run_all

        for r in run_all(quick="--quick" in sys.argv):
            print(json.dumps(r))
        return
    if "--quick" in sys.argv:
        batch, iters = 128, 3
    from blinky_tpu.bench.throughput import run_throughput

    r = run_throughput(batch=batch, iters=iters)
    print(
        json.dumps(
            {
                "metric": "warped_1080p_frames_per_sec_per_chip",
                "value": round(r["fps"], 1),
                "unit": "frames/sec",
                "vs_baseline": round(r["fps"] / TARGET, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
