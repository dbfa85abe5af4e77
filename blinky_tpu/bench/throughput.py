"""Throughput and build-latency benchmarks.

The batch analog of the reference's ``timedemo`` (``NQ/cl_demo.c:393``):
replay a recorded frame stream through the warped pipeline as fast as the
chip allows and report fps.  Configs mirror BASELINE.json: panini+cube
640x480 single-frame remap, zoom-sweep rebuilds, cartographic 360 lenses,
low-poly globes, and batched 1080p reprojection with rubix + RGB decode.
"""

from __future__ import annotations

import time

import jax
import numpy as np

from blinky_tpu import globes, lenses
from blinky_tpu.io.cubemap import synthetic_cubemap_batch
from blinky_tpu.kernels.remap import RemapKernel
from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale
from blinky_tpu.palette import default_palette


def run_throughput(
    width=1920,
    height=1080,
    platesize=1080,
    batch=128,
    iters=10,
    warmup=2,
    lens_name="panini",
    globe_name="cube",
    zoom=Zoom("fov", 180),
    rubix=False,
    decode_rgb=False,
    dtype=None,
):
    """Steady-state warped frames/sec for one config.  Returns a dict."""
    import jax.numpy as jnp

    g = globes.get(globe_name)
    lens = lenses.get(lens_name, g)
    scale = calc_scale(zoom, lens, width, height)

    t0 = time.perf_counter()
    lm = build_lensmap(lens, g, scale, width, height, platesize, dtype=dtype)
    jax.block_until_ready(lm.flat_idx)
    build_ms = (time.perf_counter() - t0) * 1000

    # second build = compiled-path latency (zoom change)
    t0 = time.perf_counter()
    lm = build_lensmap(lens, g, scale * 1.0001, width, height, platesize, dtype=dtype)
    jax.block_until_ready(lm.flat_idx)
    rebuild_ms = (time.perf_counter() - t0) * 1000

    kernel = RemapKernel(lm, default_palette())
    frames = jnp.asarray(synthetic_cubemap_batch(platesize, batch))
    jax.block_until_ready(frames)

    for _ in range(warmup):
        out = kernel(frames, rubix=rubix, decode_rgb=decode_rgb)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = kernel(frames, rubix=rubix, decode_rgb=decode_rgb)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
    return dict(
        config=f"{lens_name}+{globe_name} {width}x{height} S={platesize} B={batch}"
        + (" rubix" if rubix else "")
        + (" rgb" if decode_rgb else ""),
        fps=fps,
        ms_per_batch=dt / iters * 1000,
        build_ms=build_ms,
        rebuild_ms=rebuild_ms,
        bytes_per_frame=int(np.prod([6, platesize, platesize])) + width * height,
    )


def run_build_bench(width=1920, height=1080, lens_name="stereographic",
                    globe_name="cube", fovs=(90, 120, 150, 180, 210, 240, 270)):
    """f_fov zoom-sweep rebuild latency (BASELINE config[1]): after the
    first compile, every rebuild must be a warm jitted call."""
    g = globes.get(globe_name)
    lens = lenses.get(lens_name, g)
    S = min(width, height)
    times = []
    for fov in fovs:
        scale = calc_scale(Zoom("fov", fov), lens, width, height)
        t0 = time.perf_counter()
        lm = build_lensmap(lens, g, scale, width, height, S)
        jax.block_until_ready(lm.flat_idx)
        times.append((time.perf_counter() - t0) * 1000)
    return dict(first_ms=times[0], warm_ms=sorted(times[1:])[len(times[1:]) // 2])
