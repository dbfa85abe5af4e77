"""Throughput and build-latency benchmarks.

The batch analog of the reference's ``timedemo`` (``NQ/cl_demo.c:393``):
replay a frame stream through the warped pipeline as fast as the chip
allows and report fps.

Measurement notes (axon-tunneled TPU):
* ``jax.block_until_ready`` does not wait for device execution through the
  relay — synchronization is done by fetching one element (the device must
  finish the producing computation to serve any bytes).
* Host->device bulk transfer over the relay is slow, so benchmark frames
  are generated on-device by a jitted pattern generator.
* The timing loop runs on-device (``lax.fori_loop`` with a per-iteration
  one-element data dependency and an index perturbation that prevents
  loop-invariant hoisting), measuring steady-state kernel throughput the
  way a pipelined frame stream would see it.

Empirical shape of the XLA row-gather on v5e: per-index cost dominates
(~13 ns/index), so frames/sec scales with lanes per row — B=128 -> ~4.7k
fps, B=1024 -> ~23k fps at 1080p.  The default headline batch is 1024.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from blinky_tpu import globes, lenses
from blinky_tpu.bench.autobatch import (
    feasible_batch, planes_bytes_per_lane, rows_bytes_per_lane,
    screen_bytes_per_lane, texels_bytes_per_lane,
)
from blinky_tpu.kernels.remap import remap_impl
from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale
from blinky_tpu.palette import MAX_PLATES, default_palette, tint_lut


def _sync(x) -> int:
    """Execution barrier that works through the axon relay: one-element
    fetch (see utils.timing.device_fetch_sync, the single implementation)."""
    from blinky_tpu.utils.timing import device_fetch_sync

    return device_fetch_sync(x)


def device_cubemap_batch(platesize, batch):
    """On-device synthetic cubemap batch [6, S, S, B] u8 (checker+gradient
    family of io.cubemap.synthetic_cubemap, jitted to avoid relay upload)."""
    return device_source(platesize, batch, False, False)


def make_bench_step(iters: int, rubix: bool, decode_rgb: bool):
    """One jitted call that runs the remap *iters* times on-device.

    Each iteration perturbs one lensmap index (so XLA cannot hoist the
    remap out of the loop) and folds one output element into an
    accumulator (so every iteration's execution is data-depended-on)."""

    @jax.jit
    def step(frames, flat_idx, valid, tint, background, tlut, rgb):
        def body(i, acc):
            fi = flat_idx.at[0, 0].set(i % (flat_idx.shape[0] * flat_idx.shape[1]))
            out = remap_impl(
                frames, fi, valid, tint, background, tlut, rgb,
                rubix=rubix, decode_rgb=decode_rgb,
            )
            return acc + out.reshape(-1)[0].astype(jnp.int32)
        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    return step


def make_gather_bench_step(iters: int):
    """Bench step for the pure-gather paths (expanded / RGBA sources)."""
    from blinky_tpu.kernels.remap import remap_gather_impl

    @jax.jit
    def step(frames, flat_idx, valid, background):
        def body(i, acc):
            fi = flat_idx.at[0, 0].set(i % (flat_idx.shape[0] * flat_idx.shape[1]))
            out = remap_gather_impl(frames, fi, valid, background)
            return acc + out.reshape(-1)[0].astype(jnp.int32)
        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    return step


def make_gather_tint_bench_step(iters: int):
    """Bench step for the post-gather true-color tint path (raw RGBA
    source + elementwise tint on the gathered screen)."""
    from blinky_tpu.kernels.remap import remap_gather_tint_impl

    @jax.jit
    def step(frames, flat_idx, valid, background, tint_rgb, tint_mask):
        def body(i, acc):
            fi = flat_idx.at[0, 0].set(i % (flat_idx.shape[0] * flat_idx.shape[1]))
            out = remap_gather_tint_impl(frames, fi, valid, background,
                                         tint_rgb, tint_mask)
            return acc + out.reshape(-1)[0].astype(jnp.int32)
        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    return step


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def device_source(platesize, batch, expanded, rgba, plane_ids=None):
    """On-device synthetic source in any of the remap's source layouts.

    [NP, S, S, B] with NP = 12 when *expanded* (raw||tinted halves; the
    tinted half is a distinct deterministic pattern — remap timing is
    data-independent, and value-exactness of the tinted half is covered by
    the CPU tests against ``create_palmap``), u32-packed when *rgba*.
    *plane_ids* (static tuple) generates only that plane subset — the
    compacted source of ``kernels.remap.compact_planes``, built directly
    at compact size so the full-size source never exists in HBM."""
    S = platesize
    if plane_ids is None:
        plane_ids = tuple(range(2 * MAX_PLATES if expanded else MAX_PLATES))
    NP = len(plane_ids)
    shape = (NP, S, S, batch)
    pos = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    # map position -> plane id with a static where-chain (a table gather
    # here breaks XLA's iota fusion and materializes multi-GB i32 temps;
    # a per-plane concatenate doubles peak HBM) — this stays elementwise
    # and fuses straight into the u8/u32 output
    p = jnp.full(shape, plane_ids[0], jnp.int32)
    for k, pid in enumerate(plane_ids[1:], 1):
        p = jnp.where(pos == k, jnp.int32(pid), p)
    py = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    px = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    b = jax.lax.broadcasted_iota(jnp.int32, shape, 3)
    checker = ((px // 8 + py // 8) % 2) * 16
    grad = (px * 3 + py * 5 + p * 37 + b * 11) % 128
    v = (p * 40 + 8 + checker + grad) % 255
    if rgba:
        # synthetic packed RGBA from the index pattern
        out = (v | ((v * 3 % 256) << 8) | ((v * 7 % 256) << 16)).astype(jnp.uint32)
        return out | jnp.uint32(0xFF000000)
    return v.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def device_source_rows(platesize, batch, rgba, slabs):
    """On-device synthetic source in the row-cropped stack layout of
    ``kernels.remap.compact_rows``: [sum(hi-lo), S, B], generated directly
    at cropped size (the full source never exists in HBM).  Per-row plane
    id and source row come from a static where-chain over the slab
    boundaries, so the values are bit-identical to the matching rows of
    :func:`device_source`."""
    S = platesize
    R = sum(hi - lo for _, lo, hi in slabs)
    shape = (R, S, batch)
    gr = jax.lax.broadcasted_iota(jnp.int32, shape, 0)  # stack row
    p = jnp.full(shape, slabs[0][0], jnp.int32)
    py = gr + slabs[0][1]
    off = slabs[0][2] - slabs[0][1]
    for pid, lo, hi in slabs[1:]:
        in_slab = gr >= off
        p = jnp.where(in_slab, jnp.int32(pid), p)
        py = jnp.where(in_slab, gr - off + lo, py)
        off += hi - lo
    px = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    b = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    checker = ((px // 8 + py // 8) % 2) * 16
    grad = (px * 3 + py * 5 + p * 37 + b * 11) % 128
    v = (p * 40 + 8 + checker + grad) % 255
    if rgba:
        out = (v | ((v * 3 % 256) << 8) | ((v * 7 % 256) << 16)).astype(jnp.uint32)
        return out | jnp.uint32(0xFF000000)
    return v.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _device_source_texels(meta, batch, rgba):
    p, py, px = (a[:, None] for a in meta)  # [R, 1] i32 each
    shape = (meta[0].shape[0], batch)
    b = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    checker = ((px // 8 + py // 8) % 2) * 16
    grad = (px * 3 + py * 5 + p * 37 + b * 11) % 128
    v = (p * 40 + 8 + checker + grad) % 255
    if rgba:
        out = (v | ((v * 3 % 256) << 8) | ((v * 7 % 256) << 16)).astype(jnp.uint32)
        return out | jnp.uint32(0xFF000000)
    return v.astype(jnp.uint8)


def device_source_texels(platesize, batch, rgba, texels):
    """On-device synthetic source in the texel-compacted layout of
    ``kernels.remap.compact_texels``: [R, B], generated directly at
    compacted size.  The per-texel (plane, py, px) columns are small
    uploads (~20 MB at 1080p) broadcast elementwise against the batch
    iota — no per-element table gather on device (CLAUDE.md), and the
    values are bit-identical to the matching texels of
    :func:`device_source`."""
    S = platesize
    t = np.asarray(texels)
    meta = tuple(jnp.asarray(a.astype(np.int32))
                 for a in (t // (S * S), t // S % S, t % S))
    return _device_source_texels(meta, batch, rgba)


def run_gather_throughput(
    width=1920,
    height=1080,
    platesize=1080,
    batch=512,
    iters=8,
    lens_name="panini",
    globe_name="cube",
    zoom=Zoom("fov", 180),
    rubix=True,
    rgba=False,
    compact=False,
    tint_post=False,
    row_crop=False,
    texel_compact=False,
):
    """Throughput of the expanded-source paths: rubix (raw||tinted u8),
    RGBA (u32), or both; *compact* drops unused source planes to afford a
    larger batch, *row_crop* goes further and crops each used plane to
    its touched row band (kernels.remap.compact_rows).  See
    kernels/remap.py for why tint/decode live in the source.
    ``tint_post`` measures the post-gather true-color tint variant
    instead (raw RGBA source, tint applied to the gathered screen —
    kernels.remap.remap_gather_tint_impl): half the source planes of the
    expanded layout, so ~2x the feasible batch.  Returns a dict like
    :func:`run_throughput`."""
    from blinky_tpu.kernels.remap import RemapKernel

    g = globes.get(globe_name)
    lens = lenses.get(lens_name, g)
    scale = calc_scale(zoom, lens, width, height)
    lm = build_lensmap(lens, g, scale, width, height, platesize)
    kernel = RemapKernel(lm, default_palette())

    if tint_post:
        if not rgba:
            raise ValueError("tint_post is the true-color (rgba) variant")
        tr, tm = kernel.tint_rgb_mask
        if compact:
            from blinky_tpu.kernels.remap import compact_planes

            plane_ids, cidx = compact_planes(lm.to_numpy(), rubix=False)
            idx = jnp.asarray(cidx)
            if batch is None:
                batch = feasible_batch(
                    planes_bytes_per_lane(platesize, len(plane_ids),
                                          rgba=True, padded=False),
                    screen_bytes_per_lane(width, height, rgba=True))
            frames = device_source(platesize, batch, False, True, plane_ids)
            nplanes = len(plane_ids)
        else:
            if batch is None:
                batch = feasible_batch(
                    planes_bytes_per_lane(platesize, MAX_PLATES, rgba=True),
                    screen_bytes_per_lane(width, height, rgba=True))
            frames = device_source(platesize, batch, False, True)
            idx = kernel.flat_idx
            nplanes = int(frames.shape[0])
        _sync(frames)
        bg = kernel.background_rgba
        step = make_gather_tint_bench_step(iters)
        args = (frames, idx, kernel.valid, bg, tr, tm)
        _sync(step(*args))
        t0 = time.perf_counter()
        _sync(step(*args))
        dt = time.perf_counter() - t0
        return dict(
            config=f"{lens_name}+{globe_name} {width}x{height} S={platesize}"
            f" B={batch} rubix-post rgba"
            + (f" compact({nplanes}pl)" if compact else ""),
            fps=batch * iters / dt,
            ms_per_batch=dt / iters * 1000,
        )

    if texel_compact:
        # keep exactly the unique texels the lensmap references
        # (kernels.remap.compact_texels): the terminal compaction —
        # rubix costs zero extra source bytes here
        from blinky_tpu.kernels.remap import compact_texels

        texels, cidx = compact_texels(lm.to_numpy(), rubix=rubix)
        idx = jnp.asarray(cidx)
        if batch is None:
            batch = feasible_batch(
                texels_bytes_per_lane(texels.size, rgba=rgba),
                screen_bytes_per_lane(width, height, rgba=rgba))
        frames = device_source_texels(platesize, batch, rgba, texels)
        _sync(frames)
        bg = kernel.background_rgba if rgba else kernel.background
        step = make_gather_bench_step(iters)
        _sync(step(frames, idx, kernel.valid, bg))
        t0 = time.perf_counter()
        _sync(step(frames, idx, kernel.valid, bg))
        dt = time.perf_counter() - t0
        return dict(
            config=f"{lens_name}+{globe_name} {width}x{height} S={platesize}"
            f" B={batch}" + (" rubix" if rubix else "")
            + (" rgba" if rgba else "") + f" texelcompact({texels.size}tx)",
            fps=batch * iters / dt,
            ms_per_batch=dt / iters * 1000,
        )
    if row_crop:
        # crop each used plane to its touched row band
        # (kernels.remap.compact_rows): the freed HBM buys the batch
        from blinky_tpu.kernels.remap import compact_rows

        slabs, cidx = compact_rows(lm.to_numpy(), rubix=rubix)
        idx = jnp.asarray(cidx)
        if batch is None:
            batch = feasible_batch(
                rows_bytes_per_lane(sum(hi - lo for _, lo, hi in slabs),
                                    platesize, rgba=rgba),
                screen_bytes_per_lane(width, height, rgba=rgba))
        frames = device_source_rows(platesize, batch, rgba, slabs)
        nrows = int(frames.shape[0])
        _sync(frames)
        bg = kernel.background_rgba if rgba else kernel.background
        step = make_gather_bench_step(iters)
        _sync(step(frames, idx, kernel.valid, bg))
        t0 = time.perf_counter()
        _sync(step(frames, idx, kernel.valid, bg))
        dt = time.perf_counter() - t0
        return dict(
            config=f"{lens_name}+{globe_name} {width}x{height} S={platesize}"
            f" B={batch}" + (" rubix" if rubix else "")
            + (" rgba" if rgba else "") + f" rowcrop({nrows}rows)",
            fps=batch * iters / dt,
            ms_per_batch=dt / iters * 1000,
        )
    if compact:
        # drop unused source planes (kernels.remap.compact_planes): the
        # freed HBM is what allows the larger batch the caller passes
        from blinky_tpu.kernels.remap import compact_planes

        plane_ids, cidx = compact_planes(lm.to_numpy(), rubix=rubix)
        idx = jnp.asarray(cidx)
        if batch is None:
            batch = feasible_batch(
                planes_bytes_per_lane(platesize, len(plane_ids), rgba=rgba,
                                      padded=False),
                screen_bytes_per_lane(width, height, rgba=rgba))
        frames = device_source(platesize, batch, rubix, rgba, plane_ids)
        nplanes = len(plane_ids)
    else:
        if batch is None:
            batch = feasible_batch(
                planes_bytes_per_lane(platesize, MAX_PLATES, rgba=rgba,
                                      expanded=rubix),
                screen_bytes_per_lane(width, height, rgba=rgba))
        frames = device_source(platesize, batch, rubix, rgba)
        idx = kernel.flat_idx_rubix if rubix else kernel.flat_idx
        nplanes = int(frames.shape[0])
    _sync(frames)
    bg = kernel.background_rgba if rgba else kernel.background

    step = make_gather_bench_step(iters)
    _sync(step(frames, idx, kernel.valid, bg))
    t0 = time.perf_counter()
    _sync(step(frames, idx, kernel.valid, bg))
    dt = time.perf_counter() - t0
    fps = batch * iters / dt
    return dict(
        config=f"{lens_name}+{globe_name} {width}x{height} S={platesize} B={batch}"
        + (" rubix" if rubix else "") + (" rgba" if rgba else "")
        + (f" compact({nplanes}pl)" if compact else ""),
        fps=fps,
        ms_per_batch=dt / iters * 1000,
    )


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def device_pano(h, w, batch):
    """On-device synthetic [H, W, B] packed-RGBA u32 pano batch."""
    shape = (h, w, batch)
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    b = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    v = (r * 3 + c * 5 + b * 11) % 256
    return ((v | ((v * 5 % 256) << 8) | ((v * 9 % 256) << 16))
            .astype(jnp.uint32) | jnp.uint32(0xFF000000))


def run_equirect_throughput(pano_h=2048, pano_w=4096, platesize=720,
                            width=1280, height=720, batch=16, iters=4,
                            bilinear=True, rubix=False,
                            lens_name="panini", fov=180,
                            texel_compact=False, fused=False):
    """End-to-end 360-video throughput: device-resident pano batch ->
    EquirectIngest (static gather tables) -> remap, one fused device
    chain per iteration — only the warped screens would leave the chip
    (``Session.render_equirect``).  Rubix rides the post-gather tint
    (no face-batch expansion).  With *texel_compact* the ingest resamples
    ONLY the texels the lensmap references (``EquirectIngest.subset`` +
    ``compact_texels`` — the chained pipeline never computes an unread
    texel).  With *fused* (round 4) the ingest tables compose THROUGH
    the lensmap: pano->screen is one gather+blend with no faces
    intermediate (``EquirectScreenKernel``).  Returns panos/sec."""
    from blinky_tpu.kernels.ingest import EquirectIngest, EquirectScreenKernel
    from blinky_tpu.kernels.remap import (
        RemapKernel, compact_texels, remap_gather_impl,
        remap_gather_tint_impl)

    g = globes.get("cube")
    lens = lenses.get(lens_name, g)
    scale = calc_scale(Zoom("fov", fov), lens, width, height)
    lm = build_lensmap(lens, g, scale, width, height, platesize)
    kernel = RemapKernel(lm, default_palette())
    ing = EquirectIngest(pano_h, pano_w, platesize, globe=g,
                         bilinear=bilinear)
    if fused:
        fkern = EquirectScreenKernel(ing, kernel)
    if texel_compact:
        texels, cidx = compact_texels(lm.to_numpy())
        ing = ing.subset(texels)
        flat_idx = jnp.asarray(cidx)
    else:
        flat_idx = kernel.flat_idx
    panos = device_pano(pano_h, pano_w, batch)
    _sync(panos)
    bg = kernel.background_rgba
    tr, tm = kernel.tint_rgb_mask if rubix else (None, None)

    @jax.jit
    def step(panos):
        def body(i, acc):
            p = panos.at[0, 0, 0].set(i.astype(jnp.uint32))  # no hoisting
            if fused:
                out = fkern(p, rubix=rubix)
            elif rubix:
                faces = ing(p)
                out = remap_gather_tint_impl(
                    faces, flat_idx, kernel.valid, bg, tr, tm)
            else:
                faces = ing(p)
                out = remap_gather_impl(
                    faces, flat_idx, kernel.valid, bg)
            return acc + out.reshape(-1)[0].astype(jnp.int32)
        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    _sync(step(panos))
    t0 = time.perf_counter()
    _sync(step(panos))
    dt = time.perf_counter() - t0
    return dict(
        config=f"equirect {pano_w}x{pano_h} -> {lens_name} {width}x{height}"
        f" S={platesize} B={batch}"
        + (" bilinear" if bilinear else " nearest")
        + (" rubix" if rubix else "")
        + (" texelcompact" if texel_compact else ""),
        fps=batch * iters / dt,
        ms_per_batch=dt / iters * 1000,
    )


def run_throughput(
    width=1920,
    height=1080,
    platesize=1080,
    batch=1024,
    iters=8,
    lens_name="panini",
    globe_name="cube",
    zoom=Zoom("fov", 180),
    rubix=False,
    decode_rgb=False,
    dtype=None,
):
    """Steady-state warped frames/sec for one config.  Returns a dict."""
    g = globes.get(globe_name)
    lens = lenses.get(lens_name, g)
    scale = calc_scale(zoom, lens, width, height)

    # first build = jit compile-cache state (ungated first_* metric: a
    # persistent-cache hit ~200 ms vs a real compile 1-2 s)
    t0 = time.perf_counter()
    lm = build_lensmap(lens, g, scale, width, height, platesize, dtype=dtype)
    _sync(lm.flat_idx)
    build_ms = (time.perf_counter() - t0) * 1000

    # warm builds = compiled-path latency (zoom change); median of 3 —
    # a single relay-synced call swings ~2x on dispatch variance
    warm = []
    for i in range(3):
        t0 = time.perf_counter()
        lm = build_lensmap(lens, g, scale * (1.0 + 1e-4 * (i + 1)),
                           width, height, platesize, dtype=dtype)
        _sync(lm.flat_idx)
        warm.append((time.perf_counter() - t0) * 1000)
    rebuild_ms = sorted(warm)[1]

    frames = device_cubemap_batch(platesize, batch)
    _sync(frames)
    pal = default_palette()
    flat_idx = jnp.asarray(lm.flat_idx)
    valid = jnp.asarray(lm.valid)
    tint = jnp.asarray(lm.tint)
    bgnd = jnp.zeros((height, width), jnp.uint8)
    tlut = jnp.asarray(tint_lut(pal))
    rgb = jnp.asarray(pal)

    step = make_bench_step(iters, rubix, decode_rgb)
    _sync(step(frames, flat_idx, valid, tint, bgnd, tlut, rgb))  # compile+warm

    t0 = time.perf_counter()
    _sync(step(frames, flat_idx, valid, tint, bgnd, tlut, rgb))
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
    )


def run_pose_tracked_throughput(
    width=1920, height=1080, platesize=1080, batch=64, iters=8,
    lens_name="panini", globe_name="cube", fov=180,
):
    """Sustained pose-tracked playback: every batch rebuilds the lensmap
    for a new view basis (a warm dynamic-arg jit call) then remaps — the
    360-video pan/tilt pipeline (`reproject --follow-poses`)."""
    from blinky_tpu.kernels.remap import remap_gather_impl
    from blinky_tpu.lensmap.builder import _compiled_inverse_builder

    g = globes.get(globe_name)
    lens = lenses.get(lens_name, g)
    scale = calc_scale(Zoom("fov", fov), lens, width, height)
    builder = _compiled_inverse_builder(lens, g, width, height, platesize, jnp.float32)

    frames = device_source(platesize, batch, False, False)
    _sync(frames)
    bg = jnp.zeros((height, width), jnp.uint8)

    @jax.jit
    def step(frames, scale0, bg):
        def body(i, acc):
            a = i.astype(jnp.float32) * 0.01  # yaw drift per chunk
            s, c = jnp.sin(a), jnp.cos(a)
            basis = (jnp.stack([s, 0.0 * s, c]),      # forward
                     jnp.stack([c, 0.0 * s, -s]),     # right
                     jnp.asarray([0.0, 1.0, 0.0], jnp.float32))
            lm = builder(scale0, jnp.float32(10), jnp.float32(4), jnp.float32(1), basis)
            out = remap_gather_impl(frames, lm["flat_idx"], lm["valid"], bg)
            return acc + out.reshape(-1)[0].astype(jnp.int32)
        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    s0 = jnp.float32(scale)
    _sync(step(frames, s0, bg))
    t0 = time.perf_counter()
    _sync(step(frames, s0, bg))
    dt = time.perf_counter() - t0
    return dict(
        config=f"pose-tracked {lens_name}+{globe_name} {width}x{height} chunk={batch}",
        fps=batch * iters / dt,
        ms_per_chunk=dt / iters * 1000,
    )


def run_batch_scaling(width=1920, height=1080, platesize=1080,
                      batches=(128, 256, 512, 1024), iters=4):
    """B-scaling on one chip: fps vs batch width (the row-gather's
    per-index cost amortizes over B lanes — docs/PERF.md §1)."""
    g = globes.get("cube")
    lens = lenses.get("panini", g)
    scale = calc_scale(Zoom("fov", 180), lens, width, height)
    lm = build_lensmap(lens, g, scale, width, height, platesize)
    _sync(lm.flat_idx)
    bg = jnp.zeros((height, width), jnp.uint8)
    out = []
    frames = None
    for B in batches:
        frames = None  # free the previous batch BEFORE allocating the next
        frames = device_source(platesize, B, False, False)
        _sync(frames)
        step = make_gather_bench_step(iters)
        _sync(step(frames, lm.flat_idx, lm.valid, bg))
        t0 = time.perf_counter()
        _sync(step(frames, lm.flat_idx, lm.valid, bg))
        dt = (time.perf_counter() - t0) / iters
        out.append(dict(batch=B, fps=B / dt, ms_per_batch=dt * 1000))
    return out


def run_sharded_scaling(width=640, height=480, platesize=480,
                        per_device_batch=32, iters=4, reps=3,
                        budget=None):
    """Weak-scaling curve over the available devices: frames DP-sharded,
    screen rows space-sharded where the device count allows (SURVEY §5.8
    — remap is embarrassingly parallel, communication = input fan-out /
    output gather riding ICI).  On the virtual CPU mesh the absolute
    numbers are meaningless; the curve validates that per-device work
    stays flat as devices double.

    ``per_device_batch=None`` derives each step's batch from the layout
    + per-device HBM budget (``feasible_batch(n_devices=...)``, VERDICT
    r4 #3) instead of a hand constant; pass ``budget`` (bytes/device) to
    scale it for the virtual CPU mesh."""
    from blinky_tpu.kernels.remap import RemapKernel, remap_gather_impl
    from blinky_tpu.parallel import make_mesh, shard_frames, shard_kernel

    g = globes.get("cube")
    lens = lenses.get("panini", g)
    scale = calc_scale(Zoom("fov", 180), lens, width, height)
    lm = build_lensmap(lens, g, scale, width, height, platesize,
                       backend="numpy").to_numpy()
    n_dev = len(jax.devices())
    out = []
    n = 1
    step = jax.jit(remap_gather_impl)
    while n <= n_dev:
        n_space = 2 if n >= 4 else 1
        mesh = make_mesh(n_data=n // n_space, n_space=n_space)
        kernel = shard_kernel(RemapKernel(lm), mesh)
        if per_device_batch is None:
            B = feasible_batch(
                planes_bytes_per_lane(platesize, g.numplates),
                screen_bytes_per_lane(width, height),
                budget=budget, n_devices=n // n_space)
        else:
            B = per_device_batch * (n // n_space)
        frames = shard_frames(
            np.asarray(device_source(platesize, B, False, False)), mesh)
        args = (frames, kernel.flat_idx, kernel.valid, kernel.background)
        _sync(step(*args))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                _sync(step(*args))
            times.append((time.perf_counter() - t0) / iters)
        dt = min(times)
        out.append(dict(devices=n, mesh=f"{n // n_space}x{n_space}", batch=B,
                        fps=B / dt, fps_per_device=B / dt / n))
        n *= 2
    return out


def run_posed_sharded_scaling(width=320, height=240, platesize=240,
                              per_device_poses=4, iters=3, reps=3,
                              budget=None):
    """Weak-scaling of the fused per-frame-pose pipeline: the pose chunk
    DP-sharded over the mesh's data axis (posed_remap_sharded) — the
    batch-axis answer to the per-index gather wall (docs/PERF.md §6).
    On the virtual CPU mesh the curve validates per-device work stays
    flat as devices double.

    ``per_device_poses=None`` derives each step's pose chunk from the
    posed live-set model + per-device HBM budget (VERDICT r4 #3)."""
    from blinky_tpu.bench.autobatch import posed_bytes_per_lane
    from blinky_tpu.kernels.posed import (
        PosedRemapKernel, bases_from_pose_track, posed_remap_sharded,
    )
    from blinky_tpu.parallel import make_mesh

    g = globes.get("cube")
    lens = lenses.get("panini", g)
    scale = calc_scale(Zoom("fov", 180), lens, width, height)
    n_dev = len(jax.devices())
    out = []
    n = 1
    while n <= n_dev:
        mesh = make_mesh(n_data=n, n_space=1)
        if per_device_poses is None:
            B = feasible_batch(
                posed_bytes_per_lane(platesize, g.numplates, width, height),
                0, budget=budget, n_devices=n)
        else:
            B = per_device_poses * n
        frames = device_source(platesize, B, False, False)
        poses = np.stack([np.linspace(-20, 20, B), np.linspace(0, 90, B),
                          np.zeros(B)], axis=1)
        bases = bases_from_pose_track(poses)
        kern = PosedRemapKernel(lens, g, width, height, scale,
                                platesize=platesize)
        _sync(posed_remap_sharded(kern, frames, bases, mesh))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                _sync(posed_remap_sharded(kern, frames, bases, mesh))
            times.append((time.perf_counter() - t0) / iters)
        dt = min(times)
        out.append(dict(devices=n, poses=B, fps=B / dt,
                        fps_per_device=B / dt / n))
        n *= 2
    return out


def run_per_frame_pose_throughput(
    width=1920, height=1080, platesize=1080, batch=16, reps=3,
    lens_name="panini", globe_name="cube", fov=180,
):
    """Per-frame poses: EVERY frame gets its own view basis — one fused
    device call vmaps the builder over the pose chunk and gathers each
    frame through its own lensmap (kernels/posed.py).

    The wall here is the per-element gather: unlike the static path, no
    two frames share gather indices, so the row-gather amortization is
    unavailable and each of the 2.07 M output pixels pays the chip's
    per-index gather cost (~13 ns measured on v5e) — see docs/PERF.md §6.
    """
    from blinky_tpu.kernels.posed import PosedRemapKernel, bases_from_pose_track

    g = globes.get(globe_name)
    lens = lenses.get(lens_name, g)
    scale = calc_scale(Zoom("fov", fov), lens, width, height)
    frames = device_source(platesize, batch, False, False)
    poses = np.stack([
        np.linspace(-20, 20, batch),       # pitch drift
        np.linspace(0, 90, batch),         # yaw pan
        np.zeros(batch),
    ], axis=1)
    bases = bases_from_pose_track(poses)
    k = PosedRemapKernel(lens, g, width, height, scale, platesize=platesize)
    _sync(k(frames, bases))  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        _sync(k(frames, bases))
    dt = (time.perf_counter() - t0) / reps
    # the quality<->speed knob: lensmap at 1/2 size, nearest-upsampled on
    # device (render_scale; ~k^2 x the sustained rate past the per-index
    # gather wall)
    k2 = PosedRemapKernel(lens, g, width, height, scale,
                          platesize=platesize, render_scale=2)
    _sync(k2(frames, bases))  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        _sync(k2(frames, bases))
    dt2 = (time.perf_counter() - t0) / reps
    return dict(
        config=f"per-frame poses {lens_name}+{globe_name} {width}x{height} chunk={batch}",
        fps=batch / dt,
        ms_per_frame=dt / batch * 1000,
        fps_scale2=batch / dt2,
        ms_per_frame_scale2=dt2 / batch * 1000,
    )


def run_static_ray_pose_throughput(
    width=1920, height=1080, platesize=1080, batch=16, reps=3,
    lens_name="panini", globe_name="cube", fov=180,
):
    """Per-frame poses through the static-ray recomposition
    (kernels/static_ray.py, round 4): the ray table is built once, each
    pose is rotate + plate-resolve + gather with NO lens math — the
    per-pose cost the vmapped builder path paid (~6.5 ms at 1080p,
    docs/PERF.md §6) drops to the elementwise resolve + the per-index
    gather wall."""
    from blinky_tpu.kernels.posed import bases_from_pose_track
    from blinky_tpu.kernels.static_ray import StaticRayPosedKernel

    g = globes.get(globe_name)
    lens = lenses.get(lens_name, g)
    scale = calc_scale(Zoom("fov", fov), lens, width, height)
    frames = device_source(platesize, batch, False, False)
    poses = np.stack([
        np.linspace(-20, 20, batch),
        np.linspace(0, 90, batch),
        np.zeros(batch),
    ], axis=1)
    bases = bases_from_pose_track(poses)
    t0 = time.perf_counter()
    k = StaticRayPosedKernel(lens, g, width, height, scale,
                             platesize=platesize)
    table_ms = (time.perf_counter() - t0) * 1000
    _sync(k(frames, bases))  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        _sync(k(frames, bases))
    dt = (time.perf_counter() - t0) / reps
    k2 = StaticRayPosedKernel(lens, g, width, height, scale,
                              platesize=platesize, render_scale=2)
    _sync(k2(frames, bases))
    t0 = time.perf_counter()
    for _ in range(reps):
        _sync(k2(frames, bases))
    dt2 = (time.perf_counter() - t0) / reps
    return dict(
        config=(f"static-ray poses {lens_name}+{globe_name} "
                f"{width}x{height} chunk={batch}"),
        fps=batch / dt,
        ms_per_frame=dt / batch * 1000,
        fps_scale2=batch / dt2,
        ms_per_frame_scale2=dt2 / batch * 1000,
        table_ms=table_ms,
    )


def run_forward_posed_throughput(
    width=1920, height=1080, platesize=1080, batch=16, reps=3,
    exact_poses=1, lens_name="eckert1", globe_name="cube",
):
    """Forward-only lens pose playback at 1080p (VERDICT r3 task 7: the
    previously-unpublished datapoint).  Measures BOTH paths:

    * ``exact_fps`` — the per-pose exact host rasterization
      (``Session.render_posed(exact=True)``), the only path rounds 1-3
      had for the 10 forward-only lenses (host-build-bound);
    * ``fps`` — the round-4 static-ray device path: one host
      rasterization total (``table_ms``) builds the ray table, then
      every pose is lens-free on device."""
    from blinky_tpu.api import Session
    from blinky_tpu.kernels.posed import bases_from_pose_track
    from blinky_tpu.kernels.static_ray import StaticRayPosedKernel

    g = globes.get(globe_name)
    lens = lenses.get(lens_name, g)
    scale = calc_scale(Zoom("contain"), lens, width, height)
    frames = device_source(platesize, batch, False, False)
    poses = np.stack([
        np.linspace(-20, 20, batch),
        np.linspace(0, 90, batch),
        np.zeros(batch),
    ], axis=1)
    bases = bases_from_pose_track(poses)

    # exact host fallback: each pose repeats the identical full
    # rasterization + remap, so ONE warmup pose (absorbing the remap
    # kernel's jit compile — cache-state-dependent, the same class of
    # noise the first_* keys are ungated for) then one timed pose
    # publishes the steady-state rate
    sess = Session(width, height, platesize=platesize)
    sess.cmd(f"f_lens {lens_name}")
    sess.render_posed(frames[..., :1], poses[:1], exact=True)  # warmup
    t0 = time.perf_counter()
    sess.render_posed(frames[..., :exact_poses], poses[:exact_poses],
                      exact=True)
    exact_dt = (time.perf_counter() - t0) / exact_poses

    t0 = time.perf_counter()
    k = StaticRayPosedKernel(lens, g, width, height, scale,
                             platesize=platesize)
    table_ms = (time.perf_counter() - t0) * 1000
    _sync(k(frames, bases))  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        _sync(k(frames, bases))
    dt = (time.perf_counter() - t0) / reps
    return dict(
        config=(f"forward-lens poses {lens_name}+{globe_name} "
                f"{width}x{height} chunk={batch}"),
        fps=batch / dt,
        ms_per_frame=dt / batch * 1000,
        exact_fps=1.0 / exact_dt,
        exact_ms_per_frame=exact_dt * 1000,
        table_ms=table_ms,
    )


def run_build_bench(width=1920, height=1080, lens_name="stereographic",
                    globe_name="cube", fovs=(90, 120, 150, 180, 210, 240, 270),
                    device_iters=16):
    """f_fov zoom-sweep rebuild latency (BASELINE config[1]): after the
    first compile, every rebuild must be a warm jitted call.

    ``warm_ms`` is end-to-end through the host (incl. relay sync);
    ``device_ms`` times an on-device rebuild loop — the true per-rebuild
    kernel cost a pipelined zoom sweep would see."""
    from blinky_tpu.lensmap.builder import _compiled_inverse_builder

    g = globes.get(globe_name)
    lens = lenses.get(lens_name, g)
    S = min(width, height)
    times = []
    for fov in fovs:
        scale = calc_scale(Zoom("fov", fov), lens, width, height)
        t0 = time.perf_counter()
        lm = build_lensmap(lens, g, scale, width, height, S)
        _sync(lm.flat_idx)
        times.append((time.perf_counter() - t0) * 1000)

    if lens.map_type != "inverse":  # forward lenses rasterize on the host
        return dict(first_ms=times[0],
                    warm_ms=sorted(times[1:])[len(times[1:]) // 2],
                    device_ms=None)

    # device-side: rebuild in a fori loop with a per-iteration scale
    # perturbation + data dependence (same methodology as the remap bench)
    builder = _compiled_inverse_builder(lens, g, width, height, S, jnp.float32)

    ident = (jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
             jnp.asarray([1.0, 0.0, 0.0], jnp.float32),
             jnp.asarray([0.0, 1.0, 0.0], jnp.float32))

    @jax.jit
    def loop(scale0):
        def body(i, acc):
            out = builder(scale0 * (1 + i.astype(jnp.float32) * 1e-7),
                          jnp.float32(10), jnp.float32(4), jnp.float32(1), ident)
            return acc + out["flat_idx"].reshape(-1)[0] + acc * 0
        return jax.lax.fori_loop(0, device_iters, body, jnp.int32(0))

    scale0 = jnp.float32(calc_scale(Zoom("fov", fovs[0]), lens, width, height))
    _sync(loop(scale0))
    t0 = time.perf_counter()
    _sync(loop(scale0))
    device_ms = (time.perf_counter() - t0) / device_iters * 1000
    return dict(first_ms=times[0], warm_ms=sorted(times[1:])[len(times[1:]) // 2],
                device_ms=device_ms)
