"""Static-ray pose recomposition: pose playback with NO lens math per pose.

In the reference a view rotation never touches the lensmap — the pose
enters through the plate render basis (``F_RenderView``,
``engine/NQ/fisheye.c:750,2427-2450``) while the lensmap depends only on
(lens, globe, zoom, size) (``fisheye.c:2346-2397``), so EVERY lens,
forward-only included, rotates at full frame rate.  This module
reproduces that decomposition for recorded cubemaps:

1. Build a per-pixel **ray table** once per (lens, zoom scale, size):
   the pre-rotation camera-frame rays of the inverse build
   (:func:`blinky_tpu.lensmap.builder.lens_ray_grid`), or — for the 10
   forward-only lenses and scalar-only ``.lua`` scripts — texel-center
   rays reconstructed from the built lensmap via ``plate_uv_to_ray``
   (closed-form, lens-independent, ``fisheye.c:1198``).
2. Per pose: rotate the rays (3x3, elementwise), re-resolve plate + uv
   (:func:`blinky_tpu.lensmap.builder.rays_to_lensmap` — the identical
   second half of the inverse build), gather.  Identical code for all
   31 lenses.  Measured cost split at 1080p (docs/PERF.md §6, round 4):
   index math 1.6 ms/pose (fully fused), per-pose element gather
   ~19.6 ms — the pipeline runs at the chip's gather floor, ~49 fps
   native / ~142 fps at render_scale 2.

For jittable inverse lenses the result is the same f32 arithmetic in the
same order as the fused vmapped-builder pipeline
(:class:`blinky_tpu.kernels.posed.PosedRemapKernel`): ``lens.inverse``
outputs are f32 on device and the rotation runs on them unchanged, so
outputs match exactly on TPU (XLA:CPU's fusion-dependent FMA contraction
can flip boundary texels there — the same 1-ulp noise documented for the
``.lua`` device pins, CLAUDE.md).  For forward-only lenses the table
quantizes each screen pixel to its texel-center ray; the identity pose
reproduces the static render wherever the center ray re-resolves to the
stored texel, and rotated poses drift only by that quantization vs the
per-pose exact host rasterization (measured in ``tests/test_static_ray.py``
and documented in docs/PERF.md).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from blinky_tpu.kernels.posed import (
    check_render_scale, gather_posed, prep_posed_inputs,
)
from blinky_tpu.lensmap.builder import (
    TINT_NONE, LensMap, lens_ray_grid, rays_to_lensmap,
)
from blinky_tpu.palette import MAX_PLATES


@dataclasses.dataclass(frozen=True, eq=False)
class RayTable:
    """Per-pixel pre-rotation camera-frame rays for one (lens, zoom, size).

    Components are stored **unnormalized** in float32 — exactly what the
    inverse builder feeds its ``view_basis`` rotation (``inverse_grid``'s
    rotate-then-normalize order, matching ``fisheye.c:777-792`` composing
    the basis before the renderer's f32 pipeline) — as three [H, W]
    planes, not an [H, W, 3] array: a 3-wide minor axis pads 21-42x
    under TPU (8,128) tiling (CLAUDE.md).
    """

    width_px: int
    height_px: int
    vx: object  # f32 [H, W]
    vy: object
    vz: object
    lens_valid: object  # bool [H, W]
    source: str = "lens"  # "lens" (exact rays) | "lensmap" (texel centers)

    def device(self) -> "RayTable":
        """The same table with device-resident arrays (uploaded once)."""
        return dataclasses.replace(
            self,
            vx=jnp.asarray(self.vx), vy=jnp.asarray(self.vy),
            vz=jnp.asarray(self.vz),
            lens_valid=jnp.asarray(self.lens_valid),
        )


@functools.lru_cache(maxsize=32)
def _compiled_ray_grid(lens, width_px, height_px, dtype):
    """Jitted lens stage: dynamic zoom scale -> f32 ray planes."""

    def build(scale):
        vx, vy, vz, lens_valid = lens_ray_grid(
            lens, scale, width_px, height_px, jnp, dtype)
        shape = (height_px, width_px)
        f32 = jnp.float32
        return (
            jnp.broadcast_to(jnp.asarray(vx), shape).astype(f32),
            jnp.broadcast_to(jnp.asarray(vy), shape).astype(f32),
            jnp.broadcast_to(jnp.asarray(vz), shape).astype(f32),
            lens_valid,
        )

    return jax.jit(build)


def ray_table_from_lens(lens, scale, width_px, height_px,
                        dtype=None, backend="jax") -> RayTable:
    """Ray table for an inverse-capable lens: run the lens stage once.

    ``backend="jax"`` (jittable lenses) keeps the table bit-aligned with
    the fused posed pipeline: ``lens.inverse`` evaluates in f32 on
    device, and the stored planes are those same values.  ``"numpy"``
    (scalar-only ``.lua`` lenses, or parity checks) evaluates the lens
    math in float64 and truncates the rays to f32 at the table boundary
    — the per-pose rotation then runs in f32 like the device path.
    """
    if getattr(lens, "map_type", "inverse") != "inverse":
        raise ValueError(
            f"lens '{getattr(lens, 'name', lens)}' has no inverse map — "
            "build its table from a forward-rasterized lensmap "
            "(ray_table_from_lensmap)")
    if backend == "numpy":
        with np.errstate(all="ignore"):
            vx, vy, vz, lens_valid = lens_ray_grid(
                lens, np.float64(scale), width_px, height_px,
                np, np.float64)
        shape = (height_px, width_px)
        return RayTable(
            width_px, height_px,
            np.broadcast_to(np.asarray(vx), shape).astype(np.float32),
            np.broadcast_to(np.asarray(vy), shape).astype(np.float32),
            np.broadcast_to(np.asarray(vz), shape).astype(np.float32),
            np.asarray(lens_valid),
            source="lens",
        )
    dtype = dtype or jnp.float32
    fn = _compiled_ray_grid(lens, int(width_px), int(height_px), dtype)
    vx, vy, vz, lens_valid = fn(jnp.asarray(scale, dtype))
    return RayTable(int(width_px), int(height_px), vx, vy, vz, lens_valid,
                    source="lens")


def ray_table_from_lensmap(lm: LensMap, globe) -> RayTable:
    """Ray table reconstructed from a BUILT lensmap — the route for the
    10 forward-only lenses (their scan-order rasterization has no
    per-pixel inverse to evaluate).

    Each valid screen pixel's stored (plate, px, py) becomes the texel
    CENTER ray via ``plate_uv_to_ray`` (``fisheye.c:1198-1214``) with
    the C types: u/v recentered in double, truncated to f32, then the
    f32 ``VectorMA`` accumulation ``dist*fwd + u*right + v*up`` against
    the stored f32 plate frames (``geometry.plate_uv_to_ray_c`` order) —
    left unnormalized for the per-pose rotate-then-normalize.  The
    identity pose re-resolves each center ray to its own texel (u' = u
    up to f32 rounding), so static parity holds except where max-dot
    re-resolution disagrees with the rasterizer's scan-order plate
    ownership on plate seams.
    """
    plate = np.asarray(lm.plate)
    px = np.asarray(lm.px)
    py = np.asarray(lm.py)
    valid = np.asarray(lm.valid)
    S = lm.platesize
    # texel-center uv in double, recentered, then the C f32 boundary
    # (plate_uv_to_ray_c truncates u-0.5 / -(v-0.5) to f32 before the
    # VectorMA chain)
    u32 = (((px.astype(np.float64) + 0.5) / S) - 0.5).astype(np.float32)
    v32 = (-(((py.astype(np.float64) + 0.5) / S) - 0.5)).astype(np.float32)
    fwd = np.asarray(globe.forward, np.float32)
    rgt = np.asarray(globe.right, np.float32)
    up = np.asarray(globe.up, np.float32)
    dist = np.asarray(globe.dist, np.float32)
    rx = np.zeros(plate.shape, np.float32)
    ry = np.zeros(plate.shape, np.float32)
    rz = np.zeros(plate.shape, np.float32)
    for k in range(globe.numplates):
        sel = valid & (plate == k)
        # VectorMA order (mathlib.c:349-355): dist*fwd, then += u*right,
        # then += v*up — all f32, left-to-right
        rx = np.where(sel, dist[k] * fwd[k, 0] + u32 * rgt[k, 0] + v32 * up[k, 0], rx)
        ry = np.where(sel, dist[k] * fwd[k, 1] + u32 * rgt[k, 1] + v32 * up[k, 1], ry)
        rz = np.where(sel, dist[k] * fwd[k, 2] + u32 * rgt[k, 2] + v32 * up[k, 2], rz)
    return RayTable(lm.width_px, lm.height_px, rx, ry, rz, valid,
                    source="lensmap")


def build_ray_table(lens, globe, scale, width_px, height_px,
                    platesize=None, dtype=None, lensmap=None) -> RayTable:
    """Route a lens to its ray-table source.

    * jittable inverse lens -> device lens stage (bit-aligned with the
      fused posed pipeline);
    * scalar-only (non-jittable) inverse ``.lua`` -> host f64 lens stage,
      rays truncated to f32;
    * forward-only -> texel-center reconstruction from the exact host
      forward rasterization (``lensmap`` reuses a caller's already-built
      table when its size AND zoom scale match; rubix tint is recomputed
      per pose, so any tint parameters in it are irrelevant).
    """
    if platesize is None:
        platesize = min(width_px, height_px)
    if getattr(lens, "map_type", "inverse") == "inverse":
        jit_ok = getattr(lens, "jittable", True) and getattr(
            globe, "jittable", True)
        return ray_table_from_lens(
            lens, scale, width_px, height_px, dtype=dtype,
            backend="jax" if jit_ok else "numpy")
    if lensmap is None or lensmap.width_px != width_px \
            or lensmap.height_px != height_px \
            or lensmap.platesize != platesize \
            or lensmap.scale != float(scale):
        from blinky_tpu.lensmap.forward_raster import build_forward

        lensmap = build_forward(
            lens, globe, float(scale), int(width_px), int(height_px),
            int(platesize))
    return ray_table_from_lensmap(lensmap, globe)


@functools.lru_cache(maxsize=32)
def _compiled_static_ray_pipeline(globe, width_px, height_px, platesize,
                                  expanded, dtype, render_scale=1,
                                  local_gather=True):
    """One executable per (globe, shape, source-kind): takes the ray
    planes, a [B, 3] basis triple and the [B, N] flattened sources.

    Lens and zoom are NOT in the key — they live in the ray table, so a
    lens switch or f_fov change reuses this compiled pipeline (the
    reference's own economy: the gather kernel stays warm across lens
    switches, SURVEY §7).
    """
    S = platesize
    k = int(render_scale)
    W, H = width_px // k, height_px // k

    def one_pose_idx(fwd, rgt, up, vx, vy, vz, lens_valid,
                     numcells, cell_size, pad_size):
        lm = rays_to_lensmap(
            globe, vx, vy, vz, lens_valid, S,
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

    def run(src, background, vx, vy, vz, lens_valid,
            bases_fwd, bases_rgt, bases_up, numcells, cell_size, pad_size):
        idx, valid = jax.vmap(
            one_pose_idx,
            in_axes=(0, 0, 0, None, None, None, None, None, None, None),
        )(bases_fwd, bases_rgt, bases_up, vx, vy, vz, lens_valid,
          numcells, cell_size, pad_size)
        B = src.shape[0]
        return gather_posed(src, idx.reshape(B, H, W),
                            valid.reshape(B, H, W),
                            background, k, local_gather)

    return jax.jit(run)


class StaticRayPosedKernel:
    """Per-frame-pose playback through a static ray table — every lens,
    forward-only included, takes the fused device path.

    Usage::

        k = StaticRayPosedKernel(lens, globe, W, H, scale)
        out = k(frames, bases)   # [P, S, S, B] + [B, 3, 3] -> [B, H, W]

    Same source contract as :class:`blinky_tpu.kernels.posed.
    PosedRemapKernel` (plain u8 plates, the expanded [12, ...] rubix
    layout, or RGBA u32).  Construction builds (or accepts via
    ``ray_table``) the table at 1/``render_scale`` size — a one-time
    cost per (lens, zoom, size): ms on device for inverse lenses, one
    host rasterization for forward-only lenses (vs one PER POSE on the
    exact fallback path).
    """

    def __init__(self, lens, globe, width_px, height_px, scale,
                 platesize=None, numcells=10, cell_size=4.0, pad_size=1.0,
                 background=None, dtype=None, render_scale=1,
                 ray_table=None, lensmap=None):
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
        k = self.render_scale
        W, H = self.width_px // k, self.height_px // k
        if ray_table is None:
            # the table is built at the BUILD grid size with the k-scaled
            # zoom (the every-k-th-ray identity, kernels/posed.py)
            ray_table = build_ray_table(
                lens, globe, self.scale * k, W, H, self.platesize,
                dtype=self.dtype, lensmap=lensmap)
        if (ray_table.width_px, ray_table.height_px) != (W, H):
            raise ValueError(
                f"ray table is {ray_table.width_px}x{ray_table.height_px}, "
                f"kernel build grid is {W}x{H}")
        self.ray_table = ray_table.device()
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
        fn = _compiled_static_ray_pipeline(
            self.globe, self.width_px, self.height_px, self.platesize,
            expanded, self.dtype, self.render_scale,
        )
        t = self.ray_table
        return fn(
            src, self.background, t.vx, t.vy, t.vz, t.lens_valid,
            bases[:, 0], bases[:, 1], bases[:, 2],
            jnp.asarray(self.numcells, self.dtype),
            jnp.asarray(self.cell_size, self.dtype),
            jnp.asarray(self.pad_size, self.dtype),
        )


def static_ray_posed_sharded(kernel: StaticRayPosedKernel, frames, bases,
                             mesh):
    """The static-ray posed pipeline with the POSE axis sharded over the
    mesh's "data" axis: the ray table is replicated (HBM-cheap — 3 f32
    planes + a mask, ~25 MB at 1080p), poses and their frames are DP
    local, so XLA SPMD keeps every rotate/resolve/gather on-device with
    no collectives beyond input distribution.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from blinky_tpu.parallel import data_axes

    src, bases, expanded = prep_posed_inputs(
        frames, bases, kernel.platesize, kernel.dtype, kernel.background)
    da = data_axes(mesh)
    rows = NamedSharding(mesh, P(da, None))
    repl = NamedSharding(mesh, P())
    src = jax.device_put(src, rows)
    bf = jax.device_put(bases[:, 0], NamedSharding(mesh, P(da, None)))
    br = jax.device_put(bases[:, 1], NamedSharding(mesh, P(da, None)))
    bu = jax.device_put(bases[:, 2], NamedSharding(mesh, P(da, None)))
    t = kernel.ray_table
    vx = jax.device_put(t.vx, repl)
    vy = jax.device_put(t.vy, repl)
    vz = jax.device_put(t.vz, repl)
    lv = jax.device_put(t.lens_valid, repl)
    bg = jax.device_put(kernel.background, repl)
    fn = _compiled_static_ray_pipeline(
        kernel.globe, kernel.width_px, kernel.height_px, kernel.platesize,
        expanded, kernel.dtype, kernel.render_scale,
        local_gather=False,  # keep the pose axis visible to SPMD
    )
    return fn(
        src, bg, vx, vy, vz, lv, bf, br, bu,
        jnp.asarray(kernel.numcells, kernel.dtype),
        jnp.asarray(kernel.cell_size, kernel.dtype),
        jnp.asarray(kernel.pad_size, kernel.dtype),
    )
