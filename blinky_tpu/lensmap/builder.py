"""Lensmap builders: inverse (jitted per-pixel map) and forward (host
rasterizer) paths.

Reference: ``create_lensmap`` (``engine/NQ/fisheye.c:2367-2397``) and the
inverse scan ``resume_lensmap_inverse`` (``fisheye.c:2084-2124``).  The
reference crosses the C<->Lua boundary once per pixel and time-slices the
scan across frames (``fisheye.c:306-322``); here the whole pixel grid is
one traced, vmapped expression compiled once per (lens, globe, shape) —
zoom changes re-run the compiled builder with a new scale scalar, so a
``f_fov`` sweep never recompiles.

The same grid math runs under NumPy float64 (`xp=numpy`) for host-side
builds and under jnp for TPU; the scalar-loop transcription used as the
parity oracle lives in :mod:`blinky_tpu.parity.oracle`.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from blinky_tpu import geometry
from blinky_tpu.globes import Globe
from blinky_tpu.lenses import LensDef
from blinky_tpu.palette import MAX_PLATES

# tint-plane value meaning "no tint" in the compact 7-row LUT space
# (the reference stores 255, fisheye.c:732; we use row 6 of the tint LUT).
TINT_NONE = MAX_PLATES


@dataclasses.dataclass
class LensMap:
    """The built gather table (arrays are [H, W] in screen row-major order).

    ``flat_idx`` indexes the flattened ``[MAX_PLATES, S, S]`` globe store:
    ``plate * S*S + py * S + px`` — the TPU-native form of the reference's
    per-pixel pointers (``LENSPIXEL``, ``fisheye.c:430``).
    """

    width_px: int
    height_px: int
    platesize: int
    numplates: int
    scale: float
    plate: object  # int32 [H, W], -1 where invalid
    px: object  # int32 [H, W]
    py: object  # int32 [H, W]
    valid: object  # bool [H, W]
    tint: object  # uint8 [H, W]; 0..5 plate tint, TINT_NONE = none
    flat_idx: object  # int32 [H, W]
    plates_used: object  # bool [MAX_PLATES] — the reference's display flags

    def to_numpy(self) -> "LensMap":
        return dataclasses.replace(
            self,
            **{
                f: np.asarray(getattr(self, f))
                for f in ("plate", "px", "py", "valid", "tint", "flat_idx", "plates_used")
            },
        )

    @property
    def tint_c(self):
        """The tint plane in the reference's encoding (255 = no tint)."""
        xp = jnp if isinstance(self.tint, jax.Array) else np
        return xp.where(self.tint == TINT_NONE, xp.uint8(255), self.tint.astype(xp.uint8))


def rubix_grid_mask(px, py, platesize, numcells, cell_size, pad_size, xp):
    """True where the plate pixel lies on the rubix grid *lines* (untinted).

    Transcribes ``set_lensmap_grid`` (``fisheye.c:1922-1960``): the plate is
    divided into ``numcells`` blocks of ``cell_size`` units with
    ``pad_size`` units of padding; a pixel is on the grid when its unit
    coordinate falls in the padding band along either axis.
    """
    block_size = pad_size + cell_size
    num_units = numcells * block_size + pad_size
    # C computes this in IEEE doubles: `f_rubixgrid 0 0 0` divides by zero
    # to inf (-> no grid lines) rather than crashing, and so must we.
    # errstate only affects the NumPy backend; num_units stays an xp value
    # because it is a traced dynamic arg on the jit path.  Without
    # jax_enable_x64 (the chip: no f64) the f64 request would truncate
    # to the same f32 anyway while printing a UserWarning in every TPU
    # process — ask for f32 explicitly there; the x64 CPU test mesh and
    # the NumPy host path keep the C's double arithmetic.
    if xp is np:
        grid_dtype = np.float64
    else:
        import jax

        grid_dtype = xp.float64 if jax.config.jax_enable_x64 else xp.float32
    with np.errstate(divide="ignore", invalid="ignore"):
        unit_size_px = xp.asarray(platesize, dtype=grid_dtype) / xp.asarray(
            num_units, dtype=grid_dtype)
        ux = px / unit_size_px
        uy = py / unit_size_px
        return (xp.fmod(ux, block_size) < pad_size) | (
            xp.fmod(uy, block_size) < pad_size)


def inverse_grid(lens, globe, scale, width_px, height_px, platesize,
                 numcells, cell_size, pad_size, xp, dtype,
                 view_basis=None, row_range=None):
    """See :func:`_inverse_grid_impl`.  On the NumPy backend the lens
    math deliberately rides IEEE nan/inf (the Lua VM's C operators never
    trap — ``fisheye.c`` masks invalid pixels afterwards), so suppress
    NumPy's RuntimeWarnings for the duration instead of making every
    library consumer ``np.seterr``."""
    if xp is np:
        with np.errstate(all="ignore"):
            return _inverse_grid_impl(
                lens, globe, scale, width_px, height_px, platesize,
                numcells, cell_size, pad_size, xp, dtype,
                view_basis=view_basis, row_range=row_range)
    return _inverse_grid_impl(
        lens, globe, scale, width_px, height_px, platesize,
        numcells, cell_size, pad_size, xp, dtype,
        view_basis=view_basis, row_range=row_range)


def lens_ray_grid(lens, scale, width_px, height_px, xp, dtype,
                  row_range=None):
    """The pose-invariant half of the inverse build: pixel grid ->
    pre-rotation camera-frame ray.

    Per pixel (``resume_lensmap_inverse``, ``fisheye.c:2084-2124``):
    screen -> lens plane (note the C integer division ``width_px/2``),
    then ``lens_inverse`` -> unnormalized camera-frame ray + validity.
    This is the only stage that touches lens math — the reference's own
    pose/lensmap decoupling (a view rotation never rebuilds the lensmap,
    ``fisheye.c:750,2427-2450`` vs ``2346-2397``) holds here too: the
    returned ray grid depends only on (lens, zoom scale, size), so pose
    playback can rotate + re-resolve these rays per frame with no lens
    math at all (:mod:`blinky_tpu.kernels.static_ray`).

    Returns ``(vx, vy, vz, lens_valid)`` with ``lens_valid`` broadcast to
    the grid shape (ray components keep whatever broadcast shape the lens
    emitted — consumers that store them call ``broadcast_to``).
    """
    half_w = width_px // 2  # C int division, fisheye.c:2105
    half_h = height_px // 2  # fisheye.c:2100
    scale = xp.asarray(scale, dtype=dtype)

    r0, r1 = (0, height_px) if row_range is None else row_range
    lx = xp.arange(width_px, dtype=xp.int32)
    ly = xp.arange(r0, r1, dtype=xp.int32)
    x = ((lx - half_w).astype(dtype) * scale)[None, :]
    y = (-(ly - half_h).astype(dtype) * scale)[:, None]
    shape = (r1 - r0, width_px)
    X = xp.broadcast_to(x, shape)
    Y = xp.broadcast_to(y, shape)

    vx, vy, vz, lens_valid = lens.inverse(X, Y)
    lens_valid = xp.broadcast_to(xp.asarray(lens_valid), shape)
    return vx, vy, vz, lens_valid


def rays_to_lensmap(globe, vx, vy, vz, lens_valid, platesize,
                    numcells, cell_size, pad_size, xp, dtype,
                    view_basis=None):
    """The lens-independent half of the inverse build: camera-frame rays
    -> gather table.

    Rotate (optional ``view_basis``) -> f32 normalize (``fisheye.c:1562``)
    -> plate by max-dot or custom resolver -> plate uv -> truncated pixel
    coords with bounds rejection (``fisheye.c:1963-1992``) -> tint via
    the rubix grid.  Identical for all lenses — the per-pose path of the
    static-ray posed pipeline is exactly this function.

    ``view_basis``: optional (forward, right, up) 3-vectors rotating the
    view within *recorded* plates — the framework's analog of the
    reference re-rendering plates with a composed camera basis
    (``F_RenderView``, ``fisheye.c:750,777-792``).  With live rendering
    the rotation happens upstream; with recorded cubemaps it composes
    into the lensmap ray: ``ray' = rx*right + ry*up + rz*forward``.
    """
    S = platesize
    if view_basis is not None:
        # rotate the camera-frame ray into the recording frame (same
        # composition as the per-plate basis mix, fisheye.c:777-792),
        # in the lens math's double domain before the f32 boundary
        fwd_v, rgt_v, up_v = (xp.asarray(v, dtype=dtype) for v in view_basis)
        vx, vy, vz = (
            vx * rgt_v[0] + vy * up_v[0] + vz * fwd_v[0],
            vx * rgt_v[1] + vy * up_v[1] + vz * fwd_v[1],
            vx * rgt_v[2] + vy * up_v[2] + vz * fwd_v[2],
        )

    # The reference stores the lens ray and the plate frames as vec_t =
    # float32 while the lens math is double (LUAtoC_lens_inverse,
    # fisheye.c:1545-1565; struct plates, fisheye.c:354-358) — emulate that
    # boundary exactly.  On the f32 TPU path the casts are no-ops and the
    # double-rounded sqrt degrades to a single f32 rounding (the builder is
    # tolerance-tested against the f64 oracle there).
    f32 = xp.float32
    sqrt_dt = xp.float64 if dtype == xp.float64 else f32
    vx32, vy32, vz32 = geometry.normalize_c(
        xp.asarray(vx).astype(f32), xp.asarray(vy).astype(f32),
        xp.asarray(vz).astype(f32), xp, f32, sqrt_dt,
    )

    # Plate selection + plate-frame dots WITHOUT per-pixel [., 3] gathers:
    # a vector gather pads catastrophically under TPU (8,128) tiling (a
    # 3-wide minor axis costs 42x memory — OOMs the pose-batched vmap,
    # kernels/posed.py).  With <= 6 plates, an unrolled strict-> running
    # max (``ray_to_plate_index``'s first-max-wins scan, fisheye.c:2043)
    # and where-chains stay elementwise and fully fusable, with identical
    # float32 arithmetic (DotProduct order, fisheye.c:2052-2058).
    import math

    fwd = np.asarray(globe.forward)
    rgt = np.asarray(globe.right)
    up = np.asarray(globe.up)
    n = globe.numplates

    def dot3(vecs, k):  # f32 DotProduct with plate k's stored vec_t frame
        return vx32 * vecs[k, 0] + vy32 * vecs[k, 1] + vz32 * vecs[k, 2]

    dF = [dot3(fwd, k) for k in range(n)]

    if globe.plate_resolver is not None:
        # the Lua resolver computes in double on the promoted f32 ray
        # (LUAtoC_globe_plate, fisheye.c:1634-1656)
        plate = globe.plate_resolver(
            vx32.astype(dtype), vy32.astype(dtype), vz32.astype(dtype), globe
        )
        plate = xp.asarray(plate).astype(xp.int32)
        pc = xp.clip(plate, 0, n - 1)
    else:
        best = dF[0]
        pc = xp.zeros_like(best, dtype=xp.int32)
        for k in range(1, n):
            m_k = dF[k] > best  # strict >: first maximum wins; NaN keeps 0
            best = xp.where(m_k, dF[k], best)
            pc = xp.where(m_k, xp.int32(k), pc)
        plate = pc

    # frame dots of the selected plate (ray_to_plate_uv, fisheye.c:2052-2058)
    rz32 = dF[0]
    rx32 = dot3(rgt, 0)
    ry32 = dot3(up, 0)
    for k in range(1, n):
        sel = pc == k
        rz32 = xp.where(sel, dF[k], rz32)
        rx32 = xp.where(sel, dot3(rgt, k), rx32)
        ry32 = xp.where(sel, dot3(up, k), ry32)

    # dist recomputed in double from the f32-stored fov (fisheye.c:2060);
    # per plate it is a scalar — host libm keeps the f64 path bit-exact
    dists = [0.5 / math.tan(float(globe.fov_rad[k]) / 2) for k in range(n)]
    dist = xp.asarray(dists[0], dtype=dtype)
    for k in range(1, n):
        dist = xp.where(pc == k, xp.asarray(dists[k], dtype=dtype), dist)

    from blinky_tpu import xmath as m

    rx = rx32.astype(dtype)
    ry = ry32.astype(dtype)
    rz = rz32.astype(dtype)
    u = m.safe_div(rx, rz) * dist + 0.5
    v = m.safe_div(-ry, rz) * dist + 0.5
    uv_valid = (rz != 0) & (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1)

    u = xp.where(uv_valid, u, 0.0)
    v = xp.where(uv_valid, v, 0.0)
    px = (u * S).astype(xp.int32)  # C truncation cast, fisheye.c:1988
    py = (v * S).astype(xp.int32)
    in_bounds = (px >= 0) & (px < S) & (py >= 0) & (py < S)  # fisheye.c:1971

    valid = lens_valid & (plate >= 0) & uv_valid & in_bounds

    ongrid = rubix_grid_mask(px, py, S, numcells, cell_size, pad_size, xp)
    tint = xp.where(valid & ~ongrid, pc, TINT_NONE).astype(xp.uint8)

    flat_idx = xp.where(valid, pc * (S * S) + py * S + px, 0).astype(xp.int32)
    plate_out = xp.where(valid, pc, -1).astype(xp.int32)

    used = (
        (xp.arange(MAX_PLATES, dtype=xp.int32)[:, None, None] == plate_out[None])
        & valid[None]
    ).any(axis=(1, 2))

    return dict(
        plate=plate_out,
        px=xp.where(valid, px, 0).astype(xp.int32),
        py=xp.where(valid, py, 0).astype(xp.int32),
        valid=valid,
        tint=tint,
        flat_idx=flat_idx,
        plates_used=used,
    )


def _inverse_grid_impl(
    lens: LensDef,
    globe: Globe,
    scale,
    width_px: int,
    height_px: int,
    platesize: int,
    numcells,
    cell_size,
    pad_size,
    xp,
    dtype,
    view_basis=None,
    row_range=None,
):
    """The full inverse-path lensmap computation over the pixel grid:
    :func:`lens_ray_grid` (lens math) then :func:`rays_to_lensmap`
    (rotation + plate resolve + uv + tint) — split exactly at the
    ``view_basis`` rotation so the static-ray posed pipeline
    (:mod:`blinky_tpu.kernels.static_ray`) reuses the second half
    verbatim.

    ``row_range=(r0, r1)`` computes only screen rows ``r0..r1`` (the
    resumable-build cursor, ``fisheye.c:306-322``): every per-pixel
    quantity is elementwise in the pixel's absolute coordinates, so a
    row block is bit-identical to the same rows of a full build
    (``plates_used`` then covers just the block — callers OR blocks
    together).
    """
    vx, vy, vz, lens_valid = lens_ray_grid(
        lens, scale, width_px, height_px, xp, dtype, row_range=row_range)
    return rays_to_lensmap(
        globe, vx, vy, vz, lens_valid, platesize,
        numcells, cell_size, pad_size, xp, dtype, view_basis=view_basis)


@functools.lru_cache(maxsize=64)
def _compiled_inverse_builder(lens, globe, width_px, height_px, platesize, dtype):
    """Compile (once per lens/globe/shape) a builder taking the dynamic
    zoom scale and rubix parameters — so f_fov sweeps and f_rubixgrid
    changes reuse the compiled executable."""

    def build(scale, numcells, cell_size, pad_size, view_basis):
        return inverse_grid(
            lens,
            globe,
            scale,
            width_px,
            height_px,
            platesize,
            numcells,
            cell_size,
            pad_size,
            jnp,
            dtype,
            view_basis=view_basis,
        )

    return jax.jit(build)


def device_builder_warm(lens, globe, width_px, height_px, platesize,
                        dtype=None) -> bool:
    """True once the jitted inverse builder for this (lens, globe, shape)
    has EXECUTED in this process — i.e. a device build now costs ms, not
    a cold jit compile (seconds to minutes for solver-loop lenses through
    the axon relay).  Consumers (Session's time-sliced preview) use this
    to avoid blocking an interactive path on a first compile."""
    if platesize is None:
        platesize = min(width_px, height_px)
    fn = _compiled_inverse_builder(
        lens, globe, width_px, height_px, platesize, dtype or jnp.float32
    )
    return getattr(fn, "_executed", False)


def build_lensmap(
    lens: LensDef,
    globe: Globe,
    scale: float,
    width_px: int,
    height_px: int,
    platesize: Optional[int] = None,
    numcells: int = 10,
    cell_size: float = 4.0,
    pad_size: float = 1.0,
    backend: str = "jax",
    dtype=None,
    view_basis=None,
) -> LensMap:
    """Build the lensmap for the resolved map type of *lens*.

    ``platesize`` defaults to ``min(width_px, height_px)``
    (``fisheye.c:707``).  ``backend``: "jax" (jitted, default) or "numpy"
    (host float64).  Forward-only lenses rasterize on the host — a
    per-lens-switch cost, as in the reference where forward mapping is the
    slow path (``lenses/README.md`` Mapping section).

    ``view_basis``: optional (forward, right, up) camera basis rotating
    the view within recorded plates (see :func:`inverse_grid`); a dynamic
    jit argument, so pose changes never recompile.
    """
    if platesize is None:
        platesize = min(width_px, height_px)
    if lens.map_type == "forward":
        from blinky_tpu.lensmap.forward_raster import build_forward

        return build_forward(
            lens, globe, scale, width_px, height_px, platesize,
            numcells, cell_size, pad_size, view_basis=view_basis,
        )
    if backend != "numpy" and not (getattr(lens, "jittable", True)
                                   and getattr(globe, "jittable", True)):
        # a .lua lens/globe whose map or plate resolver cannot trace
        # (load-time probes, lua_bridge.load_lua_lens/globe) builds on
        # the exact host path — same routing Session applies, enforced
        # here so the library API cannot trace a scalar-only script by
        # accident
        backend = "numpy"
    if backend == "numpy":
        out = inverse_grid(
            lens, globe, np.float64(scale), width_px, height_px, platesize,
            numcells, cell_size, pad_size, np, np.float64,
            view_basis=None if view_basis is None else tuple(
                np.asarray(v, dtype=np.float64) for v in view_basis
            ),
        )
    else:
        dtype = dtype or jnp.float32
        if view_basis is None:
            # identity basis keeps one compiled executable for both cases
            view_basis = (np.array([0.0, 0.0, 1.0]), np.array([1.0, 0.0, 0.0]),
                          np.array([0.0, 1.0, 0.0]))
        fn = _compiled_inverse_builder(
            lens, globe, width_px, height_px, platesize, dtype
        )
        out = fn(
            jnp.asarray(scale, dtype=dtype),
            jnp.asarray(numcells, dtype=dtype),
            jnp.asarray(cell_size, dtype=dtype),
            jnp.asarray(pad_size, dtype=dtype),
            tuple(jnp.asarray(v, dtype=dtype) for v in view_basis),
        )
        fn._executed = True  # compile paid: device_builder_warm now True
    return LensMap(
        width_px=width_px,
        height_px=height_px,
        platesize=platesize,
        numplates=globe.numplates,
        scale=float(scale),
        **out,
    )
