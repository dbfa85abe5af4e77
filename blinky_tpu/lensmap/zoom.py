"""Zoom solvers: map a zoom request to the lens-plane scale (units/pixel).

Transcribes ``calc_zoom`` (``engine/NQ/fisheye.c:1293-1386``):

* ``fov`` / ``vfov``: forward-map the probe ray at (lat=0, lon=fov/2) or
  (lat=fov/2, lon=0) and flush the screen edge to it;
* ``cover`` / ``contain``: fit the declared lens_width/lens_height to the
  screen, choosing the larger/smaller fit by aspect comparison;
* every reference error path (missing forward map, missing bounds, fov over
  limit, non-positive scale) raises :class:`ZoomError` with the reference's
  console message, and the caller renders nothing — matching
  ``create_lensmap``'s early return (``fisheye.c:2376-2379``).
"""

from __future__ import annotations

import dataclasses
import math

from blinky_tpu.geometry import latlon_to_ray  # noqa: F401 (public solver surface)
from blinky_tpu.lenses import LensDef


class ZoomError(ValueError):
    """A zoom request the current lens cannot satisfy."""


@dataclasses.dataclass(frozen=True)
class Zoom:
    type: str  # "fov" | "vfov" | "cover" | "contain" | "none"
    fov: int = 0  # degrees; the reference stores an int (fisheye.c:460)

    def command(self) -> str:
        """The console command that reproduces this zoom, as persisted by
        ``F_WriteConfig`` (``fisheye.c:689-695``)."""
        if self.type == "fov":
            return f"f_fov {self.fov}"
        if self.type == "vfov":
            return f"f_vfov {self.fov}"
        if self.type in ("cover", "contain"):
            return f"f_{self.type}"
        return ""


def calc_scale(zoom: Zoom, lens: LensDef, width_px: int, height_px: int) -> float:
    if zoom.type in ("fov", "vfov"):
        if lens.max_fov <= 0 or lens.max_vfov <= 0:
            raise ZoomError('max_fov & max_vfov not specified, try "f_cover"')
        if zoom.type == "fov" and zoom.fov > lens.max_fov:
            raise ZoomError(f"fov must be less than {lens.max_fov}")
        if zoom.type == "vfov" and zoom.fov > lens.max_vfov:
            raise ZoomError(f"vfov must be less than {lens.max_vfov}")
        if lens.forward is None:
            raise ZoomError(
                "Please specify a forward mapping function in your script for FOV scaling"
            )
        fovr = zoom.fov * math.pi / 180
        # The probe ray passes through a vec3_t (float32) before the Lua
        # forward call (calc_zoom, fisheye.c:1316-1339) — truncate to
        # match.  Components are handed over as 0-d float64 ARRAYS, not
        # Python floats: the C forward math is IEEE (division by zero ->
        # inf, discarded by a where/validity pick), and the ports' eager
        # where-branches rely on that — a Python-float probe would raise
        # ZeroDivisionError on e.g. the cube lens's face chain at lat=0.
        import numpy as np

        def _f32ray(lat, lon):
            from blinky_tpu.geometry import latlon_to_ray_f32

            return tuple(np.float64(c) for c in latlon_to_ray_f32(lat, lon))

        with np.errstate(all="ignore"):
            if zoom.type == "fov":
                ray = _f32ray(0.0, fovr * 0.5)
                x, _, ok = lens.forward(*ray)
                if not bool(ok):
                    raise ZoomError(
                        "ray_to_xy did not return a valid r value for determining FOV scale"
                    )
                scale = float(x) / (width_px * 0.5)
            else:
                ray = _f32ray(fovr * 0.5, 0.0)
                _, y, ok = lens.forward(*ray)
                if not bool(ok):
                    raise ZoomError(
                        "ray_to_xy did not return a valid r value for determining FOV scale"
                    )
                scale = float(y) / (height_px * 0.5)
    elif zoom.type in ("cover", "contain"):
        fit_width_scale = lens.width / width_px
        fit_height_scale = lens.height / height_px
        width_provided = lens.width > 0
        height_provided = lens.height > 0
        if not width_provided and height_provided:
            scale = fit_height_scale
        elif width_provided and not height_provided:
            scale = fit_width_scale
        elif not width_provided and not height_provided:
            raise ZoomError(
                "neither lens_height nor lens_width are valid/specified.  Try f_fov instead."
            )
        else:
            lens_aspect = lens.width / lens.height
            screen_aspect = width_px / height_px
            lens_wider = lens_aspect > screen_aspect
            if zoom.type == "contain":
                scale = fit_width_scale if lens_wider else fit_height_scale
            else:
                scale = fit_height_scale if lens_wider else fit_width_scale
    else:
        scale = -1.0

    if scale <= 0:
        raise ZoomError(f"init returned a scale of {scale:f}, which is  <= 0")
    return scale
