"""Lensmap: the per-screen-pixel gather table and its builders.

Reference: the lensmap is ``lens.pixels`` — a per-pixel *pointer* into the
globe pixel store plus a per-pixel tint index (``engine/NQ/fisheye.c:
379-451``).  TPU-natively it becomes index arrays: a flat int32 gather
index, a validity mask, and a compact tint plane, all static per
(lens, globe, zoom, size) and consumed by the remap kernel every frame.
"""

from blinky_tpu.lensmap.zoom import Zoom, ZoomError, calc_scale  # noqa: F401
from blinky_tpu.lensmap.builder import (  # noqa: F401
    LensMap,
    build_lensmap,
    device_builder_warm,
)
