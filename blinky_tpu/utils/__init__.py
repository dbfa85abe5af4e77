"""Utilities: timing/observability (the reference's *_speeds analogs)."""

from blinky_tpu.utils.timing import FrameClock, Timings  # noqa: F401
