"""Per-frame compute kernels: the batched cubemap -> screen remap."""

from blinky_tpu.kernels.remap import RemapKernel, remap_frames  # noqa: F401
