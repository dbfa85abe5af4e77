"""I/O: PCX codec, cubemap import/export, synthetic fixtures, frame batches."""

from blinky_tpu.io.pcx import encode_pcx, decode_pcx  # noqa: F401
from blinky_tpu.io.cubemap import (  # noqa: F401
    plate_ownership_mask,
    save_globe_pcx,
    load_globe_pcx,
    synthetic_cubemap,
    synthetic_cubemap_batch,
)
