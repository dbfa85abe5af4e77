"""Regenerate the frozen golden fixtures.

The parity tests are self-consistent (oracle and builders share the lens
formulas), so a future refactor could drift both together.  These files
freeze the audited round-1 behavior at the byte level: lensmap fields and
warped/rubix screens for representative (lens, globe, zoom) configs.

Run from the repo root AFTER verifying a change is intentionally
behavior-altering:

    python tests/goldens/generate.py
"""

from pathlib import Path

import numpy as np

from blinky_tpu import globes, lenses
from blinky_tpu.io.cubemap import synthetic_cubemap
from blinky_tpu.kernels.remap import RemapKernel, expand_frames_tinted
from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale
from blinky_tpu.palette import default_palette

W, H, S = 64, 48, 48

CONFIGS = [
    ("panini", "cube", Zoom("fov", 180)),
    ("stereographic", "cube", Zoom("fov", 300)),
    ("quincuncial", "cube", Zoom("contain")),
    ("winkeltripel", "cube", Zoom("contain")),
    ("hammer", "fast", Zoom("contain")),
    ("fisheye1", "tetra", Zoom("contain")),
    ("eckert1", "cube", Zoom("contain")),   # forward rasterizer path
    ("cube", "cube_edge", Zoom("contain")),
]


def build_one(lens_name, globe_name, zoom):
    g = globes.get(globe_name)
    lens = lenses.get(lens_name, g)
    scale = calc_scale(zoom, lens, W, H)
    lm = build_lensmap(lens, g, scale, W, H, S, backend="numpy").to_numpy()
    pal = default_palette()
    kernel = RemapKernel(lm, pal)
    frames = synthetic_cubemap(S)
    screen = np.asarray(kernel(frames))
    rubix = np.asarray(kernel(expand_frames_tinted(frames, pal), rubix=True))
    return dict(
        scale=np.float64(scale),
        plate=lm.plate, px=lm.px, py=lm.py,
        valid=lm.valid, tint=lm.tint, flat_idx=lm.flat_idx,
        plates_used=lm.plates_used,
        screen=screen, rubix=rubix,
    )


def main():
    outdir = Path(__file__).parent
    for lens_name, globe_name, zoom in CONFIGS:
        arrs = build_one(lens_name, globe_name, zoom)
        path = outdir / f"{lens_name}__{globe_name}__{zoom.type}{zoom.fov or ''}.npz"
        np.savez_compressed(path, **arrs)
        print(f"wrote {path.name}")


if __name__ == "__main__":
    main()
