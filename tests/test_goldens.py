"""Frozen golden-fixture regression tests.

The oracle-vs-builder parity tests share the lens formulas, so a refactor
could drift both together; these fixtures (tests/goldens/*.npz, produced
by tests/goldens/generate.py from the line-audited round-1 build) pin the
lensmap tables and warped/rubix screens byte-exactly.  If a change breaks
these on purpose, re-audit against the reference and regenerate.
"""

from pathlib import Path

import numpy as np
import pytest

GOLDENS = sorted(Path(__file__).parent.glob("goldens/*.npz"))

FIELDS = ("plate", "px", "py", "valid", "tint", "flat_idx", "plates_used")


def _parse(path):
    lens_name, globe_name, zoomspec = path.stem.split("__")
    ztype = zoomspec.rstrip("0123456789")
    fov = int(zoomspec[len(ztype):] or 0)
    return lens_name, globe_name, ztype, fov


@pytest.mark.parametrize("path", GOLDENS, ids=lambda p: p.stem)
def test_golden(path):
    from blinky_tpu import globes, lenses
    from blinky_tpu.io.cubemap import synthetic_cubemap
    from blinky_tpu.kernels.remap import RemapKernel, expand_frames_tinted
    from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale
    from blinky_tpu.palette import default_palette

    lens_name, globe_name, ztype, fov = _parse(path)
    with np.load(path) as z:
        gold = {k: z[k] for k in z.files}

    g = globes.get(globe_name)
    lens = lenses.get(lens_name, g)
    scale = calc_scale(Zoom(ztype, fov), lens, 64, 48)
    assert scale == float(gold["scale"]), "zoom scale drifted"
    lm = build_lensmap(lens, g, scale, 64, 48, 48, backend="numpy").to_numpy()
    for f in FIELDS:
        np.testing.assert_array_equal(np.asarray(getattr(lm, f)), gold[f], err_msg=f)

    pal = default_palette()
    kernel = RemapKernel(lm, pal)
    frames = synthetic_cubemap(48)
    np.testing.assert_array_equal(np.asarray(kernel(frames)), gold["screen"])
    np.testing.assert_array_equal(
        np.asarray(kernel(expand_frames_tinted(frames, pal), rubix=True)),
        gold["rubix"],
    )


def test_goldens_exist():
    assert len(GOLDENS) >= 8
