"""Forward-path rasterizer tests.

The rasterizer is itself the transcription of resume_lensmap_forward (the
serial scatter is the definition of the output), so tests check invariants
and cross-validate against the inverse path where a lens has both maps.
"""

import numpy as np
import pytest

from blinky_tpu import globes, lenses
from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale

W, H = 96, 72


@pytest.mark.parametrize("name", ["sinusoidal", "winkel1", "eckert5", "kavrayskiy7"])
def test_forward_lens_builds(name, cube_globe):
    lens = lenses.get(name, cube_globe)
    scale = calc_scale(Zoom("contain"), lens, W, H)
    lm = build_lensmap(lens, cube_globe, scale, W, H)
    v = np.asarray(lm.valid)
    assert v.sum() > 0.25 * v.size, name
    assert np.asarray(lm.plates_used).sum() >= 4, name
    px, py = np.asarray(lm.px), np.asarray(lm.py)
    S = lm.platesize
    assert ((px >= 0) & (px < S) & (py >= 0) & (py < S)).all()


def test_forward_is_deterministic(cube_globe):
    lens = lenses.get("sinusoidal", cube_globe)
    scale = calc_scale(Zoom("contain"), lens, W, H)
    a = build_lensmap(lens, cube_globe, scale, W, H)
    b = build_lensmap(lens, cube_globe, scale, W, H)
    assert np.array_equal(np.asarray(a.flat_idx), np.asarray(b.flat_idx))


def test_forward_agrees_with_inverse_path(cube_globe):
    """equirect has exact forward and inverse maps: force the forward
    path and compare plate assignment with the inverse build — interior
    pixels must agree (edges/seams rasterize +-1 px)."""
    lens_inv = lenses.get("equirect", cube_globe)
    spec = __import__("blinky_tpu.lenses.equirect", fromlist=["make"]).make(None)
    spec["map"] = "lens_forward"
    from blinky_tpu.lenses import resolve

    lens_fwd = resolve("equirect", spec)
    assert lens_fwd.map_type == "forward"
    scale = calc_scale(Zoom("contain"), lens_inv, W, H)
    lm_i = build_lensmap(lens_inv, cube_globe, scale, W, H, backend="numpy")
    lm_f = build_lensmap(lens_fwd, cube_globe, scale, W, H)
    vi, vf = np.asarray(lm_i.valid), np.asarray(lm_f.valid)
    both = vi & vf
    assert both.sum() > 0.8 * vi.sum()
    pi, pf = np.asarray(lm_i.plate), np.asarray(lm_f.plate)
    agree = (pi[both] == pf[both]).mean()
    assert agree > 0.95, agree  # seam texels rasterize to the +-1 px neighbor
    # Where plates agree, the forward path's last-written texel must lie
    # within the texel-per-pixel density of the inverse-map texel (several
    # plate texels rasterize onto one screen pixel; last-writer-wins picks
    # one of them, as in the reference).
    same = both & (pi == pf)
    density = int(np.ceil(lm_i.platesize * scale / (np.pi / 2))) + 1
    dpx = np.abs(np.asarray(lm_i.px)[same] - np.asarray(lm_f.px)[same])
    dpy = np.abs(np.asarray(lm_i.py)[same] - np.asarray(lm_f.py)[same])
    assert np.percentile(dpx, 99) <= 2 * density and np.percentile(dpy, 99) <= 2 * density
