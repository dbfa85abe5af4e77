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


# every forward-only lens shipped (10 of 31; lenses/README.md "Mapping")
FORWARD_ONLY = ["eckert1", "eckert5", "sinusoidal", "winkel1", "winkel2",
                "kavrayskiy7", "wagner6", "larrivee", "gins8", "polyconic"]


def _fwd_zoom(name):
    # polyconic declares no lens bounds; its onload is f_fov 360
    return Zoom("fov", 360) if name == "polyconic" else Zoom("contain")


@pytest.mark.parametrize("name", FORWARD_ONLY)
def test_forward_lens_builds(name, cube_globe):
    lens = lenses.get(name, cube_globe)
    assert lens.map_type == "forward"
    scale = calc_scale(_fwd_zoom(name), lens, W, H)
    lm = build_lensmap(lens, cube_globe, scale, W, H)
    v = np.asarray(lm.valid)
    assert v.sum() > 0.25 * v.size, name
    assert np.asarray(lm.plates_used).sum() >= 4, name
    px, py = np.asarray(lm.px), np.asarray(lm.py)
    S = lm.platesize
    assert ((px >= 0) & (px < S) & (py >= 0) & (py < S)).all()
    # tint invariant: a tint byte is a plate index or TINT_NONE, and only
    # written pixels carry one.  (It may be an EARLIER overlapping write's
    # plate — set_lensmap_grid only writes for off-grid texels,
    # fisheye.c:1955-1958 — so it need not equal the final plate.)
    from blinky_tpu.lensmap.builder import TINT_NONE

    tint = np.asarray(lm.tint)
    assert ((tint == TINT_NONE) | (tint < cube_globe.numplates)).all()
    assert (tint[~v] == TINT_NONE).all()


@pytest.mark.parametrize("name", FORWARD_ONLY)
@pytest.mark.parametrize("use_native", [True, False], ids=["native", "python"])
def test_forward_is_deterministic_and_native_matches(name, cube_globe, use_native):
    """Two builds agree, and the native rasterizer equals the pure-Python
    transcription for every forward-only lens (both are pinned to the
    compiled reference C for a subset in tests/test_c_reference.py)."""
    from blinky_tpu.lensmap.forward_raster import build_forward

    lens = lenses.get(name, cube_globe)
    scale = calc_scale(_fwd_zoom(name), lens, W, H)
    a = build_forward(lens, cube_globe, scale, W, H, min(W, H), use_native=use_native)
    b = build_forward(lens, cube_globe, scale, W, H, min(W, H), use_native=use_native)
    assert np.array_equal(np.asarray(a.flat_idx), np.asarray(b.flat_idx))
    if use_native:
        c = build_forward(lens, cube_globe, scale, W, H, min(W, H), use_native=False)
        np.testing.assert_array_equal(np.asarray(a.flat_idx), np.asarray(c.flat_idx))
        np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(c.valid))
        np.testing.assert_array_equal(np.asarray(a.tint), np.asarray(c.tint))


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
