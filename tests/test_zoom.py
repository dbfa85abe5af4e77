"""Zoom solver tests against calc_zoom semantics (fisheye.c:1293-1386)."""

import math

import numpy as np
import pytest

from blinky_tpu import lenses
from blinky_tpu.lensmap import Zoom, ZoomError, calc_scale


def test_fov_scale_formula(cube_globe):
    # panini fov: x = forward(ray(0, fov/2)).x; scale = x / (W/2)
    lens = lenses.get("panini", cube_globe)
    fovr = math.radians(180)
    s = (1 + 1) / (1 + math.cos(fovr / 2)) * math.sin(fovr / 2)
    assert calc_scale(Zoom("fov", 180), lens, 640, 480) == pytest.approx(s / 320)


def test_vfov_scale(cube_globe):
    lens = lenses.get("panini", cube_globe)
    got = calc_scale(Zoom("vfov", 90), lens, 640, 480)
    # at lon=0: S=1, y = tan(lat)
    assert got == pytest.approx(math.tan(math.radians(45)) / 240)


def test_fov_over_max_errors(cube_globe):
    lens = lenses.get("rectilinear", cube_globe)
    with pytest.raises(ZoomError, match="less than 180"):
        calc_scale(Zoom("fov", 181), lens, 640, 480)


def test_fov_without_limits_errors(cube_globe):
    lens = lenses.get("quincuncial", cube_globe)
    with pytest.raises(ZoomError, match="max_fov & max_vfov"):
        calc_scale(Zoom("fov", 90), lens, 640, 480)


def test_contain_vs_cover(cube_globe):
    # equirect: width 2pi, height pi -> lens aspect 2; on a 4:3 screen the
    # lens is wider, so contain fits width and cover fits height.
    lens = lenses.get("equirect", cube_globe)
    contain = calc_scale(Zoom("contain"), lens, 640, 480)
    cover = calc_scale(Zoom("cover"), lens, 640, 480)
    assert contain == pytest.approx(2 * np.pi / 640)
    assert cover == pytest.approx(np.pi / 480)


def test_cover_with_only_width(cube_globe):
    # mercator declares only lens_width -> both cover/contain fit width
    lens = lenses.get("mercator", cube_globe)
    assert calc_scale(Zoom("cover"), lens, 640, 480) == pytest.approx(2 * np.pi / 640)
    assert calc_scale(Zoom("contain"), lens, 640, 480) == pytest.approx(2 * np.pi / 640)


def test_none_zoom_errors(cube_globe):
    lens = lenses.get("panini", cube_globe)
    with pytest.raises(ZoomError, match="scale"):
        calc_scale(Zoom("none"), lens, 640, 480)


def test_zoom_command_strings():
    assert Zoom("fov", 140).command() == "f_fov 140"
    assert Zoom("vfov", 90).command() == "f_vfov 90"
    assert Zoom("cover").command() == "f_cover"
    assert Zoom("contain").command() == "f_contain"
    assert Zoom("none").command() == ""
