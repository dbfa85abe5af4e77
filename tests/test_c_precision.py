"""The C mixed-precision boundary (vec_t = float32, lens math = double).

SURVEY.md lists this as a parity hard part: the reference stores rays and
plate frames in float32 (``vec3_t``), normalizes in float32 with a
double->float32 truncated sqrt, computes plate dots in float32 promoted to
double, while the Lua lens math and the uv projection run in double.
These tests pin the emulation to those exact semantics.
"""

import math

import numpy as np

from blinky_tpu import geometry, globes


def test_plate_frames_are_float32():
    for name in globes.names():
        g = globes.get(name)
        for a in (g.forward, g.right, g.up, g.fov_rad, g.dist):
            assert a.dtype == np.float32, (name, a.dtype)


def test_normalize_c_matches_scalar_c_semantics():
    rng = np.random.default_rng(0)
    v = rng.standard_normal((100, 3))
    x, y, z = geometry.normalize_c(
        v[:, 0].astype(np.float32), v[:, 1].astype(np.float32),
        v[:, 2].astype(np.float32), np, np.float32, np.float64,
    )
    for i in range(100):
        a = np.float32(v[i, 0]); b = np.float32(v[i, 1]); c = np.float32(v[i, 2])
        sumsq = a * a + b * b + c * c               # f32 left-to-right
        length = np.float32(math.sqrt(np.float64(sumsq)))  # double sqrt -> f32
        il = np.float32(1.0) / length
        assert x[i] == a * il and y[i] == b * il and z[i] == c * il


def test_normalize_c_zero_ray_unchanged():
    x, y, z = geometry.normalize_c(
        np.zeros(1, np.float32), np.zeros(1, np.float32), np.zeros(1, np.float32),
        np, np.float32, np.float64,
    )
    assert x[0] == 0 and y[0] == 0 and z[0] == 0


def test_sqrt_double_rounding_is_innocuous():
    """C computes ``sqrt`` in double and truncates to float32
    (mathlib.c:417); direct float32 sqrt gives the identical result for
    every float32 input — double rounding of a correctly-rounded sqrt
    cannot differ when the wide format has p2 >= 2*p1 + 2 significand bits
    (53 >= 2*24 + 2).  Pin that equivalence so the two formulations stay
    interchangeable in the builders."""
    bits = np.arange(0x3F000000, 0x3F000000 + 4_000_000, dtype=np.uint32)
    vals = bits.view(np.float32)
    direct = np.sqrt(vals)
    via_double = np.sqrt(vals.astype(np.float64)).astype(np.float32)
    np.testing.assert_array_equal(direct, via_double)


def test_zoom_probe_ray_is_f32_truncated():
    """calc_zoom passes the probe ray through a vec3_t (fisheye.c:1316)."""
    from blinky_tpu import lenses
    from blinky_tpu.lensmap import Zoom, calc_scale

    g = globes.get("cube")
    lens = lenses.get("stereographic", g)
    scale = calc_scale(Zoom("fov", 123), lens, 640, 480)
    fovr = 123 * math.pi / 180
    ray = tuple(
        float(np.float32(c)) for c in geometry.latlon_to_ray(0.0, fovr * 0.5)
    )
    x, _, _ = lens.forward(*ray)
    assert scale == float(x) / (640 * 0.5)


def test_latlon_to_ray_f32_matches_builtin_truncation():
    lat, lon = 0.3, 2.9
    exact = geometry.latlon_to_ray(lat, lon)
    trunc = geometry.latlon_to_ray_f32(lat, lon)
    for e, t in zip(exact, trunc):
        assert t == np.float64(np.float32(e))
