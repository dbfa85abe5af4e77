"""Panini (cylindrical stereographic, d = 1) — the default lens
(``fisheye.c:670``).

Reference: ``game/lua-scripts/lenses/panini.lua``.
"""

from blinky_tpu import xmath as m
from blinky_tpu.geometry import latlon_to_ray, ray_to_latlon

_D = 1.0


def panini_inverse_latlon(x, y, d=_D):
    """Shared by panini and gumby (``gumby.lua`` is panini scaled 0.75)."""
    k = x * x / ((d + 1) * (d + 1))
    dscr = k * k * d * d - (k + 1) * (k * d * d - 1)
    clon = (-k * d + m.sqrt(dscr)) / (k + 1)
    s = (d + 1) / (d + clon)
    lon = m.atan2(x, s * clon)
    lat = m.atan2(y, s)
    return lat, lon


def panini_forward_xy(lat, lon, d=_D):
    s = (d + 1) / (d + m.cos(lon))
    return s * m.sin(lon), s * m.tan(lat)


def make(ctx):
    def lens_inverse(x, y):
        lat, lon = panini_inverse_latlon(x, y)
        vx, vy, vz = latlon_to_ray(lat, lon)
        return vx, vy, vz, True

    def lens_forward(x, y, z):
        lat, lon = ray_to_latlon(x, y, z)
        px, py = panini_forward_xy(lat, lon)
        return px, py, True

    return dict(
        lens_inverse=lens_inverse,
        lens_forward=lens_forward,
        max_fov=360,
        max_vfov=180,
        onload="f_fov 180",
    )
