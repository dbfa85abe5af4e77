"""Load the reference's actual ``.lua`` lens/globe scripts as drop-ins.

This is the framework's ``LUA_load_lens`` / ``LUA_load_globe``
(``engine/NQ/fisheye.c:1659-1875``): a script runs in a fresh
:mod:`blinky_tpu.minilua` environment with the host builtins the C
embeds (``init_lua``, ``fisheye.c:1222-1265``), and the resulting
globals become a :class:`blinky_tpu.lenses.LensDef` or a
:class:`blinky_tpu.globes.Globe`.

The builtins reproduce the C<->Lua boundary exactly:

* ``latlon_to_ray`` passes through a ``vec3_t`` — float32-truncated
  components (``CtoLUA_latlon_to_ray``, ``fisheye.c:1494-1505``);
* ``ray_to_latlon`` truncates its inputs to float32 and evaluates the
  sum of squares in float32 (``fisheye.c:1506-1519`` + the ``vec_t``
  arithmetic in ``ray_to_latlon``);
* ``plate_to_ray`` projects through the float32 ``plate_uv_to_ray`` and
  returns nil for an out-of-range plate (``fisheye.c:1521-1538``);
* lens functions returning nil mean "no pixel"
  (``LUAtoC_lens_inverse/forward``, ``fisheye.c:1545-1628``).

Interpretation is scalar (like the Lua VM); the lens functions are
vectorized with ``np.vectorize`` for the float64 host builder — the
``Session`` default static path — so a user's existing ``.lua`` script
renders end-to-end.  (The jitted f32 pose-playback builder cannot trace
a scalar interpreter; port hot lenses to a Python module for that.)
"""

from __future__ import annotations

import math
from pathlib import Path

import numpy as np

from blinky_tpu import geometry
from blinky_tpu.minilua import Interpreter, LuaError, LuaTable


def _scalar_latlon_to_ray(lat, lon):
    """CtoLUA_latlon_to_ray: double math through a vec3_t (f32)."""
    clat = math.cos(lat)
    return (
        float(np.float32(math.sin(lon) * clat)),
        float(np.float32(math.sin(lat))),
        float(np.float32(math.cos(lon) * clat)),
    )


def _scalar_ray_to_latlon(x, y, z):
    """CtoLUA_ray_to_latlon: f32 inputs, f32 sum of squares, double atan2."""
    x32, y32, z32 = np.float32(x), np.float32(y), np.float32(z)
    lon = math.atan2(float(x32), float(z32))
    lat = math.atan2(float(y32), math.sqrt(float(x32 * x32 + z32 * z32)))
    return lat, lon


def make_lua_builtins(globe=None) -> dict:
    """The host symbols a script sees (``fisheye.c:254-260,1258-1265``)."""

    def plate_to_ray(i, u, v):
        if globe is None:
            return None
        pi = int(i)
        if pi < 0 or pi >= globe.numplates:
            return None  # lua_pushnil, fisheye.c:1528-1531
        rx, ry, rz = geometry.plate_uv_to_ray_c(
            np.float64(u), np.float64(v),
            globe.forward[pi], globe.right[pi], globe.up[pi],
            globe.dist[pi], np, np.float32, np.float64,
        )
        return float(rx), float(ry), float(rz)

    out = dict(
        latlon_to_ray=_scalar_latlon_to_ray,
        ray_to_latlon=_scalar_ray_to_latlon,
        plate_to_ray=plate_to_ray,
    )
    if globe is not None:
        out["numplates"] = float(globe.numplates)
    return out


def _vectorize_inverse(luafn, interp):
    """Wrap a Lua ``lens_inverse`` into the array contract
    ``(x, y) -> (vx, vy, vz, valid)`` with the LUAtoC nil protocol."""

    def scalar(x, y):
        out = luafn(float(x), float(y))
        if out is None:
            return 0.0, 0.0, 0.0, False
        if not (isinstance(out, tuple) and len(out) == 3):
            raise LuaError("lens_inverse must return 3 numbers or nil")
        return float(out[0]), float(out[1]), float(out[2]), True

    vec = np.vectorize(scalar, otypes=[np.float64, np.float64, np.float64, bool])

    def inverse(x, y):
        vx, vy, vz, ok = vec(x, y)
        return vx, vy, vz, ok

    return inverse


def _vectorize_forward(luafn, interp):
    def scalar(x, y, z):
        out = luafn(float(x), float(y), float(z))
        if out is None:
            return 0.0, 0.0, False
        if not (isinstance(out, tuple) and len(out) == 2):
            raise LuaError("lens_forward must return 2 numbers or nil")
        return float(out[0]), float(out[1]), True

    vec = np.vectorize(scalar, otypes=[np.float64, np.float64, bool])

    def forward(x, y, z):
        px, py, ok = vec(x, y, z)
        return px, py, ok

    return forward


def load_lua_lens(path, globe=None):
    """Run a ``lenses/*.lua`` script and resolve it like ``LUA_load_lens``."""
    from blinky_tpu.lenses import resolve

    path = Path(path)
    interp = Interpreter(builtins=make_lua_builtins(globe))
    interp.run(path.read_text())

    spec = {}
    inv = interp.get_global("lens_inverse")
    fwd = interp.get_global("lens_forward")
    if inv is not None:
        spec["lens_inverse"] = _vectorize_inverse(inv, interp)
    if fwd is not None:
        spec["lens_forward"] = _vectorize_forward(fwd, interp)
    spec["jittable"] = False  # scalar interpreter: not jax-traceable
    for name in ("map", "onload"):
        v = interp.get_global(name)
        if v is not None:
            spec[name] = v
    for name in ("max_fov", "max_vfov", "lens_width", "lens_height"):
        v = interp.get_global(name)
        if isinstance(v, (int, float)):
            spec[name] = v
    return resolve(path.stem, spec)


def load_lua_globe(path):
    """Run a ``globes/*.lua`` script and build the Globe like
    ``LUA_load_globe`` (``fisheye.c:1752-1875``)."""
    from blinky_tpu.globes import make_globe

    path = Path(path)
    interp = Interpreter(builtins=make_lua_builtins(None))
    interp.run(path.read_text())

    plates_t = interp.get_global("plates")
    if not isinstance(plates_t, LuaTable):
        raise LuaError(f"globe script {path.name}: 'plates' table not found")
    plates = []
    for row in plates_t.array():
        if not isinstance(row, LuaTable):
            raise LuaError("plates entries must be {forward, up, fov} tables")
        fwd_t, up_t, fov = row.get(1), row.get(2), row.get(3)
        if not (isinstance(fwd_t, LuaTable) and isinstance(up_t, LuaTable)
                and isinstance(fov, (int, float))):
            raise LuaError("plate must be {{fx,fy,fz},{ux,uy,uz},fov}")
        plates.append((tuple(fwd_t.array()), tuple(up_t.array()), float(fov)))

    resolver = None
    gp = interp.get_global("globe_plate")
    if gp is not None:
        def scalar(x, y, z):
            out = gp(float(x), float(y), float(z))
            if out is None or isinstance(out, bool) or not isinstance(out, (int, float)):
                return -1  # non-number -> no plate (fisheye.c:1645-1649)
            return int(out)

        vec = np.vectorize(scalar, otypes=[np.int32])

        def resolver(x, y, z, globe):  # noqa: F811 - the exported resolver
            return vec(np.asarray(x, np.float64), np.asarray(y, np.float64),
                       np.asarray(z, np.float64))

    return make_globe(path.stem, plates, plate_resolver=resolver)
