"""Lenses: forward/inverse map projections melding plates into one image.

A lens is what the reference loads from ``game/lua-scripts/lenses/*.lua``
(loader: ``LUA_load_lens``, ``engine/NQ/fisheye.c:1659-1749``).  The Lua
contract (``fisheye.c:230-260`` and ``lenses/README.md``):

* ``lens_forward(x, y, z) -> (x, y)`` — globe ray to lens plane;
* ``lens_inverse(x, y) -> (x, y, z)`` — lens plane to globe ray;
* either may return ``nil`` meaning "no pixel" — reproduced here as an
  explicit ``valid`` boolean array returned alongside the values;
* ``lens_width`` / ``lens_height`` — lens-plane extents for f_cover /
  f_contain fitting (0 = unspecified);
* ``max_fov`` / ``max_vfov`` — FOV zoom limits (0 = unspecified);
* ``map`` — optional preference string overriding the default
  inverse-over-forward choice (``fisheye.c:1711-1731``);
* ``onload`` — console command executed on lens switch
  (``fisheye.c:1087-1102``), e.g. ``"f_fov 180"``.

Each lens lives in its own module defining ``make(ctx) -> dict`` with the
Lua-contract names.  ``make`` runs per (lens, globe) load — the analog of
re-executing the Lua script — because lens metadata may depend on the globe
(``numplates``; see ``lenses/debug.py`` and ``fisheye.c:734-737``).  The
returned mapping functions are dtype-generic array functions (see
:mod:`blinky_tpu.xmath`) traced by the jitted lensmap builder and evaluated
in float64 by the parity oracle.

Conventions:
* ``lens_inverse(x, y) -> (vx, vy, vz, valid)``;
* ``lens_forward(x, y, z) -> (px, py, valid)``;
* total functions may return ``True`` for ``valid`` (broadcast later);
* division follows raw IEEE like the Lua interpreter — NaN/Inf propagate
  and are discarded downstream by validity checks, exactly as in the
  reference (e.g. the unmapped dead-center pixel of r=0 azimuthal lenses).
"""

from __future__ import annotations

import dataclasses
import importlib
import importlib.util
from pathlib import Path
from types import SimpleNamespace
from typing import Callable, Optional

BUILTIN_LENSES = [
    "cube",
    "cubestereo",
    "cylinder",
    "debug",
    "eckert1",
    "eckert4",
    "eckert5",
    "equirect",
    "fahey",
    "fisheye1",
    "fisheye2",
    "gallstereo",
    "gins8",
    "gumby",
    "hammer",
    "kavrayskiy7",
    "larrivee",
    "mercator",
    "miller",
    "mollweide",
    "panini",
    "polyconic",
    "quincuncial",
    "rectilinear",
    "sinusoidal",
    "stereographic",
    "vandergrinten",
    "wagner6",
    "winkel1",
    "winkel2",
    "winkeltripel",
]


@dataclasses.dataclass(frozen=True, eq=False)  # identity hash: used as jit cache key
class LensDef:
    """A loaded lens: resolved mapping functions + metadata."""

    name: str
    forward: Optional[Callable]  # (x, y, z) -> (px, py, valid)
    inverse: Optional[Callable]  # (x, y) -> (vx, vy, vz, valid)
    map_type: str  # "inverse" | "forward"
    width: float  # lens-plane width, 0 = unspecified
    height: float
    max_fov: int
    max_vfov: int
    onload: Optional[str]
    # False for lenses whose map functions cannot be traced by jax (e.g.
    # .lua drop-ins interpreted scalar-by-scalar); such lenses run on the
    # exact f64 host builder only.
    jittable: bool = True
    # resource-release hook (``.lua`` lenses: unwinds coroutine threads a
    # script parked in its scalar interpreters — see load_lua_lens).
    # Call only when discarding the LensDef for good; None for ports.
    release: Optional[Callable] = None


def resolve(name: str, spec: dict) -> LensDef:
    """Apply the loader's map-type resolution (``fisheye.c:1683-1731``):
    prefer inverse when both exist, honor an explicit ``map`` preference."""
    inverse = spec.get("lens_inverse")
    forward = spec.get("lens_forward")
    if inverse is not None:
        map_type = "inverse"
    elif forward is not None:
        map_type = "forward"
    else:
        raise ValueError(f"lens '{name}': no inverse or forward map provided")
    pref = spec.get("map")
    if pref is not None:
        if pref == "lens_inverse" and inverse is not None:
            map_type = "inverse"
        elif pref == "lens_forward" and forward is not None:
            map_type = "forward"
        else:
            raise ValueError(f"lens '{name}': unsupported map preference {pref!r}")
    return LensDef(
        name=name,
        forward=forward,
        inverse=inverse,
        map_type=map_type,
        width=float(spec.get("lens_width", 0) or 0),
        height=float(spec.get("lens_height", 0) or 0),
        max_fov=int(spec.get("max_fov", 0) or 0),
        max_vfov=int(spec.get("max_vfov", 0) or 0),
        onload=spec.get("onload"),
        jittable=bool(spec.get("jittable", True)),
        release=spec.get("release"),
    )


def make_context(globe) -> SimpleNamespace:
    """The host-provided symbols a lens script may use
    (``fisheye.c:254-260``): ``numplates``, ``latlon_to_ray``,
    ``ray_to_latlon`` and a vectorized ``plate_to_ray(i, u, v)`` bound to
    the current globe."""
    from blinky_tpu import geometry
    from blinky_tpu import xmath as m

    def plate_to_ray(i, u, v):
        # CtoLUA_plate_to_ray (fisheye.c:1521-1538): goes through the
        # float32 plate_uv_to_ray, Lua receives the f32-valued components.
        import numpy as np

        xp = m.xp(i, u, v)
        f32 = xp.float32
        # key the sqrt precision on the trace dtype, like builder.py does
        dt = getattr(u, "dtype", np.dtype(np.float64))
        f64 = xp.float64 if dt == np.float64 else f32
        fwd = xp.asarray(globe.forward)[i]
        rgt = xp.asarray(globe.right)[i]
        up = xp.asarray(globe.up)[i]
        dist = xp.asarray(globe.dist)[i]
        return geometry.plate_uv_to_ray_c(u, v, fwd, rgt, up, dist, xp, f32, f64)

    return SimpleNamespace(
        numplates=globe.numplates,
        latlon_to_ray=geometry.latlon_to_ray,
        ray_to_latlon=geometry.ray_to_latlon,
        plate_to_ray=plate_to_ray,
    )


def names() -> list:
    """Built-in lens names (the ``f_lens <tab>`` completion set, reference
    ``fisheye.c:1106-1118``)."""
    return list(BUILTIN_LENSES)


def get(name: str, globe=None) -> LensDef:
    """Load a built-in lens for the given globe (re-evaluating metadata per
    globe, as the reference reloads the Lua script — ``fisheye.c:734-737``)."""
    if name not in BUILTIN_LENSES:
        raise KeyError(f"unknown lens '{name}' (have: {', '.join(BUILTIN_LENSES)})")
    mod = importlib.import_module(f"blinky_tpu.lenses.{name}")
    ctx = make_context(globe) if globe is not None else None
    return resolve(name, mod.make(ctx))


def load_lens_module(path, globe=None) -> LensDef:
    """Load a user lens from a script: a Python module defining
    ``make(ctx)``, or an actual reference-format ``.lua`` script
    (``LUA_load_lens``, ``fisheye.c:1659-1750`` — see
    :mod:`blinky_tpu.lua_bridge`)."""
    path = Path(path)
    if path.suffix.lower() == ".lua":
        from blinky_tpu.lua_bridge import load_lua_lens

        return load_lua_lens(path, globe)
    spec = importlib.util.spec_from_file_location(f"blinky_lens_{path.stem}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    ctx = make_context(globe) if globe is not None else None
    return resolve(path.stem, mod.make(ctx))
