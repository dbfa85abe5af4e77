"""Spherical / plate-frame geometry.

Transcribes the pure coordinate converters of the reference
(``engine/NQ/fisheye.c:1184-1214`` and ``fisheye.c:2023-2066``) as
vectorized, dtype-generic array functions.  Rays are passed as component
triples ``(x, y, z)`` so the same code broadcasts over pixel grids under
jax tracing and over NumPy float64 in the parity oracle.

Coordinate system (camera frame; reference header comment ``fisheye.c:48-60``):
``+X`` right, ``+Y`` up, ``+Z`` forward.  Latitude is degrees-up toward +Y,
longitude degrees-right toward +X.
"""

from __future__ import annotations

from blinky_tpu import xmath as m


def latlon_to_ray(lat, lon):
    """Spherical (radians) -> unit direction. Reference: ``fisheye.c:1184-1190``."""
    clat = m.cos(lat)
    return m.sin(lon) * clat, m.sin(lat), m.cos(lon) * clat


def ray_to_latlon(x, y, z):
    """Direction -> spherical (radians). Reference: ``fisheye.c:1192-1196``."""
    lon = m.atan2(x, z)
    lat = m.atan2(y, m.sqrt(x * x + z * z))
    return lat, lon


def normalize(x, y, z):
    """Normalize a ray, leaving zero-length rays untouched.

    Mirrors ``VectorNormalize`` (``engine/common/mathlib.c:413-429``): the
    zero-length branch returns the vector unchanged.
    """
    length = m.sqrt(x * x + y * y + z * z)
    inv = m.where(length != 0, 1.0 / m.where(length != 0, length, 1.0), 1.0)
    return x * inv, y * inv, z * inv


def plate_frames(forward, up):
    """Re-orthogonalize plate bases exactly as the globe loader does.

    ``right = up x forward; up = forward x right`` with **no** normalization
    (``fisheye.c:1849-1850``); unit-length inputs (all shipped globes) yield
    orthonormal frames.

    Args:
        forward, up: arrays [..., 3].
    Returns:
        (forward, right, up) arrays [..., 3].
    """
    x = m.xp(forward, up)
    right = x.cross(up, forward)
    up2 = x.cross(forward, right)
    return forward, right, up2


def plate_dist(fov_rad):
    """Pinhole plane distance for a plate fov: ``0.5 / tan(fov/2)``
    (``fisheye.c:1868``)."""
    return 0.5 / m.tan(fov_rad / 2)


def ray_to_plate_index(x, y, z, plate_forward):
    """Closest plate by maximum dot product, first index wins ties.

    Reference ``fisheye.c:2023-2050`` scans plates with a strict ``>``
    comparison, so the earliest plate wins on ties; ``argmax`` (first
    occurrence of the maximum) reproduces that.

    Args:
        x, y, z: ray components, any broadcastable shape [...].
        plate_forward: [n, 3] plate forward vectors.
    Returns:
        int32 plate index array [...].
    """
    xp_ = m.xp(x, y, z, plate_forward)
    dots = (
        x[..., None] * plate_forward[:, 0]
        + y[..., None] * plate_forward[:, 1]
        + z[..., None] * plate_forward[:, 2]
    )
    return xp_.argmax(dots, axis=-1).astype(xp_.int32)


def ray_to_plate_uv(x, y, z, p_forward, p_right, p_up, p_fov_rad):
    """Project a ray onto one plate's image plane.

    Reference ``fisheye.c:2052-2066``: dot the ray with the plate frame,
    recompute ``dist = 0.5/tan(fov/2)`` (the reference recomputes it here in
    double rather than reusing the stored value), then
    ``u = x/z*dist + 0.5``, ``v = -y/z*dist + 0.5``; valid iff both are in
    the **closed** interval [0, 1].

    Args:
        x, y, z: ray components [...].
        p_forward, p_right, p_up: per-element plate frames [..., 3]
            (pre-gathered for the selected plate).
        p_fov_rad: per-element plate fov [...].
    Returns:
        (u, v, valid).
    """
    rx = p_right[..., 0] * x + p_right[..., 1] * y + p_right[..., 2] * z
    ry = p_up[..., 0] * x + p_up[..., 1] * y + p_up[..., 2] * z
    rz = p_forward[..., 0] * x + p_forward[..., 1] * y + p_forward[..., 2] * z

    dist = 0.5 / m.tan(p_fov_rad / 2)
    u = m.safe_div(rx, rz) * dist + 0.5
    v = m.safe_div(-ry, rz) * dist + 0.5
    valid = (rz != 0) & (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1)
    return u, v, valid


def plate_uv_to_ray(u, v, p_forward, p_right, p_up, p_dist):
    """Plate texture uv -> unit ray.

    Reference ``fisheye.c:1198-1214``: recenters uv, flips v, combines the
    **stored** plate dist with the frame vectors, then normalizes.

    Args:
        u, v: [...] in [0, 1].
        p_forward, p_right, p_up: [..., 3] plate frames (broadcast or
            pre-gathered).
        p_dist: [...] plate plane distances.
    Returns:
        (x, y, z) unit ray components.
    """
    uu = u - 0.5
    vv = -(v - 0.5)
    x = p_dist * p_forward[..., 0] + uu * p_right[..., 0] + vv * p_up[..., 0]
    y = p_dist * p_forward[..., 1] + uu * p_right[..., 1] + vv * p_up[..., 1]
    z = p_dist * p_forward[..., 2] + uu * p_right[..., 2] + vv * p_up[..., 2]
    return normalize(x, y, z)
