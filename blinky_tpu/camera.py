"""Camera pose math: view angles -> basis, and plate world-frame bases.

The reference drives each plate render by composing the plate's
camera-relative frame with the player's view basis:
``AngleVectors(r_refdef.viewangles)`` (``engine/common/mathlib.c:311-341``)
then ``plate (x) camera`` (``engine/NQ/fisheye.c:750,777-792``).  Our frame
sources are recorded plates, but pose streams still ride along in demo
containers so a renderer-side producer can reproduce the exact plate
cameras.
"""

from __future__ import annotations

import numpy as np

from blinky_tpu import xmath as m


def angle_vectors(pitch, yaw, roll):
    """Quake view angles (degrees) -> (forward, right, up) world basis.

    Transcribes ``AngleVectors`` (``engine/common/mathlib.c:311-341``)
    including its sign conventions.  Vectorized over leading dimensions;
    returns arrays [..., 3].
    """
    xp = m.xp(pitch, yaw, roll)
    d2r = m.pi / 180
    sy, cy = m.sin(yaw * d2r), m.cos(yaw * d2r)
    sp, cp = m.sin(pitch * d2r), m.cos(pitch * d2r)
    sr, cr = m.sin(roll * d2r), m.cos(roll * d2r)

    forward = xp.stack([cp * cy, cp * sy, -sp], axis=-1)
    right = xp.stack(
        [
            -sr * sp * cy + cr * sy,
            -sr * sp * sy - cr * cy,
            -sr * cp,
        ],
        axis=-1,
    )
    up = xp.stack(
        [
            cr * sp * cy + sr * sy,
            cr * sp * sy - sr * cy,
            cr * cp,
        ],
        axis=-1,
    )
    return forward, right, up


def view_basis_from_angles(pitch, yaw, roll):
    """(pitch, yaw, roll) degrees -> (forward, right, up) in the fisheye
    camera convention (+X right, +Y up, +Z forward; ``fisheye.c:48-60``).

    Used to rotate the view within *recorded* cubemaps (the reference
    rotates by re-rendering plates with Quake's own ``AngleVectors``
    world convention — :func:`angle_vectors` — which does not apply to
    plates recorded in the camera frame).  Positive yaw looks right
    (toward +X), positive pitch looks up (+Y), and positive roll tilts
    the up vector toward the right vector — the same roll sense as
    Quake's ``AngleVectors`` (``mathlib.c:311-341``).
    """
    d2r = np.pi / 180
    sp, cp = np.sin(pitch * d2r), np.cos(pitch * d2r)
    sy, cy = np.sin(yaw * d2r), np.cos(yaw * d2r)
    sr, cr = np.sin(roll * d2r), np.cos(roll * d2r)
    forward = np.array([sy * cp, sp, cy * cp])
    right0 = np.array([cy, 0.0, -sy])
    up0 = np.cross(forward, right0)
    up0 /= np.linalg.norm(up0)
    right0 = np.cross(up0, forward)
    right = cr * right0 - sr * up0
    up = cr * up0 + sr * right0
    return forward, right, up


def plate_world_basis(globe, forward, right, up):
    """World-frame (forward, right, up) for every plate of *globe* given a
    camera basis.

    Transcribes the per-plate composition in ``F_RenderView``
    (``fisheye.c:777-792``): each plate vector's components weight the
    camera's (right, up, forward) axes.

    Args:
        globe: a :class:`blinky_tpu.globes.Globe`.
        forward, right, up: camera basis, arrays [..., 3].
    Returns:
        (f, r, u): arrays [..., numplates, 3].
    """
    cam = np.stack([np.asarray(right), np.asarray(up), np.asarray(forward)], axis=-2)

    def mix(plate_vecs):  # [n, 3] x [..., 3, 3] -> [..., n, 3]
        return np.einsum("nc,...cw->...nw", plate_vecs, cam)

    return mix(globe.forward), mix(globe.right), mix(globe.up)
