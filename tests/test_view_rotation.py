"""View rotation within recorded cubemaps (setviewangles).

The reference rotates by re-rendering plates with a composed camera
basis (F_RenderView, fisheye.c:750,777-792); with recorded plates the
rotation composes into the lensmap rays instead.
"""

import numpy as np
import pytest

from blinky_tpu import globes, lenses
from blinky_tpu.api import Session
from blinky_tpu.camera import view_basis_from_angles
from blinky_tpu.io.cubemap import synthetic_cubemap
from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale


def test_basis_orthonormal_and_conventions():
    f, r, u = view_basis_from_angles(0, 0, 0)
    np.testing.assert_allclose(f, [0, 0, 1], atol=1e-15)
    np.testing.assert_allclose(r, [1, 0, 0], atol=1e-15)
    np.testing.assert_allclose(u, [0, 1, 0], atol=1e-15)
    f, r, u = view_basis_from_angles(0, 90, 0)  # look right -> +X
    np.testing.assert_allclose(f, [1, 0, 0], atol=1e-15)
    f, r, u = view_basis_from_angles(90, 0, 0)  # look up -> +Y
    np.testing.assert_allclose(f, [0, 1, 0], atol=1e-15)
    for ang in [(12, 34, 56), (-40, 200, -10)]:
        f, r, u = view_basis_from_angles(*ang)
        for a, b in [(f, r), (f, u), (r, u)]:
            assert abs(np.dot(a, b)) < 1e-12
        np.testing.assert_allclose(np.cross(r, f), -u, atol=1e-12)


def test_identity_rotation_is_noop():
    g = globes.get("cube")
    lens = lenses.get("panini", g)
    scale = calc_scale(Zoom("fov", 180), lens, 64, 48)
    ident = view_basis_from_angles(0, 0, 0)
    a = build_lensmap(lens, g, scale, 64, 48, backend="numpy")
    b = build_lensmap(lens, g, scale, 64, 48, backend="numpy", view_basis=ident)
    for f in ("plate", "px", "py", "valid", "tint", "flat_idx"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)), err_msg=f)


def test_yaw_90_looks_at_right_plate():
    """A rectilinear fov-90 view yawed 90 degrees must sample (almost)
    exclusively from the cube's right plate (+X, plate 1)."""
    s = Session(64, 64, backend="numpy")
    s.cmd("f_lens rectilinear; f_fov 90")
    s.cmd("setviewangles 0 90 0")
    lm = s.lensmap.to_numpy()
    plates = np.asarray(lm.plate)[np.asarray(lm.valid)]
    assert (plates == 1).mean() > 0.95
    # and the rendered view differs from the forward view
    frames = synthetic_cubemap(s.platesize)
    yawed = np.asarray(s.render(frames))
    s.cmd("setviewangles")
    front = np.asarray(s.render(frames))
    assert (yawed != front).any()
    fplates = s.lensmap.to_numpy()
    assert (np.asarray(fplates.plate)[np.asarray(fplates.valid)] == 0).mean() > 0.95


def test_rotation_on_forward_lens():
    """The forward rasterizer applies the inverse rotation to corner rays:
    yawing an equirect view shifts the image horizontally."""
    g = globes.get("cube")
    lens = lenses.get("sinusoidal", g)
    scale = calc_scale(Zoom("contain"), lens, 64, 48)
    plain = build_lensmap(lens, g, scale, 64, 48, backend="numpy")
    vb = view_basis_from_angles(0, 45, 0)
    yawed = build_lensmap(lens, g, scale, 64, 48, backend="numpy", view_basis=vb)
    assert (np.asarray(plain.flat_idx) != np.asarray(yawed.flat_idx)).any()
    # coverage is rotation-invariant for a full-sphere forward lens
    assert abs(int(np.asarray(plain.valid).sum()) -
               int(np.asarray(yawed.valid).sum())) < 64 * 48 * 0.05


def test_setviewangles_affects_plain_view():
    s = Session(64, 48, backend="numpy")
    frames = synthetic_cubemap(48)
    s.cmd("fisheye 0")
    a = np.asarray(s.render(frames))
    s.cmd("setviewangles 0 180 0")
    b = np.asarray(s.render(frames))
    assert (a != b).any()


def test_roll_matches_quake_sense():
    """Positive roll tilts up toward the right vector, like AngleVectors
    (mathlib.c: roll +10 at pitch=yaw=0 gives up = (0, -sin, cos) which
    leans toward Quake's right (0,-1,0))."""
    f, r, u = view_basis_from_angles(0, 0, 10)
    np.testing.assert_allclose(f, [0, 0, 1], atol=1e-15)
    # up leans toward +X (the right vector at yaw 0)
    assert u[0] > 0 and u[1] > 0.9
    # right leans away from up's old direction (rotation, not reflection)
    assert r[1] < 0 and r[0] > 0.9
    for a, b in [(f, r), (f, u), (r, u)]:
        assert abs(np.dot(a, b)) < 1e-12
