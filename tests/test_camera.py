"""Camera pose math: AngleVectors transcription + plate basis composition."""

import math

import numpy as np

from blinky_tpu import globes
from blinky_tpu.camera import angle_vectors, plate_world_basis


def test_angle_vectors_cardinal_directions():
    # AngleVectors (mathlib.c:311-341): yaw rotates forward in the XY
    # plane, pitch dips it toward -Z.
    f, r, u = angle_vectors(0.0, 0.0, 0.0)
    np.testing.assert_allclose(f, [1, 0, 0], atol=1e-15)
    np.testing.assert_allclose(r, [0, -1, 0], atol=1e-15)
    np.testing.assert_allclose(u, [0, 0, 1], atol=1e-15)
    f, _, _ = angle_vectors(0.0, 90.0, 0.0)
    np.testing.assert_allclose(f, [0, 1, 0], atol=1e-15)
    f, _, _ = angle_vectors(90.0, 0.0, 0.0)  # pitch down in Quake angles
    np.testing.assert_allclose(f, [0, 0, -1], atol=1e-15)


def test_angle_vectors_matches_c_formula():
    rng = np.random.default_rng(0)
    for pitch, yaw, roll in rng.uniform(-180, 180, (20, 3)):
        f, r, u = angle_vectors(pitch, yaw, roll)
        d2r = math.pi / 180
        sy, cy = math.sin(yaw * d2r), math.cos(yaw * d2r)
        sp, cp = math.sin(pitch * d2r), math.cos(pitch * d2r)
        sr, cr = math.sin(roll * d2r), math.cos(roll * d2r)
        np.testing.assert_allclose(f, [cp * cy, cp * sy, -sp], rtol=1e-12)
        np.testing.assert_allclose(
            r, [-sr * sp * cy + cr * sy, -sr * sp * sy - cr * cy, -sr * cp],
            rtol=1e-12, atol=1e-12,
        )
        np.testing.assert_allclose(
            u, [cr * sp * cy + sr * sy, cr * sp * sy - sr * cy, cr * cp],
            rtol=1e-12, atol=1e-12,
        )


def test_plate_world_basis_identity_camera():
    """With the camera basis equal to the world axes used by the plate
    frames, the composition returns the plate vectors themselves
    (fisheye.c:777-792: world = px*right + py*up + pz*forward)."""
    g = globes.get("cube")
    f, r, u = plate_world_basis(
        g, np.array([0.0, 0, 1]), np.array([1.0, 0, 0]), np.array([0.0, 1, 0])
    )
    np.testing.assert_allclose(f, g.forward, atol=1e-7)
    np.testing.assert_allclose(r, g.right, atol=1e-7)
    np.testing.assert_allclose(u, g.up, atol=1e-7)


def test_plate_world_basis_batched():
    g = globes.get("trism")
    fwd = np.tile([0.0, 0, 1], (4, 1))
    rgt = np.tile([1.0, 0, 0], (4, 1))
    up = np.tile([0.0, 1, 0], (4, 1))
    f, r, u = plate_world_basis(g, fwd, rgt, up)
    assert f.shape == (4, g.numplates, 3)
    np.testing.assert_allclose(f[2], g.forward, atol=1e-7)
