"""Geometry unit tests: converters, frames, plate projections."""

import numpy as np
import pytest

from blinky_tpu import geometry, globes


def test_latlon_ray_roundtrip():
    rng = np.random.default_rng(0)
    lat = rng.uniform(-np.pi / 2 + 1e-6, np.pi / 2 - 1e-6, 1000)
    lon = rng.uniform(-np.pi, np.pi, 1000)
    x, y, z = geometry.latlon_to_ray(lat, lon)
    np.testing.assert_allclose(x * x + y * y + z * z, 1.0, atol=1e-12)
    lat2, lon2 = geometry.ray_to_latlon(x, y, z)
    np.testing.assert_allclose(lat2, lat, atol=1e-12)
    np.testing.assert_allclose(lon2, lon, atol=1e-12)


def test_normalize_zero_ray_unchanged():
    # mathlib.c:413 leaves zero-length vectors untouched
    x, y, z = geometry.normalize(np.array([0.0]), np.array([0.0]), np.array([0.0]))
    assert x[0] == 0 and y[0] == 0 and z[0] == 0


def test_plate_frames_orthogonal():
    for name in globes.names():
        g = globes.get(name)
        for i in range(g.numplates):
            # plate frames are vec_t float32 like the reference
            # (fisheye.c:354-356), so orthogonality holds to f32 eps
            f, r, u = g.forward[i], g.right[i], g.up[i]
            assert abs(np.dot(r, f)) < 1e-6, (name, i)
            assert abs(np.dot(u, f)) < 1e-6, (name, i)
            assert abs(np.dot(r, u)) < 1e-6, (name, i)


def test_plate_uv_ray_roundtrip(cube_globe):
    g = cube_globe
    rng = np.random.default_rng(1)
    u = rng.uniform(0.05, 0.95, 500)
    v = rng.uniform(0.05, 0.95, 500)
    for plate in range(6):
        x, y, z = geometry.plate_uv_to_ray(
            u, v, g.forward[plate], g.right[plate], g.up[plate], g.dist[plate]
        )
        idx = geometry.ray_to_plate_index(x, y, z, g.forward)
        assert (idx == plate).all()
        u2, v2, ok = geometry.ray_to_plate_uv(
            x, y, z,
            np.broadcast_to(g.forward[plate], (500, 3)),
            np.broadcast_to(g.right[plate], (500, 3)),
            np.broadcast_to(g.up[plate], (500, 3)),
            np.broadcast_to(g.fov_rad[plate], (500,)),
        )
        assert ok.all()
        # the roundtrip passes through float32 plate frames (vec_t)
        np.testing.assert_allclose(u2, u, atol=1e-6)
        np.testing.assert_allclose(v2, v, atol=1e-6)


def test_plate_index_tie_breaks_first(cube_globe):
    # A ray exactly on the front/right edge dots equally with both plates;
    # the strict > scan keeps the earlier index (fisheye.c:2043).
    s = 1 / np.sqrt(2)
    idx = geometry.ray_to_plate_index(
        np.array([s]), np.array([0.0]), np.array([s]), cube_globe.forward
    )
    assert idx[0] == 0  # front (index 0) beats right (index 1)


def test_globe_validation_errors():
    with pytest.raises(ValueError):
        globes.make_globe("bad", [((0, 0, 1), (0, 1, 0), 0)])  # fov must be > 0
    with pytest.raises(ValueError):
        globes.make_globe("bad", [])
    with pytest.raises(ValueError):
        globes.make_globe("bad", [((0, 0, 1), (0, 1, 0), 90)] * 7)  # > MAX_PLATES
