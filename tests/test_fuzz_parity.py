"""Randomized parity: the vectorized builder vs the scalar oracle on
random globes and zooms.

The fixed-config suites (tests/test_lensmap_parity.py, the compiled-C
pins in tests/test_c_reference.py) cover the shipped globes; this fuzzes
the globe space — random plate counts, frames and fovs — and requires the
float64 builder to stay bit-exact against the per-pixel oracle, including
plate-selection tie-breaks and bounds edges that only odd geometries hit.
"""

import numpy as np
import pytest

from blinky_tpu import globes, lenses
from blinky_tpu.globes import make_globe
from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale
from blinky_tpu.parity.oracle import oracle_inverse_lensmap, oracle_remap

W, H = 48, 36

LENS_ZOOMS = [
    ("panini", Zoom("fov", 140)),
    ("stereographic", Zoom("fov", 220)),
    ("fisheye1", Zoom("contain")),
    ("equirect", Zoom("contain")),
    ("hammer", Zoom("vfov", 120)),
]


def random_globe(rng, numplates):
    """A plausible random globe: unit-ish forward vectors (not axis-aligned),
    non-parallel ups, fovs in (25, 170) degrees."""
    plates = []
    for _ in range(numplates):
        f = rng.normal(size=3)
        f /= np.linalg.norm(f)
        u = rng.normal(size=3)
        # keep up non-parallel to forward (the loader orthogonalizes)
        while abs(np.dot(u / np.linalg.norm(u), f)) > 0.95:
            u = rng.normal(size=3)
        fov = float(rng.uniform(25, 170))
        plates.append((tuple(f), tuple(u), fov))
    return make_globe(f"fuzz{numplates}", plates)


@pytest.mark.parametrize("seed", range(6))
def test_random_globes_builder_matches_oracle(seed):
    rng = np.random.default_rng(100 + seed)
    numplates = int(rng.integers(1, 7))
    g = random_globe(rng, numplates)
    lens_name, zoom = LENS_ZOOMS[seed % len(LENS_ZOOMS)]
    lens = lenses.get(lens_name, g)
    scale = calc_scale(zoom, lens, W, H)
    # randomized rubix geometry exercises the tint/fmod path too
    numcells = int(rng.integers(2, 12))
    cell = float(rng.uniform(1, 6))
    pad = float(rng.uniform(0.3, 2))

    lm = build_lensmap(lens, g, scale, W, H, min(W, H), numcells=numcells,
                       cell_size=cell, pad_size=pad, backend="numpy")
    o = oracle_inverse_lensmap(lens, g, scale, W, H, min(W, H),
                               numcells=numcells, cell_size=cell, pad_size=pad)
    np.testing.assert_array_equal(lm.valid, o["valid"])
    np.testing.assert_array_equal(lm.flat_idx, o["flat_idx"])
    np.testing.assert_array_equal(lm.plate, np.where(o["valid"], o["plate"], -1))
    np.testing.assert_array_equal(lm.tint, o["tint"])
    np.testing.assert_array_equal(lm.plates_used, o["plates_used"])


def test_random_view_bases_builder_matches_oracle_composition():
    """view_basis composes into the ray before the f32 boundary; fuzz a few
    random orthonormal bases and check the rotated build equals an oracle
    run on a globe whose plates were pre-rotated the same way."""
    rng = np.random.default_rng(7)
    g = globes.get("cube")
    lens = lenses.get("panini", g)
    scale = calc_scale(Zoom("fov", 160), lens, W, H)
    for _ in range(3):
        from blinky_tpu.camera import view_basis_from_angles

        p, y, r = rng.uniform(-80, 80), rng.uniform(0, 360), rng.uniform(-45, 45)
        basis = view_basis_from_angles(p, y, r)
        lm = build_lensmap(lens, g, scale, W, H, min(W, H), backend="numpy",
                           view_basis=basis)
        # oracle equivalent: wrap the lens inverse with the same rotation
        fwd_v, rgt_v, up_v = (np.asarray(v, np.float64) for v in basis)

        class RotLens:
            map_type = lens.map_type
            forward = lens.forward

            @staticmethod
            def inverse(x, y_):
                vx, vy, vz, ok = lens.inverse(x, y_)
                return (
                    vx * rgt_v[0] + vy * up_v[0] + vz * fwd_v[0],
                    vx * rgt_v[1] + vy * up_v[1] + vz * fwd_v[1],
                    vx * rgt_v[2] + vy * up_v[2] + vz * fwd_v[2],
                    ok,
                )

        o = oracle_inverse_lensmap(RotLens, g, scale, W, H, min(W, H))
        np.testing.assert_array_equal(lm.valid, o["valid"])
        np.testing.assert_array_equal(lm.flat_idx, o["flat_idx"])


def test_random_frames_remap_matches_oracle():
    rng = np.random.default_rng(11)
    g = random_globe(rng, 5)
    lens = lenses.get("stereographic", g)
    scale = calc_scale(Zoom("fov", 200), lens, W, H)
    S = min(W, H)
    lm = build_lensmap(lens, g, scale, W, H, S, backend="numpy")
    from blinky_tpu.kernels.remap import RemapKernel
    from blinky_tpu.palette import create_palmap, default_palette

    pal = default_palette()
    frames = rng.integers(0, 256, (6, S, S), np.uint8)
    bg = rng.integers(0, 256, (H, W), np.uint8)
    k = RemapKernel(lm, pal, background=bg)
    got = np.asarray(k(frames, rubix=True))
    exp = oracle_remap(
        dict(valid=lm.valid, plate=lm.plate, px=lm.px, py=lm.py, tint=lm.tint),
        frames, bg, rubix_enabled=True, palmap=create_palmap(pal),
    )
    np.testing.assert_array_equal(got, exp)
