"""Per-lens semantic tests: metadata, roundtrips, known values, nil bounds."""

import numpy as np
import pytest

from blinky_tpu import geometry, globes, lenses

# Expected metadata per game/lua-scripts/lenses/*.lua (SURVEY.md §2.3).
EXPECTED = {
    "rectilinear": dict(map_type="inverse", max_fov=180, max_vfov=180, onload="f_fov 110"),
    "panini": dict(map_type="inverse", max_fov=360, max_vfov=180, onload="f_fov 180"),
    "stereographic": dict(map_type="inverse", max_fov=360, max_vfov=360, onload="f_fov 180"),
    "fisheye1": dict(map_type="inverse", max_fov=360, max_vfov=360, onload="f_contain"),
    "fisheye2": dict(map_type="inverse", max_fov=360, max_vfov=360, onload="f_contain"),
    "cylinder": dict(map_type="inverse", max_fov=360, max_vfov=180, onload="f_cover"),
    "mercator": dict(map_type="inverse", onload="f_cover"),
    "miller": dict(map_type="inverse", onload="f_contain"),
    "equirect": dict(map_type="inverse", onload="f_contain"),
    "hammer": dict(map_type="inverse", onload="f_contain"),
    "mollweide": dict(map_type="inverse", onload="f_contain"),
    "eckert4": dict(map_type="inverse", onload="f_contain"),
    "eckert1": dict(map_type="forward", onload="f_contain"),
    "eckert5": dict(map_type="forward", onload="f_contain"),
    "sinusoidal": dict(map_type="forward", onload="f_contain"),
    "winkel1": dict(map_type="forward", onload="f_contain"),
    "winkel2": dict(map_type="forward", onload="f_contain"),
    "winkeltripel": dict(map_type="inverse", onload="f_contain"),
    "kavrayskiy7": dict(map_type="forward", onload="f_contain"),
    "wagner6": dict(map_type="forward", onload="f_contain"),
    "larrivee": dict(map_type="forward", onload="f_contain"),
    "gins8": dict(map_type="forward", onload="f_contain"),
    "fahey": dict(map_type="inverse", onload="f_contain"),
    "gallstereo": dict(map_type="inverse", onload="f_contain"),
    "polyconic": dict(map_type="forward", onload="f_fov 360"),
    "vandergrinten": dict(map_type="inverse", onload="f_contain"),
    "gumby": dict(map_type="inverse", onload="f_contain"),
    "quincuncial": dict(map_type="inverse", onload="f_contain"),
    "cube": dict(map_type="inverse", max_fov=360, max_vfov=180, onload="f_contain"),
    "cubestereo": dict(map_type="inverse", max_fov=270, max_vfov=270, onload="f_fov 180"),
    "debug": dict(map_type="inverse", onload="f_contain"),
}


def test_all_builtin_lenses_listed():
    assert set(lenses.names()) == set(EXPECTED)


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_lens_metadata(name, cube_globe):
    lens = lenses.get(name, cube_globe)
    for k, v in EXPECTED[name].items():
        assert getattr(lens, k) == v, (name, k)


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_forward_inverse_roundtrip(name, cube_globe):
    """For lenses with both maps: inverse(forward(ray)) ~= ray on rays
    well inside the lens FOV."""
    lens = lenses.get(name, cube_globe)
    if lens.forward is None or lens.inverse is None or name == "cube":
        # cube's forward is a face unwrap "only to be used for FOV"
        # (cube.lua:72) and is not the inverse's inverse on the seams.
        pytest.skip("needs both exact maps")
    rng = np.random.default_rng(7)
    half = min(lens.max_fov or 360, 170) * np.pi / 360
    lat = rng.uniform(-half / 2, half / 2, 300)
    lon = rng.uniform(-half, half, 300)
    x, y, z = geometry.latlon_to_ray(lat, lon)
    px, py, okf = lens.forward(x, y, z)
    okf = np.broadcast_to(np.asarray(okf), lat.shape)
    rx, ry, rz, oki = lens.inverse(np.asarray(px, float), np.asarray(py, float))
    oki = np.broadcast_to(np.asarray(oki), lat.shape)
    rx, ry, rz = geometry.normalize(rx, ry, rz)
    good = okf & oki
    assert good.mean() > 0.95, name
    err = np.max(np.abs(np.stack([rx - x, ry - y, rz - z]))[:, good])
    # mollweide's Newton exit is the Lua script's *signed* `dt < 0.001`
    # (mollweide.lua:16) — negative latitudes exit after one step, so its
    # forward map is intentionally imprecise there (parity-preserved).
    tol = 0.05 if name == "mollweide" else 1e-4
    assert err < tol, (name, err)


def test_equirect_known_values(cube_globe):
    lens = lenses.get("equirect", cube_globe)
    lat, lon = 0.3, -1.1
    x, y, ok = lens.forward(*geometry.latlon_to_ray(lat, lon))
    # lens_forward sees the ray through the C's vec3_t float32 boundary
    # (CtoLUA_ray_to_latlon, fisheye.c:1506-1519) -> ~1e-8 recovery error
    assert abs(x - lon) < 1e-6 and abs(y - lat) < 1e-6


def test_fisheye1_nil_outside_pi(cube_globe):
    lens = lenses.get("fisheye1", cube_globe)
    _, _, _, ok = lens.inverse(np.array([3.2]), np.array([0.0]))
    assert not ok[0]
    _, _, _, ok = lens.inverse(np.array([3.1]), np.array([0.0]))
    assert ok[0]


def test_hammer_ellipse_bound(cube_globe):
    lens = lenses.get("hammer", cube_globe)
    _, _, _, ok = lens.inverse(np.array([2 * np.sqrt(2) + 0.01]), np.array([0.0]))
    assert not ok[0]


def test_quincuncial_full_sphere_coverage(cube_globe):
    """Every direction must be reachable: inverse over the square should
    produce rays covering all 6 cube faces (it is a full-360 lens)."""
    lens = lenses.get("quincuncial", cube_globe)
    s = np.sqrt(2) * 0.999
    g = np.linspace(-s, s, 101)
    X, Y = np.meshgrid(g, g)
    rx, ry, rz, ok = lens.inverse(X, Y)
    rx, ry, rz = geometry.normalize(rx, ry, rz)
    idx = geometry.ray_to_plate_index(rx, ry, rz, cube_globe.forward)
    assert ok.mean() > 0.99
    assert set(np.unique(idx[ok])) == set(range(6))


def test_debug_lens_layout_depends_on_globe():
    for gname, w, h in [("cube", 3, 2), ("trism", 3, 2), ("tetra", 2, 2), ("fast", 2, 1)]:
        g = globes.get(gname)
        lens = lenses.get("debug", g)
        assert (lens.width, lens.height) == (w, h), gname


def test_mollweide_newton_converges(cube_globe):
    lens = lenses.get("mollweide", cube_globe)
    lat = np.linspace(-1.5, 1.5, 11)
    lon = np.zeros_like(lat)
    x, y, ok = lens.forward(*geometry.latlon_to_ray(lat, lon))
    # equal-area: y = sqrt(2) sin(theta) with theta + sin theta = pi sin lat
    assert np.all(np.isfinite(np.asarray(x))) and np.all(np.isfinite(np.asarray(y)))
    assert np.all(np.abs(np.asarray(y)) <= np.sqrt(2) + 1e-9)


def test_vandergrinten_pole_and_equator(cube_globe):
    lens = lenses.get("vandergrinten", cube_globe)
    x, y, ok = lens.forward(*geometry.latlon_to_ray(0.0, 1.0))
    # float32 vec3_t boundary on the input ray (see test_equirect_known_values)
    assert abs(float(x) - 1.0) < 1e-6 and abs(float(y)) < 1e-6
    x, y, ok = lens.forward(*geometry.latlon_to_ray(np.pi / 2, 0.0))
    assert abs(float(x)) < 1e-9 and abs(float(y) - np.pi) < 1e-6


def test_user_lens_module(tmp_path, cube_globe):
    p = tmp_path / "mylens.py"
    p.write_text(
        "def make(ctx):\n"
        "    def lens_forward(x, y, z):\n"
        "        return x, y, True\n"
        "    return dict(lens_forward=lens_forward, max_fov=90, max_vfov=90,\n"
        "                onload='f_cover', lens_width=2.0, lens_height=2.0)\n"
    )
    lens = lenses.load_lens_module(p, cube_globe)
    assert lens.name == "mylens" and lens.map_type == "forward" and lens.width == 2.0


def test_quincuncial_ellipj_scan_matches_unrolled():
    """The traced ellipj rolls the descending Landen recurrence into
    lax.scan (the 8-deep unrolled asin/sin chain sent XLA's algebraic
    simplifier into a near-fixpoint spiral: 131 s cold TPU compile,
    bench_all_r4.json config 2).  Contract: the scan is BIT-EQUAL to the
    unrolled form — identical per-iteration arithmetic, constants rounded
    once to the working dtype, at f32 and f64."""
    import jax
    import jax.numpy as jnp

    from blinky_tpu.lenses import quincuncial as q

    def unrolled(u):
        # the pre-round-5 traced form: Python-float constants, weak-typed
        n = len(q._A)
        phi = q._TWON * q._A[n - 1] * u
        b = phi
        for k in range(n - 1, 0, -1):
            b = phi
            t = q._C[k] * jnp.sin(b) / q._A[k]
            phi = 0.5 * (jnp.arcsin(t) + phi)
        t = jnp.cos(phi)
        return jnp.sin(phi), t, t / jnp.cos(phi - b), phi

    rng = np.random.RandomState(7)
    vals = rng.uniform(-2 * q._KE, 2 * q._KE, (64, 48))
    for dt in (jnp.float32, jnp.float64):
        u = jnp.asarray(vals, dt)
        # eager: the op-for-op sequences are identical -> bit-equal
        got = q._ellipj(u)
        exp = unrolled(u)
        for g_, e_ in zip(got, exp):
            assert g_.dtype == e_.dtype == dt
            assert np.array_equal(np.asarray(g_), np.asarray(e_))
        # jitted: XLA may fold the unrolled form's per-step constant
        # divide into a multiply (x/const -> x*(1/const)) which the scan's
        # dynamic divide keeps — separate executables agree to 1-2 ulp
        got_j = jax.jit(q._ellipj)(u)
        eps = float(jnp.finfo(dt).eps)
        for g_, e_ in zip(got_j, exp):
            np.testing.assert_allclose(np.asarray(g_), np.asarray(e_),
                                       rtol=4 * eps, atol=4 * eps)
    # and the NumPy path still runs the f64 libm loop (parity oracle)
    host = q._ellipj(np.asarray(vals))
    tr = q._ellipj(jnp.asarray(vals, jnp.float64))
    for h_, t_ in zip(host, tr):
        np.testing.assert_allclose(np.asarray(t_), h_, rtol=0, atol=1e-12)
