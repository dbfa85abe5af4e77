"""Lua drop-in compatibility (VERDICT round 1, Missing #2).

Loads the reference's ACTUAL ``.lua`` scripts (``game/lua-scripts/``)
through the mini-Lua interpreter (``blinky_tpu/minilua.py`` +
``lua_bridge.py``) and machine-checks, for every shipped script, that it
numerically agrees with its hand-ported Python module over dense grids —
turning round 1's eyeball-audited ports into verified ones, and restoring
the user-scripting surface (``LUA_load_lens``/``LUA_load_globe``,
``fisheye.c:1659-1875``).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from blinky_tpu import geometry, globes, lenses
from blinky_tpu.lua_bridge import load_lua_globe, load_lua_lens

LUA_DIR = Path("/root/reference/game/lua-scripts")
LENS_LUA = sorted(p.stem for p in (LUA_DIR / "lenses").glob("*.lua"))
GLOBE_LUA = sorted(p.stem for p in (LUA_DIR / "globes").glob("*.lua"))


@pytest.fixture(scope="module")
def cube():
    return globes.get("cube")


def _forward_grid():
    """Rays as the zoom probe / forward builder produce them: through the
    float32 vec3_t boundary."""
    lat = np.linspace(-np.pi / 2 * 0.999, np.pi / 2 * 0.999, 41)
    lon = np.linspace(-np.pi * 0.999, np.pi * 0.999, 43)
    LAT, LON = np.meshgrid(lat, lon, indexing="ij")
    x, y, z = geometry.latlon_to_ray_f32(LAT, LON)
    return np.asarray(x), np.asarray(y), np.asarray(z)


def _inverse_grid(lens):
    w = lens.width if lens.width > 0 else 6.5
    h = lens.height if lens.height > 0 else 6.5
    xs = np.linspace(-w / 2 * 1.05, w / 2 * 1.05, 41)
    ys = np.linspace(-h / 2 * 1.05, h / 2 * 1.05, 39)
    X, Y = np.meshgrid(xs, ys, indexing="xy")
    return X, Y


def test_all_shipped_scripts_present():
    assert len(LENS_LUA) == 31 and len(GLOBE_LUA) == 6


@pytest.mark.parametrize("name", LENS_LUA)
def test_lua_lens_agrees_with_python_port(name, cube):
    lua = load_lua_lens(LUA_DIR / "lenses" / f"{name}.lua", cube)
    py = lenses.get(name, cube)

    # metadata read exactly as LUA_load_lens does (fisheye.c:1683-1749)
    assert lua.map_type == py.map_type
    assert lua.max_fov == py.max_fov and lua.max_vfov == py.max_vfov
    assert lua.width == pytest.approx(py.width, abs=0) or lua.width == py.width
    assert lua.height == py.height
    assert (lua.onload or "") == (py.onload or "")

    if py.forward is not None:
        x, y, z = _forward_grid()
        with np.errstate(all="ignore"):
            lpx, lpy, lok = lua.forward(x, y, z)
            ppx, ppy, pok = py.forward(x, y, z)
        pok = np.broadcast_to(np.asarray(pok), x.shape)
        np.testing.assert_array_equal(np.asarray(lok), pok, err_msg="forward valid")
        both = np.asarray(lok) & pok
        np.testing.assert_array_equal(
            np.where(both, np.asarray(lpx), 0), np.where(both, np.asarray(ppx), 0),
            err_msg="forward x")
        np.testing.assert_array_equal(
            np.where(both, np.asarray(lpy), 0), np.where(both, np.asarray(ppy), 0),
            err_msg="forward y")

    if py.inverse is not None:
        X, Y = _inverse_grid(py)
        with np.errstate(all="ignore"):
            lvx, lvy, lvz, lok = lua.inverse(X, Y)
            pvx, pvy, pvz, pok = py.inverse(X, Y)
        pok = np.broadcast_to(np.asarray(pok), X.shape)
        np.testing.assert_array_equal(np.asarray(lok), pok, err_msg="inverse valid")
        both = np.asarray(lok) & pok
        # The returned ray is only ever observed PAST the LUAtoC boundary:
        # vec3_t truncation + VectorNormalize (fisheye.c:1560-1563).  The
        # Lua builtin hands scripts f32-valued components while the Python
        # ports keep f64 — bit-identical once truncated, which is why the
        # compiled-C suite pins both.  Compare at the boundary.
        lb = geometry.normalize_c(*(np.asarray(v, np.float64) for v in (lvx, lvy, lvz)),
                                  np, np.float32, np.float64)
        pb = geometry.normalize_c(*(np.asarray(v, np.float64) for v in (pvx, pvy, pvz)),
                                  np, np.float32, np.float64)
        for lv, pv, tag in zip(lb, pb, "xyz"):
            np.testing.assert_array_equal(
                np.where(both, lv, 0), np.where(both, pv, 0),
                err_msg=f"inverse ray {tag}")


@pytest.mark.parametrize("name", GLOBE_LUA)
def test_lua_globe_agrees_with_python_port(name):
    lua = load_lua_globe(LUA_DIR / "globes" / f"{name}.lua")
    py = globes.get(name)
    assert lua.numplates == py.numplates
    np.testing.assert_array_equal(lua.forward, py.forward)
    np.testing.assert_array_equal(lua.right, py.right)
    np.testing.assert_array_equal(lua.up, py.up)
    np.testing.assert_array_equal(lua.fov_rad, py.fov_rad)
    np.testing.assert_array_equal(lua.dist, py.dist)
    assert (lua.plate_resolver is None) == (py.plate_resolver is None)
    if py.plate_resolver is not None:
        rng = np.random.default_rng(3)
        v = rng.normal(size=(500, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        x, y, z = (np.float32(v[:, i]).astype(np.float64) for i in range(3))
        np.testing.assert_array_equal(
            np.asarray(lua.plate_resolver(x, y, z, lua)),
            np.asarray(py.plate_resolver(x, y, z, py)),
        )


def test_lua_lens_drop_in_session(tmp_path, cube):
    """End-to-end: a user points lens_dirs at .lua scripts and f_lens works,
    rendering identically to the built-in port (exact default path)."""
    import shutil

    from blinky_tpu.api import Session
    from blinky_tpu.io.cubemap import synthetic_cubemap

    shutil.copy(LUA_DIR / "lenses" / "hammer.lua", tmp_path / "myhammer.lua")
    shutil.copy(LUA_DIR / "globes" / "fast.lua", tmp_path / "myfast.lua")
    sess = Session(64, 48, lens_dirs=[tmp_path], globe_dirs=[tmp_path])
    frames = synthetic_cubemap(sess.platesize)
    assert "myhammer" in sess.complete_lens("my")
    assert "myfast" in sess.complete_globe("my")
    sess.cmd("f_globe myfast")
    sess.cmd("f_lens myhammer")  # runs the script's onload (f_contain)
    out_lua = np.asarray(sess.render(frames))

    ref = Session(64, 48)
    ref.cmd("f_globe fast")
    ref.cmd("f_lens hammer")
    out_py = np.asarray(ref.render(frames))
    np.testing.assert_array_equal(out_lua, out_py)


def test_lua_forward_only_lens_in_session(tmp_path, cube):
    """A forward-only .lua lens goes through the host rasterizer."""
    import shutil

    from blinky_tpu.api import Session
    from blinky_tpu.io.cubemap import synthetic_cubemap

    shutil.copy(LUA_DIR / "lenses" / "sinusoidal.lua", tmp_path / "mysinu.lua")
    sess = Session(48, 36, lens_dirs=[tmp_path])
    frames = synthetic_cubemap(sess.platesize)
    sess.cmd("f_lens mysinu")
    out_lua = np.asarray(sess.render(frames))
    ref = Session(48, 36)
    ref.cmd("f_lens sinusoidal")
    np.testing.assert_array_equal(out_lua, np.asarray(ref.render(frames)))


def test_lua_lens_view_rotation_takes_device_builder(tmp_path):
    """Round 3 (Lua->JAX): a traceable .lua lens is jittable, so
    setviewangles routes to the f32 DEVICE builder exactly like a
    Python port — the reference's one-builder-for-every-lens contract
    (fisheye.c:1659-1750)."""
    import shutil

    from blinky_tpu.api import Session
    from blinky_tpu.io.cubemap import synthetic_cubemap

    shutil.copy(LUA_DIR / "lenses" / "hammer.lua", tmp_path / "h.lua")
    sess = Session(48, 36, lens_dirs=[tmp_path])
    sess.cmd("f_lens h")
    assert sess.lens.jittable
    sess.cmd("setviewangles 10 20 0")
    assert sess._resolved_backend() == "jax"
    frames = synthetic_cubemap(sess.platesize)
    out = np.asarray(sess.render(frames))
    assert out.shape == (36, 48)
    # the rotated .lua build matches the rotated Python-port build
    ref = Session(48, 36)
    ref.cmd("f_lens hammer; setviewangles 10 20 0")
    np.testing.assert_array_equal(out, np.asarray(ref.render(frames)))
    # render_posed accepts the .lua lens now (api.py raise is gone for
    # traceable scripts)
    posed = np.asarray(sess.render_posed(frames[..., None],
                                         np.zeros((1, 3))))
    assert posed.shape == (1, 36, 48)


def test_untraceable_lua_lens_stays_on_host_builder(tmp_path):
    """A script that genuinely needs per-lane scalar control (here a
    lane-varying table WRITE) fails the trace probe and stays on the
    exact f64 host builder; render_posed still works — the static-ray
    path (round 4) evaluates the lens math ONCE on the host into a ray
    table and poses rotate it on device, so even scalar-only scripts
    play poses.  (debug.lua no longer qualifies — its numplates tables
    trace via the dense-table read since late round 3.)"""
    from blinky_tpu.api import Session
    from blinky_tpu.io.cubemap import synthetic_cubemap

    (tmp_path / "scat.lua").write_text("""
max_fov = 360
max_vfov = 180
onload = "f_fov 180"
acc = {}
function lens_forward(x, y, z)
  local lat, lon = ray_to_latlon(x, y, z)
  return lon / 1.5, lat / 1.5
end
function lens_inverse(x, y)
  local k = math.floor(math.abs(x) * 3) + 1
  acc[k] = y          -- lane-varying table WRITE: per-lane control
  local r = 1.5
  return latlon_to_ray(y * r, x * r)
end
""")
    sess = Session(48, 36, lens_dirs=[tmp_path])
    sess.cmd("f_lens scat")
    assert sess.lens_valid and not sess.lens.jittable
    sess.cmd("setviewangles 10 20 0")
    assert sess._resolved_backend() == "numpy"
    frames = synthetic_cubemap(sess.platesize)
    assert np.asarray(sess.render(frames)).shape == (36, 48)
    # round 4: the host-built ray table makes poses work here too; the
    # identity pose matches the static render up to the documented f32
    # table boundary (the rays truncate to f32 like the device builder)
    sess.cmd("setviewangles")
    posed = np.asarray(sess.render_posed(frames[..., None],
                                         np.zeros((1, 3))))
    assert posed.shape == (1, 36, 48)
    static = np.asarray(sess.render(frames))
    assert (posed[0] != static).mean() < 0.05


def test_untraceable_lua_globe_takes_exact_posed_path(tmp_path):
    """A scalar-only .lua GLOBE (lane-varying table write in its
    globe_plate) cannot trace the per-pose plate-resolve stage, which
    the static-ray pipeline jits for EVERY lens — render_posed must
    route to the exact host path (bit-equal to exact=True) instead of
    letting Unvectorizable escape mid-trace, and the viewer's drag-look
    preview must stay off so a drag rebuilds exactly rather than 500ing
    (regression: round-4 static-ray removed the round-3 jittable guard)."""
    from blinky_tpu.api import Session
    from blinky_tpu.io.cubemap import synthetic_cubemap
    from blinky_tpu.viewer import Viewer

    (tmp_path / "scatglobe.lua").write_text("""
plates = {
{ {0,0,1}, {0,1,0}, 90 },
{ {0,0,1}, {0,1,0}, 160 }
}
acc = {}
function globe_plate(x,y,z)
  local k = math.floor(math.abs(x) * 3) + 1
  acc[k] = z          -- lane-varying table WRITE: per-lane control
  if x > 0 then return 0 end
  return 1
end
""")
    sess = Session(48, 36, platesize=16, globe_dirs=[tmp_path])
    sess.cmd("f_globe scatglobe")
    assert sess.globe_valid and not sess.globe.jittable
    frames = synthetic_cubemap(16)[:2]
    poses = np.asarray([(0.0, 0.0, 0.0), (5.0, 30.0, 0.0)])
    posed = np.asarray(sess.render_posed(frames[..., None].repeat(2, -1),
                                         poses))
    assert posed.shape == (2, 36, 48)
    exact = np.asarray(sess.render_posed(frames[..., None].repeat(2, -1),
                                         poses, exact=True))
    np.testing.assert_array_equal(posed, exact)
    # the drag-look preview stays off — even for a forward-only lens,
    # where the preview would otherwise always activate
    sess.cmd("f_lens eckert1; setviewangles 5 30 0")
    v = Viewer(sess, np.stack([synthetic_cubemap(16)]))
    assert v._posed_preview_active() is False


def test_debug_lua_traces_on_device(tmp_path):
    """Late round 3: debug.lua — numplates-dependent layout tables,
    multi-nil helper returns, lane-varying plate_to_ray — traces through
    the device builder bit-equal to the Python debug port, per globe."""
    import jax

    from blinky_tpu import globes

    for gname in ("cube", "trism", "tetra"):
        g = globes.get(gname)
        lua = load_lua_lens(LUA_DIR / "lenses" / "debug.lua", g)
        assert lua.jittable, gname
        port = lenses.get("debug", g)
        w, h = lua.width, lua.height
        X = np.linspace(-w / 2 * 1.1, w / 2 * 1.1, 40).astype(
            np.float32)[None].repeat(24, 0)
        Y = np.linspace(-h / 2 * 1.1, h / 2 * 1.1, 24).astype(
            np.float32)[:, None].repeat(40, 1)
        lx, ly, lz, lval = jax.jit(lua.inverse)(X, Y)
        px_, py_, pz_, pval = jax.jit(port.inverse)(X, Y)
        lv = np.asarray(lval)
        pv = np.broadcast_to(np.asarray(pval), lv.shape)
        np.testing.assert_array_equal(lv, pv, err_msg=gname)
        m = lv & pv
        # components to a few f32 ulp: the two graphs are the same math
        # but XLA:CPU's fusion clusters differ (the .lua graph carries
        # the unrolled masked loop), contracting different FMAs — on
        # the TPU the same comparison measures exactly 0
        for a, b in ((lx, px_), (ly, py_), (lz, pz_)):
            np.testing.assert_allclose(np.asarray(a)[m],
                                       np.asarray(b)[m],
                                       rtol=3e-6, atol=3e-6,
                                       err_msg=gname)


@pytest.mark.parametrize("name", [
    "panini", "stereographic", "fisheye2", "cube", "mollweide",
    "eckert4", "winkeltripel", "vandergrinten", "quincuncial", "debug",
])
def test_lua_device_build_matches_port_device_build(name, cube):
    """VERDICT r2 task 1 pin: the .lua f32 DEVICE lensmap equals the
    Python-port f32 device lensmap on small grids (same jitted builder,
    same f32 math, same masked-loop semantics).  quincuncial tolerates
    f32 noise: the port bakes static AGM tables at load while the
    script's tables go through the evaluator."""
    from blinky_tpu import lenses
    from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale

    lua = load_lua_lens(LUA_DIR / "lenses" / f"{name}.lua", cube)
    port = lenses.get(name, cube)
    assert lua.jittable
    zoom = (Zoom("fov", min(140, lua.max_fov)) if lua.max_fov > 0
            else Zoom("contain"))  # quincuncial declares bounds only
    scale = calc_scale(zoom, port, 64, 48)
    lm_lua = build_lensmap(lua, cube, scale, 64, 48, 32, backend="jax")
    lm_port = build_lensmap(port, cube, scale, 64, 48, 32, backend="jax")
    a, b = np.asarray(lm_lua.valid), np.asarray(lm_port.valid)
    if name in ("quincuncial", "debug"):
        # quincuncial: the port bakes static AGM tables at load; debug:
        # XLA:CPU fuses the .lua graph's unrolled loop differently (1-ulp
        # FMA noise; exactly 0 on TPU) — boundary texels may flip
        assert (a == b).mean() > 0.99
        m = a & b
        assert (np.asarray(lm_lua.flat_idx)[m]
                == np.asarray(lm_port.flat_idx)[m]).mean() > 0.99
        return
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(np.asarray(lm_lua.flat_idx),
                                  np.asarray(lm_port.flat_idx))
    np.testing.assert_array_equal(np.asarray(lm_lua.tint),
                                  np.asarray(lm_port.tint))


def test_lua_globe_resolver_traces_on_device(tmp_path, cube):
    """fast.lua's custom globe_plate resolver runs under the jitted
    device builder (the traced branch of load_lua_globe's resolver),
    bit-equal to the builtin fast globe's device build."""
    import shutil

    from blinky_tpu import globes
    from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale

    shutil.copy(LUA_DIR / "globes" / "fast.lua", tmp_path / "f.lua")
    lua_globe = load_lua_globe(tmp_path / "f.lua")
    py_globe = globes.get("fast")
    lens = lenses.get("panini", py_globe)
    scale = calc_scale(Zoom("fov", 140), lens, 64, 48)
    lm_lua = build_lensmap(lenses.get("panini", lua_globe), lua_globe,
                           scale, 64, 48, 32, backend="jax")
    lm_py = build_lensmap(lens, py_globe, scale, 64, 48, 32, backend="jax")
    for f in ("plate", "valid", "flat_idx"):
        np.testing.assert_array_equal(np.asarray(getattr(lm_lua, f)),
                                      np.asarray(getattr(lm_py, f)),
                                      err_msg=f)


def test_session_lua_globe_pose_playback(tmp_path):
    """End-to-end: a .lua globe drop-in + view rotation takes the jitted
    device builder (traced resolver) and matches the builtin globe."""
    import shutil

    from blinky_tpu.api import Session
    from blinky_tpu.io.cubemap import synthetic_cubemap

    shutil.copy(LUA_DIR / "globes" / "fast.lua", tmp_path / "myfast.lua")
    sess = Session(64, 48, platesize=32, globe_dirs=[tmp_path])
    sess.cmd("f_globe myfast; setviewangles 5 30 0")
    assert sess._resolved_backend() == "jax"
    frames = synthetic_cubemap(32)[:2]
    out = np.asarray(sess.render(frames))
    ref = Session(64, 48, platesize=32)
    ref.cmd("f_globe fast; setviewangles 5 30 0")
    np.testing.assert_array_equal(out, np.asarray(ref.render(frames)))


def test_lua_lens_host_paths_are_thread_safe(cube):
    """Concurrent HOST-path evaluations of the same .lua LensDef must
    serialize on the script lock (lua_bridge): the load-time
    VectorInterpreter's mask/frame stacks, fuel, and script globals
    (eckert4's memoized row) are shared mutable state, and real callers
    race — render_posed(block=False)'s background table build vs the
    caller-thread coarse preview build, viewer warm threads vs drag
    requests.  Without the lock this interleaves interpreter state and
    can cache corrupt rays for the session lifetime."""
    import threading

    # eckert4 carries the memoized-row global; quincuncial is the
    # heaviest pure recurrence — both exercise long vcalls
    for name in ("eckert4", "quincuncial"):
        lua = load_lua_lens(LUA_DIR / "lenses" / f"{name}.lua", cube)
        X, Y = _inverse_grid(lua)
        with np.errstate(all="ignore"):
            ref = lua.inverse(X, Y)
        results = [None] * 8
        errors = []

        def worker(i):
            try:
                with np.errstate(all="ignore"):
                    results[i] = lua.inverse(X, Y)
            except Exception as e:  # pragma: no cover - the failure mode
                errors.append(e)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors
        for r in results:
            assert r is not None
            for got, exp, tag in zip(r, ref, ("x", "y", "z", "ok")):
                np.testing.assert_array_equal(
                    np.asarray(got), np.asarray(exp),
                    err_msg=f"{name} inverse {tag} under concurrency")


def test_lua_lens_release_unwinds_parked_coroutines(tmp_path):
    """A script that leaves a coroutine SUSPENDED pins one OS thread per
    scalar interpreter (the thread's frame references the interpreter,
    so GC alone can never reclaim it).  LensDef.release unwinds both the
    scalar-tier reader and the lazy fallback (round-5 review)."""
    import threading
    import time

    src = '''
max_fov = 360
max_vfov = 180
lens_width = 2 * pi
lens_height = pi
gen = coroutine.create(function()
  coroutine.yield(2 * pi)
  coroutine.yield(pi)  -- never resumed again: PARKED here
end)
local _, w = coroutine.resume(gen)
lens_width = w
function lens_inverse(x, y)
  local keep = coroutine.create(function() coroutine.yield() end)
  coroutine.resume(keep)  -- parks one per interpreter (not per call:
  -- 'keep' is local, but the suspended thread itself persists until
  -- close; the dead-pruning rule does not apply to suspended ones)
  return cos(y) * sin(x), sin(y), cos(y) * cos(x)
end
'''
    path = tmp_path / "parked.lua"
    path.write_text(src)
    g = globes.get("cube")
    before = threading.active_count()
    ld = load_lua_lens(path, g)  # scalar-tier reader parks gen's thread
    assert ld.jittable is False and ld.release is not None
    assert threading.active_count() >= before + 1
    # scalar inverse call builds the fallback interpreter: more parked
    out = ld.inverse(0.1, 0.2)
    assert len(out) == 4
    assert threading.active_count() >= before + 2
    ld.release()
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
    # release is idempotent, and the lens still WORKS afterwards (the
    # fallback lazily rebuilds)
    ld.release()
    out2 = ld.inverse(0.1, 0.2)
    np.testing.assert_array_equal(np.asarray(out2[0]), np.asarray(out[0]))
    ld.release()  # unwind the rebuild's parked thread too
