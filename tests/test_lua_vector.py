"""The vectorized masked Lua evaluator (`blinky_tpu/lua_vector.py`)
vs the scalar interpreter: bit-equality over dense grids for every
shipped script, plus the masked-control-flow machinery in isolation."""

import numpy as np
import pytest

from blinky_tpu.lua_bridge import make_lua_builtins
from blinky_tpu.lua_vector import Unvectorizable, VectorInterpreter
from blinky_tpu.minilua import Interpreter

LENS_DIR = "/root/reference/game/lua-scripts/lenses"
GLOBE_DIR = "/root/reference/game/lua-scripts/globes"

INVERSE_LENSES = [
    "panini", "stereographic", "rectilinear", "fisheye1", "fisheye2",
    "equirect", "mercator", "miller", "cylinder", "hammer", "gumby",
    "fahey", "gallstereo", "cube", "cubestereo", "mollweide", "eckert4",
    "winkeltripel", "vandergrinten", "quincuncial",
]


def _load(name, vector):
    src = open(f"{LENS_DIR}/{name}.lua").read()
    if vector:
        it = VectorInterpreter(builtins=make_lua_builtins(None, vector=True))
    else:
        it = Interpreter(builtins=make_lua_builtins(None))
    it.run(src)
    return it


@pytest.mark.parametrize("name", INVERSE_LENSES)
def test_vector_inverse_bitequal_scalar(name):
    """vcall over a grid == one scalar interpreter walk per point,
    bit-for-bit (same op sequence per lane; same glibc libm)."""
    vi = _load(name, vector=True)
    si = _load(name, vector=False)
    inv_v = vi.get_global("lens_inverse")
    inv_s = si.get_global("lens_inverse")
    w = float(np.asarray(vi.get_global("lens_width") or 6.0))
    h = float(np.asarray(vi.get_global("lens_height") or 6.0))
    import zlib

    rng = np.random.default_rng(zlib.crc32(name.encode()))
    N = 400
    X = rng.uniform(-0.7 * w, 0.7 * w, N)  # beyond bounds: nil lanes too
    Y = rng.uniform(-0.7 * h, 0.7 * h, N)
    with np.errstate(all="ignore"):
        vals, nil = vi.vcall(inv_v, [X, Y])
    for i in range(N):
        sv = si.call(inv_s, [float(X[i]), float(Y[i])])
        s_nil = len(sv) == 0 or sv[0] is None
        v_nil = bool(nil[i]) if nil is not None else len(vals) == 0
        assert s_nil == v_nil, (name, i, X[i], Y[i])
        if not s_nil:
            for j, s in enumerate(sv):
                a, b = float(s), float(vals[j][i])
                assert a == b or (np.isnan(a) and np.isnan(b)), \
                    (name, i, j, a, b)


def test_vector_globe_resolver_bitequal():
    """fast.lua's globe_plate (per-lane nil + masked ifs) vectorizes."""
    src = open(f"{GLOBE_DIR}/fast.lua").read()
    vi = VectorInterpreter(builtins=make_lua_builtins(None, vector=True))
    vi.run(src)
    si = Interpreter(builtins=make_lua_builtins(None))
    si.run(src)
    gp_v, gp_s = vi.get_global("globe_plate"), si.get_global("globe_plate")
    rng = np.random.default_rng(5)
    X, Y, Z = (rng.uniform(-1, 1, 500) for _ in range(3))
    vals, nil = vi.vcall(gp_v, [X, Y, Z])
    for i in range(500):
        sv = si.call(gp_s, [float(X[i]), float(Y[i]), float(Z[i])])
        s_nil = len(sv) == 0 or sv[0] is None
        v_nil = bool(nil[i]) if nil is not None else len(vals) == 0
        assert s_nil == v_nil
        if not s_nil:
            assert float(sv[0]) == float(vals[0][i])


def test_masked_control_flow_primitives():
    """The machinery in isolation: masked if/elseif, masked loop with
    break, per-lane nil, nested calls under masks."""
    src = """
function f(x)
  if x > 2 then
    return 100 + x
  elseif x > 0 then
    local acc = x
    for i = 1, 10 do
      acc = acc + 1
      if acc > 4 then break end
    end
    return acc
  elseif x > -2 then
    return nil
  end
  return helper(x)
end
function helper(v)
  local t = v
  repeat
    t = t + 1
  until t >= 0
  return t * 10
end
"""
    vi = VectorInterpreter()
    vi.run(src)
    si = Interpreter()
    si.run(src)
    f_v, f_s = vi.get_global("f"), si.get_global("f")
    X = np.linspace(-5.5, 5.5, 111)
    vals, nil = vi.vcall(f_v, [X])
    for i, x in enumerate(X):
        sv = si.call(f_s, [float(x)])
        s_nil = len(sv) == 0 or sv[0] is None
        assert s_nil == bool(nil[i] if nil is not None else False), x
        if not s_nil:
            assert float(sv[0]) == float(vals[0][i]), (x, sv, vals[0][i])


def test_unvectorizable_constructs_raise():
    # a lane-array read of a DENSE numeric table vectorizes since late
    # round 3 (proven equal per lane: integer in-range active keys)...
    vi = VectorInterpreter()
    vi.run("""
t = {10, 20, 30}
function g(x)
  return t[x]
end
""")
    vals, nil = vi.vcall(vi.get_global("g"), [np.array([1.0, 3.0, 2.0])])
    np.testing.assert_array_equal(vals[0], [10.0, 30.0, 20.0])
    # ...but non-integer or out-of-range keys on active lanes refuse
    # (the scalar path would read nil there)
    with pytest.raises(Unvectorizable):
        vi.vcall(vi.get_global("g"), [np.array([1.5, 2.0])])
    with pytest.raises(Unvectorizable):
        vi.vcall(vi.get_global("g"), [np.array([1.0, 7.0])])
    # and a NON-dense table (hash keys) still refuses outright
    vi2 = VectorInterpreter()
    vi2.run("""
h = {1, 2, 3}
h.x = 9
function g(x)
  return h[x]
end
""")
    with pytest.raises(Unvectorizable):
        vi2.vcall(vi2.get_global("g"), [np.array([1.0, 2.0])])
    # lane-varying table WRITES remain per-lane control: refuse
    vi3 = VectorInterpreter()
    vi3.run("""
acc = {}
function w(x)
  acc[x] = 1
  return x
end
""")
    with pytest.raises((Unvectorizable, TypeError)):
        vi3.vcall(vi3.get_global("w"), [np.array([1.0, 2.0])])


def test_bridge_falls_back_to_scalar(tmp_path):
    """A lens with a lane-varying table read loads and renders
    correctly whichever path takes it (since late round 3 the dense
    numeric read vectorizes; before, it fell back to the scalar walk —
    the values are pinned identical either way)."""
    p = tmp_path / "tricky.lua"
    p.write_text("""
lut = {2, 4, 8}
lens_width = 2
lens_height = 2
onload = "f_contain"
function lens_inverse(x, y)
  local k
  if x < -0.3 then k = 1 elseif x < 0.3 then k = 2 else k = 3 end
  local s = lut[k]      -- k is lane-varying
  return x * s, y * s, 1.0
end
""")
    from blinky_tpu.lua_bridge import load_lua_lens

    lens = load_lua_lens(p)
    X = np.linspace(-0.9, 0.9, 64)
    Y = np.zeros(64)
    vx, vy, vz, ok = lens.inverse(X, Y)
    assert ok.all()
    expect = np.where(X < -0.3, 2.0, np.where(X < 0.3, 4.0, 8.0))
    np.testing.assert_array_equal(np.asarray(vx), X * expect)


def test_vector_path_is_actually_used():
    """The bridge's array calls go through the vectorized evaluator, not
    2 M scalar walks: a grid call must be far faster than per-pixel."""
    import time

    from blinky_tpu.lua_bridge import load_lua_lens

    lens = load_lua_lens(f"{LENS_DIR}/winkeltripel.lua")
    rng = np.random.default_rng(0)
    X = rng.uniform(-2, 2, 20000)
    Y = rng.uniform(-1.4, 1.4, 20000)
    t0 = time.time()
    vx, vy, vz, ok = lens.inverse(X, Y)
    dt = time.time() - t0
    assert dt < 2.0, f"vectorized path not taken ({dt:.1f}s for 20k points)"
    assert np.asarray(ok).any()


def _compare(src, fname, X, builtins=None):
    """vector vcall vs scalar per-point for one function over X."""
    vi = VectorInterpreter(builtins=dict(builtins or {}))
    vi.run(src)
    si = Interpreter(builtins=dict(builtins or {}))
    si.run(src)
    with np.errstate(all="ignore"):
        vals, nil = vi.vcall(vi.get_global(fname), [np.asarray(X, np.float64)])
    out = []
    for i, x in enumerate(X):
        sv = si.call(si.get_global(fname), [float(x)])
        s_nil = len(sv) == 0 or sv[0] is None
        v_nil = bool(nil[i]) if nil is not None else len(vals) == 0
        assert s_nil == v_nil, (x, sv)
        if not s_nil:
            a, b = float(sv[0]), float(vals[0][i])
            assert a == b or (np.isnan(a) and np.isnan(b)), (x, a, b)
            out.append(a)
    return out


def test_maybe_nil_comparison_and_reuse():
    """A helper's per-lane nil result tested with == nil and then used
    arithmetically (review finding: used to silently misbranch/crash)."""
    src = """
function helper(x)
  if x > 0 then return x end
  return nil
end
function f(x)
  local v = helper(x)
  if v == nil then return -99 end
  return v * 2
end
"""
    _compare(src, "f", np.array([-1.0, 3.0, 0.0, 7.5]))


def test_partially_assigned_flag_falls_back():
    """A variable assigned in only one masked arm then tested for
    truthiness: must NOT silently take one branch for all lanes (review
    finding) — either correct per-lane or Unvectorizable."""
    src = """
function f(x)
  local v
  if x > 0 then v = 1 end
  if v then return 10 else return 20 end
end
"""
    vi = VectorInterpreter()
    vi.run(src)
    X = np.array([-1.0, 1.0])
    with pytest.raises(Unvectorizable):
        vi.vcall(vi.get_global("f"), [X])
    # and through the bridge contract: correct values via the fallback
    import tempfile
    from pathlib import Path

    from blinky_tpu.lua_bridge import load_lua_lens

    d = Path(tempfile.mkdtemp())
    (d / "flag.lua").write_text("""
lens_width = 2
lens_height = 2
function lens_inverse(x, y)
  local v
  if x > 0 then v = 1 end
  if v then return x, y, 10 else return x, y, 20 end
end
""")
    lens = load_lua_lens(d / "flag.lua")
    vx, vy, vz, ok = lens.inverse(np.array([-0.5, 0.5]), np.zeros(2))
    np.testing.assert_array_equal(np.asarray(vz), [20.0, 10.0])


def test_masked_table_write_of_uniform_value():
    """Masked writes of lane-uniform values over an existing slot must
    not clobber the other arm's value (review finding)."""
    src = """
s = {}
function f(x)
  if x > 0 then s.k = 1 else s.k = 2 end
  return s.k
end
"""
    _compare(src, "f", np.array([1.0, -1.0, 2.0]))


def test_scalar_semantics_preserving_div_pow_maxmin():
    """/ by -0.0, 0^negative and max/min with NaN follow the SCALAR
    interpreter's (Lua/C) semantics, not raw numpy (review finding)."""
    src = """
function fdiv(x)
  return 1 / (x * 0)     -- x*0 of a negative x is -0.0
end
function fpow(x)
  return (x - x) ^ -1    -- 0 ^ negative
end
function fmax(x)
  return math.max(1.0, math.sqrt(x))  -- sqrt(neg) = nan
end
"""
    _compare(src, "fdiv", np.array([2.0, -2.0, 0.0]))
    _compare(src, "fpow", np.array([3.0, -4.0]))
    _compare(src, "fmax", np.array([4.0, -1.0]))


def test_rad_deg_lifted():
    src = """
function f(x)
  return math.deg(math.rad(x)) + math.rad(x)
end
"""
    _compare(src, "f", np.array([0.0, 45.0, -90.0, 123.456]))


def test_fallback_survives_deleted_script(tmp_path):
    """The scalar fallback captures the source at load time (review
    finding: the file may be gone when the fallback first engages)."""
    from blinky_tpu.lua_bridge import load_lua_lens

    p = tmp_path / "gone.lua"
    p.write_text("""
lens_width = 2
lens_height = 2
function lens_inverse(x, y)
  return x, y, 1.0
end
""")
    lens = load_lua_lens(p)
    p.unlink()
    vx, vy, vz, ok = lens.inverse(0.25, -0.5)  # scalar call -> fallback
    assert float(vx) == 0.25 and bool(ok)


def test_masked_toplevel_break_is_unvectorizable():
    """A masked `break` with no tracked call frame (array-valued
    TOP-LEVEL code) must raise Unvectorizable rather than exiting the
    loop uniformly for all lanes — ADVICE r2: a uniform _Break here
    silently diverges from scalar per-lane semantics, so the scalar
    fallback must take over."""
    it = VectorInterpreter()
    it.globals.vars["xs"] = np.array([1.0, -1.0, 2.0])
    with pytest.raises(Unvectorizable, match="masked break"):
        it.run("""
n = 0
while true do
  n = n + 1
  if xs > 0 then break end
  if n > 3 then break end
end
""")
    # an UNmasked top-level break still exits normally
    it2 = VectorInterpreter()
    it2.run("m = 0\nwhile true do m = m + 1; if m > 2 then break end end")
    assert float(np.asarray(it2.get_global("m"))) == 3.0


def test_debug_lens_vectorizes_bitequal_scalar():
    """Late round 3: debug.lua vectorizes on the np path too — dense
    lane-array table reads and the lane-varying plate_to_ray gather are
    PROVEN equal to per-lane scalar calls (active-lane verification),
    so the exact host build runs whole-grid instead of one interpreter
    walk per pixel.  Bit-equality lane-for-lane vs the scalar engine."""
    from blinky_tpu import globes

    for gname in ("cube", "trism"):
        g = globes.get(gname)
        src = open(f"{LENS_DIR}/debug.lua").read()
        vi = VectorInterpreter(builtins=make_lua_builtins(g, vector=True))
        vi.run(src)
        si = Interpreter(builtins=make_lua_builtins(g))
        si.run(src)
        inv_v, inv_s = (vi.get_global("lens_inverse"),
                        si.get_global("lens_inverse"))
        rng = np.random.default_rng(7)
        N = 400
        X = rng.uniform(-1.8, 1.8, N)
        Y = rng.uniform(-1.3, 1.3, N)
        with np.errstate(all="ignore"):
            vals, nil = vi.vcall(inv_v, [X, Y])
        assert len(vals) == 3  # vectorized, no scalar fallback
        for i in range(N):
            sv = si.call(inv_s, [float(X[i]), float(Y[i])])
            s_nil = len(sv) == 0 or sv[0] is None
            v_nil = bool(nil[i]) if nil is not None else False
            assert s_nil == v_nil, (gname, i, X[i], Y[i])
            if not s_nil:
                for j, s in enumerate(sv):
                    assert float(s) == float(vals[j][i]), (gname, i, j)


def test_debug_exact_host_build_matches_port():
    """The whole-grid debug.lua exact build bit-equals the Python
    port's exact build (and runs in ms, not minutes)."""
    from blinky_tpu import globes, lenses
    from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale
    from blinky_tpu.lua_bridge import load_lua_lens

    g = globes.get("cube")
    lua = load_lua_lens(f"{LENS_DIR}/debug.lua", g)
    port = lenses.get("debug", g)
    scale = calc_scale(Zoom("contain"), lua, 96, 72)
    lm = build_lensmap(lua, g, scale, 96, 72, 48, backend="numpy")
    lmp = build_lensmap(port, g, scale, 96, 72, 48, backend="numpy")
    for f in ("plate", "px", "py", "valid", "tint", "flat_idx"):
        np.testing.assert_array_equal(np.asarray(getattr(lm, f)),
                                      np.asarray(getattr(lmp, f)),
                                      err_msg=f)


def test_masked_table_stdlib_mutation_refuses():
    """Review: table.insert/remove/sort under a lane mask would run once
    for ALL lanes where the scalar engine runs per lane — must refuse
    (Unvectorizable) so the scalar fallback reproduces exact behavior."""
    vi = VectorInterpreter()
    vi.run("""
function f(x)
  local t = {}
  if x > 0 then
    table.insert(t, x)
  end
  return #t
end
""")
    with pytest.raises(Unvectorizable):
        vi.vcall(vi.get_global("f"), [np.array([1.0, -1.0, 2.0])])
    # ...and the bridge-level contract: vector == scalar per lane via
    # the fallback
    from blinky_tpu.lua_bridge import _vectorize_inverse  # noqa: F401
    si = Interpreter()
    si.run("""
function f(x)
  local t = {}
  if x > 0 then
    table.insert(t, x)
  end
  return #t
end
""")
    for x in (1.0, -1.0):
        assert float(si.call(si.get_global("f"), [x])[0]) == (
            1.0 if x > 0 else 0.0)


def test_traced_plate_to_ray_out_of_range_is_nil():
    """Review: the traced lane-varying plate_to_ray must keep the
    reference's nil protocol (lua_pushnil for an out-of-range plate,
    fisheye.c:1528-1531) — a script relying on it must mark those lanes
    invalid on the DEVICE build too, matching the np path."""
    import jax

    from blinky_tpu import globes
    from blinky_tpu.lua_bridge import load_lua_lens

    src = """
max_fov = 360
max_vfov = 180
onload = "f_fov 180"
function lens_forward(x, y, z)
  local lat, lon = ray_to_latlon(x, y, z)
  return lon, lat
end
function lens_inverse(x, y)
  -- plate index beyond numplates for x > 0.5: plate_to_ray -> nil
  local p = 0
  if x > 0.5 then p = 99 end
  return plate_to_ray(p, x - math.floor(x), y - math.floor(y))
end
"""
    import tempfile
    from pathlib import Path

    d = Path(tempfile.mkdtemp())
    (d / "oob.lua").write_text(src)
    g = globes.get("cube")
    lens = load_lua_lens(d / "oob.lua", g)
    assert lens.jittable
    X = np.array([[0.1, 0.2, 0.7, 0.9]], np.float32)
    Y = np.array([[0.3, 0.4, 0.3, 0.4]], np.float32)
    _, _, _, ok_t = jax.jit(lens.inverse)(X, Y)
    ok_np = lens.inverse(np.asarray(X, np.float64),
                         np.asarray(Y, np.float64))[3]
    np.testing.assert_array_equal(np.asarray(ok_t), [[True, True,
                                                      False, False]])
    np.testing.assert_array_equal(np.asarray(ok_np),
                                  np.asarray(ok_t))
