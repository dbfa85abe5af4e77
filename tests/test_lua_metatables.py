"""Lua 5.2 metatables in the mini-Lua engines.

The reference links real liblua (``fisheye.c:278-280``), so user scripts
may use the full metamethod protocol.  The scalar engine implements it;
the vectorized engine runs metatabled code for UNIFORM values through
the same base machinery and raises Unvectorizable (-> the bridge's
scalar fallback) wherever a metamethod would have to fire per lane.
"""

import numpy as np
import pytest

from blinky_tpu.lua_vector import Unvectorizable, VectorInterpreter
from blinky_tpu.minilua import LuaError, run_script


def run(src):
    return run_script(src, is_path=False)


CLASS_SRC = '''
Point = {}
Point.__index = Point
function Point.new(x, y) return setmetatable({x = x, y = y}, Point) end
function Point:norm() return math.sqrt(self.x ^ 2 + self.y ^ 2) end
Point.__add = function(a, b) return Point.new(a.x + b.x, a.y + b.y) end
Point.__sub = function(a, b) return Point.new(a.x - b.x, a.y - b.y) end
Point.__eq = function(a, b) return a.x == b.x and a.y == b.y end
Point.__lt = function(a, b) return a:norm() < b:norm() end
Point.__len = function(p) return 2 end
Point.__unm = function(p) return Point.new(-p.x, -p.y) end
Point.__call = function(p, k) return p.x * k end
Point.__tostring = function(p) return "(" .. p.x .. "," .. p.y .. ")" end
Point.__concat = function(a, b) return tostring(a) .. tostring(b) end
'''


def test_class_oop_protocol():
    it = run(CLASS_SRC + '''
p = Point.new(3, 4)
q = Point.new(1, 2)
n = p:norm()
s = p + q
d = p - q
eq1 = p == Point.new(3, 4)
eq2 = p == q
ne = p ~= q
lt = q < p
le = q <= p            -- 5.2 falls back to not __lt(p, q)
gt = p > q
len1 = #p
neg = (-p).x
callv = p(10)
str1 = tostring(p)
cc = p .. q
''')
    g = it.get_global
    assert g("n") == 5.0
    assert (g("s").get("x"), g("s").get("y")) == (4.0, 6.0)
    assert (g("d").get("x"), g("d").get("y")) == (2.0, 2.0)
    assert g("eq1") is True and g("eq2") is False and g("ne") is True
    assert g("lt") is True and g("le") is True and g("gt") is True
    assert g("len1") == 2.0
    assert g("neg") == -3.0
    assert g("callv") == 30.0
    assert g("str1") == "(3.0,4.0)"
    assert g("cc") == "(3.0,4.0)(1.0,2.0)"


def test_index_and_newindex_handlers():
    it = run('''
proxy = setmetatable({}, {
  __index = function(t, k) return "d_" .. k end,
  __newindex = function(t, k, v) rawset(t, k, v .. "!") end,
})
dv = proxy.foo
proxy.bar = "hi"
bar = rawget(proxy, "bar")
-- chained __index through a table
base = {greet = "hello"}
mid = setmetatable({}, {__index = base})
leaf = setmetatable({}, {__index = mid})
chained = leaf.greet
-- __index table miss stays nil
missing = leaf.nope
''')
    g = it.get_global
    assert g("dv") == "d_foo"
    assert g("bar") == "hi!"
    assert g("chained") == "hello"
    assert g("missing") is None


def test_protected_and_raw_api():
    it = run('''
prot = setmetatable({}, {__metatable = "locked"})
gm = getmetatable(prot)
ok, err = pcall(function() setmetatable(prot, {}) end)
re = rawequal(prot, prot)
rl = rawlen({10, 20, 30})
rls = rawlen("abcd")
k1, v1 = next({7})
n2 = next({})
sm = getmetatable("x").__index.upper("up")
gmn = getmetatable(5)
''')
    g = it.get_global
    assert g("gm") == "locked"
    assert g("ok") is False and "protected" in g("err")
    assert g("re") is True
    assert g("rl") == 3.0 and g("rls") == 4.0
    assert (g("k1"), g("v1")) == (1.0, 7.0)
    assert g("n2") is None
    assert g("sm") == "UP"
    assert g("gmn") is None


def test_pairs_metamethod():
    it = run('''
cnt = 0
pt = setmetatable({}, {__pairs = function(t)
  local i = 0
  return function(s, c) i = i + 1; if i <= 3 then return i, i * 10 end end,
         t, nil
end})
for k, v in pairs(pt) do cnt = cnt + v end
''')
    assert it.get_global("cnt") == 60.0


def test_eq_requires_same_handler():
    """5.2: __eq fires only when both operands share the handler."""
    it = run('''
a = setmetatable({}, {__eq = function() return true end})
b = setmetatable({}, {__eq = function() return true end})
eq = a == b      -- different handlers: primitive identity, false
c = getmetatable(a)
d = setmetatable({}, c)
eq2 = a == d     -- same handler table: fires
''')
    assert it.get_global("eq") is False
    assert it.get_global("eq2") is True


def test_error_messages_without_handlers():
    with pytest.raises(LuaError, match="arithmetic"):
        run("x = {} + 1")
    with pytest.raises(LuaError, match="concatenate"):
        run("x = {} .. 'a'")
    with pytest.raises(LuaError, match="compare"):
        run("x = {} < 1")
    with pytest.raises(LuaError, match="call a table"):
        run("x = ({})()")
    # concat of nil is an error now (liblua semantics), pcall-able
    it = run("ok, err = pcall(function() return 'a' .. nil end)")
    assert it.get_global("ok") is False


def test_vector_engine_uniform_metatables():
    """Uniform metatabled code runs on the vectorized engine (the base
    machinery), bit-equal to the scalar engine."""
    it = VectorInterpreter()
    it.run(CLASS_SRC + '''
function f(x)
  local p = Point.new(3, 4)
  return p:norm() + x + #p
end
''')
    vals, nil = it.vcall(it.get_global("f"), [np.array([1.0, 2.0])])
    assert nil is None
    np.testing.assert_array_equal(vals[0], [8.0, 9.0])


def test_vector_engine_refuses_per_lane_metamethods():
    """Lane-varying values meeting metamethods raise Unvectorizable
    (scalar authority), never a wrong answer."""
    it = VectorInterpreter()
    it.run(CLASS_SRC + '''
function g(x)
  local p = Point.new(x, x)   -- lane-varying field is fine (raw writes)
  return (p + p).x            -- but __add on a table holding arrays...
end
function h(x)
  local t = setmetatable({}, {__index = function(_, k) return 0 end})
  return t[x]                 -- lane-array key into a metatabled table
end
''')
    arr = np.array([1.0, 2.0])
    # g: p + p where fields are arrays -> table operands stay uniform,
    # the handler runs and returns arrays — allowed and correct:
    vals, _ = it.vcall(it.get_global("g"), [arr])
    np.testing.assert_array_equal(vals[0], [2.0, 4.0])
    with pytest.raises(Unvectorizable):
        it.vcall(it.get_global("h"), [arr])


def test_vector_masked_metatable_write_refuses():
    it = VectorInterpreter()
    it.run('''
t = setmetatable({}, {__newindex = function(t, k, v) rawset(t, k, v) end})
function f(x)
  if x > 0 then t.slot = x end
  return x
end
''')
    with pytest.raises(Unvectorizable):
        it.vcall(it.get_global("f"), [np.array([-1.0, 1.0])])


def test_lua_bridge_lens_with_metatables(tmp_path):
    """End to end: a .lua lens organized with a metatable class still
    loads and evaluates correctly (uniform metatables vectorize; the
    scalar fallback covers the rest)."""
    src = CLASS_SRC + '''
max_fov = 360
max_vfov = 180
lens_width = 2 * pi
lens_height = pi
function lens_inverse(x, y)
  if math.abs(x) > pi or math.abs(y) > pi / 2 then return nil end
  local c = math.cos(y)
  return c * math.sin(x), math.sin(y), c * math.cos(x)
end
'''
    path = tmp_path / "metalens.lua"
    path.write_text(src)
    from blinky_tpu.lua_bridge import load_lua_lens

    lens = load_lua_lens(path)
    xs = np.array([0.0, 1.0, 4.0])
    ys = np.array([0.0, 0.5, 0.0])
    vx, vy, vz, ok = lens.inverse(xs, ys)
    assert ok.tolist() == [True, True, False]
    np.testing.assert_allclose(vy[:2], np.sin(ys[:2]))


def test_masked_setmetatable_preexisting_table_refuses():
    """Code review (late r3): installing a metatable under a mask on a
    table that pre-exists the mask would leak __index behavior to
    inactive lanes — must refuse; the corpus replays the full program."""
    it = VectorInterpreter()
    it.run('''
t = {}
mt = {__index = function() return 7 end}
function f(x)
  if x > 0 then setmetatable(t, mt) end
  local v = t.miss
  if v == nil then v = 0 end
  return v
end
''')
    with pytest.raises(Unvectorizable):
        it.vcall(it.get_global("f"), [np.array([-1.0, 1.0])])


def test_masked_constructor_idiom_still_vectorizes():
    """The fresh-table constructor (`setmetatable({...}, Class)`) inside
    a masked region keeps the vector path — the table was created under
    the SAME mask context (identity-compared), so no lane can observe a
    difference."""
    it = VectorInterpreter()
    it.run('''
C = {}
C.__index = C
function C.new(a) return setmetatable({a = a}, C) end
function f(x)
  if x > 99 then return nil end
  local p = C.new(x + 1)
  return p.a
end
''')
    vals, nil = it.vcall(it.get_global("f"), [np.array([1.0, 2.0])])
    np.testing.assert_array_equal(np.asarray(vals[0]), [2.0, 3.0])


def test_rawget_lane_key_falls_back(tmp_path):
    """Code review (late r3): raw* / next keep LuaTable._norm's
    TypeError contract for array keys so the bridge engages the scalar
    walk instead of aborting the build."""
    src = '''
max_fov = 360
max_vfov = 180
lens_width = 2
lens_height = 2
T = {}
T[2] = 20
function lens_inverse(x, y)
  local v = rawget(T, math.floor(math.abs(x)) + 2)
  if v == nil then v = 1 end
  return x, y, v
end
'''
    path = tmp_path / "rg.lua"
    path.write_text(src)
    from blinky_tpu.lua_bridge import load_lua_lens

    lens = load_lua_lens(path)
    _, _, vz, ok = lens.inverse(np.array([0.1, 1.5]), np.array([0.0, 0.0]))
    assert vz.tolist() == [20.0, 1.0] and ok.all()


def test_gsub_table_repl_consults_index_metamethod():
    it = run('''
rep = setmetatable({}, {__index = function(_, k) return "#" end})
out = string.gsub("ab", "%a", rep)
''')
    assert it.get_global("out") == "##"


def test_bool_lane_array_equality_is_elementwise():
    """Code review (late r3): (x > 0) == true must compare per lane."""
    it = VectorInterpreter()
    it.run('''
function f(x)
  local b = (x > 0) == true
  if b then return x * 2 end
  return x
end
''')
    vals, _ = it.vcall(it.get_global("f"), [np.array([-1.0, 1.0])])
    np.testing.assert_array_equal(np.asarray(vals[0]), [-1.0, 2.0])


def test_goto_globe_routes_to_host_builder(tmp_path):
    """Code review (late r3): a globe whose globe_plate cannot trace
    (goto) gets Globe.jittable=False and build_lensmap reroutes to the
    exact host path instead of crashing mid-trace."""
    gsrc = '''
plates = {
  {{0, 0, 1}, {0, 1, 0}, 100},
  {{0, 0, -1}, {0, 1, 0}, 260},
}
function globe_plate(x, y, z)
  if z >= 0.7 then goto sharp end
  do return 1 end
  ::sharp::
  return 0
end
'''
    path = tmp_path / "gglobe.lua"
    path.write_text(gsrc)
    from blinky_tpu import lenses
    from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale
    from blinky_tpu.lua_bridge import load_lua_globe

    gg = load_lua_globe(path)
    assert gg.jittable is False
    pl = lenses.get("panini", gg)
    lm = build_lensmap(pl, gg, calc_scale(Zoom("fov", 180), pl, 96, 72),
                       96, 72)  # default jax backend: must reroute
    used = np.asarray(lm.plates_used)
    assert used[0] and used[1]


def test_arith_metamethod_with_lane_array_operand():
    """table OP lane-array dispatches the handler like any script call
    (elementwise through the vector machinery), bit-equal to per-lane
    scalar dispatch."""
    from blinky_tpu.minilua import Interpreter

    src = CLASS_SRC + '''
function f(x)
  local p = Point.new(2, 3)
  local q = p + Point.new(x, -x)   -- table + table holding lanes
  local r = Point.new(q.x, q.y)
  return r.x * 1 + r.y
end
'''
    si = Interpreter()
    si.run(src)
    vi = VectorInterpreter()
    vi.run(src)
    X = np.array([-1.5, 0.0, 2.0])
    scalar = [si.call(si.get_global("f"), [float(v)])[0] for v in X]
    vals, _ = vi.vcall(vi.get_global("f"), [X])
    np.testing.assert_array_equal(np.asarray(vals[0]), scalar)


def test_mul_metamethod_scalar_array():
    """Ray * lane-array (the examples/lua_drop_in.py idiom) stays on
    the vector path and traces (probe) for the device builder."""
    src = '''
Ray = {}
Ray.__index = Ray
function Ray.new(x, y) return setmetatable({x = x, y = y}, Ray) end
Ray.__mul = function(r, s) return Ray.new(r.x * s, r.y * s) end
function f(x)
  local r = Ray.new(2, 4) * x
  return r.x + r.y
end
'''
    it = VectorInterpreter()
    it.run(src)
    vals, _ = it.vcall(it.get_global("f"), [np.array([0.5, 2.0])])
    np.testing.assert_array_equal(np.asarray(vals[0]), [3.0, 12.0])


def test_comparison_metamethod_lane_result_refuses():
    """Code review (late r3 second pass): table-vs-table __lt whose
    handler returns a lane array must refuse — _truthy would collapse
    it to uniform True."""
    from blinky_tpu.minilua import Interpreter

    src = '''
P = {}
P.__index = P
function P.new(v) return setmetatable({v = v}, P) end
P.__lt = function(a, b) return a.v < b.v end
function f(x)
  local r = 2.0
  if P.new(x) < P.new(0.0) then r = 1.0 end
  return r
end
'''
    si = Interpreter()
    si.run(src)
    assert [si.call(si.get_global("f"), [v])[0]
            for v in (-1.0, 1.0)] == [1.0, 2.0]
    vi = VectorInterpreter()
    vi.run(src)
    with pytest.raises(Unvectorizable):
        vi.vcall(vi.get_global("f"), [np.array([-1.0, 1.0, -3.0])])
    # uniform operands still fire the handler like the scalar engine
    vals, _ = vi.vcall(vi.get_global("f"), [-1.0])
    assert vals[0] == 1.0


def test_arith_error_blames_the_nonnumeric_operand():
    """lane-array + handlerless table must blame the TABLE (the scalar
    engine's diagnostic), not typename the array."""
    it = VectorInterpreter()
    it.run("t = {}\nfunction f(x) return x + t end")
    with pytest.raises(LuaError, match=r"\(table\)"):
        it.vcall(it.get_global("f"), [np.array([1.0, 2.0])])
