"""Language-semantics tests for the mini-Lua interpreter.

The integration suite (test_lua_bridge.py) checks all 37 shipped scripts
end-to-end; these pin the interpreter's Lua 5.2 semantics directly —
the constructs the scripts rely on plus their edge cases.
"""

import math

import pytest

from blinky_tpu.minilua import Interpreter, LuaError, run_script


def run(src, builtins=None):
    return run_script(src, builtins=builtins, is_path=False)


def g(src, name, builtins=None):
    return run(src, builtins).get_global(name)


def test_arithmetic_and_precedence():
    assert g("x = 2 + 3 * 4", "x") == 14
    assert g("x = (2 + 3) * 4", "x") == 20
    assert g("x = 2 ^ 3 ^ 2", "x") == 512  # right-assoc
    assert g("x = -2 ^ 2", "x") == -4  # unary binds looser than ^
    assert g("x = 2 ^ -1", "x") == 0.5
    assert g("x = -2 * 3", "x") == -6
    assert g("x = 7 % 3", "x") == 1
    assert g("x = -7 % 3", "x") == 2  # Lua %: floored, sign of divisor
    assert g("x = 1/2 + 1/2", "x") == 1.0


def test_comparisons_and_truthiness():
    # only nil and false are falsy — 0 is TRUE in Lua
    assert g("if 0 then x = 'zero-true' else x = 'zero-false' end", "x") == "zero-true"
    assert g("x = 1 < 2 and 'a' or 'b'", "x") == "a"
    assert g("x = nil == false", "x") is False  # nil ~= false in Lua
    assert g("x = not nil", "x") is True
    assert g("y = nil; x = y == nil", "x") is True


def test_and_or_return_values():
    assert g("x = nil or 5", "x") == 5
    assert g("x = false and 5", "x") is False
    assert g("x = 3 and 4", "x") == 4
    assert g("x = nil and 4", "x") is None


def test_multiple_assignment_and_returns():
    src = """
function two() return 1, 2 end
a, b = two()
c, d, e = two()        -- e padded with nil
f = two()              -- truncated to first
s, t = two(), 9        -- non-last call truncated to one value
"""
    it = run(src)
    assert (it.get_global("a"), it.get_global("b")) == (1, 2)
    assert it.get_global("e") is None
    assert it.get_global("f") == 1
    assert (it.get_global("s"), it.get_global("t")) == (1, 9)


def test_parens_truncate_multiple_returns():
    src = "function two() return 1, 2 end\na, b = (two())"
    it = run(src)
    assert it.get_global("a") == 1 and it.get_global("b") is None


def test_tables_and_length():
    src = """
t = {10, 20, 30}
t[4] = 40
n = #t
u = { {1,2}, {3,4} }
v = u[2][1]
w = {x = 5, [2+1] = 7}
a = w.x
b = w[3]
"""
    it = run(src)
    assert it.get_global("n") == 4
    assert it.get_global("v") == 3
    assert it.get_global("a") == 5 and it.get_global("b") == 7


def test_loops_and_break():
    src = """
s = 0
for i = 1, 5 do s = s + i end
p = 1
i = 0
while true do
  i = i + 1
  if i >= 3 then break end
end
r = 0
repeat r = r + 1 until r >= 4
"""
    it = run(src)
    assert it.get_global("s") == 15
    assert it.get_global("i") == 3
    assert it.get_global("r") == 4


def test_repeat_until_sees_body_locals():
    src = """
n = 0
repeat
  local done = n >= 2
  n = n + 1
until done
"""
    assert g(src, "n") == 3


def test_scoping_and_closures():
    src = """
x = 1
function f()
  local x = 2
  return x
end
a = f()
b = x
function counter()
  local n = 0
  return function() n = n + 1 return n end
end
c = counter()
d = c()
e = c()
"""
    it = run(src)
    assert it.get_global("a") == 2 and it.get_global("b") == 1
    assert (it.get_global("d"), it.get_global("e")) == (1, 2)


def test_math_library_is_libm_semantics():
    # domain errors yield NaN / -inf like C libm, not exceptions
    assert math.isnan(g("x = acos(2)", "x"))
    assert g("x = log(0)", "x") == -math.inf
    assert math.isnan(g("x = sqrt(-1)", "x"))
    assert math.isnan(g("x = (-2) ^ 0.5", "x"))  # C pow domain error
    assert g("x = 1/0", "x") == math.inf
    assert g("x = -1/0", "x") == -math.inf
    assert math.isnan(g("x = 0/0", "x"))
    i, f = g("a, b = math.modf(3.7)\nx = {a, b}", "x").array()
    assert i == 3.0 and abs(f - 0.7) < 1e-12
    i, f = g("a, b = math.modf(-3.7)\nx = {a, b}", "x").array()
    assert i == -3.0 and abs(f + 0.7) < 1e-12  # toward zero, like C modf
    assert g("x = math.max(table.unpack({3, 9, 4}))", "x") == 9


def test_alias_globals_preloaded():
    # init_lua's alias block (fisheye.c:1231-1248)
    it = run("x = cos(0) + sin(0)\ny = pi\nz = tau\nw = pow(2, 10)")
    assert it.get_global("x") == 1.0
    assert it.get_global("y") == math.pi
    assert it.get_global("z") == 2 * math.pi
    assert it.get_global("w") == 1024


def test_print_captured():
    it = run("print(42)\nprint('a', 1)")
    assert it.printed == ["42.0", "a\t1.0"] or it.printed == ["42", "a\t1"]


def test_builtins_injected_and_nil_protocol():
    def host(a, b):
        if a < 0:
            return None  # nil
        return a + b, a - b

    it = run("p, q = f(3, 1)\nr = f(-1, 0)", builtins={"f": host})
    assert (it.get_global("p"), it.get_global("q")) == (4, 2)
    assert it.get_global("r") is None


def test_errors_are_lua_errors_with_lines():
    with pytest.raises(LuaError, match="line 2"):
        run("x = 1\ny = @")
    with pytest.raises(LuaError, match="malformed number"):
        run("x = 3e")
    with pytest.raises(LuaError, match="unterminated string"):
        run('x = "abc')
    with pytest.raises(LuaError):
        run("x = y.z")  # indexing a nil value
    with pytest.raises(LuaError):
        run("x = 1 + nil")


def test_comments():
    src = """
-- line comment
x = 1 -- trailing
--[[ block
comment with x = 99
--]]
y = 2
"""
    it = run(src)
    assert it.get_global("x") == 1 and it.get_global("y") == 2


def test_session_reports_bad_lua_script(tmp_path):
    from blinky_tpu.api import Session

    (tmp_path / "broken.lua").write_text("function lens_inverse(x, y\nreturn x end")
    sess = Session(32, 24, lens_dirs=[tmp_path])
    sess.cmd("f_lens broken")
    assert any("could not load lens" in m for m in sess.console)
    assert not sess.lens_valid or sess.lens_name != "broken"


def test_runaway_scripts_are_bounded():
    """A bad user script must not hang the session (the viewer is
    single-threaded): the interpreter carries a per-entry instruction
    budget."""
    import pytest

    from blinky_tpu.minilua import Interpreter, LuaError

    for src in ("while true do end",
                "repeat until false",
                "x = 0\nwhile true do x = x + 1 end",
                "function f() return f() end\nf()"):
        it = Interpreter()
        with pytest.raises((LuaError, RecursionError)):
            it.run(src)
    # the budget resets per host call: many small calls never trip it
    it = Interpreter()
    it.run("function inc(x) return x + 1 end")
    fn = it.get_global("inc")
    for i in range(1000):
        assert it.call(fn, [i]) == [i + 1]


def test_pow_and_division_match_c99():
    """Lua's ^ and / are C pow and IEEE double division; pin the edge
    cases directly against glibc (the fuzz suite found Python's ** and
    ZeroDivisionError mappings diverging)."""
    import ctypes
    import math

    from blinky_tpu.minilua import Interpreter

    libm = ctypes.CDLL("libm.so.6")
    libm.pow.restype = ctypes.c_double
    libm.pow.argtypes = [ctypes.c_double, ctypes.c_double]

    it = Interpreter()
    it.run("function p(a, b) return a ^ b end\n"
           "function d(a, b) return a / b end")
    p, d = it.get_global("p"), it.get_global("d")

    cases = [(0.0, -1.0), (0.0, -2.0), (-0.0, -3.0), (0.0, -math.inf),
             (-0.04, -803.6), (-2.0, 1001.0), (2.0, 1e308), (-2.0, 0.5),
             (1.0, math.nan), (math.nan, 0.0), (-1.0, math.inf)]
    for a, b in cases:
        want = libm.pow(a, b)
        got = it.call(p, [a, b])[0]
        assert got == want or (math.isnan(got) and math.isnan(want)), \
            (a, b, got, want)

    for a, b, want in [(1.0, -0.0, -math.inf), (1.0, 0.0, math.inf),
                       (-1.0, -0.0, math.inf), (0.0, 0.0, math.nan),
                       (math.nan, 0.0, math.nan)]:
        got = it.call(d, [a, b])[0]
        assert got == want or (math.isnan(got) and math.isnan(want)), \
            (a, b, got, want)


# ---------------------------------------------------------------------------
# Round 3 (VERDICT task 6): the extended common surface + the diagnosed
# subset boundary.


def test_generic_for_pairs_ipairs_table_lib():
    it = run("""
t = {10, 20, 30, x = 1}
sum = 0
for i, v in ipairs(t) do sum = sum + v end
keys = 0
for k, v in pairs(t) do keys = keys + 1 end
table.insert(t, 40)
table.insert(t, 1, 5)
removed = table.remove(t)
cat = table.concat({"a", "b", "c"}, "-")
srt = {3, 1, 2}
table.sort(srt)
desc = {3, 1, 2}
table.sort(desc, function(a, b) return a > b end)
""")
    assert it.get_global("sum") == 60.0
    assert it.get_global("keys") == 4.0
    assert it.get_global("removed") == 40.0
    assert it.get_global("cat") == "a-b-c"
    assert it.get_global("srt").array() == [1.0, 2.0, 3.0]
    assert it.get_global("desc").array() == [3.0, 2.0, 1.0]


def test_varargs_and_select():
    it = run("""
function f(a, ...)
  local n = select("#", ...)
  local b, c = ...
  local t = {...}
  return a + n, b, c, #t
end
r1, r2, r3, r4 = f(1, 10, 20, 30)
""")
    assert [it.get_global(k) for k in ("r1", "r2", "r3", "r4")] == \
        [4.0, 10.0, 20.0, 3.0]


def test_string_library_and_methods():
    it = run("""
s = string.format("%03d|%s|%.2f|%x|%q", 7, "a", 1.5, 255, 'he"y')
sub1 = string.sub("hello", 2, -2)
up = ("abc"):upper()
rep = string.rep("ab", 3, "-")
b1, b2 = string.byte("AB", 1, 2)
ch = string.char(72, 105)
rev = string.reverse("abc")
n = string.len("abcd")
""")
    assert it.get_global("s") == '007|a|1.50|ff|"he\\"y"'
    assert it.get_global("sub1") == "ell"
    assert it.get_global("up") == "ABC"
    assert it.get_global("rep") == "ab-ab-ab"
    assert (it.get_global("b1"), it.get_global("b2")) == (65.0, 66.0)
    assert it.get_global("ch") == "Hi"
    assert it.get_global("rev") == "cba"
    assert it.get_global("n") == 4.0


def test_method_definitions_and_dotted_functions():
    it = run("""
obj = {v = 10}
function obj:get() return self.v end
function obj.plain(x) return x * 2 end
lib = {inner = {}}
function lib.inner.f() return 7 end
a = obj:get()
b = obj.plain(3)
c = lib.inner.f()
""")
    assert (it.get_global("a"), it.get_global("b"),
            it.get_global("c")) == (10.0, 6.0, 7.0)


def test_tonumber_type_pcall_assert():
    it = run("""
n1 = tonumber("  12.5 ")
n2 = tonumber("0x1F")
n3 = tonumber("zz")
n4 = tonumber("ff", 16)
t1 = type(nil) .. type(true) .. type(1) .. type("s")
ok1, v = pcall(function() return 5 end)
ok2, err = pcall(function() error("boom") end)
a = assert(42)
""")
    assert it.get_global("n1") == 12.5
    assert it.get_global("n2") == 31.0
    assert it.get_global("n3") is None
    assert it.get_global("n4") == 255.0
    assert it.get_global("t1") == "nilbooleannumberstring"
    assert it.get_global("ok1") is True and it.get_global("v") == 5.0
    assert it.get_global("ok2") is False and "boom" in it.get_global("err")
    assert it.get_global("a") == 42.0


def test_long_strings_and_escapes():
    it = run('s = [[a\nb]]\nt = "x\\65\\n"')
    assert it.get_global("s") == "a\nb"
    assert it.get_global("t") == "xA\n"


@pytest.mark.parametrize("src,needle", [
    ("io.write('x')", "'io' library is not available"),
    ("os.time()", "'os' library is not available"),
    ("require('m')", "not available to sandboxed"),
    ("dofile('m.lua')", "not available to sandboxed"),
    ("loadfile('m.lua')", "not available to sandboxed"),
])
def test_out_of_subset_diagnostics(src, needle):
    """VERDICT r2 task 6: out-of-subset constructs fail with a clean,
    SPECIFIC diagnostic naming the missing feature (and pointing at
    docs/SCRIPTING.md), never a confusing nil-call error."""
    with pytest.raises(LuaError, match="(?i)" + needle.replace("'", ".")):
        run(src)


def test_vector_engine_handles_new_surface():
    """The vectorized evaluator runs the new constructs: uniform-scalar
    generic for (with the loop registered so masked breaks target it),
    varargs, string methods on uniform values."""
    import numpy as np

    from blinky_tpu.lua_vector import VectorInterpreter

    src = """
weights = {0.5, 0.25, 0.25}
function f(x, y)
  local acc = 0
  for i, w in ipairs(weights) do
    acc = acc + w * (x + i)
  end
  local lbl = string.format("%d", #weights)
  return acc + #lbl, y
end
"""
    si = Interpreter()
    si.run(src)
    vi = VectorInterpreter()
    vi.run(src)
    X = np.linspace(-2, 2, 17)
    Y = np.linspace(1, 3, 17)
    vals, nil = vi.vcall(vi.get_global("f"), [X, Y])
    assert nil is None
    for i in range(len(X)):
        sv = si.call(si.get_global("f"), [float(X[i]), float(Y[i])])
        assert float(sv[0]) == float(np.asarray(vals[0])[i])
        assert float(sv[1]) == float(np.broadcast_to(vals[1], X.shape)[i])


def test_table_remove_bounds_and_pairs_live_values():
    """Review round 3: table.remove out of bounds raises (Lua 5.2), and
    pairs() reads values LIVE (mutations mid-traversal are seen, niled
    entries skipped) instead of snapshotting."""
    it = run("""
t = {10, 20, 30}
ok1 = pcall(function() table.remove(t, 7) end)
ok2 = pcall(function() table.remove(t, 0) end)
untouched = #t
allowed = table.remove(t, 4)  -- pos == n+1 is legal: no shift, nil
n_after = #t
seen = ""
u = {1, 2, 3}
for k, v in pairs(u) do
  u[2] = 99
  u[3] = nil
  seen = seen .. tostring(v) .. ";"
end
""")
    assert it.get_global("ok1") is False and it.get_global("ok2") is False
    assert it.get_global("untouched") == 3.0
    assert it.get_global("allowed") is None
    assert it.get_global("n_after") == 3.0
    assert it.get_global("seen") == "1.0;99.0;"


def test_stdlib_raises_luaerror_never_python_exceptions():
    """Review round 3: stdlib bodies convert stray Python exceptions to
    LuaError so pcall catches them and the sandbox contract holds."""
    it = run("""
ok1, e1 = pcall(function() table.sort({1, "x"}) end)
ok2, e2 = pcall(function() return string.format("%d") end)
ok3, e3 = pcall(function() return string.format("%d", 0/0) end)
ok4, e4 = pcall(function() return string.rep("a", "zz") end)
""")
    for k in ("ok1", "ok2", "ok3", "ok4"):
        assert it.get_global(k) is False, k
    # and outside pcall they surface as LuaError, not TypeError
    with pytest.raises(LuaError):
        run('table.sort({1, "x"})')


def test_vararg_outside_vararg_function_is_parse_error():
    """Review round 3: a nested non-vararg closure cannot read the
    enclosing function's `...` (parse-time error like the real VM)."""
    with pytest.raises(LuaError, match="outside a vararg"):
        run("function outer(...)\n"
            "  local f = function() return ... end\n"
            "  return f()\nend")
    # the main chunk is vararg in Lua: top-level `...` parses (and the
    # runtime reports the missing binding cleanly)
    with pytest.raises(LuaError, match="vararg"):
        run("x = ...")


def test_nil_table_keys_lua_semantics():
    """Review: t[nil] READS yield nil (not an error); WRITING t[nil]
    raises 'table index is nil' as a LuaError (pcall-able); table- and
    function-valued keys remain legal like real Lua."""
    it = run("""
t = {}
r1 = t[nil]
ok1, e1 = pcall(function() t[nil] = 1 end)
k = {}
t[k] = "byref"
f = function() end
t[f] = 2
v1 = t[k]
v2 = t[f]
""")
    assert it.get_global("r1") is None
    assert it.get_global("ok1") is False
    assert "index is nil" in it.get_global("e1")
    assert it.get_global("v1") == "byref" and it.get_global("v2") == 2.0


def test_goto_continue_idiom_and_loops():
    """Lua 5.2 goto/labels: the ::continue:: idiom, backward gotos,
    forward jumps out of nested blocks, per-function scoping."""
    it = run('''
sum = 0
for i = 1, 10 do
  if i % 2 == 0 then goto continue end
  sum = sum + i
  ::continue::
end
n = 0
::top::
n = n + 1
if n < 5 then goto top end
state = "start"
do
  do goto done end
end
state = "skipped"
::done::
final = state
function f(k)
  local acc = 0
  for i = 1, k do
    if i == 3 then goto skip end
    acc = acc + i
    ::skip::
  end
  return acc
end
facc = f(5)
''')
    g = it.get_global
    assert g("sum") == 25.0
    assert g("n") == 5.0
    assert g("final") == "start"
    assert g("facc") == 12.0  # 1+2+4+5


@pytest.mark.parametrize("src,needle", [
    ("goto nowhere", "no visible label"),
    # a label is not visible outside its own block
    ("do ::x:: end goto x", "no visible label"),
    # gotos cannot cross function boundaries
    ("function f() goto out end ::out::", "no visible label"),
    ("::a:: ::a::", "already defined"),
])
def test_goto_parse_time_validation(src, needle):
    with pytest.raises(LuaError, match=needle):
        run(src)


def test_goto_runaway_burns_fuel():
    with pytest.raises(LuaError, match="budget"):
        run("::a:: goto a")


def test_goto_script_falls_back_to_scalar_engine(tmp_path):
    """A .lua lens using goto loads through the bridge's scalar
    fallback (Unvectorizable at vector load) and still evaluates."""
    import numpy as np

    from blinky_tpu.lua_bridge import load_lua_lens

    src = '''
max_fov = 360
max_vfov = 180
lens_width = 2
lens_height = 2
-- top-level goto: the vectorized engine refuses, scalar runs it
probe = 0
::again::
probe = probe + 1
if probe < 3 then goto again end
function lens_inverse(x, y)
  local n = 0
  ::more::
  n = n + 1
  if n < 2 then goto more end
  return x, y, n - 1
end
'''
    path = tmp_path / "gotolens.lua"
    path.write_text(src)
    lens = load_lua_lens(path)
    assert lens.jittable is False  # scalar-only tier
    xs = np.array([0.1, -0.2])
    ys = np.array([0.3, 0.4])
    vx, vy, vz, ok = lens.inverse(xs, ys)
    np.testing.assert_allclose(vx, xs)
    np.testing.assert_allclose(vz, [1.0, 1.0])
    assert ok.all()


def test_build_lensmap_routes_nonjittable_to_host(tmp_path):
    """build_lensmap must not trace a scalar-only .lua lens even when
    called directly with the default jax backend (the Session routing,
    enforced at the library layer)."""
    import numpy as np

    from blinky_tpu import globes, lenses
    from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale
    from blinky_tpu.lua_bridge import load_lua_lens

    src = '''
max_fov = 360
max_vfov = 180
lens_width = 2 * pi
lens_height = pi
function lens_inverse(x, y)
  if math.abs(x) > pi or math.abs(y) > pi/2 then goto invalid end
  do return math.cos(y) * math.sin(x), math.sin(y), math.cos(y) * math.cos(x) end
  ::invalid::
  return nil
end
'''
    path = tmp_path / "gotoeq.lua"
    path.write_text(src)
    g = globes.get("cube")
    ld = load_lua_lens(path, g)
    assert ld.jittable is False
    lm = build_lensmap(ld, g, calc_scale(Zoom("contain"), ld, 96, 72),
                       96, 72)  # default jax backend: must reroute
    port = lenses.get("equirect", g)
    lmp = build_lensmap(port, g, calc_scale(Zoom("contain"), port, 96, 72),
                        96, 72, backend="numpy")
    assert (np.asarray(lm.plate) == np.asarray(lmp.plate)).all()
    assert (np.asarray(lm.valid) == np.asarray(lmp.valid)).all()


# ---- coroutines + load (round 5): the pure-language half of liblua 5.2
# the reference links (fisheye.c:278-280); io/os stay sandboxed.


def test_coroutine_create_resume_yield_values():
    it = run("""
local co = coroutine.create(function(a, b)
  local c = coroutine.yield(a + b)
  local d, e = coroutine.yield(c * 2)
  return d + e, "done"
end)
ok1, v1 = coroutine.resume(co, 1, 2)
st1 = coroutine.status(co)
ok2, v2 = coroutine.resume(co, 10)
ok3, v3, v4 = coroutine.resume(co, 5, 6)
st2 = coroutine.status(co)
ok4, err4 = coroutine.resume(co)
ty = type(co)
ts = tostring(co)
""")
    gg = it.get_global
    assert (gg("ok1"), gg("v1")) == (True, 3.0)
    assert gg("st1") == "suspended"
    assert (gg("ok2"), gg("v2")) == (True, 20.0)
    assert (gg("ok3"), gg("v3"), gg("v4")) == (True, 11.0, "done")
    assert gg("st2") == "dead"
    # liblua error semantics: resuming a dead coroutine is a FALSE
    # return, not a raised error
    assert gg("ok4") is False and "cannot resume dead coroutine" in gg("err4")
    assert gg("ty") == "thread" and gg("ts").startswith("thread: 0x")
    it.close()


def test_coroutine_wrap_and_error_propagation():
    it = run("""
local gen = coroutine.wrap(function() for k = 1, 3 do coroutine.yield(k) end end)
w1, w2, w3 = gen(), gen(), gen()
-- error inside create'd coroutine: resume returns false + message
local bad = coroutine.create(function() error("boom") end)
okb, errb = coroutine.resume(bad)
stb = coroutine.status(bad)
-- error inside wrap'd coroutine: PROPAGATES (liblua wrap semantics)
local wbad = coroutine.wrap(function() error("wboom") end)
okw, errw = pcall(wbad)
""")
    gg = it.get_global
    assert (gg("w1"), gg("w2"), gg("w3")) == (1.0, 2.0, 3.0)
    assert gg("okb") is False and "boom" in gg("errb")
    assert gg("stb") == "dead"
    assert gg("okw") is False and "wboom" in gg("errw")
    it.close()


def test_coroutine_yield_outside_and_nonsuspended_resume():
    it = run("""
oky, erry = pcall(coroutine.yield, 1)
-- resuming the RUNNING coroutine from inside itself: false return
local co
co = coroutine.create(function() return coroutine.resume(co) end)
okr, selfok, selferr = coroutine.resume(co)
""")
    gg = it.get_global
    assert gg("oky") is False and "outside a coroutine" in gg("erry")
    assert gg("okr") is True and gg("selfok") is False
    assert "non-suspended" in gg("selferr")
    it.close()


def test_coroutine_nested_and_status_normal():
    it = run("""
local inner = coroutine.create(function()
  coroutine.yield("i1")
  return "idone"
end)
local outer = coroutine.create(function()
  local _, v = coroutine.resume(inner)
  inner_status = coroutine.status(inner)
  local me, ismain = coroutine.running()
  running_ismain = ismain
  coroutine.yield("o:" .. v)
  local _, v2 = coroutine.resume(inner)
  return "oend:" .. v2
end)
-- while outer runs inner, outer is "normal" (checked from inner)
local watcher = coroutine.create(function(o)
  watched = coroutine.status(o)
  coroutine.yield()
end)
ok1, v1 = coroutine.resume(outer)
ok2, v2 = coroutine.resume(outer)
main_co, main_ismain = coroutine.running()
iy = coroutine.isyieldable()
""")
    gg = it.get_global
    assert (gg("ok1"), gg("v1")) == (True, "o:i1")
    assert gg("inner_status") == "suspended"
    assert gg("running_ismain") is False
    assert (gg("ok2"), gg("v2")) == (True, "oend:idone")
    assert gg("main_co") is None and gg("main_ismain") is True
    assert gg("iy") is False
    it.close()


def test_coroutine_yield_across_pcall():
    # 5.2's yieldable pcall: a yield inside pcall suspends; the pcall
    # completes on the next resume
    it = run("""
local co = coroutine.create(function()
  local ok, v = pcall(function()
    coroutine.yield("inpcall")
    return "after"
  end)
  return ok, v
end)
ok1, y1 = coroutine.resume(co)
ok2, pok, pv = coroutine.resume(co)
""")
    gg = it.get_global
    assert gg("y1") == "inpcall"
    assert gg("pok") is True and gg("pv") == "after"
    it.close()


def test_coroutine_fuel_and_thread_cap():
    import threading

    # a runaway coroutine burns the shared per-entry fuel -> LuaError
    with pytest.raises(LuaError, match="instruction budget"):
        run("local f = coroutine.wrap(function() while true do end end) f()")
    # parking unbounded suspended coroutines trips the thread cap
    before = threading.active_count()
    it = Interpreter()
    with pytest.raises(LuaError, match="too many live coroutines"):
        it.run("""
for k = 1, 1000 do
  local c = coroutine.create(function() coroutine.yield() end)
  coroutine.resume(c)
end
""")
    assert threading.active_count() <= before + it.MAX_LIVE_COROUTINES + 1
    it.close()  # unwinds the parked threads
    deadline = 50
    while threading.active_count() > before and deadline:
        import time

        time.sleep(0.1)
        deadline -= 1
    assert threading.active_count() <= before


def test_coroutine_fuel_does_not_reset_across_suspension():
    # a suspended coroutine must not re-arm the per-host-entry fuel
    # reset: each host entry still gets exactly FUEL statements
    it = run("""
co = coroutine.create(function() coroutine.yield() end)
coroutine.resume(co)  -- leave it suspended
""")
    assert it.get_global("co").status == "suspended"
    with pytest.raises(LuaError, match="instruction budget"):
        it.run("while true do end")
    it.close()


def test_load_string_chunks():
    it = run("""
local f = load("return 40 + 2")
l1 = f()
-- syntax error: nil + message, never a raised error
local bad, err = load("syntax error here(")
lbad = bad == nil and err ~= nil
-- chunks see (and write) the sandbox globals
shared = 7
l2 = load("return shared + 1")()
load("written = 99")()
-- vararg chunk
l3 = load("local a, b = ... ; return a * b")(6, 7)
-- loadstring is the 5.1-compat alias
l4 = loadstring("return 'ls'")()
-- reader-function form (5.2): pieces until nil/empty
local parts = { "return ", "1 + ", "2" }
local i = 0
local rf = load(function() i = i + 1 ; return parts[i] end)
l5 = rf()
-- custom env (the 5.2 _ENV argument)
local env = { x = 7 }
l6 = load("return x * 2", "c", "t", env)()
load("y = x + 1", "c2", "t", env)()
envy = env.y
-- the custom env does NOT leak to the sandbox globals
leak = (x == nil) and (y == nil)
""")
    gg = it.get_global
    assert gg("l1") == 42.0
    assert gg("lbad") is True
    assert gg("l2") == 8.0
    assert gg("written") == 99.0
    assert gg("l3") == 42.0
    assert gg("l4") == "ls"
    assert gg("l5") == 3.0
    assert gg("l6") == 14.0
    assert gg("envy") == 8.0
    assert gg("leak") is True


def test_load_goto_validation_and_fuel():
    it = run("g1, gerr = load('goto nowhere')")
    assert it.get_global("g1") is None
    assert "label" in it.get_global("gerr")
    # a loaded runaway chunk still burns fuel
    with pytest.raises(LuaError, match="instruction budget"):
        run("load('while true do end')()")


def test_coroutine_lens_script_loads_and_builds(tmp_path):
    """A lens script written coroutine-style (VERDICT r4 #2 'done'
    criterion): a generator coroutine computes the bound table at load
    time and lens_inverse consults it; loads through the bridge's
    scalar fallback and BUILDS a lensmap."""
    import numpy as np

    from blinky_tpu import globes
    from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale
    from blinky_tpu.lua_bridge import load_lua_lens

    src = '''
max_fov = 360
max_vfov = 180
-- coroutine-style load-time computation of the lens bounds
local gen = coroutine.create(function()
  coroutine.yield(2 * pi)  -- width
  coroutine.yield(pi)      -- height
end)
local _, w = coroutine.resume(gen)
local _, h = coroutine.resume(gen)
lens_width = w
lens_height = h
-- equirect inverse written through a chunk compiled by load()
local core = load("local x, y = ... ; return cos(y) * sin(x), sin(y), cos(y) * cos(x)")
function lens_inverse(x, y)
  if math.abs(x) > pi or math.abs(y) > pi / 2 then return nil end
  return core(x, y)
end
'''
    path = tmp_path / "corolens.lua"
    path.write_text(src)
    g = globes.get("cube")
    ld = load_lua_lens(path, g)
    # coroutine at load time -> vector engine refused -> scalar tier
    assert ld.jittable is False
    assert float(ld.width) == pytest.approx(2 * math.pi)
    lm = build_lensmap(ld, g, calc_scale(Zoom("contain"), ld, 96, 72),
                       96, 72)
    from blinky_tpu import lenses

    port = lenses.get("equirect", g)
    lmp = build_lensmap(port, g, calc_scale(Zoom("contain"), port, 96, 72),
                        96, 72, backend="numpy")
    assert (np.asarray(lm.plate) == np.asarray(lmp.plate)).all()
    assert (np.asarray(lm.valid) == np.asarray(lmp.valid)).all()


def test_load_only_lens_stays_vectorized(tmp_path):
    """load() alone is NOT scalar-authority: a loaded chunk is an
    ordinary function through the same evaluator, so a lens using load
    (without coroutines/goto) keeps the vectorized tier."""
    import numpy as np

    from blinky_tpu import globes
    from blinky_tpu.lua_bridge import load_lua_lens

    src = '''
max_fov = 360
max_vfov = 180
lens_width = 2 * pi
lens_height = pi
local core = load("local x, y = ... ; return cos(y) * sin(x), sin(y), cos(y) * cos(x)")
function lens_inverse(x, y)
  if math.abs(x) > pi or math.abs(y) > pi / 2 then return nil end
  return core(x, y)
end
'''
    path = tmp_path / "loadlens.lua"
    path.write_text(src)
    g = globes.get("cube")
    ld = load_lua_lens(path, g)
    xs = np.linspace(-4.0, 4.0, 31)
    ys = np.linspace(-1.2, 1.2, 31)
    vx, vy, vz, ok = ld.inverse(xs, ys)
    ref = np.cos(ys) * np.sin(xs)
    np.testing.assert_allclose(np.where(ok, vx, 0), np.where(ok, ref, 0))
    assert ok.sum() > 0 and (~ok).sum() > 0


def test_dead_coroutines_are_pruned_not_retained():
    """Drained coroutines must leave the interpreter's tracking list
    (round-5 review): a script that wraps one coroutine per call runs
    once per PIXEL on the scalar tier, so retaining dead
    coroutine+thread+event triples leaks ~2M objects per 1080p build."""
    it = run("""
for k = 1, 50 do
  local gen = coroutine.wrap(function() coroutine.yield(k) end)
  gen(); gen()  -- drain to death
end
-- an ERRORING coroutine is dead too, and must be pruned as well
local bad = coroutine.create(function() error("boom") end)
coroutine.resume(bad)
""")
    assert it._all_coroutines == []
    assert it._live_coroutines == 0
    it.close()


def test_suspended_coroutines_stay_tracked_for_close():
    it = run("""
co = coroutine.create(function() coroutine.yield() end)
coroutine.resume(co)  -- park it
done = coroutine.create(function() end)
coroutine.resume(done)  -- dead: pruned
""")
    assert len(it._all_coroutines) == 1
    assert it._all_coroutines[0] is it.get_global("co")
    it.close()
    assert it._all_coroutines == []
    assert it.get_global("co").status == "dead"


def test_live_coroutine_counter_conserved_under_churn():
    """The live counter decrements INSIDE the handoff window (before
    _return_evt.set()): a decrement racing the next resume's
    check-then-increment would drift the counter until the 200-thread
    cap fired spuriously on a script that drains every coroutine.
    300 sequential create+drain cycles only pass if conserved."""
    it = run("""
for k = 1, 300 do
  local c = coroutine.create(function() return k end)
  coroutine.resume(c)
end
""")
    assert it._live_coroutines == 0
    it.close()


def test_load_mode_argument_must_be_string():
    """A non-string mode raises a CATCHABLE LuaError (liblua: bad
    argument #3), never a raw Python TypeError — a leaked TypeError
    would both escape script pcall and be misread by lua_bridge's
    fallback clauses as an Unvectorizable verdict."""
    it = run("""
ok, err = pcall(load, "x = 1", "chunk", 3)
-- a STRING mode without 't' keeps the (nil, message) protocol
f, msg = load("x = 1", nil, "b")
""")
    assert it.get_global("ok") is False
    assert "bad argument #3" in it.get_global("err")
    assert it.get_global("f") is None
    assert "mode 't'" in it.get_global("msg")
